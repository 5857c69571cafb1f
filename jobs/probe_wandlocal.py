"""Round-6 pass-3 probe: wand_topk_local cold-query cost (guide §1).

The bench's wand_local_8q line pays ONE Spark job per cold query (pruned
postings fetch via _local_blocks -> toPandas).  This probe measures that
job against a driver-local pyarrow read of the same bucket-pruned parquet
files (the fuzzy_topk_local / docstore.py serving pattern) and asserts the
fetched blocks and final rankings are identical.  NOT part of the driver
bench contract.
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EXPAND = int(os.environ.get("SPARK_GRAFT_EXPAND", "40"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    ["spark", "merge"],
    ["the"],
    ["vector", "window", "batch"],
    ["the", "data", "row"],
    ["join", "filter"],
    ["dup"],
    ["table", "scan", "query"],
    ["zzzznotaterm"],
]


def pyarrow_fetch(index, missing):
    """Prototype: driver-local bucket-pruned read of the postings table."""
    import pyarrow.dataset as ds

    from telegram2elastic_spark.functions.xxhash import term_bucket
    from telegram2elastic_spark.index.build import N_TERM_BUCKETS

    buckets = sorted({term_bucket(t, N_TERM_BUCKETS) for t in missing})
    src = ds.dataset(
        f"{index['_dir']}/postings", format="parquet", partitioning="hive"
    )
    cols = [
        "term", "block_id", "n_docs", "first_doc_id", "last_doc_id",
        "doc_gaps", "tf_bytes", "dl_bytes", "block_max_tf",
    ]
    filt = ds.field("term_bucket").isin(buckets) & ds.field("term").isin(
        missing
    )
    return src.to_table(columns=cols, filter=filt).to_pandas()


def main():
    import pandas as pd

    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.index.build import build_index, read_index, write_index
    from telegram2elastic_spark.query.wand import wand_topk_local, _local_blocks
    from telegram2elastic_spark.session import get_spark

    spark = get_spark("probe-wandlocal", master=f"local[{CPUS}]")
    wd = tempfile.mkdtemp(prefix="probe_wl_")
    corpus_path = f"{wd}/corpus"
    docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
    as_corpus(docs).repartition(64, "doc_id").write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()

    idx_dir = f"{wd}/index"
    write_index(build_index(corpus, n_doc_parts=CPUS), idx_dir)

    def fresh(spark_fetch: bool):
        idx = read_index(spark, idx_dir)
        if spark_fetch:
            idx.pop("_postings_dir", None)  # force the Spark fetch route
        for name in ("doc_map", "term_dict", "postings", "stats"):
            idx[name] = idx[name].cache()
            idx[name].count()
        wand_topk_local(idx, BENCH_QUERIES[0], k=10)  # stats + worker warm
        idx.pop("_local_post_cache", None)
        idx.pop("_local_decoded", None)
        idx.pop("_local_decoded_n", None)
        idx.pop("_idf_cache", None)
        return idx

    # interleaved A/B: spark fetch vs the integrated pyarrow fast path
    res_spark = res_pa = None
    for trial in range(3):
        for label, use_spark in (("spark_fetch", True), ("pyarrow_fetch", False)):
            idx = fresh(use_spark)
            t0 = time.perf_counter()
            res = [wand_topk_local(idx, q, k=10) for q in BENCH_QUERIES]
            print(f"{label} trial{trial}: {time.perf_counter() - t0:.3f}s",
                  flush=True)
            if use_spark:
                res_spark = res
            else:
                res_pa = res

    assert res_spark == res_pa, (
        "rank mismatch between spark and pyarrow fetch"
    )
    print("identity: OK (8/8 queries identical)")
    spark.stop()


if __name__ == "__main__":
    main()
