"""Round-6 probe: field_indexes build — per-field build_index (old) vs
shared-scan build_field_indexes (new), interleaved trials, bench
methodology (cache + count all 8 tables).  NOT part of the bench contract.
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


def main():
    import pandas as pd
    from pyspark.sql import functions as F

    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query import multifield as mff
    from telegram2elastic_spark.session import get_spark

    spark = get_spark("probe-fieldidx", master=f"local[{CPUS}]")
    sc = spark.sparkContext
    wd = tempfile.mkdtemp(prefix="probe_fidx_")
    corpus_path = f"{wd}/corpus"
    docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
    as_corpus(docs).repartition(64, "doc_id").write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()

    def build_old():
        return {
            name: build_index(
                corpus.withColumn("text", F.col(c)), n_doc_parts=CPUS
            )
            for name, c in {"text": "text", "url": "url"}.items()
        }

    def build_new():
        return mff.build_field_indexes(
            corpus, {"text": "text", "url": "url"}, n_doc_parts=CPUS
        )

    def run(builder, label):
        sc.setJobDescription(f"fieldidx {label}")
        t0 = time.perf_counter()
        fidx = builder()
        for _fi in fidx.values():
            for nm in ("doc_map", "term_dict", "postings", "stats"):
                _fi[nm] = _fi[nm].cache()
                _fi[nm].count()
        dt = time.perf_counter() - t0
        # cleanup: uncache everything so trials are independent
        for _fi in fidx.values():
            for nm in ("doc_map", "term_dict", "postings", "stats"):
                _fi[nm].unpersist()
            for df in _fi.get("_cached", []):
                df.unpersist()
        return dt

    res = {"old": [], "new": []}
    for t in range(3):
        res["old"].append(run(build_old, f"old t{t}"))
        res["new"].append(run(build_new, f"new t{t}"))
        print(
            f"trial {t}: old={res['old'][-1]:.3f}s new={res['new'][-1]:.3f}s",
            flush=True,
        )
    print(
        f"BEST old={min(res['old']):.3f}s new={min(res['new']):.3f}s",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
