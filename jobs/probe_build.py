"""Round-6 measurement probe: isolate index-build stage costs (guide §1).

Times, with noop sinks where applicable:
  * tokenize+tf kernel alone (noop)
  * postings encode alone (noop)  vs encode+partitioned write
  * term_dict agg alone (noop)    vs write
Counts output files per table.  NOT part of the driver bench contract.
"""
from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EXPAND = int(os.environ.get("SPARK_GRAFT_EXPAND", "40"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import pandas as pd

    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.index.build import (
        build_index,
        build_postings,
        term_dict,
        term_frequencies,
        write_index,
    )
    from telegram2elastic_spark.session import get_spark

    spark = get_spark("probe-build", master=f"local[{CPUS}]")
    wd = tempfile.mkdtemp(prefix="probe_")
    corpus_path = f"{wd}/corpus"
    docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
    as_corpus(docs).repartition(64, "doc_id").write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n = corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()

    res = {}

    def timed(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t)
        res[name] = round(best, 3)
        print(name, res[name], flush=True)

    sc = spark.sparkContext
    sc.setJobDescription("probe: tf kernel noop")
    tf = term_frequencies(corpus)
    timed("tf_kernel_noop", lambda: noop(tf))

    from pyspark import StorageLevel
    tfc = term_frequencies(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    tfc.count()

    sc.setJobDescription("probe: postings encode noop (cached tf)")
    timed("postings_encode_noop", lambda: noop(build_postings(tfc, n_doc_parts=CPUS)))

    from pyspark.sql import functions as F
    from telegram2elastic_spark.index.build import N_TERM_BUCKETS

    def write_post():
        (build_postings(tfc, n_doc_parts=CPUS)
         .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)))
         .write.mode("overwrite").partitionBy("term_bucket")
         .parquet(f"{wd}/post_a"))
    sc.setJobDescription("probe: postings encode+write")
    timed("postings_encode_write", write_post)
    res["postings_files"] = len(glob.glob(f"{wd}/post_a/*/*.parquet"))

    td = term_dict(tfc)
    sc.setJobDescription("probe: term_dict noop")
    timed("term_dict_noop", lambda: noop(td))

    def write_td():
        (td.withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS)))
         .write.mode("overwrite").partitionBy("term_bucket")
         .parquet(f"{wd}/td_a"))
    sc.setJobDescription("probe: term_dict write")
    timed("term_dict_write", write_td)
    res["term_dict_files"] = len(glob.glob(f"{wd}/td_a/*/*.parquet"))
    res["vocab_rows"] = td.count()

    def write_td_sorted():
        (td.repartitionByRange(8, "term").sortWithinPartitions("term")
         .write.mode("overwrite").parquet(f"{wd}/td_s"))
    sc.setJobDescription("probe: term_dict sorted write")
    timed("term_dict_sorted_write", write_td_sorted)

    print("RESULT", res, flush=True)
    tfc.unpersist()
    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()


def variant_writes():
    """Compare postings write layouts: direct partitionBy vs repartition
    by term_bucket first (fewer files, one extra compact-blocks shuffle)."""
    import glob as _glob

    import pandas as pd
    from pyspark.sql import functions as F

    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.index.build import (
        N_TERM_BUCKETS, build_postings, term_frequencies,
    )
    from telegram2elastic_spark.session import get_spark
    from pyspark import StorageLevel

    spark = get_spark("probe-variants", master=f"local[{CPUS}]")
    wd = tempfile.mkdtemp(prefix="probe_v_")
    docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
    as_corpus(docs).repartition(64, "doc_id").write.mode("overwrite").parquet(f"{wd}/corpus")
    corpus = spark.read.parquet(f"{wd}/corpus")
    corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()
    tfc = term_frequencies(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    tfc.count()
    post = build_postings(tfc, n_doc_parts=CPUS).withColumn(
        "term_bucket", F.pmod(F.xxhash64("term"), F.lit(N_TERM_BUCKETS))
    )
    res = {}
    for name, df in [
        ("direct", post),
        ("repart64", post.repartition(N_TERM_BUCKETS, "term_bucket")),
    ]:
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            df.write.mode("overwrite").partitionBy("term_bucket").parquet(f"{wd}/p_{name}")
            best = min(best, time.perf_counter() - t)
        res[name] = round(best, 3)
        res[name + "_files"] = len(_glob.glob(f"{wd}/p_{name}/*/*.parquet"))
    print("VARIANTS", res, flush=True)
    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()
