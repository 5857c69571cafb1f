"""Round-6 measurement probe: bm25_relational cost structure (guide §1).

Isolates, per bench query:
  * corpus text scan floor (noop)
  * tokenize+tf projection compute (noop, no persist)
  * stats agg on the unpersisted projection (pass 1 without cache write)
  * the current bm25_topk (persist + agg action + top-k action), with
    per-phase wall and Spark job counts via statusTracker
NOT part of the driver bench contract.
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
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import pandas as pd
    from pyspark.sql import functions as F

    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.functions.tokenizer import tokens
    from telegram2elastic_spark.query import bm25
    from telegram2elastic_spark.session import get_spark

    spark = get_spark("probe-bm25", master=f"local[{CPUS}]")
    sc = spark.sparkContext
    wd = tempfile.mkdtemp(prefix="probe_bm25_")
    corpus_path = f"{wd}/corpus"
    docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
    as_corpus(docs).repartition(64, "doc_id").write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n = corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()
    print(f"n_docs={n}", flush=True)

    def jobs():
        return len(sc.statusTracker().getJobIdsForGroup(None) or []) or len(
            sc.statusTracker().getActiveJobsIds() or []
        )

    def timed(label, fn, trials=3):
        best = None
        for _ in range(trials):
            j0 = sc.statusTracker().getJobIdsForGroup()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: best={best:.3f}s", flush=True)
        return best

    # ---- floors ----
    sc.setJobDescription("probe: text scan noop")
    timed("scan_text_noop", lambda: noop(corpus.select("doc_id", "text")))
    sc.setJobDescription("probe: lower(text) length noop")
    timed(
        "lower_len_noop",
        lambda: noop(corpus.select(F.length(F.lower("text")).alias("l"))),
    )
    sc.setJobDescription("probe: tokens size (dl) noop")
    timed("dl_split_noop", lambda: noop(corpus.select(F.size(tokens("text")).alias("dl"))))
    timed(
        "dl_regexp_count_noop",
        lambda: noop(
            corpus.select(
                F.regexp_count(F.col("text"), F.lit(r"[\p{L}\p{N}]+")).alias("dl")
            )
        ),
    )

    for terms in BENCH_QUERIES:
        uniq = sorted(set(terms))
        tk_rows = corpus.withColumn("_tk", tokens("text"))
        proj = [
            F.col("doc_id"),
            F.col("url"),
            F.size("_tk").alias("dl"),
        ] + [
            F.size(F.filter("_tk", lambda x, t=t: x == F.lit(t))).alias(f"tf_{i}")
            for i, t in enumerate(uniq)
        ]
        rows = tk_rows.select(*proj)
        sc.setJobDescription(f"probe: proj noop {terms}")
        timed(f"proj_noop {terms}", lambda rows=rows: noop(rows))

        stats_aggs = [
            F.count(F.lit(1)).alias("n"),
            F.avg("dl").alias("avgdl"),
        ] + [
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(uniq))
        ]
        sc.setJobDescription(f"probe: agg-nopersist {terms}")
        timed(
            f"agg_nopersist {terms}",
            lambda rows=rows, aggs=stats_aggs: rows.agg(*aggs).first(),
        )

        # regexp_count variant of the projection
        ltext = F.lower("text")
        proj2 = [
            F.col("doc_id"),
            F.col("url"),
            F.regexp_count(F.col("text"), F.lit(r"[\p{L}\p{N}]+")).alias("dl"),
        ] + [
            F.regexp_count(
                ltext, F.lit(r"(?<![\p{L}\p{N}])" + t + r"(?![\p{L}\p{N}])")
            ).alias(f"tf_{i}")
            for i, t in enumerate(uniq)
        ]
        rows2 = corpus.select(*proj2)
        sc.setJobDescription(f"probe: proj-recount noop {terms}")
        timed(f"proj_recount_noop {terms}", lambda rows2=rows2: noop(rows2))
        sc.setJobDescription(f"probe: agg-recount {terms}")
        timed(
            f"agg_recount {terms}",
            lambda rows2=rows2, aggs=stats_aggs: rows2.agg(*aggs).first(),
        )

        # full current implementation
        sc.setJobDescription(f"probe: bm25_topk current {terms}")
        timed(
            f"bm25_topk_current {terms}",
            lambda terms=terms: bm25.bm25_topk(corpus, terms, k=10).collect(),
        )

    spark.stop()


if __name__ == "__main__":
    main()
