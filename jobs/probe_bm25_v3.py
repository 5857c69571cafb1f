"""Round-6 probe #3: bm25 relational — observe()-fused stats variant (D)
vs current (A), measured bench-style (trial = full 4q loop; min over
trials), with result identity asserts.  NOT part of the bench contract.

D: one full scan per query — CollectMetrics (observe) computes
   (n, avgdl, df_i) as a side effect of materializing the CANDIDATES-ONLY
   persisted projection; scoring top-k then reads the (small) cache.
   Stats are integer-sum-based (count, sum(long)/count, count-of-matches)
   so partial-aggregation order cannot change a bit.
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

_live = []


def main():
    import pandas as pd
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.functions.tokenizer import tokens
    from telegram2elastic_spark.query import bm25
    from telegram2elastic_spark.query.bm25 import SCORE_DECIMALS, bm25_weight, idf_col
    from telegram2elastic_spark.session import get_spark

    spark = get_spark("probe-bm25-v3", master=f"local[{CPUS}]")
    sc = spark.sparkContext
    wd = tempfile.mkdtemp(prefix="probe_bm25v3_")
    corpus_path = f"{wd}/corpus"
    docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
    as_corpus(docs).repartition(64, "doc_id").write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n = corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()
    print(f"n_docs={n}", flush=True)

    def retire_predecessors(new_df):
        import threading

        stale = _live[:]
        del _live[: len(stale)]
        if stale:
            def _drop():
                for old in stale:
                    try:
                        old.unpersist(False)
                    except Exception:
                        pass

            threading.Thread(target=_drop, daemon=True).start()
        _live.append(new_df)

    def variant_observe(terms, k=10):
        uniq = sorted(set(terms))
        tk_rows = corpus.withColumn("_tk", tokens("text"))

        def _tf(t):
            return F.size(F.filter("_tk", lambda x: x == F.lit(t)))

        proj = [
            F.col("doc_id"),
            F.col("url"),
            F.size("_tk").alias("dl"),
        ] + [_tf(t).alias(f"tf_{i}") for i, t in enumerate(uniq)]
        rows = tk_rows.select(*proj)

        stats_aggs = [
            F.count(F.lit(1)).alias("n"),
            F.avg("dl").alias("avgdl"),
        ] + [
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(uniq))
        ]
        obs = Observation()
        rows = rows.observe(obs, *stats_aggs)

        matched = [F.col(f"tf_{i}") > 0 for i in range(len(uniq))]
        any_match = matched[0] if matched else F.lit(False)
        for m in matched[1:]:
            any_match = any_match | m
        cand = rows.filter(any_match).persist()
        retire_predecessors(cand)
        cand.write.format("noop").mode("overwrite").save()
        srow = obs.get

        def _num_lit(v):
            return F.lit(None).cast("double") if v is None else F.lit(float(v))

        n_lit = _num_lit(srow["n"])
        avgdl_lit = _num_lit(srow["avgdl"])
        df_lits = [_num_lit(srow[f"df_{i}"]) for i in range(len(uniq))]

        w_terms = [
            F.when(
                matched[i],
                bm25_weight(
                    F.col(f"tf_{i}").cast("double"),
                    F.col("dl").cast("double"),
                    avgdl_lit,
                    idf_col(n_lit, df_lits[i]),
                ),
            ).otherwise(F.lit(0.0))
            for i in range(len(uniq))
        ]
        score_expr = w_terms[0] if w_terms else F.lit(0.0)
        for w in w_terms[1:]:
            score_expr = score_expr + w
        scored = cand.withColumn("score", F.round(score_expr, SCORE_DECIMALS)).select(
            "doc_id", "url", "score"
        )
        return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    # identity check once, at small cost
    for terms in BENCH_QUERIES:
        rA = bm25.bm25_topk(corpus, terms, k=10).collect()
        rD = variant_observe(terms).collect()
        assert [tuple(r) for r in rA] == [tuple(r) for r in rD], f"D mismatch {terms}"
    print("identity ok on all 4 queries", flush=True)

    # bench-style: trial = full 4q loop, min over 3 trials
    for label, fn in (
        ("A_current", lambda t: bm25.bm25_topk(corpus, t, k=10).collect()),
        ("D_observe", lambda t: variant_observe(t).collect()),
    ):
        best = None
        for _ in range(3):
            sc.setJobDescription(f"{label} 4q trial")
            t0 = time.perf_counter()
            for terms in BENCH_QUERIES:
                fn(terms)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"{label} trial: {dt:.3f}s", flush=True)
        print(f"{label} 4q best: {best:.3f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
