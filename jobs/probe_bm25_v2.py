"""Round-6 probe #2: bm25 relational alternatives, end-to-end, with result
identity checks vs the current implementation.  NOT part of the bench
contract.

Variants:
  A current        — persist projection, agg action, cached top-k
  B nopersist      — stats agg on bare projection; scoring pass re-scans
  C nopersist+pre  — same, but scoring scan pre-filtered by
                     contains(lower(text), term) (superset of token match)
"""
from __future__ import annotations

import os
import sys
import tempfile
import time
from functools import reduce

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


def main():
    import pandas as pd
    from pyspark.sql import functions as F

    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.functions.tokenizer import tokens
    from telegram2elastic_spark.query import bm25
    from telegram2elastic_spark.query.bm25 import (
        SCORE_DECIMALS,
        bm25_weight,
        idf_col,
    )
    from telegram2elastic_spark.session import get_spark

    spark = get_spark("probe-bm25-v2", master=f"local[{CPUS}]")
    sc = spark.sparkContext
    wd = tempfile.mkdtemp(prefix="probe_bm25v2_")
    corpus_path = f"{wd}/corpus"
    docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
    as_corpus(docs).repartition(64, "doc_id").write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n = corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()
    print(f"n_docs={n}", flush=True)

    def variant_nopersist(terms, k=10, prefilter=False):
        uniq = sorted(set(terms))
        # pass 1: stats over bare projection (column-pruned to text)
        tk_rows = corpus.withColumn("_tk", tokens("text"))
        def _tf(t):
            return F.size(F.filter("_tk", lambda x: x == F.lit(t)))

        proj = [F.size("_tk").alias("dl")] + [
            _tf(t).alias(f"tf_{i}") for i, t in enumerate(uniq)
        ]
        stats_aggs = [
            F.count(F.lit(1)).alias("n"),
            F.avg("dl").alias("avgdl"),
        ] + [
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(uniq))
        ]
        srow = tk_rows.select(*proj).agg(*stats_aggs).first()

        def _num_lit(v):
            return F.lit(None).cast("double") if v is None else F.lit(float(v))

        n_lit = _num_lit(srow["n"])
        avgdl_lit = _num_lit(srow["avgdl"])
        df_lits = [_num_lit(srow[f"df_{i}"]) for i in range(len(uniq))]

        # pass 2: scoring scan
        base = corpus
        if prefilter and uniq:
            lt = F.lower(F.col("text"))
            pre = reduce(
                lambda a, b: a | b, [lt.contains(F.lit(t)) for t in uniq]
            )
            base = base.filter(pre)
        cand_rows = base.withColumn("_tk", tokens("text")).select(
            F.col("doc_id"),
            F.col("url"),
            F.size("_tk").alias("dl"),
            *[_tf(t).alias(f"tf_{i}") for i, t in enumerate(uniq)],
        )
        matched = [F.col(f"tf_{i}") > 0 for i in range(len(uniq))]
        any_match = matched[0] if matched else F.lit(False)
        for m in matched[1:]:
            any_match = any_match | m
        cand = cand_rows.filter(any_match)
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

    def timed(label, fn, trials=3):
        best = None
        res = None
        for _ in range(trials):
            t0 = time.perf_counter()
            res = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: best={best:.3f}s", flush=True)
        return best, res

    tot = {"A": 0.0, "B": 0.0, "C": 0.0}
    for terms in BENCH_QUERIES:
        sc.setJobDescription(f"A current {terms}")
        bA, rA = timed(
            f"A_current {terms}",
            lambda terms=terms: bm25.bm25_topk(corpus, terms, k=10).collect(),
        )
        sc.setJobDescription(f"B nopersist {terms}")
        bB, rB = timed(
            f"B_nopersist {terms}",
            lambda terms=terms: variant_nopersist(terms, prefilter=False).collect(),
        )
        sc.setJobDescription(f"C nopersist+pre {terms}")
        bC, rC = timed(
            f"C_prefilter {terms}",
            lambda terms=terms: variant_nopersist(terms, prefilter=True).collect(),
        )
        tot["A"] += bA
        tot["B"] += bB
        tot["C"] += bC
        assert [tuple(r) for r in rA] == [tuple(r) for r in rB], f"B mismatch {terms}"
        assert [tuple(r) for r in rA] == [tuple(r) for r in rC], f"C mismatch {terms}"
        print(f"  identity ok ({len(rA)} rows)", flush=True)
    print(f"TOTALS 4q: {({k: round(v, 3) for k, v in tot.items()})}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
