"""Round-6 probe: replicate bench.py's _suite_trial timing for selected
headline lines (same methodology, same scale) WITHOUT touching the frozen
bench.py.  Usage: python jobs/probe_suite.py [index|bm25|wand|local|search|agg]...
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EXPAND = int(os.environ.get("SPARK_GRAFT_EXPAND", "40"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))

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


def main():
    import pandas as pd

    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.index.build import build_index, read_index, write_index
    from telegram2elastic_spark.session import get_spark

    which = set(sys.argv[1:]) or {"index", "bm25", "wand", "local", "search", "agg"}
    spark = get_spark("probe-suite", master=f"local[{CPUS}]")
    wd = tempfile.mkdtemp(prefix="probe_suite_")
    corpus_path = f"{wd}/corpus"
    docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
    as_corpus(docs).repartition(64, "doc_id").write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()

    for trial in range(TRIALS):
        out = {}
        stages = {}
        t0 = time.perf_counter()
        idx = build_index(corpus, n_doc_parts=CPUS)
        idx["_cached"][1].count()
        stages["tokenize_tf_agg"] = time.perf_counter() - t0
        write_index(idx, f"{wd}/index_t{trial}", timings=stages)
        out["index_build"] = round(sum(stages.values()), 3)
        out["_stages"] = {k: round(v, 3) for k, v in stages.items()}

        idx = read_index(spark, f"{wd}/index_t{trial}")
        for name in ("doc_map", "term_dict", "postings", "stats"):
            idx[name] = idx[name].cache()
            idx[name].count()

        if "bm25" in which:
            from telegram2elastic_spark.query import bm25

            t0 = time.perf_counter()
            for terms in BENCH_QUERIES[:4]:
                bm25.bm25_topk(corpus, terms, k=10).collect()
            out["bm25_relational_4q"] = round(time.perf_counter() - t0, 3)

        if "wand" in which:
            from telegram2elastic_spark.query.wand import wand_topk_batch

            t0 = time.perf_counter()
            wand_topk_batch(idx, dict(enumerate(BENCH_QUERIES)), k=10).collect()
            out["wand_batch_8q"] = round(time.perf_counter() - t0, 3)

        if "local" in which:
            from telegram2elastic_spark.query.wand import wand_topk_local

            wand_topk_local(idx, BENCH_QUERIES[0], k=10)
            idx.pop("_local_post_cache", None)
            cold = []
            for terms in BENCH_QUERIES:
                t0 = time.perf_counter()
                wand_topk_local(idx, terms, k=10)
                cold.append(time.perf_counter() - t0)
            cold.sort()
            out["wand_local_8q"] = round(sum(cold), 3)
            out["_wand_p95_ms"] = round(cold[max(0, int(len(cold) * 0.95) - 1)] * 1000, 1)

        if "search" in which:
            from telegram2elastic_spark.query import search

            t0 = time.perf_counter()
            search.search_page(corpus, q="merge", min_score=10.0, offset=5, limit=10).collect()
            search.search_count(corpus, q="merge", min_score=10.0).collect()
            out["search_pipeline"] = round(time.perf_counter() - t0, 3)

        if "agg" in which:
            from telegram2elastic_spark.corpus import load_events
            from telegram2elastic_spark.operators import aggregates as agg

            events = load_events(spark, SF_DIR)
            t0 = time.perf_counter()
            agg.events_rollup(events).collect()
            agg.top_users_per_type(events).collect()
            agg.timeline_daily(corpus).collect()
            out["aggregates"] = round(time.perf_counter() - t0, 3)

        for name in ("doc_map", "term_dict", "postings", "stats"):
            idx[name].unpersist()
        shutil.rmtree(f"{wd}/index_t{trial}", ignore_errors=True)
        print(f"trial {trial}:", out, flush=True)

    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
