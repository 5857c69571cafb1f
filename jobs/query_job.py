"""spark-submit entry point: BM25 top-k queries against a built index.

    spark-submit --master local[8] --py-files /tmp/t2es.zip \\
        jobs/query_job.py --index /path/to/index \\
        --query "spark merge" --query "the data row" [--k 10]

Prints one JSON line per query: {"terms": [...], "hits": [[doc_id, url,
score], ...], "latency_ms": ...}.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", required=True)
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("t2es-query")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from telegram2elastic_spark.index.build import read_index
    from telegram2elastic_spark.query.wand import wand_topk

    idx = read_index(spark, args.index)
    for q in args.query:
        terms = q.split()
        t0 = time.perf_counter()
        hits = [
            [r["doc_id"], r["url"], r["score"]]
            for r in wand_topk(idx, terms, k=args.k).collect()
        ]
        print(json.dumps({
            "terms": terms,
            "hits": hits,
            "latency_ms": round((time.perf_counter() - t0) * 1000, 1),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
