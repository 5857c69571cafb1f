"""spark-submit entry point: ranked queries against a built index.

    spark-submit --master local[8] --py-files /tmp/t2es.zip \\
        jobs/query_job.py --index /path/to/index \\
        --query "spark merge" --query "the data row" [--k 10] \\
        [--exclude "vector"] [--msm 2] [--conjunctive] \\
        [--phrase "merge batch" --slop 1] \\
        [--prefix sc] [--wildcard "s?a*"] [--doc-filter "lang = 'en'"]

Every ES-surface query type the engine implements is reachable from the
deployment path: term disjunctions (with minimum_should_match / must_not
/ conjunctive / doc_filter), phrases (exact or sloppy — requires an index
built with --positions), and prefix/wildcard term expansion.  Prints one
JSON line per query:
{"kind": ..., "query": ..., "hits": [[doc_id, url, score], ...],
 "latency_ms": ...}.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", action="append", default=[],
                    help="space-separated terms, WAND disjunction")
    ap.add_argument("--phrase", action="append", default=[],
                    help="space-separated phrase (positional index)")
    ap.add_argument("--prefix", action="append", default=[])
    ap.add_argument("--wildcard", action="append", default=[])
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--exclude", default=None,
                    help="space-separated must_not terms (term queries)")
    ap.add_argument("--msm", type=int, default=0,
                    help="minimum_should_match for term queries")
    ap.add_argument("--conjunctive", action="store_true")
    ap.add_argument("--slop", type=int, default=0,
                    help="phrase proximity slack")
    ap.add_argument("--doc-filter", default=None,
                    help="SQL predicate over doc_map (ES filter context)")
    args = ap.parse_args()
    if not (args.query or args.phrase or args.prefix or args.wildcard):
        ap.error(
            "supply at least one of --query / --phrase / --prefix / --wildcard"
        )

    spark = (
        SparkSession.builder.appName("t2es-query")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from telegram2elastic_spark.index.build import read_index
    from telegram2elastic_spark.query.expand import prefix_topk, wildcard_topk
    from telegram2elastic_spark.query.phrase import phrase_topk
    from telegram2elastic_spark.query.wand import wand_topk

    idx = read_index(spark, args.index)
    exclude = args.exclude.split() if args.exclude else None

    runs = (
        [("terms", q, lambda q=q: wand_topk(
            idx, q.split(), k=args.k, doc_filter=args.doc_filter,
            conjunctive=args.conjunctive, min_should_match=args.msm,
            exclude_terms=exclude,
        )) for q in args.query]
        + [("phrase", p, lambda p=p: phrase_topk(
            idx, p.split(), k=args.k, slop=args.slop,
        )) for p in args.phrase]
        + [("prefix", p, lambda p=p: prefix_topk(
            idx, p, k=args.k, doc_filter=args.doc_filter,
        )) for p in args.prefix]
        + [("wildcard", w, lambda w=w: wildcard_topk(
            idx, w, k=args.k, doc_filter=args.doc_filter,
        )) for w in args.wildcard]
    )
    for kind, q, run in runs:
        t0 = time.perf_counter()
        hits = [
            [r["doc_id"], r["url"], r["score"]] for r in run().collect()
        ]
        print(json.dumps({
            "kind": kind,
            "query": q,
            "hits": hits,
            "latency_ms": round((time.perf_counter() - t0) * 1000, 1),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
