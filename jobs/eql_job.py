"""spark-submit entry point: run an EQL query (POST /_eql/search analogue).

    spark-submit --master local[8] --py-files /tmp/t2es.zip \\
        jobs/eql_job.py --sf-dir /root/testdata/sf0.001 \\
        --eql 'sequence by user_id with maxspan=2h [ signup ] [ error ]' \\
        [--k 100] [--explain] [--validate-only]

Parses the EQL core grammar (sequence/maxspan/until/sample, per-step
`where value <cmp> N` predicates) and dispatches onto the verified funnel
plans over the events table.  Prints one JSON line per match, then a
summary line {"rows": N, "latency_ms": ...}.  --validate-only parses
without starting a Spark job.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True,
                    help="directory holding events.parquet")
    ap.add_argument("--eql", action="append", default=[],
                    help="EQL query (repeatable)")
    ap.add_argument("--k", type=int, default=100, help="max matches")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--validate-only", action="store_true")
    args = ap.parse_args()
    if not args.eql:
        ap.error("supply at least one --eql query")

    from telegram2elastic_spark.query.eql import eql_search, parse_eql

    if args.validate_only:
        ok = True
        for q in args.eql:
            try:
                p = parse_eql(q)
                print(json.dumps({"eql": q, "valid": True, "kind": p["kind"]}))
            except ValueError as e:
                ok = False
                print(json.dumps({"eql": q, "valid": False, "error": str(e)}))
        sys.exit(0 if ok else 1)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("t2es-eql")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    events = spark.read.parquet(f"{args.sf_dir}/events.parquet")
    for q in args.eql:
        t0 = time.perf_counter()
        df = eql_search(events, q, k=args.k)  # parse errors precede any job
        if args.explain:
            df.explain("formatted")
        rows = df.collect()
        ms = (time.perf_counter() - t0) * 1000.0
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
        print(json.dumps({
            "eql": q, "rows": len(rows), "latency_ms": round(ms, 1),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
