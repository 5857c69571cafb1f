"""spark-submit entry point: run an ES|QL program (POST /_query analogue).

    spark-submit --master local[8] --py-files /tmp/t2es.zip \\
        jobs/esql_job.py --sf-dir /root/testdata/sf0.001 \\
        --esql 'FROM corpus | WHERE lang == "en" | STATS n = COUNT(*) BY source | SORT n DESC' \\
        [--limit 100] [--explain] [--validate-only]

Compiles the piped program onto a DataFrame chain (filters pushed to the
parquet scan, EVAL/WHERE/KEEP fused by Catalyst into one codegen'd map,
STATS one hash aggregate) and prints one JSON line per result row, then a
summary line {"rows": N, "latency_ms": ...}.  --validate-only parses and
typechecks without starting a Spark job (compile errors never reach an
executor); --explain also prints the formatted physical plan.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# Runnable both via spark-submit --py-files and as a plain script from the
# repo root (the parity_check convention).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True,
                    help="directory holding the parquet tables")
    ap.add_argument("--esql", action="append", default=[],
                    help="ES|QL program (repeatable)")
    ap.add_argument("--limit", type=int, default=100,
                    help="max rows printed per program")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--validate-only", action="store_true")
    args = ap.parse_args()
    if not args.esql:
        ap.error("supply at least one --esql program")

    from telegram2elastic_spark.query.esql import EsqlPlan, validate_esql

    if args.validate_only:
        ok = True
        for prog in args.esql:
            v = validate_esql(prog)
            ok = ok and v["valid"]
            print(json.dumps(v))
        sys.exit(0 if ok else 1)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("t2es-esql")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    for prog in args.esql:
        t0 = time.perf_counter()
        plan = EsqlPlan(prog)  # compile errors surface before any job
        df = plan.dataframe(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
        rows = df.limit(args.limit).collect()
        ms = (time.perf_counter() - t0) * 1000.0
        for r in rows:
            print(json.dumps(r.asDict(), default=str))
        print(json.dumps({
            "esql": prog, "rows": len(rows),
            "columns": list(plan.schema), "latency_ms": round(ms, 1),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
