"""spark-submit entry point: config-driven output pipeline.

The reference's main loop wires everything from YAML (telegram2elastic.py
:624-659); this is the same shape on Spark:

    cd /root/repo && zip -qr /tmp/t2es.zip telegram2elastic_spark
    spark-submit --master local[8] --py-files /tmp/t2es.zip \\
        jobs/pipeline_job.py --config conf.yml \\
        (--corpus /path/to/corpus_parquet | --from-testdata /root/testdata/sf0.01)

Reads the corpus, applies the configured translation stage + per-output
projections, writes every configured sink.  Prints one JSON line:
{"sinks": [...], "n_docs": N, "wall_sec": ...}.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--corpus")
    ap.add_argument("--from-testdata")
    args = ap.parse_args()
    if not args.corpus and not args.from_testdata:
        ap.error("one of --corpus / --from-testdata is required")

    spark = (
        SparkSession.builder.appName("t2es-pipeline")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from telegram2elastic_spark import config as cfg
    from telegram2elastic_spark.corpus import as_corpus, load_corpus

    conf = cfg.load_config(args.config)
    if args.from_testdata:
        corpus = load_corpus(spark, args.from_testdata)
    else:
        corpus = as_corpus(spark.read.parquet(args.corpus))

    t0 = time.perf_counter()
    names = cfg.run_pipeline(corpus, conf)
    print(
        json.dumps(
            {
                "sinks": names,
                "n_docs": corpus.count(),
                "wall_sec": round(time.perf_counter() - t0, 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
