"""spark-submit entry point: full index build.

Usage (north_rule deployment shape — works unchanged on a multi-executor
cluster; locally `--master local[N]` stands in for executor count):

    cd /root/repo && zip -qr /tmp/t2es.zip telegram2elastic_spark
    spark-submit --master local[8] --py-files /tmp/t2es.zip \\
        jobs/build_index_job.py \\
        --corpus /path/to/corpus_parquet --out /path/to/index \\
        [--doc-parts 32] [--from-testdata /root/testdata/sf0.01]

With --from-testdata the corpus is derived from the driver testdata
documents table (corpus.as_corpus); otherwise --corpus must point at a
parquet table with the input_hint schema (url, warc_ts, html, text, lang
[+ doc_id]).

Prints one JSON line: {"n_docs": ..., "build_sec": ..., "docs_per_sec": ...}.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--from-testdata", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--doc-parts", type=int, default=32)
    ap.add_argument("--positions", action="store_true",
                    help="store token positions (phrase/slop queries)")
    ap.add_argument("--doc-store", action="store_true",
                    help="also write the stored-fields store (doc_store) "
                         "for driver-local mlt/rescore/highlight serving")
    ap.add_argument("--semantic-store", default=None, metavar="DIR",
                    help="also write the semantic_text inference store "
                         "(semantic.write_semantic_store) to DIR")
    ap.add_argument("--semantic-chunk-store", default=None, metavar="DIR",
                    help="also write the CHUNKED semantic_text store "
                         "(semantic.write_semantic_chunk_store) to DIR")
    args = ap.parse_args()

    # spark-submit provides master/conf; only fill gaps for bare invocation
    spark = (
        SparkSession.builder.appName("t2es-build-index")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import (
        build_index,
        write_doc_store,
        write_index,
    )

    if args.from_testdata:
        corpus = load_corpus(spark, args.from_testdata)
    else:
        corpus = spark.read.parquet(args.corpus)

    n_docs = corpus.count()
    t0 = time.perf_counter()
    idx = build_index(corpus, n_doc_parts=args.doc_parts, positions=args.positions)
    write_index(idx, args.out)
    if args.doc_store:
        write_doc_store(corpus, args.out)
    if args.semantic_store or args.semantic_chunk_store:
        from telegram2elastic_spark.query.semantic import (
            write_semantic_chunk_store,
            write_semantic_store,
        )

        if args.semantic_store:
            write_semantic_store(corpus, args.semantic_store)
        if args.semantic_chunk_store:
            write_semantic_chunk_store(corpus, args.semantic_chunk_store)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "n_docs": n_docs,
        "build_sec": round(dt, 3),
        "docs_per_sec": round(n_docs / dt, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
