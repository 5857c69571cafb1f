"""Corpus loading + deterministic derivation to the input_hint shape.

BASELINE.json input_hint mandates an input table
``documents(url string, warc_ts timestamp, html binary, text string,
lang string)`` — the Common-Crawl analogue of the reference's message table
(text <-> Message.text poc/src/core/models.py:104, warc_ts <-> telegram_date
models.py:101, url <-> the (archive_id, message_id) natural key models.py:177,
html <-> media bytes telegram2elastic.py:147-149).

The driver testdata ships ``documents(doc_id, text, lang, source, n_chars)``;
we derive the input_hint columns deterministically from doc_id so the exact
same derivation is expressible in the DuckDB oracle SQL (see CORPUS_CTE).
No randomness: every run, every engine, same bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Epoch seconds of 2022-01-01T00:00:00Z; each doc is 37 s after the previous
# one, spanning many days (exercises daily partitioning like the reference's
# per-day ES indices, output/elasticsearch.py:10).
BASE_EPOCH = 1640995200
TS_STRIDE_SEC = 37

# CTE used verbatim inside oracle_sql() strings so DuckDB derives the very
# same corpus from the pre-registered `documents` view.
CORPUS_CTE = """
corpus AS (
  SELECT
    doc_id,
    'https://site' || CAST(doc_id % 1000 AS VARCHAR) || '.example/page/'
        || CAST(doc_id AS VARCHAR)                                  AS url,
    TIMESTAMP '2022-01-01 00:00:00' + doc_id * INTERVAL 37 SECOND   AS warc_ts,
    CAST('<html><body><p>' || text || '</p></body></html>' AS BLOB) AS html,
    text,
    lang,
    source,
    n_chars
  FROM documents
)
"""


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw driver table: (doc_id, text, lang, source, n_chars)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def as_corpus(docs: DataFrame) -> DataFrame:
    """Derive the input_hint corpus columns (pure built-in exprs, codegen'd).

    Matches CORPUS_CTE column for column.
    """
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 1000).cast("string"),
            F.lit(".example/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(BASE_EPOCH) + F.col("doc_id") * TS_STRIDE_SEC
        ).alias("warc_ts"),
        F.concat(
            F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
        )
        .cast("binary")
        .alias("html"),
        "text",
        "lang",
        "source",
        "n_chars",
    )


def py_url(doc_id: int) -> str:
    """Driver-side twin of the url derivation in as_corpus/CORPUS_CTE —
    local serving paths reconstruct a hit's url without a doc-store read."""
    return f"https://site{doc_id % 1000}.example/page/{doc_id}"


def load_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return as_corpus(load_documents(spark, sf_dir))


def expand_corpus(docs: DataFrame, factor: int, stride: int = 100_000) -> DataFrame:
    """Deterministically replicate the raw documents table `factor` times.

    Bench-only: the driver corpus tops out at 5k docs, too small to measure
    throughput/scaling on 32 cores.  Replica r gets doc_id' = r*stride +
    doc_id (unique, stable — the driver tables stay well under the stride);
    text/lang are unchanged.  The stride is deliberately small so expanded
    ids stay a DENSE bounded space, matching how a real build assigns
    internal doc ids (Lucene segment ids are dense) — the query-node
    counting-sort paths key on that.  Pure built-ins — the cross join with
    a literal range is a BroadcastNestedLoopJoin with a tiny broadcast
    side, so it parallelizes across the documents partitions.
    """
    if factor <= 1:
        return docs
    reps = docs.sparkSession.range(factor).withColumnRenamed("id", "rep")
    return (
        docs.crossJoin(F.broadcast(reps))
        .withColumn("doc_id", F.col("rep") * stride + F.col("doc_id"))
        .drop("rep")
    )


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id bigint, embedding array<float>, label int)."""
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_id, ts, user_id, event_type, value, props) — the append-only
    stream table, analogue of the reference's realtime message events
    (telegram2elastic.py:527-535)."""
    return spark.read.parquet(f"{sf_dir}/events.parquet")
