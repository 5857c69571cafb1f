"""Percolator — reverse search: match incoming documents against STORED
queries (the ES percolate query).

The reference is a monitoring pipeline (Telegram OSINT archive): the
natural serving shape is "which standing alerts does this new message
trigger", i.e. queries are the indexed side and documents are the probe.
A stored query here is (query_id, terms array, min_should_match); a
document matches when it contains >= min_should_match distinct query
terms — the bool-should contract of the forward path.

Distributed shape (the inverted one): explode the stored queries into a
(term -> query_id) table — the "query index", tiny and broadcastable at
any realistic alert count — then one map-side broadcast join from each
incoming doc's DISTINCT terms, and a (doc, query) hit-count aggregation
against the per-query bar.  No shuffle of the document side beyond the
count agg; at streaming scale this runs per micro-batch as-is (the query
index only changes when alerts change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE, tokens


def stored_queries(spark, specs: list[tuple[int, list[str], int]]) -> DataFrame:
    """(query_id, terms array<string>, msm) from (id, terms, msm) specs."""
    return spark.createDataFrame(
        [(int(q), list(ts), int(m)) for q, ts, m in specs],
        "query_id int, terms array<string>, msm int",
    )


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    broadcast_threshold: int | None = 1_000_000,
) -> DataFrame:
    """(doc_id, query_id, n_matched) for every stored query a document
    triggers, ordered (doc_id, query_id).

    `broadcast_threshold`: the (term -> query_id) index is broadcast when
    its exploded row count fits under this bar (alert stores are usually
    tiny — the map-side shape above).  Above it — a million-alert store
    would OOM a forced broadcast — the join falls back to a
    hash-partitioned shuffle join on term (AQE's skew-join split handles
    Zipf-head terms).  Sizing costs one count over the ALERT side only;
    pass None to force the broadcast unconditionally, or 0 to force the
    shuffle join — both skip the count (the streaming variant sizes the
    alert set once up front and passes the decision per micro-batch)."""
    qindex = queries.select(
        "query_id", "msm", F.explode(F.array_distinct("terms")).alias("term")
    )
    dterms = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term")
    )
    qside = qindex
    if broadcast_threshold is None or (
        int(broadcast_threshold) > 0
        and qindex.count() <= int(broadcast_threshold)
    ):
        qside = F.broadcast(qindex)
    return (
        dterms.join(qside, "term")
        .groupBy("doc_id", "query_id", "msm")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .filter(F.col("n_matched") >= F.col("msm"))
        .select(
            "doc_id", "query_id", F.col("n_matched").cast("long").alias("n_matched")
        )
        .orderBy("doc_id", "query_id")
    )


def stream_percolate_availablenow(
    spark,
    corpus_path: str,
    queries: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Standing-alert serving: percolate a document STREAM against the
    stored queries — the realtime shape of the reference's monitoring
    pipeline (new Telegram messages -> which watchlists fire).

    File-source readStream + Trigger.AvailableNow micro-batches; each
    batch is percolated independently (correct: a document's matches
    depend only on its own terms) and written to an epoch-keyed directory
    with overwrite, so a retried epoch replaces rather than duplicates —
    the same checkpoint-offsets + idempotent-sink exactly-once recipe as
    streaming ingest (streaming/ingest.py).  The query index re-broadcasts
    per batch (tiny); on a long-lived stream a changed alert set takes
    effect at the next micro-batch."""
    schema = spark.read.parquet(corpus_path).schema
    # size the alert index ONCE before the stream starts — per-batch
    # percolate calls then skip the count job (the alert set only changes
    # between runs; a restart re-sizes it)
    n_alerts = queries.select(
        F.explode(F.array_distinct("terms"))
    ).count()
    per_batch_threshold = None if n_alerts <= 1_000_000 else 0

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        percolate(
            batch_df, queries, broadcast_threshold=per_batch_threshold
        ).write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    q = (
        reader.parquet(corpus_path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def percolate_sql(specs: list[tuple[int, list[str], int]]) -> str:
    """DuckDB oracle over the same inline stored-query set."""
    rows = ", ".join(
        "({}, {}, {})".format(
            int(q),
            "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in ts) + "]",
            int(m),
        )
        for q, ts, m in specs
    )
    return f"""
WITH {CORPUS_CTE.strip()},
queries(query_id, terms, msm) AS (VALUES {rows}),
qindex AS (
  SELECT query_id, msm, unnest(list_distinct(terms)) AS term FROM queries
),
dterms AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> ''))) AS term
  FROM corpus
)
SELECT d.doc_id, q.query_id, count(*) AS n_matched
FROM dterms d JOIN qindex q USING (term)
GROUP BY d.doc_id, q.query_id, q.msm
HAVING count(*) >= q.msm
ORDER BY d.doc_id, q.query_id
"""


# --- phrase percolation -------------------------------------------------------


def stored_phrase_queries(spark, specs: list[tuple[int, list[str]]]) -> DataFrame:
    """(query_id, phrase array<string>) — ordered phrase alerts."""
    return spark.createDataFrame(
        [(int(q), list(ts)) for q, ts in specs],
        "query_id int, phrase array<string>",
    )


def percolate_phrase(
    docs: DataFrame,
    queries: DataFrame,
    broadcast_threshold: int | None = 1_000_000,
) -> DataFrame:
    """(doc_id, query_id) for every stored PHRASE alert a document
    triggers — ES percolator's two-phase contract made explicit:

      1. candidate selection: the stored queries' term index is probed
         with the doc's distinct terms and a candidate must contain ALL
         the phrase's terms (ES extracts terms from the stored query and
         pre-filters with a TermsQuery);
      2. verify: each candidate (doc, query) re-checks ADJACENCY on the
         doc's token array (ES re-runs the full query against a one-doc
         MemoryIndex) — a consecutive-window equality, array-side.

    Scale shape: phase 1 is the verified `percolate` kernel shape
    (broadcast-or-shuffle on the same threshold contract); phase 2
    touches candidate pairs only, with the phrase arrays broadcast
    (alert stores are tiny next to the doc stream).  The token array is
    persisted across the two phases — one tokenize per batch."""
    toksd = docs.select("doc_id", tokens("text").alias("tk")).persist()
    qn = queries.select(
        "query_id",
        "phrase",
        F.array_distinct("phrase").alias("dterms"),
        F.size(F.array_distinct("phrase")).alias("need"),
    )
    qindex = qn.select(
        "query_id", "need", F.explode("dterms").alias("term")
    )
    qside = qindex
    if broadcast_threshold is None or (
        int(broadcast_threshold) > 0
        and qindex.count() <= int(broadcast_threshold)
    ):
        qside = F.broadcast(qindex)
    dterms = toksd.select(
        "doc_id", F.explode(F.array_distinct("tk")).alias("term")
    )
    cand = (
        dterms.join(qside, "term")
        .groupBy("doc_id", "query_id", "need")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= F.col("need"))
        .select("doc_id", "query_id")
    )
    m = F.size("phrase")
    verified = (
        cand.join(toksd, "doc_id")
        .join(F.broadcast(queries.select("query_id", "phrase")), "query_id")
        .filter(
            F.when(
                F.size("tk") >= m,
                F.exists(
                    F.sequence(F.lit(1), F.size("tk") - m + 1),
                    lambda i: F.slice(F.col("tk"), i, m) == F.col("phrase"),
                ),
            ).otherwise(F.lit(False))
        )
    )
    return verified.select("doc_id", "query_id").orderBy("doc_id", "query_id")


def percolate_phrase_sql(specs: list[tuple[int, list[str]]]) -> str:
    """DuckDB oracle — deliberately SINGLE-phase (direct adjacency test
    over the doc x alert cross product): an independent formulation, so
    a candidate-phase bug cannot hide in both engines."""
    rows = ", ".join(
        "({}, {})".format(
            int(q),
            "[" + ", ".join("'" + t.replace("'", "''") + "'" for t in ts) + "]",
        )
        for q, ts in specs
    )
    return f"""
WITH {CORPUS_CTE.strip()},
queries(query_id, phrase) AS (VALUES {rows}),
tkt AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '') AS tk
  FROM corpus
)
SELECT t.doc_id, q.query_id
FROM tkt t, queries q
WHERE len(t.tk) >= len(q.phrase)
  AND len(list_filter(range(1, len(t.tk) - len(q.phrase) + 2),
          i -> t.tk[i : i + len(q.phrase) - 1] = q.phrase)) > 0
ORDER BY t.doc_id, q.query_id
"""
