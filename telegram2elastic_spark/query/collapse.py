"""Field collapsing — ES `collapse`: one (best) hit per key in the ranked
results.

The web-search shape: dedupe the top-k by host so one prolific site
cannot fill the page.  Semantics (ES collapse on the relevance sort):
score every matching doc, keep each collapse key's best hit (score desc,
doc_id asc within the key), then return the top-k of those
representatives.

Distributed shape: per-key best via groupBy(key).agg(max_by(...)) — a
hash aggregate with map-side partial combine (each partition contributes
at most one candidate per key it contains), never a window sort over the
full match set; the top-k of representatives is a TakeOrdered.  The key
here is the url host (everything between '://' and the first '/'),
derived identically in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import DOC_LEN_SQL, TOKEN_SPLIT_RE
from .bm25 import B, K1, SCORE_DECIMALS, bm25_scores


def host_col() -> F.Column:
    return F.regexp_extract("url", r"^[a-z]+://([^/]+)/", 1)


HOST_SQL = "regexp_extract(url, '^[a-z]+://([^/]+)/', 1)"


def search_collapse(
    corpus: DataFrame, terms: list[str], k: int = 10
) -> DataFrame:
    """(host, doc_id, url, score): top-k hosts by their best-scoring hit;
    ties inside a host break by doc_id asc, across hosts by host asc."""
    # score ALL matching docs — collapse needs every key's best, so the
    # candidate set is per-key-reduced (map-side combine), never
    # top-k-truncated before the reduction
    scored = bm25_scores(corpus, terms).withColumn("host", host_col())
    # max_by over a struct ordered (score desc, doc_id asc): encode as
    # (score, -doc_id) so the natural struct max is the wanted representative
    best = scored.groupBy("host").agg(
        F.max_by(
            F.struct("doc_id", "url", "score"),
            F.struct(F.col("score"), -F.col("doc_id")),
        ).alias("top")
    )
    return (
        best.select(
            "host",
            F.col("top.doc_id").alias("doc_id"),
            F.col("top.url").alias("url"),
            F.col("top.score").alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def search_collapse_sql(terms: list[str], k: int = 10) -> str:
    tl = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"""
WITH {CORPUS_CTE.strip()},
dl AS (SELECT doc_id, url, {DOC_LEN_SQL} AS doc_len FROM corpus),
stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM dl),
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, dl.url, {HOST_SQL} AS host,
         round(sum(
           ln(1 + (stats.n - tdf.df + 0.5) / (tdf.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN tdf ON tf.term = tdf.term
  CROSS JOIN stats
  GROUP BY tf.doc_id, dl.url, host
),
best AS (
  SELECT host, doc_id, url, score,
         row_number() OVER (
           PARTITION BY host ORDER BY score DESC, doc_id ASC
         ) AS rn
  FROM scored
)
SELECT host, doc_id, url, score
FROM best WHERE rn = 1
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
