"""ES `_rank_eval` API: given a set of ranked-search requests and rated
documents, compute per-query quality metrics — precision@k, MRR
(reciprocal_rank), and NDCG@k (dcg metric), exactly the three evaluators
the ES endpoint ships.

Reference analogue: the poc search API is the ranked surface under
evaluation (poc/src/api/routes/search.py); _rank_eval is ES's standard
relevance-regression harness over it.

Ratings are RULE-DERIVED so the evaluation set is deterministic at every
scale factor and expressible identically in the DuckDB oracle (a literal
doc_id ratings list would pin one sf only) — and the rule grades what
BM25 does NOT optimize, so the metrics discriminate: rating 2 = the
request terms occur as an exact adjacent phrase (token-boundary regex,
the tokenizer's separator class), rating 1 = all terms present
anywhere, rating 0 = otherwise.  The ideal ranking front-loads phrase
docs while the bag-of-words BM25 ranking cannot see adjacency.

Metric definitions (ES evaluators, relevant_rating_threshold = 2):
    precision@k  = |top-k docs with rating >= 2| / k
    MRR          = 1 / rank of the first doc with rating >= 2 (0 if none)
    DCG@k        = sum_{i<=k} (2^rating_i - 1) / log2(i + 1)
    NDCG@k       = DCG@k / IDCG@k   (ideal = all rated docs, best first)

Scale shape: the ranking itself is the engine's BM25 top-k (k rows);
metrics are windowed aggregates over those k rows.  The ideal-DCG pass
ranks ratings, not documents — one tokenize scan per query with a
map-side distinct-term count, then a top-k by rating.  The per-query
windows run over <= k rows (bounded, like search_page's pagination
window)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE, tokens
from .bm25 import bm25_topk

DEFAULT_REQUESTS = {
    1: ["spark", "merge"],
    2: ["vector", "window"],
    3: ["the", "data"],
}

METRIC_DECIMALS = 6
RELEVANT_THRESHOLD = 2

_SEP = r"[^\p{L}\p{N}]"


def _phrase_regex(terms: list[str]) -> str:
    """Token-boundary-anchored adjacency regex equivalent to tokenizer
    adjacency: terms separated by exactly one separator run."""
    import re as _re

    body = (_SEP + "+").join(_re.escape(t) for t in terms)
    return f"(^|{_SEP}){body}($|{_SEP})"


def _ratings(corpus: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, rating): 2 = exact phrase, 1 = all terms present, 0."""
    tset = sorted(set(terms))
    return corpus.select(
        "doc_id",
        F.when(F.lower("text").rlike(_phrase_regex(terms)), F.lit(2))
        .when(
            F.size(
                F.array_intersect(
                    F.array_distinct(tokens("text")),
                    F.array([F.lit(t) for t in tset]),
                )
            )
            == len(tset),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("rating"),
    )


def rank_eval(
    corpus: DataFrame,
    requests: dict[int, list[str]] | None = None,
    k: int = 10,
) -> DataFrame:
    """(query_id, p_at_k, mrr, ndcg) per request, query_id order."""
    if requests is None:
        requests = DEFAULT_REQUESTS
    parts = []
    for qid in sorted(requests):
        terms = requests[qid]
        top = bm25_topk(corpus, terms, k=k)
        w = Window.partitionBy(F.lit(0)).orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        ranked = (
            top.withColumn("rank", F.row_number().over(w))
            .join(_ratings(corpus, terms), "doc_id", "left")
            .na.fill({"rating": 0})
        )
        got = ranked.agg(
            F.round(
                F.sum((F.col("rating") >= RELEVANT_THRESHOLD).cast("int")) / float(k),
                METRIC_DECIMALS,
            ).alias("p_at_k"),
            F.round(
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("rating") >= RELEVANT_THRESHOLD, F.lit(1.0) / F.col("rank")
                        )
                    ),
                    F.lit(0.0),
                ),
                METRIC_DECIMALS,
            ).alias("mrr"),
            F.sum(
                (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
                / F.log2(F.col("rank") + 1.0)
            ).alias("dcg"),
        )
        wi = Window.partitionBy(F.lit(0)).orderBy(F.desc("rating"))
        ideal = (
            _ratings(corpus, terms)
            .select("rating")
            .orderBy(F.desc("rating"))
            .limit(k)
            .withColumn("rank", F.row_number().over(wi))
            .agg(
                F.sum(
                    (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
                    / F.log2(F.col("rank") + 1.0)
                ).alias("idcg")
            )
        )
        parts.append(
            got.crossJoin(ideal).select(
                F.lit(qid).alias("query_id"),
                "p_at_k",
                "mrr",
                F.round(
                    F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
                    .otherwise(F.lit(0.0)),
                    METRIC_DECIMALS,
                ).alias("ndcg"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("query_id")


def _terms_sql(terms: list[str]) -> str:
    return ", ".join(
        "'" + t.replace("'", "''") + "'" for t in sorted(set(terms))
    )


def _query_sql(qid: int, terms: list[str], k: int) -> str:
    """One request's metric row.  Ranking = the engine's relational BM25
    oracle (rank-identical to the index path); ratings = distinct-term
    membership count."""
    from ..functions.tokenizer import DOC_LEN_SQL
    from .bm25 import B, K1, SCORE_DECIMALS

    ts = _terms_sql(terms)
    m = len(set(terms))
    ph = _phrase_regex(terms).replace("'", "''")
    return f"""
rt_{qid} AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(lower(text), '{ph}') THEN 2
              WHEN len(list_intersect(list_distinct(list_filter(
                       regexp_split_to_array(lower(text),
                           '{TOKEN_SPLIT_RE}'),
                       x -> x <> '')), [{ts}])) = {m} THEN 1
              ELSE 0 END AS rating
  FROM corpus
),
tf_{qid} AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({ts}) GROUP BY doc_id, term
),
df_{qid} AS (SELECT term, count(*) AS df FROM tf_{qid} GROUP BY term),
sc_{qid} AS (
  SELECT tf.doc_id,
         round(sum(
           ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tf_{qid} tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN df_{qid} df ON tf.term = df.term
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
top_{qid} AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM sc_{qid}
  ORDER BY score DESC, doc_id ASC
  LIMIT {k}
),
met_{qid} AS (
  SELECT round(sum(CASE WHEN r.rating >= {RELEVANT_THRESHOLD}
                        THEN 1 ELSE 0 END)
               / {float(k)!r}, {METRIC_DECIMALS}) AS p_at_k,
         round(coalesce(max(CASE WHEN r.rating >= {RELEVANT_THRESHOLD}
                                 THEN 1.0 / t.rank END), 0.0),
               {METRIC_DECIMALS}) AS mrr,
         sum((pow(2.0, r.rating) - 1.0) / log2(t.rank + 1.0)) AS dcg
  FROM top_{qid} t JOIN rt_{qid} r ON t.doc_id = r.doc_id
),
ideal_{qid} AS (
  SELECT sum((pow(2.0, rating) - 1.0) / log2(rn + 1.0)) AS idcg
  FROM (
    SELECT rating, row_number() OVER (ORDER BY rating DESC) AS rn
    FROM rt_{qid} ORDER BY rating DESC LIMIT {k}
  )
),
row_{qid} AS (
  SELECT {qid} AS query_id, m.p_at_k, m.mrr,
         round(CASE WHEN i.idcg > 0 THEN m.dcg / i.idcg ELSE 0.0 END,
               {METRIC_DECIMALS}) AS ndcg
  FROM met_{qid} m CROSS JOIN ideal_{qid} i
)"""


def rank_eval_sql(
    requests: dict[int, list[str]] | None = None, k: int = 10
) -> str:
    from ..functions.tokenizer import DOC_LEN_SQL

    if requests is None:
        requests = DEFAULT_REQUESTS
    qids = sorted(requests)
    per_q = ",".join(_query_sql(q, requests[q], k) for q in qids)
    union = "\nUNION ALL\n".join(f"SELECT * FROM row_{q}" for q in qids)
    return f"""
WITH {CORPUS_CTE.strip()},
dl AS (SELECT doc_id, {DOC_LEN_SQL} AS doc_len FROM corpus),
stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM dl),
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),{per_q}
{union}
ORDER BY query_id
"""
