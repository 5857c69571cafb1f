"""Multi-field ranked retrieval — ES `multi_match` (most_fields) with
field boosts.

The reference's ES documents carry several searchable fields (message
text, sender/chat names — output/elasticsearch.py:60-75); ES multi_match
with most_fields scores each field with its own BM25 statistics and sums
the per-field scores, weighted by the field boost:

    score(d) = sum_f  w_f * sum_t  idf_{f,t} * tf_{f,t,d}*(k1+1)
               / (tf + k1*(1 - b + b*dl_f(d)/avgdl_f))

Each field gets its OWN inverted index (build_field_indexes), built with
the same document-salt partitioning — so every field's posting blocks for
one document land in the same salt, and one cogrouped kernel pass scores
all fields with zero cross-field shuffle.  Per-field statistics (df, N,
avgdl, dl) come from that field's own index; doc lengths are denormalized
into the blocks as usual, so the query touches only the query terms'
blocks in each field index.

Pruning: fields are folded into the standard MaxScore kernel
(_score_salt_group) by keying each posting group as field+term with a
per-key (idf, weight, avgdl) triple — every upper bound scales by the
field boost, so the theta-skipping stays exact across fields and a
boosted rare field prunes a heavy unboosted one exactly like a rare term
prunes a Zipf-head term in single-field WAND.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE
from ..index.build import build_index
from .bm25 import B, K1, SCORE_DECIMALS
from .wand import _collect_idfs, _postings_for_terms, _score_salt_group

# field/term separator inside composite kernel keys; tokenizer terms are
# letter/number runs so \x1f can never occur in a term (field names must
# avoid it too)
_SEP = "\x1f"


def build_field_indexes(
    corpus: DataFrame,
    fields: dict[str, F.Column | str],
    n_doc_parts: int = 8,
    positions: bool = False,
) -> dict[str, dict]:
    """One index per searchable field, all sharing doc ids and the salt
    modulus (same corpus rows, same pmod(doc_id, P) layout).  `fields`
    maps field name -> column/expression holding that field's text."""
    out = {}
    for name, col in fields.items():
        c = F.col(col) if isinstance(col, str) else col
        fcorp = corpus.withColumn("text", c)
        out[name] = build_index(fcorp, n_doc_parts=n_doc_parts, positions=positions)
    return out


def multi_match_topk(
    field_indexes: dict[str, dict],
    weights: dict[str, float],
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """Top-k (doc_id, url, score) of the field-boosted most_fields sum.

    One postings scan per field (each pruned by its own term_bucket
    layout), one union keyed as field+term, ONE groupBy(salt) run of the
    standard MaxScore kernel with per-key (idf, boost, avgdl) — per-field
    stats are collected driver-side (|fields| x |terms| scalars) and
    closed over."""
    first = next(iter(field_indexes.values()))
    spark = first["doc_map"].sparkSession
    empty = spark.createDataFrame([], "doc_id long, url string, score double")

    key_idfs: dict[str, float] = {}
    key_weights: dict[str, float] = {}
    key_avgdls: dict[str, float] = {}
    parts = []
    cols = [
        "salt", "term", "block_id", "n_docs", "first_doc_id", "last_doc_id",
        "block_max_tf", "doc_gaps", "tf_bytes", "dl_bytes",
    ]
    for name, idx in field_indexes.items():
        idfs, avgdl = _collect_idfs(idx, terms)
        w = float(weights.get(name, 1.0))
        for t, idf in idfs.items():
            key = name + _SEP + t
            key_idfs[key] = idf
            key_weights[key] = w
            key_avgdls[key] = float(avgdl)
        if idfs:
            parts.append(
                _postings_for_terms(idx, list(idfs))
                .select(*cols)
                .withColumn(
                    "term", F.concat(F.lit(name + _SEP), F.col("term"))
                )
            )
    if not parts:
        return empty
    post = parts[0]
    for p in parts[1:]:
        post = post.unionByName(p)

    local = post.groupBy("salt").applyInPandas(
        lambda pdf: _score_salt_group(
            pdf, key_idfs, 0.0, k,
            weights=key_weights, avgdls=key_avgdls,
        ),
        "doc_id long, score double",
    )
    topk = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        first["doc_map"]
        .select("doc_id", "url")
        .join(F.broadcast(topk), "doc_id", "inner")
        .select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def _sql_quote_terms(terms: list[str]) -> str:
    return ", ".join("'" + t.replace("'", "''") + "'" for t in terms)


def multi_match_sql(
    terms: list[str],
    k: int = 10,
    w_text: float = 1.0,
    w_url: float = 2.0,
) -> str:
    """DuckDB oracle for the registered two-field shape: fields `text`
    (boost w_text) and `url` (boost w_url, tokenized with the SAME
    tokenizer — scheme/host/path pieces become terms)."""
    terms_sql = _sql_quote_terms(terms)

    def field_ctes(fld: str, src_expr: str) -> str:
        return f"""
toks_{fld} AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower({src_expr}),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
dl_{fld} AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower({src_expr}),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS doc_len
  FROM corpus
),
stats_{fld} AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM dl_{fld}),
tf_{fld} AS (
  SELECT doc_id, term, count(*) AS tf FROM toks_{fld}
  WHERE term IN ({terms_sql}) GROUP BY doc_id, term
),
df_{fld} AS (SELECT term, count(*) AS df FROM tf_{fld} GROUP BY term),
sc_{fld} AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / s.avgdl))
         ) AS raw
  FROM tf_{fld} tf
  JOIN dl_{fld} dl ON tf.doc_id = dl.doc_id
  JOIN df_{fld} df ON tf.term = df.term
  CROSS JOIN stats_{fld} s
  GROUP BY tf.doc_id
)"""

    return f"""
WITH {CORPUS_CTE.strip()},{field_ctes("text", "text")},{field_ctes("url", "url")},
combined AS (
  SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
         round({w_text} * coalesce(t.raw, 0) + {w_url} * coalesce(u.raw, 0),
               {SCORE_DECIMALS}) AS score
  FROM sc_text t FULL OUTER JOIN sc_url u ON t.doc_id = u.doc_id
)
SELECT c.doc_id, corpus.url, c.score
FROM combined c JOIN corpus ON c.doc_id = corpus.doc_id
ORDER BY c.score DESC, c.doc_id ASC
LIMIT {k}
"""


def dis_max_topk(
    field_indexes: dict[str, dict],
    boosts: dict[str, float],
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """ES `dis_max` / multi_match(best_fields) with tie_breaker=0 (the ES
    default): score(d) = max over fields of w_f * BM25_f(d) — the BEST
    field wins instead of summing (most_fields).

    Exactness of the per-field top-k union: if doc d belongs to the
    global dis_max top-k via best field f, fewer than k docs out-score it
    in field f (each of those has dis_max >= its f-score > d's), so d is
    inside field f's own top-k.  Hence the candidate set = union of the
    per-field WAND top-k lists (<= |fields|*k rows, driver-scale), and
    each candidate's winning score is already on its row — a max_by hash
    agg over F*k rows, no rescoring pass.  (tie_breaker > 0 would need
    the runner-up field scores of every candidate — the summing kernel's
    job — and is intentionally not offered on this path.)"""
    from .wand import wand_topk

    parts = []
    for name, idx in field_indexes.items():
        w = float(boosts.get(name, 1.0))
        parts.append(
            wand_topk(idx, terms, k=k).select(
                "doc_id",
                "url",
                F.round(F.col("score") * w, SCORE_DECIMALS).alias("fs"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    best = F.max_by(F.struct("fs", "url"), F.struct("fs", "url"))
    return (
        u.groupBy("doc_id")
        .agg(best.alias("b"))
        .select("doc_id", F.col("b.url").alias("url"), F.col("b.fs").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(k))
    )


def dis_max_sql(
    terms: list[str],
    k: int = 10,
    w_text: float = 1.0,
    w_url: float = 2.0,
) -> str:
    """DuckDB oracle for the registered two-field dis_max shape — same
    per-field BM25 CTEs as multi_match_sql, greatest() instead of the
    weighted sum."""
    terms_sql = _sql_quote_terms(terms)

    def field_ctes(fld: str, src_expr: str) -> str:
        return f"""
toks_{fld} AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower({src_expr}),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
dl_{fld} AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower({src_expr}),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS doc_len
  FROM corpus
),
stats_{fld} AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM dl_{fld}),
tf_{fld} AS (
  SELECT doc_id, term, count(*) AS tf FROM toks_{fld}
  WHERE term IN ({terms_sql}) GROUP BY doc_id, term
),
df_{fld} AS (SELECT term, count(*) AS df FROM tf_{fld} GROUP BY term),
sc_{fld} AS (
  SELECT tf.doc_id,
         sum(
           ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / s.avgdl))
         ) AS raw
  FROM tf_{fld} tf
  JOIN dl_{fld} dl ON tf.doc_id = dl.doc_id
  JOIN df_{fld} df ON tf.term = df.term
  CROSS JOIN stats_{fld} s
  GROUP BY tf.doc_id
)"""

    return f"""
WITH {CORPUS_CTE.strip()},{field_ctes("text", "text")},{field_ctes("url", "url")},
combined AS (
  SELECT coalesce(t.doc_id, u.doc_id) AS doc_id,
         greatest(
           CASE WHEN t.doc_id IS NULL THEN NULL
                ELSE round({w_text} * t.raw, {SCORE_DECIMALS}) END,
           CASE WHEN u.doc_id IS NULL THEN NULL
                ELSE round({w_url} * u.raw, {SCORE_DECIMALS}) END
         ) AS score
  FROM sc_text t FULL OUTER JOIN sc_url u ON t.doc_id = u.doc_id
)
SELECT c.doc_id, corpus.url, c.score
FROM combined c JOIN corpus ON c.doc_id = corpus.doc_id
ORDER BY c.score DESC, c.doc_id ASC
LIMIT {k}
"""
