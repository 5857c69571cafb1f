"""Score explanation — the ES `_explain` API.

For one (query, document) pair, emit the per-term BM25 breakdown the
engine's scorers sum: tf, df, idf, the length norm inputs, and the final
weight — plus the idf/norm parameterization, so a rank can be audited
without rerunning retrieval.  The document is fetched by id (one-row
scan), global stats come from the corpus; everything is built-in
expressions over a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE, tokens
from .bm25 import B, K1, SCORE_DECIMALS, bm25_weight, idf_col


def explain_score(
    corpus: DataFrame, terms: list[str], doc_id: int
) -> DataFrame:
    """(term, tf, df, doc_len, idf, weight) — one row per query term the
    document contains, ordered by weight desc then term (the additive
    pieces of bm25_topk's score for this doc)."""
    uniq = sorted(set(terms))
    stats = corpus.select(F.size(tokens("text")).alias("dl")).agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    toks = corpus.select(
        "doc_id", F.explode(tokens("text")).alias("term")
    ).filter(F.col("term").isin(uniq))
    tf = (
        toks.filter(F.col("doc_id") == int(doc_id))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    dl = corpus.filter(F.col("doc_id") == int(doc_id)).select(
        F.size(tokens("text")).alias("doc_len")
    )
    idf = idf_col(F.col("n").cast("double"), F.col("df").cast("double"))
    weight = bm25_weight(
        F.col("tf").cast("double"),
        F.col("doc_len").cast("double"),
        F.col("avgdl"),
        idf,
    )
    return (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(dl))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.col("doc_len").cast("long").alias("doc_len"),
            F.round(idf, 6).alias("idf"),
            F.round(weight, SCORE_DECIMALS).alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("term"))
    )


def explain_score_sql(terms: list[str], doc_id: int) -> str:
    tl = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"""
WITH {CORPUS_CTE.strip()},
dls AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS dl
  FROM corpus
),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dls),
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
qtoks AS (SELECT * FROM toks WHERE term IN ({tl})),
tf AS (
  SELECT term, count(*) AS tf FROM qtoks
  WHERE doc_id = {int(doc_id)} GROUP BY term
),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM qtoks GROUP BY term),
dl AS (SELECT dl AS doc_len FROM dls WHERE doc_id = {int(doc_id)})
SELECT tf.term, tf.tf, df.df, dl.doc_len,
       round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5)), 6) AS idf,
       round(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({K1} + 1.0)
             / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl)),
             {SCORE_DECIMALS}) AS weight
FROM tf JOIN df USING (term) CROSS JOIN dl CROSS JOIN stats
ORDER BY weight DESC, tf.term ASC
"""


def matched_queries_topk(
    index: dict,
    terms: list[str],
    named: dict[str, list[str]],
    k: int = 10,
) -> DataFrame:
    """ES named queries: every bool clause can carry `_name`, and each
    hit's response lists `matched_queries` — the names of the clauses it
    satisfied.  Retrieval ranks on `terms` (the verified WAND path);
    each named clause here is a term-set matched with OR semantics
    (ES `terms` clause).

    Serving shape (the ES coordinator's): membership for a named clause
    is resolved on the k-ROW hit set only — the clause terms' postings
    are ids-only decoded (doc_gaps — weights stay compressed) from the
    hot-shard cache and intersected with the k hit ids driver-side.
    Nothing corpus-sized moves; a clause costs one pruned postings fetch
    the first time its terms are seen.  (doc_id, url, score,
    matched_queries) with the names comma-joined in name order (the
    cross-engine-stable encoding of ES's array)."""
    import numpy as np
    import pandas as pd  # noqa: F401 (dtype side of _local_blocks)

    from .wand import _decode_ids_only, _local_blocks, wand_topk

    top = wand_topk(index, terms, k=k)
    rows = top.collect()
    if not rows:
        spark = index["doc_map"].sparkSession
        return spark.createDataFrame(
            [],
            "doc_id long, url string, score double, matched_queries string",
        )
    hit_ids = np.array([int(r["doc_id"]) for r in rows], dtype=np.int64)
    member: dict[str, np.ndarray] = {}
    for name, nterms in named.items():
        nts = sorted({t.lower() for t in nterms})
        pdf = _local_blocks(index, nts, nts)
        if pdf is None:
            member[name] = np.zeros(len(hit_ids), dtype=bool)
            continue
        ids = _decode_ids_only(pdf)
        member[name] = np.isin(hit_ids, ids)
    names = sorted(named)
    out = [
        (
            int(r["doc_id"]),
            r["url"],
            float(r["score"]),
            ",".join(n for n in names if member[n][i]),
        )
        for i, r in enumerate(rows)
    ]
    spark = index["doc_map"].sparkSession
    return spark.createDataFrame(
        out, "doc_id long, url string, score double, matched_queries string"
    ).orderBy(F.desc("score"), F.asc("doc_id"))


def matched_queries_sql(
    terms: list[str], named: dict[str, list[str]], k: int = 10
) -> str:
    from .bm25 import bm25_topk_sql

    base = bm25_topk_sql(terms, k=k)
    name_exprs = []
    for name in sorted(named):
        nts = sorted({t.lower() for t in named[name]})
        in_list = ", ".join(
            "'" + t.replace("'", "''") + "'" for t in nts
        )
        nm = name.replace("'", "''")
        name_exprs.append(
            f"CASE WHEN len(list_filter(tk, x -> x IN ({in_list}))) > 0 "
            f"THEN '{nm}' END"
        )
    arr = "list_filter([" + ", ".join(name_exprs) + "], x -> x IS NOT NULL)"
    return f"""
WITH base AS ({base}),
{CORPUS_CTE.strip()},
withtk AS (
  SELECT b.doc_id, b.url, b.score,
         list_filter(regexp_split_to_array(lower(c.text),
             '{TOKEN_SPLIT_RE}'), x -> x <> '') AS tk
  FROM base b JOIN corpus c ON b.doc_id = c.doc_id
)
SELECT doc_id, url, score,
       coalesce(list_aggr({arr}, 'string_agg', ','), '') AS matched_queries
FROM withtk
ORDER BY score DESC, doc_id ASC
"""
