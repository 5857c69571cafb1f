"""Result highlighting — the ES `highlight` block of a search response.

The reference's search API returns raw message text and relies on
Elasticsearch highlighting when served through Kibana (README.md:5); here
the snippet is computed relationally on TOP-K ROWS ONLY: rank first
(bm25_topk — k rows), broadcast the k-row hit list back onto the corpus
scan, and evaluate the snippet expressions (instr / substring /
regexp_replace — all JVM built-ins, whole-stage codegen) on exactly k
documents.  No UDF, no second scoring pass, and the text column is only
materialized for the k winners — at 100 TB the highlight stage touches k
rows regardless of corpus size.

Snippet contract (deterministic, oracle-exact):
  * anchor = first case-insensitive occurrence of any query term
    (min over per-term instr positions, absent terms ignored);
  * snippet = substring(text, max(1, anchor - window), length);
  * every query-term occurrence inside the snippet is wrapped in
    <em>...</em>, case-insensitively, original casing preserved.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import DOC_LEN_SQL, TOKEN_SPLIT_RE
from .bm25 import B, K1, SCORE_DECIMALS, _sql_quote_terms, bm25_topk


def search_highlight(
    corpus: DataFrame,
    terms: list[str],
    k: int = 10,
    window: int = 30,
    length: int = 160,
    index: dict | None = None,
) -> DataFrame:
    """(doc_id, url, score, snippet) for the BM25 top-k hits.

    With `index`, the base ranking runs on the compressed-index WAND path
    (rank-identical to the relational scorer) — the serving shape: the
    corpus is only touched by the k-row broadcast snippet join, never
    re-tokenized per query."""
    uniq = sorted({t.lower() for t in terms})
    if index is not None:
        from .wand import wand_topk

        top = wand_topk(index, terms, k=k)
    else:
        top = bm25_topk(corpus, terms, k=k)
    hits = corpus.select("doc_id", "text").join(F.broadcast(top), "doc_id")
    low = F.lower(F.col("text"))
    pos = [F.when(F.instr(low, t) > 0, F.instr(low, t)) for t in uniq]
    first = F.least(*pos) if len(pos) > 1 else pos[0]
    hits = hits.withColumn(
        "_start", F.greatest(F.lit(1), first - F.lit(int(window)))
    )
    pattern = "(?i)(" + "|".join(re.escape(t) for t in uniq) + ")"
    return (
        hits.withColumn(
            "snippet",
            F.regexp_replace(
                F.expr(f"substring(text, _start, {int(length)})"),
                pattern,
                "<em>$1</em>",
            ),
        )
        .select("doc_id", "url", "score", "snippet")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def search_highlight_sql(
    terms: list[str], k: int = 10, window: int = 30, length: int = 160
) -> str:
    """DuckDB oracle: the plain BM25 top-k CTE chain + the identical
    snippet expressions (nullif(strpos)=instr-when, least skips NULLs in
    both engines, regexp_replace with 'gi' = Spark's global (?i))."""
    uniq = sorted({t.lower() for t in terms})
    terms_sql = _sql_quote_terms(terms)
    firsts = ", ".join(
        "nullif(strpos(lower(c.text), '" + t.replace("'", "''") + "'), 0)"
        for t in uniq
    )
    first = f"least({firsts})" if len(uniq) > 1 else firsts
    rx = "(" + "|".join(re.escape(t) for t in uniq) + ")"
    rx_sql = rx.replace("'", "''")
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
tf_all AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({terms_sql}) GROUP BY doc_id, term
),
tdf AS (SELECT term, count(*) AS df FROM tf_all GROUP BY term),
scored AS (
  SELECT tf_all.doc_id,
         round(sum(
           ln(1 + (stats.n - tdf.df + 0.5) / (tdf.df + 0.5))
           * tf_all.tf * ({K1} + 1.0)
           / (tf_all.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tf_all
  JOIN dl ON tf_all.doc_id = dl.doc_id
  JOIN tdf ON tf_all.term = tdf.term
  CROSS JOIN stats
  GROUP BY tf_all.doc_id
),
topk AS (
  SELECT s.doc_id, d.url, s.score
  FROM scored s JOIN dl d ON s.doc_id = d.doc_id
  ORDER BY s.score DESC, s.doc_id ASC
  LIMIT {k}
)
SELECT t.doc_id, t.url, t.score,
       regexp_replace(
         substr(c.text, greatest(1, {first} - {int(window)}), {int(length)}),
         '{rx_sql}', '<em>\\1</em>', 'gi') AS snippet
FROM topk t JOIN corpus c ON t.doc_id = c.doc_id
ORDER BY t.score DESC, t.doc_id ASC
"""


# --- fast-vector-highlighter (fragment-scored) ---------------------------------


def highlight_fvh(
    corpus: DataFrame,
    terms: list[str],
    k: int = 10,
    frag_size: int = 20,
    num_frags: int = 2,
    index: dict | None = None,
) -> DataFrame:
    """ES `highlight` with `type: fvh` — the fast vector highlighter:
    multiple fragments per hit, each SCORED by the weight (idf) of the
    query-term occurrences it contains, returned in score order
    (`order: score`).  The plain highlighter above returns one anchored
    snippet; fvh's distinguishing contract is fragment scoring.

    Deterministic fragment model (oracle-exact in both engines):
    fragments are consecutive `frag_size`-token windows (bucket b covers
    token positions [b*frag_size+1, (b+1)*frag_size]); fragment score =
    sum of idf over query-term OCCURRENCES in the window, rounded to 5;
    top `num_frags` fragments per hit by (score desc, bucket asc);
    fragment text is the window's tokens space-joined with matches
    wrapped in <em></em> (token-normalized — the cross-engine-stable
    analogue of ES's stored-offset slices).

    Scale shape: ranking is the verified top-k path (WAND with `index=`,
    else relational BM25); everything after operates on the k-row
    broadcast hit set only — tokenize k docs, explode only their
    query-term occurrences, window over <= k * ceil(dl/frag_size) rows.
    (doc_id, url, score, frag_rank, frag_score, fragment), ordered
    (doc_id, frag_rank)."""
    from pyspark.sql import Window

    from ..functions.tokenizer import tokens

    uniq = sorted({t.lower() for t in terms})
    spark = corpus.sparkSession
    if index is not None:
        from .wand import _collect_idfs, wand_topk

        top = wand_topk(index, terms, k=k)
        idfs, _ = _collect_idfs(index, uniq)
        idf_tbl = spark.createDataFrame(
            [(t, float(v)) for t, v in idfs.items()], "term string, idf double"
        )
    else:
        top = bm25_topk(corpus, terms, k=k)
        stats = corpus.agg(F.count(F.lit(1)).alias("n"))
        idf_tbl = (
            corpus.select(
                "doc_id",
                F.explode(F.array_distinct(tokens("text"))).alias("term"),
            )
            .filter(F.col("term").isin(uniq))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .crossJoin(stats)
            .select(
                "term",
                F.log1p(
                    (F.col("n") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                ).alias("idf"),
            )
        )
    hits = (
        corpus.select("doc_id", "text")
        .join(F.broadcast(top), "doc_id")
        .withColumn("toks", tokens("text"))
        .drop("text")
    )
    occ = (
        hits.select(
            "doc_id", "url", "score", "toks",
            F.posexplode("toks").alias("p", "term"),
        )
        .filter(F.col("term").isin(uniq))
        .withColumn(
            "bucket", (F.col("p") / F.lit(int(frag_size))).cast("int")
        )
    )
    scored = (
        occ.join(F.broadcast(idf_tbl), "term")
        .groupBy("doc_id", "url", "score", "bucket")
        .agg(
            F.round(F.sum("idf"), 5).alias("frag_score"),
            F.first("toks").alias("toks"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("frag_score"), F.asc("bucket")
    )
    sel = scored.withColumn("frag_rank", F.row_number().over(w)).filter(
        F.col("frag_rank") <= int(num_frags)
    )
    window_toks = F.slice(
        F.col("toks"),
        F.col("bucket") * F.lit(int(frag_size)) + F.lit(1),
        F.lit(int(frag_size)),
    )
    fragment = F.array_join(
        F.transform(
            window_toks,
            lambda t: F.when(
                t.isin(uniq), F.concat(F.lit("<em>"), t, F.lit("</em>"))
            ).otherwise(t),
        ),
        " ",
    )
    return (
        sel.select(
            "doc_id", "url", "score",
            F.col("frag_rank").cast("int").alias("frag_rank"),
            "frag_score",
            fragment.alias("fragment"),
        )
        .orderBy("doc_id", "frag_rank")
    )


def highlight_fvh_sql(
    terms: list[str], k: int = 10, frag_size: int = 20, num_frags: int = 2
) -> str:
    uniq = sorted({t.lower() for t in terms})
    terms_sql = _sql_quote_terms(uniq)
    fs = int(frag_size)
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
tf_all AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({terms_sql}) GROUP BY doc_id, term
),
tdf AS (SELECT term, count(*) AS df FROM tf_all GROUP BY term),
idf AS (
  SELECT term, ln(1 + (stats.n - df + 0.5) / (df + 0.5)) AS idf
  FROM tdf CROSS JOIN stats
),
scored AS (
  SELECT tf_all.doc_id,
         round(sum(
           ln(1 + (stats.n - tdf.df + 0.5) / (tdf.df + 0.5))
           * tf_all.tf * ({K1} + 1.0)
           / (tf_all.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tf_all
  JOIN dl ON tf_all.doc_id = dl.doc_id
  JOIN tdf ON tf_all.term = tdf.term
  CROSS JOIN stats
  GROUP BY tf_all.doc_id
),
topk AS (
  SELECT s.doc_id, d.url, s.score
  FROM scored s JOIN dl d ON s.doc_id = d.doc_id
  ORDER BY s.score DESC, s.doc_id ASC
  LIMIT {int(k)}
),
hits AS (
  SELECT t.doc_id, t.url, t.score,
         list_filter(regexp_split_to_array(lower(c.text),
             '{TOKEN_SPLIT_RE}'), x -> x <> '') AS tk
  FROM topk t JOIN corpus c ON t.doc_id = c.doc_id
),
occ AS (
  SELECT doc_id, url, score, tk,
         unnest(list_filter(range(1, len(tk) + 1),
                p -> tk[p] IN ({terms_sql}))) AS p
  FROM hits
),
fragsc AS (
  SELECT o.doc_id, o.url, o.score, ((o.p - 1) // {fs}) AS bucket,
         round(sum(i.idf), 5) AS frag_score, any_value(o.tk) AS tk
  FROM occ o JOIN idf i ON o.tk[o.p] = i.term
  GROUP BY o.doc_id, o.url, o.score, ((o.p - 1) // {fs})
),
sel AS (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY frag_score DESC, bucket ASC
         ) AS INT) AS frag_rank
  FROM fragsc
)
SELECT doc_id, url, score, frag_rank, frag_score,
       list_aggr(
         list_transform(tk[bucket * {fs} + 1 : bucket * {fs} + {fs}],
           x -> CASE WHEN x IN ({terms_sql})
                     THEN '<em>' || x || '</em>' ELSE x END),
         'string_agg', ' ') AS fragment
FROM sel WHERE frag_rank <= {int(num_frags)}
ORDER BY doc_id, frag_rank
"""
