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
