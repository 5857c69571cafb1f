"""Suggesters — ES `completion` and `term` ("did you mean") analogues.

Completion: prefix -> the corpus's most frequent completions, served from
the term dictionary (cf = collection frequency is already materialized at
build time), prefix-pruned via the sorted layout exactly like
expand.prefix_topk.  ES backs this with an in-memory FST per shard; the
sorted term_dict's row-group pruning is this engine's FST walk, and at
query-node scale the ≤max rows collected here are what a server would
cache.

Spelling ("term suggester"): an unknown or misspelled term -> vocabulary
terms ranked by trigram Jaccard similarity (the pg_trgm `%` / ES term-
suggester shape; the reference's Postgres schema carries pg_trgm GIN
indexes, poc models.py:188).  Candidate generation is a vocab-sized scan
with a similarity threshold — at 10^12-doc scale vocabulary is millions
of rows (Heaps' law), so a full-vocab trigram pass per query remains
cheap relative to any postings work, and the same trigram-bucket GIN
layout used for document fuzzy search (query/fuzzy.py) applies if it is
not.

Trigram model (matches query/fuzzy.py): pad = "  " + term + " ", distinct
3-grams; similarity = |A ∩ B| / |A ∪ B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE


def _dict_for_scan(index: dict) -> DataFrame:
    return index.get("term_dict_sorted", index["term_dict"])


def suggest_complete(index: dict, prefix: str, k: int = 10) -> DataFrame:
    """(term, cf) completions for `prefix`, most frequent first (cf desc,
    term asc) — StartsWith-pruned on the sorted dictionary."""
    return (
        _dict_for_scan(index)
        .filter(F.col("term").startswith(prefix))
        .select("term", F.col("cf").cast("long").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(int(k))
    )


def suggest_complete_sql(prefix: str, k: int = 10) -> str:
    esc = prefix.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    q = esc.replace("'", "''")
    return f"""
WITH {CORPUS_CTE.strip()},
toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text),
      '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
)
SELECT term, count(*) AS cf
FROM toks
WHERE term LIKE '{q}%' ESCAPE '\\'
GROUP BY term
ORDER BY cf DESC, term ASC
LIMIT {int(k)}
"""


def suggest_spelling(
    index: dict, word: str, k: int = 5, min_sim: float = 0.3
) -> DataFrame:
    """(term, sim) vocabulary terms trigram-similar to `word`, best first
    (sim desc, term asc); sim rounded to 6 decimals for deterministic
    cross-engine order."""
    word = word.lower()
    q_grams = sorted(_py_trigrams(word))
    grams = F.array(*[F.lit(g) for g in q_grams])
    # term trigrams need a dynamic substring start -> SQL lambda form
    t_grams = F.array_distinct(
        F.expr(
            "transform(sequence(1, length(concat('  ', term, ' ')) - 2), "
            "i -> substring(concat('  ', term, ' '), i, 3))"
        )
    )
    inter = F.size(F.array_intersect(t_grams, grams))
    union = F.size(F.array_union(t_grams, grams))
    return (
        _dict_for_scan(index)
        .select("term", F.round(inter / union, 6).alias("sim"))
        .filter(F.col("sim") >= float(min_sim))
        .orderBy(F.desc("sim"), F.asc("term"))
        .limit(int(k))
    )


def _py_trigrams(word: str) -> set[str]:
    padded = "  " + word + " "
    return {padded[i : i + 3] for i in range(len(padded) - 2)}


def suggest_spelling_sql(word: str, k: int = 5, min_sim: float = 0.3) -> str:
    w = word.lower().replace("'", "''")
    return f"""
WITH {CORPUS_CTE.strip()},
vocab AS (
  SELECT DISTINCT unnest(list_filter(regexp_split_to_array(lower(text),
      '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
qg AS (
  SELECT list_distinct(list_transform(
      range(1, length('  ' || '{w}' || ' ') - 1),
      i -> substring('  ' || '{w}' || ' ', i, 3))) AS grams
),
scored AS (
  SELECT term,
         round(
           len(list_intersect(list_distinct(list_transform(
               range(1, length('  ' || term || ' ') - 1),
               i -> substring('  ' || term || ' ', i, 3))), qg.grams)) * 1.0
           / len(list_distinct(list_concat(list_distinct(list_transform(
               range(1, length('  ' || term || ' ') - 1),
               i -> substring('  ' || term || ' ', i, 3))), qg.grams))),
           6) AS sim
  FROM vocab CROSS JOIN qg
)
SELECT term, sim FROM scored
WHERE sim >= {float(min_sim)}
ORDER BY sim DESC, term ASC
LIMIT {int(k)}
"""
