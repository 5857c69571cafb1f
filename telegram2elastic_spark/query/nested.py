"""ES `nested` query and `nested` aggregation.

ES stores arrays of objects as hidden child documents so a query can
require MULTIPLE conditions of the SAME array element; a flattened
object field loses that tie (the classic {user.first, user.last}
cross-match bug).  The engine's nested field here is the per-doc
termvector `mentions: array<struct<term, freq, first_pos>>`, derived
deterministically from the stored text in BOTH engines (a real
deployment materializes it at ingest; deriving it in the scan keeps the
oracle shared and the semantics identical).  Reference analogue: the ES
mapping surface implied by README.md:5 Kibana serving.

`nested_query_page`: parents where SOME single element satisfies the
whole conjunction (term prefix AND freq >= n AND first_pos <= p) —
exactly the tie a flattened mapping cannot express.  The element
identity is (doc, term), so the plan may explode and REGROUP BY THE
ELEMENT KEY before evaluating the conjunction: each rebuilt row IS one
nested element, and the tie is preserved (the cross-match unit test
pins it).  The selective prefix predicate is pushed to immediately
after the Generate, so only matching occurrences shuffle.

`nested_terms_agg`: the ES nested aggregation — unnest the elements of
the FILTERED parents, aggregate per term (doc count, total/max freq),
top-N.  One explode + two keyed hash aggregates with map-side combine.

Scale shape: one codegen'd scan+Generate each; shuffles carry only
prefix-matching rows (query) / per-(doc,term) partials (agg).  The
per-doc termvector derivation (`mentions_col`) is kept for the mapping
surface but stays off the hot path — higher-order-function lambdas are
interpreted per element and measured 6x slower at 200k docs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE, tokens


def mentions_col(toks: Column | None = None) -> Column:
    """array<struct<term,freq,first_pos>> — one element per distinct
    token, freq its occurrence count, first_pos its 1-based first
    position.

    Pass `toks` as a MATERIALIZED column: the lambda references the token
    array twice per distinct element, so a raw tokenizer expression gets
    re-evaluated per reference (dedup.shingles_col performance contract).
    The no-arg form keeps the self-contained (slow) shape."""
    toks = tokens("text") if toks is None else toks
    return F.transform(
        F.array_distinct(toks),
        lambda t: F.struct(
            t.alias("term"),
            F.size(F.filter(toks, lambda x: x == t)).alias("freq"),
            (F.array_position(toks, t)).alias("first_pos"),
        ),
    )


MENTIONS_SQL = (
    "list_transform(list_distinct(toks), t -> {{"
    "'term': t, "
    "'freq': len(list_filter(toks, x -> x = t)), "
    "'first_pos': list_position(toks, t)}})"
)


def nested_query_page(
    corpus: DataFrame,
    prefix: str = "mer",
    min_freq: int = 2,
    max_first_pos: int = 60,
    limit: int = 20,
) -> DataFrame:
    """Parents where ONE element matches the whole conjunction (module
    docstring).  Output (doc_id, url, n_matching) — n_matching is the
    ES inner-hit count for the nested clause — doc order, first
    `limit`."""
    # The nested-element identity here is (doc, term): posexplode the
    # tokens (codegen'd Generate), push the selective prefix filter
    # IMMEDIATELY after it (the ES analogue of running the nested child
    # query first), and rebuild each surviving element's (freq,
    # first_pos) with one keyed aggregate.  The whole-element
    # conjunction is then evaluated per rebuilt element, so the
    # flattened-mapping cross-match bug remains impossible (unit-
    # tested).  Only prefix-matching occurrences are ever shuffled —
    # a per-doc termvector build (higher-order functions, interpreted
    # lambdas, O(len * distinct) work) measured 6x slower at 200k docs.
    tok = corpus.select(
        "doc_id", "url", F.posexplode(tokens("text")).alias("p", "term")
    )
    return (
        tok.filter(F.col("term").startswith(prefix))
        .groupBy("doc_id", "url", "term")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            (F.min("p") + 1).alias("first_pos"),
        )
        .filter(
            (F.col("freq") >= min_freq) & (F.col("first_pos") <= max_first_pos)
        )
        .groupBy("doc_id", "url")
        .agg(F.count(F.lit(1)).cast("long").alias("n_matching"))
        .select("doc_id", "url", "n_matching")
        .orderBy("doc_id")
        .limit(limit)
    )


def nested_query_page_sql(
    prefix: str = "mer",
    min_freq: int = 2,
    max_first_pos: int = 60,
    limit: int = 20,
) -> str:
    p = prefix.replace("'", "''")
    esc = p.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    cond = (
        f"e.term LIKE '{esc}%' ESCAPE '\\' AND e.freq >= {int(min_freq)} "
        f"AND e.first_pos <= {int(max_first_pos)}"
    )
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id, url,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
nested AS (
  SELECT doc_id, url,
         CAST(len(list_filter({MENTIONS_SQL.format()}, e -> {cond}))
              AS BIGINT) AS n_matching
  FROM tokd
)
SELECT doc_id, url, n_matching
FROM nested WHERE n_matching > 0
ORDER BY doc_id
LIMIT {int(limit)}
"""


def nested_terms_agg(
    corpus: DataFrame, lang: str = "en", top: int = 10
) -> DataFrame:
    """ES nested aggregation: over parents passing the filter, unnest the
    elements and aggregate per term — (term, n_docs, total_freq,
    max_freq), top-N by total_freq desc then term asc."""
    # Two-level aggregate instead of a per-doc termvector build: explode
    # the tokens (linear per doc), per-(doc,term) freq with map-side
    # combine, then the term rollup.  Same result as unnesting the
    # nested elements; the quadratic in-array stats build is gone and
    # both shuffles key on term (the second is axis-sized).
    return (
        corpus.filter(F.col("lang") == lang)
        .select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("freq").cast("bigint").alias("total_freq"),
            F.max("freq").cast("bigint").alias("max_freq"),
        )
        .orderBy(F.desc("total_freq"), F.asc("term"))
        .limit(top)
    )


def nested_terms_agg_sql(lang: str = "en", top: int = 10) -> str:
    l = lang.replace("'", "''")
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus WHERE lang = '{l}'
),
el AS (
  SELECT unnest({MENTIONS_SQL.format()}) AS e FROM tokd
)
SELECT e.term AS term,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(e.freq) AS BIGINT) AS total_freq,
       CAST(max(e.freq) AS BIGINT) AS max_freq
FROM el
GROUP BY 1
ORDER BY total_freq DESC, term ASC
LIMIT {int(top)}
"""


def reverse_nested_agg(
    corpus: DataFrame, lang: str = "en", top: int = 10
) -> DataFrame:
    """ES `reverse_nested` aggregation: a terms bucketing in the NESTED
    scope (per-token mention elements) whose metrics hop BACK to the
    parent scope — each parent counts once per bucket no matter how many
    of its elements landed there (the reverse_nested doc-count
    contract), and parent-level fields (n_chars, source) become
    per-bucket metrics a nested-scope agg cannot see.

    Plan: posexplode-free token explode (linear per doc), per
    (parent, term) collapse FIRST — that collapse IS the reverse_nested
    hop, deduplicating elements per parent — then the term rollup.
    Both shuffles key on term-sized axes; parent attributes ride the
    first groupBy as functionally-dependent keys (no join-back).
    Reference analogue: per-entity rollups over message mentions
    (poc entity extraction), aggregated per chat."""
    per = (
        corpus.filter(F.col("lang") == lang)
        .select(
            "doc_id",
            "n_chars",
            "source",
            F.explode(tokens("text")).alias("term"),
        )
        .groupBy("doc_id", "n_chars", "source", "term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return (
        per.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_parents"),
            F.sum("freq").cast("bigint").alias("total_freq"),
            F.round(F.avg("n_chars"), 5).alias("avg_parent_chars"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy(F.desc("total_freq"), F.asc("term"))
        .limit(int(top))
    )


def reverse_nested_agg_sql(lang: str = "en", top: int = 10) -> str:
    l = lang.replace("'", "''")
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id, n_chars, source,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus WHERE lang = '{l}'
),
el AS (
  SELECT doc_id, n_chars, source, unnest(toks) AS term FROM tokd
),
per AS (
  SELECT doc_id, n_chars, source, term, count(*) AS freq
  FROM el GROUP BY 1, 2, 3, 4
)
SELECT term,
       count(*) AS n_parents,
       CAST(sum(freq) AS BIGINT) AS total_freq,
       round(avg(n_chars), 5) AS avg_parent_chars,
       count(DISTINCT source) AS n_sources
FROM per
GROUP BY 1
ORDER BY total_freq DESC, term ASC
LIMIT {int(top)}
"""
