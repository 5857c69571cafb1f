"""Tokenizer / normalizer / html→text extractor.

This is the one stage the reference outsourced to the Elasticsearch analyzer
(output/elasticsearch.py:33) and to pg_trgm (poc/src/core/models.py:188); we
own it.  Normalization follows the reference's lowercase/strip convention
(`normalized_text` "Lowercase, stripped", poc/src/core/models.py:270-272).

Two invariants (BASELINE.json input_hint):
  * extracted text is byte-identical per url vs the reference extractor —
    tested by round-tripping the html wrapper of corpus.as_corpus;
  * tokenization is deterministic and reproducible in ANSI SQL, so DuckDB
    oracles can tokenize the same corpus identically (TOKEN_SPLIT_RE is RE2-
    and Java-regex compatible; see SPLIT_SQL / TOKENS_CTE).

Hot path is pure built-in Column expressions (whole-stage codegen, zero
Python); the pandas-UDF variants exist for the html→binary decode step that
built-ins cannot express, and they are Arrow-vectorized (no per-row Python).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Maximal runs of Unicode letters/digits; the same literal works in Spark
# (Java regex) and DuckDB (RE2).
TOKEN_SPLIT_RE = r"[^\p{L}\p{N}]+"

# DuckDB-side tokenization of a text column, producing one row per
# (doc_id, term).  Filters the empty strings regexp_split emits at string
# boundaries, exactly as tokens() does.
TOKENS_CTE = rf"""
tokens AS (
  SELECT doc_id,
         unnest(list_filter(
             regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
             t -> t <> '')) AS term
  FROM corpus
)
"""

# Python-side equivalent (for numpy oracles in unit tests).
_PY_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)  # \w minus underscore == [L N]


def py_tokenize(text: str) -> list[str]:
    """Reference tokenizer in plain Python — the test oracle."""
    return _PY_TOKEN_RE.findall(text.lower())


def tokens(col: Column | str) -> Column:
    """array<string> of normalized tokens — pure built-ins, codegen'd.

    split() emits '' at leading/trailing separators; filter them so empty
    docs give an empty array (they still count toward N and avgdl).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), TOKEN_SPLIT_RE), lambda t: t != F.lit("")
    )


def doc_len(col: Column | str) -> Column:
    """Token count |d| for BM25 length norms."""
    return F.size(tokens(col))


# SQL fragment for doc_len in DuckDB oracles.
DOC_LEN_SQL = (
    "len(list_filter(regexp_split_to_array(lower(text), "
    f"'{TOKEN_SPLIT_RE}'), t -> t <> ''))"
)


# --- html → text extraction (the decode step built-ins can't do on binary) --

_TAG_RE = re.compile(r"<[^>]*>")


def _extract_text_from_html(html: pd.Series) -> pd.Series:
    """Vectorized html(binary)→text: decode utf-8, strip tags.

    Inverse of corpus.as_corpus's wrapper, so extracted text must be
    byte-identical to the corpus `text` column per url (input_hint
    invariant).  Uses pandas str ops over the whole Arrow batch.
    """
    decoded = html.str.decode("utf-8", errors="replace")
    return decoded.str.replace(_TAG_RE, "", regex=True)


@F.pandas_udf(StringType())
def extract_text(html_iter: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """Arrow-batched pandas UDF (iterator form: one-time init per executor,
    analogous to the reference's compiled-regex reuse,
    poc/src/enrichment/entity_extractor.py:154-158)."""
    for html in html_iter:
        yield _extract_text_from_html(html)


def apply_stop_analyzer(corpus, stopwords: list[str]):
    """ES `stop` token filter as an analyzed-corpus view: drop stopword
    tokens, re-join with single spaces.

    Because tokens() splits on separator runs, the rewritten text
    re-tokenizes to exactly the filtered token stream — so an index
    built over this view IS the index a stop-filter analyzer would
    build (doc lengths, avgdl, dfs all shift accordingly), with zero
    new code in the build/query kernels.  Pure built-in exprs (filter
    + array_join), codegen'd; the lambda touches the element only, so
    the tokenize-once contract holds."""
    sw = [w.lower() for w in stopwords]
    kept = F.filter(tokens("text"), lambda t: ~t.isin(*sw))
    return corpus.withColumn("text", F.array_join(kept, " "))


def stop_analyzed_corpus_cte(stopwords: list[str]) -> str:
    """DuckDB twin of apply_stop_analyzer: CORPUS_CTE with `text`
    replaced by the stop-filtered re-join.  Emits the two CTE clauses
    `corpus_raw` and `corpus` (callers start their WITH with this)."""
    from ..corpus import CORPUS_CTE

    sw = ", ".join("'" + w.lower().replace("'", "''") + "'" for w in stopwords)
    raw = CORPUS_CTE.strip().replace("corpus AS (", "corpus_raw AS (", 1)
    return f"""{raw},
corpus AS (
  SELECT doc_id, url, warc_ts, html,
         array_to_string(list_filter(
             regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
             t -> t <> '' AND t NOT IN ({sw})), ' ') AS text,
         lang, source, n_chars
  FROM corpus_raw
)"""


def apply_fingerprint_analyzer(corpus):
    """ES `fingerprint` analyzer as an analyzed-corpus view: lowercase,
    tokenize, DEDUPE, SORT, re-join with single spaces — the OpenRefine
    fingerprint ES ships for dedup/clustering keys.

    Round-trips through tokens() exactly (alnum tokens, single-space
    joins), so an index over this view is the fingerprint-analyzed
    index: every tf is 1, doc_len is the distinct-token count, dfs are
    unchanged.  Pure built-ins (array_distinct + array_sort +
    array_join), codegen'd."""
    fp = F.array_join(
        F.array_sort(F.array_distinct(tokens("text"))), " "
    )
    return corpus.withColumn("text", fp)


def fingerprint_corpus_cte() -> str:
    """DuckDB twin of apply_fingerprint_analyzer (emits `corpus_raw` +
    `corpus`, like stop_analyzed_corpus_cte)."""
    from ..corpus import CORPUS_CTE

    raw = CORPUS_CTE.strip().replace("corpus AS (", "corpus_raw AS (", 1)
    return f"""{raw},
corpus AS (
  SELECT doc_id, url, warc_ts, html,
         array_to_string(list_sort(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
             t -> t <> ''))), ' ') AS text,
         lang, source, n_chars
  FROM corpus_raw
)"""


def apply_pattern_analyzer(corpus, pattern: str = "[^a-z]+"):
    """ES `pattern` analyzer: lowercase + split on a CUSTOM regex (the
    default here keeps letters only — digits become separators, unlike
    the standard [L N] tokenizer).  The view re-joins with single
    spaces; callers must pass a pattern whose tokens contain no
    standard-tokenizer separators so the view round-trips (letters-only
    patterns always do).  The regex must be Java/RE2-portable — it runs
    verbatim in both engines."""
    toks = F.filter(
        F.split(F.lower(F.col("text")), pattern), lambda t: t != ""
    )
    return corpus.withColumn("text", F.array_join(toks, " "))


def pattern_corpus_cte(pattern: str = "[^a-z]+") -> str:
    """DuckDB twin of apply_pattern_analyzer."""
    from ..corpus import CORPUS_CTE

    raw = CORPUS_CTE.strip().replace("corpus AS (", "corpus_raw AS (", 1)
    return f"""{raw},
corpus AS (
  SELECT doc_id, url, warc_ts, html,
         array_to_string(list_filter(
             regexp_split_to_array(lower(text), '{pattern}'),
             t -> t <> ''), ' ') AS text,
         lang, source, n_chars
  FROM corpus_raw
)"""


def apply_synonym_analyzer(corpus, groups: dict[str, list[str]]):
    """ES `synonym` token filter at INDEX time, contracting form
    (`a, b => head`): every member token is rewritten to its group head
    before indexing, so the index holds ONE merged posting list per
    group — df, tf and doc_len shift exactly as a Lucene
    SynonymGraphFilter index does for contraction rules.  (The
    query-time expansion form is query/synonyms.py; ES docs recommend
    exactly this split.)

    `groups`: head -> member list.  Heads must round-trip through the
    standard tokenizer (single lowercase alnum token) so the rewritten
    text re-tokenizes to the filtered stream verbatim.  Pure built-ins
    (transform + element_at on a literal map + re-join), codegen'd; the
    lambda touches the element only, so the tokenize-once contract
    holds."""
    mapping: dict[str, str] = {}
    for head, members in groups.items():
        if py_tokenize(head) != [head]:
            raise ValueError(f"synonym head {head!r} is not a single token")
        for m in members:
            mapping[m.lower()] = head.lower()
    kv: list = []
    for m in sorted(mapping):
        kv.extend([F.lit(m), F.lit(mapping[m])])
    syn_map = F.create_map(*kv)
    rewritten = F.transform(
        tokens("text"), lambda t: F.coalesce(syn_map[t], t)
    )
    return corpus.withColumn("text", F.array_join(rewritten, " "))


def synonym_corpus_cte(groups: dict[str, list[str]]) -> str:
    """DuckDB twin of apply_synonym_analyzer (emits `corpus_raw` +
    `corpus`, like stop_analyzed_corpus_cte)."""
    from ..corpus import CORPUS_CTE

    def q(s: str) -> str:
        return "'" + s.lower().replace("'", "''") + "'"

    cases = []
    for head, members in sorted(groups.items()):
        ms = ", ".join(q(m) for m in sorted(members))
        cases.append(f"WHEN t IN ({ms}) THEN {q(head)}")
    case = "CASE " + " ".join(cases) + " ELSE t END"
    raw = CORPUS_CTE.strip().replace("corpus AS (", "corpus_raw AS (", 1)
    return f"""{raw},
corpus AS (
  SELECT doc_id, url, warc_ts, html,
         array_to_string(list_transform(list_filter(
             regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
             t -> t <> ''), t -> {case}), ' ') AS text,
         lang, source, n_chars
  FROM corpus_raw
)"""
