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
