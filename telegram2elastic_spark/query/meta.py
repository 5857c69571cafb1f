"""ES metadata + scripted-field APIs: `_field_caps` and runtime fields.

* `field_caps` — ES's schema-capability endpoint: per field its ES type
  and whether it is searchable / aggregatable.  The Spark path derives
  the answer from the ACTUAL DataFrame schema (a metadata operation, no
  scan — exactly what ES serves from its mappings); the oracle derives
  the same rows from DuckDB's own DESCRIBE of the corpus relation, so
  both engines introspect their catalog rather than echoing a literal.
  Mapping rule (the engine's mapping contract): the analyzed full-text
  field is `text` (searchable, not aggregatable — no doc_values, like an
  ES `text` field), `html` is binary (neither), every other string is a
  keyword, timestamps are dates, integers are long/integer.

* `runtime_fields_page` — ES runtime (script) fields evaluated at query
  time: a page of hits carrying fields that exist nowhere in storage —
  host (grok of url), hour (date part), html_kb (payload size), and
  n_tokens (the analyzer run as a script).  All native expressions:
  codegen'd, pushdown-safe, zero UDFs; the page bound makes the sort a
  TakeOrdered."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import DOC_LEN_SQL, tokens

# (spark dtype, column) -> ES type
_TEXT_FIELDS = {"text"}


def _es_type(col: str, dtype: str) -> str:
    if dtype == "binary":
        return "binary"
    if dtype == "string":
        return "text" if col in _TEXT_FIELDS else "keyword"
    if dtype == "timestamp":
        return "date"
    if dtype == "bigint":
        return "long"
    if dtype == "int":
        return "integer"
    if dtype == "double":
        return "double"
    return dtype


def field_caps(corpus: DataFrame) -> DataFrame:
    """(field, es_type, searchable, aggregatable) per corpus column,
    field order; derived from the live schema."""
    rows = []
    for col, dtype in corpus.dtypes:
        et = _es_type(col, dtype)
        searchable = et != "binary"
        aggregatable = et not in ("binary", "text")
        rows.append((col, et, searchable, aggregatable))
    rows.sort()
    return corpus.sparkSession.createDataFrame(
        rows, "field string, es_type string, searchable boolean, "
        "aggregatable boolean"
    )


def field_caps_sql() -> str:
    """DuckDB introspects its own corpus relation via DESCRIBE and maps
    its type names with the same rules."""
    return f"""
WITH {CORPUS_CTE.strip()},
cols AS (
  SELECT column_name AS field, column_type AS dt
  FROM (DESCRIBE SELECT * FROM corpus)
),
typed AS (
  SELECT field,
         CASE WHEN dt = 'BLOB' THEN 'binary'
              WHEN dt = 'VARCHAR' AND field = 'text' THEN 'text'
              WHEN dt = 'VARCHAR' THEN 'keyword'
              WHEN dt LIKE 'TIMESTAMP%' THEN 'date'
              WHEN dt = 'BIGINT' THEN 'long'
              WHEN dt = 'INTEGER' THEN 'integer'
              WHEN dt = 'DOUBLE' THEN 'double'
              ELSE lower(dt) END AS es_type
  FROM cols
)
SELECT field, es_type,
       es_type <> 'binary' AS searchable,
       es_type NOT IN ('binary', 'text') AS aggregatable
FROM typed
ORDER BY field
"""


def runtime_fields_page(corpus: DataFrame, limit: int = 20) -> DataFrame:
    """First `limit` docs by doc_id with runtime fields computed at query
    time: host, hour-of-day, html payload KiB, analyzer token count."""
    return (
        corpus.select(
            "doc_id",
            F.regexp_extract("url", r"^[a-z]+://([^/]+)", 1).alias("host"),
            F.hour("warc_ts").alias("hour"),
            F.round(F.octet_length("html") / 1024.0, 3).alias("html_kb"),
            F.size(tokens("text")).alias("n_tokens"),
        )
        .orderBy("doc_id")
        .limit(limit)
    )


def runtime_fields_page_sql(limit: int = 20) -> str:
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       CAST(hour(warc_ts) AS INTEGER) AS hour,
       round(octet_length(html) / 1024.0, 3) AS html_kb,
       CAST({DOC_LEN_SQL} AS INTEGER) AS n_tokens
FROM corpus
ORDER BY doc_id
LIMIT {limit}
"""


def analyze_text(spark, text: str) -> DataFrame:
    """ES `_analyze` API: run the engine analyzer over a literal string
    and return (position, token, start_offset, end_offset) — the exact
    pipeline every indexed document goes through (functions/tokenizer.py
    — the analyzer the reference outsourced to ES,
    output/elasticsearch.py:33), so users can debug why a query does or
    does not match.  Offsets are 0-based character offsets into the
    original string (the analyzer is length-preserving: lowercase only),
    taken straight from the token regex match spans.  Driver-side work
    on one request-sized string; the DataFrame only satisfies the API
    contract — no scan, no index access."""
    from ..functions.tokenizer import _PY_TOKEN_RE

    rows = [
        (i + 1, m.group(0), m.start(), m.end())
        for i, m in enumerate(_PY_TOKEN_RE.finditer(text.lower()))
    ]
    return spark.createDataFrame(
        rows, "position long, token string, start_offset long, end_offset long"
    )


def analyze_text_sql(text: str) -> str:
    """DuckDB oracle: same split, offsets recovered by a recursive
    left-to-right scan (each token's start is its first occurrence at or
    after the previous token's end — exact because the analyzer is
    length-preserving and tokens appear in source order)."""
    from ..functions.tokenizer import TOKEN_SPLIT_RE

    lit = text.replace("'", "''")
    return f"""
WITH RECURSIVE src AS (
  SELECT lower('{lit}') AS low,
         list_filter(regexp_split_to_array(lower('{lit}'),
             '{TOKEN_SPLIT_RE}'), x -> x <> '') AS ts
),
scan AS (
  SELECT CAST(1 AS BIGINT) AS position, ts[1] AS token,
         CAST(instr(low, ts[1]) - 1 AS BIGINT) AS start_offset,
         CAST(instr(low, ts[1]) - 1 + length(ts[1]) AS BIGINT) AS end_offset
  FROM src WHERE len(ts) >= 1
  UNION ALL
  SELECT s.position + 1, src.ts[s.position + 1],
         s.end_offset
           + instr(substr(src.low, s.end_offset + 1),
                   src.ts[s.position + 1]) - 1,
         s.end_offset
           + instr(substr(src.low, s.end_offset + 1),
                   src.ts[s.position + 1]) - 1
           + length(src.ts[s.position + 1])
  FROM scan s, src
  WHERE s.position < len(src.ts)
)
SELECT position, token, start_offset, end_offset FROM scan ORDER BY position
"""


def terms_enum(index: dict, prefix: str, size: int = 20):
    """ES ``_terms_enum`` API: up to ``size`` index terms starting with
    ``prefix``, in term order — the search-as-you-type/autocomplete
    enumeration served from the term dictionary (Lucene's terms index).

    Reads ONLY the term_dict relation (vocab-sized, never the corpus);
    with the sorted on-disk layout (index/build.py term_dict_sorted) the
    scan prunes to the prefix's row groups.  Output: (term).
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    return (
        index["term_dict"]
        .where(F.col("term").startswith(prefix))
        .select("term")
        .orderBy("term")
        .limit(size)
    )


def terms_enum_sql(prefix: str, size: int = 20) -> str:
    from ..corpus import CORPUS_CTE  # noqa: PLC0415
    from ..functions.tokenizer import TOKENS_CTE  # noqa: PLC0415

    # literal-prefix semantics: % and _ in the prefix are characters, not
    # LIKE wildcards (tokens can contain _? no — the tokenizer strips it;
    # escaped anyway so the oracle matches startswith for ANY prefix)
    esc = (
        prefix.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        .replace("'", "''")
    )
    return f"""
WITH {CORPUS_CTE.strip()},
{TOKENS_CTE.strip()}
SELECT DISTINCT term FROM tokens
WHERE term LIKE '{esc}%' ESCAPE '\\'
ORDER BY term LIMIT {size}"""


def mget_page(corpus: DataFrame, ids: list[int]) -> DataFrame:
    """ES `_mget`: fetch documents by id list, one row per REQUESTED id
    in request order semantics (here: id asc — the engine's stable
    order), with `found` false for absent ids (the ES envelope).

    Scale shape: the id list broadcasts and the corpus side is a pushed
    `doc_id IN (...)`-shaped semi scan via the broadcast join — a point
    lookup per id on a doc_id-sorted store (the docstore row-group GET
    serves the same request driver-locally)."""
    if not ids:
        raise ValueError("mget needs a non-empty id list")
    uniq = sorted({int(i) for i in ids})
    spark = corpus.sparkSession
    req = spark.createDataFrame([(i,) for i in uniq], "doc_id long")
    hits = corpus.join(F.broadcast(req), "doc_id", "left_semi").select(
        "doc_id", "url", "lang", "n_chars"
    )
    return (
        req.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.col("url").isNotNull().alias("found"),
            "url",
            "lang",
            "n_chars",
        )
        .orderBy("doc_id")
    )


def mget_page_sql(ids: list[int]) -> str:
    if not ids:
        raise ValueError("mget needs a non-empty id list")
    uniq = sorted({int(i) for i in ids})
    vals = ", ".join(f"({i})" for i in uniq)
    return f"""
WITH {CORPUS_CTE.strip()},
req AS (SELECT * FROM (VALUES {vals}) AS v(doc_id))
SELECT CAST(r.doc_id AS BIGINT) AS doc_id,
       c.url IS NOT NULL AS found,
       c.url, c.lang, c.n_chars
FROM req r LEFT JOIN corpus c ON r.doc_id = c.doc_id
ORDER BY r.doc_id
"""
