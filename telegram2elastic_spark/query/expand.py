"""Multi-term query rewrites: ES `prefix` / `wildcard` queries.

The reference hands ranked retrieval to Elasticsearch (output/
elasticsearch.py:33), whose query strings support prefix and wildcard
terms; Lucene rewrites those into a boolean over the first
`max_expansions` matching terms in term-dictionary order (MultiTermQuery
scoring_boolean rewrite).  Here the expansion runs against the index's
term dictionary and the expanded terms feed the same block-max WAND
kernel as any hand-written disjunction — scores are ordinary per-term
BM25 sums, rank-identical to running the expanded term list directly.

Scale shape: the hash-bucketed term_dict layout cannot prune a prefix
scan (xxhash64 destroys order), so write_index also persists
`term_dict_sorted` — the same vocab-sized table range-partitioned and
sorted by term.  A prefix expansion pushes StringStartsWith into that
parquet scan, where row-group min/max statistics on the sorted column
skip every row group outside the prefix's range (the FST-walk analogue).
Expansion output is <= max_expansions terms (tiny, driver-collected) —
postings are never touched until the WAND stage, which prunes by
term_bucket as usual.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .wand import wand_topk

DEFAULT_MAX_EXPANSIONS = 50  # Lucene's IndexSearcher default


def _dict_for_scan(index: dict) -> DataFrame:
    """Prefer the sorted layout (row-group pruning); in-memory indexes and
    pre-round-3 on-disk indexes fall back to the full term_dict scan."""
    return index.get("term_dict_sorted", index["term_dict"])


def expand_prefix(
    index: dict, prefix: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS
) -> list[str]:
    """Terms starting with `prefix`, in term order, capped at
    max_expansions — Lucene's term-enum order for multi-term rewrites."""
    rows = (
        _dict_for_scan(index)
        .filter(F.col("term").startswith(prefix))
        .select("term")
        .orderBy("term")
        .limit(int(max_expansions))
        .collect()
    )
    return [r["term"] for r in rows]


def wildcard_regex(pattern: str) -> str:
    """ES wildcard pattern (`*` = any run, `?` = one char) -> anchored
    regex, everything else literal-escaped.  The same regex runs on Spark
    (Java rlike) and DuckDB (RE2) — only portable constructs emitted."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def expand_wildcard(
    index: dict, pattern: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS
) -> list[str]:
    """Terms matching an ES wildcard pattern, term order, capped.  The
    literal prefix before the first wildcard still prunes the sorted-dict
    scan (StartsWith pushdown); the regex only runs on survivors."""
    lit_prefix = re.match(r"^[^*?]*", pattern).group(0)
    df = _dict_for_scan(index)
    if lit_prefix:
        df = df.filter(F.col("term").startswith(lit_prefix))
    rows = (
        df.filter(F.col("term").rlike(wildcard_regex(pattern)))
        .select("term")
        .orderBy("term")
        .limit(int(max_expansions))
        .collect()
    )
    return [r["term"] for r in rows]


def _empty(index: dict) -> DataFrame:
    return index["doc_map"].sparkSession.createDataFrame(
        [], "doc_id long, url string, score double"
    )


def prefix_topk(
    index: dict,
    prefix: str,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    doc_filter: str | None = None,
) -> DataFrame:
    """ES `prefix` query with scoring_boolean rewrite: expand against the
    term dictionary, then rank with the standard WAND disjunction."""
    terms = expand_prefix(index, prefix, max_expansions)
    if not terms:
        return _empty(index)
    return wand_topk(index, terms, k=k, doc_filter=doc_filter)


def wildcard_topk(
    index: dict,
    pattern: str,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    doc_filter: str | None = None,
) -> DataFrame:
    """ES `wildcard` query, same rewrite as prefix_topk."""
    terms = expand_wildcard(index, pattern, max_expansions)
    if not terms:
        return _empty(index)
    return wand_topk(index, terms, k=k, doc_filter=doc_filter)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _expanded_bm25_sql(
    qterms_pred: str, k: int, max_expansions: int, order_sql: str = "term"
) -> str:
    """Relational BM25 where the query-term set is computed IN SQL from the
    corpus vocabulary (mirrors the engine's term-dict expansion: the term
    dictionary IS the distinct corpus vocabulary).  `order_sql` is the
    expansion cap order — term order for prefix/wildcard/regexp, (edit
    distance, term) for fuzzy."""
    from ..corpus import CORPUS_CTE
    from ..functions.tokenizer import DOC_LEN_SQL, TOKEN_SPLIT_RE
    from .bm25 import B, K1, SCORE_DECIMALS

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
qterms AS (
  SELECT term FROM (SELECT DISTINCT term FROM toks) WHERE {qterms_pred}
  ORDER BY {order_sql} LIMIT {max_expansions}
),
tf_all AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM qterms) GROUP BY doc_id, term
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
)
SELECT s.doc_id, d.url, s.score
FROM scored s JOIN dl d ON s.doc_id = d.doc_id
ORDER BY s.score DESC, s.doc_id ASC
LIMIT {k}
"""


def prefix_topk_sql(
    prefix: str, k: int = 10, max_expansions: int = DEFAULT_MAX_EXPANSIONS
) -> str:
    """DuckDB oracle for prefix_topk.  LIKE with escaped %/_ so the prefix
    is treated literally, exactly like startswith."""
    esc = prefix.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    pred = f"term LIKE {_sql_quote(esc + '%')} ESCAPE '\\'"
    return _expanded_bm25_sql(pred, k, max_expansions)


def wildcard_topk_sql(
    pattern: str, k: int = 10, max_expansions: int = DEFAULT_MAX_EXPANSIONS
) -> str:
    """DuckDB oracle for wildcard_topk (same anchored regex as the
    engine)."""
    pred = f"regexp_matches(term, {_sql_quote(wildcard_regex(pattern))})"
    return _expanded_bm25_sql(pred, k, max_expansions)


def expand_fuzzy(
    index: dict,
    word: str,
    fuzziness: int = 2,
    prefix_length: int = 1,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> list[str]:
    """ES `fuzzy` query expansion: vocabulary terms within `fuzziness`
    Levenshtein edits of `word`, closest first (distance asc, term asc),
    capped at max_expansions.  `prefix_length` (Lucene's default-style
    shared-prefix requirement) keeps the sorted-dict StartsWith pushdown
    in play, so the edit-distance check runs on the pruned prefix range
    only — the DFA-intersection analogue."""
    w = word.lower()
    df = _dict_for_scan(index)
    if prefix_length > 0:
        df = df.filter(F.col("term").startswith(w[: int(prefix_length)]))
    rows = (
        df.withColumn("dist", F.levenshtein(F.col("term"), F.lit(w)))
        .filter(F.col("dist") <= int(fuzziness))
        .select("term", "dist")
        .orderBy("dist", "term")
        .limit(int(max_expansions))
        .collect()
    )
    return [r["term"] for r in rows]


def expand_regexp(
    index: dict, pattern: str, max_expansions: int = DEFAULT_MAX_EXPANSIONS
) -> list[str]:
    """ES `regexp` query expansion: terms fully matching the (anchored)
    pattern, term order, capped.  The pattern must stay in the
    Java-regex/RE2 common subset so the engine and the oracle agree; a
    literal prefix (regex metachars absent) still prunes the sorted-dict
    scan."""
    lit_prefix = re.match(r"^[A-Za-z0-9]*", pattern).group(0)
    df = _dict_for_scan(index)
    if lit_prefix:
        df = df.filter(F.col("term").startswith(lit_prefix.lower()))
    rows = (
        df.filter(F.col("term").rlike("^(?:" + pattern + ")$"))
        .select("term")
        .orderBy("term")
        .limit(int(max_expansions))
        .collect()
    )
    return [r["term"] for r in rows]


def fuzzy_term_topk(
    index: dict,
    word: str,
    k: int = 10,
    fuzziness: int = 2,
    prefix_length: int = 1,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    doc_filter: str | None = None,
) -> DataFrame:
    """ES `fuzzy` query with scoring_boolean rewrite (like prefix_topk:
    expansions feed the standard WAND disjunction as plain BM25 terms)."""
    terms = expand_fuzzy(index, word, fuzziness, prefix_length, max_expansions)
    if not terms:
        return _empty(index)
    return wand_topk(index, terms, k=k, doc_filter=doc_filter)


def regexp_topk(
    index: dict,
    pattern: str,
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
    doc_filter: str | None = None,
) -> DataFrame:
    """ES `regexp` query, same rewrite."""
    terms = expand_regexp(index, pattern, max_expansions)
    if not terms:
        return _empty(index)
    return wand_topk(index, terms, k=k, doc_filter=doc_filter)


def fuzzy_term_topk_sql(
    word: str,
    k: int = 10,
    fuzziness: int = 2,
    prefix_length: int = 1,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> str:
    """DuckDB oracle: same Levenshtein predicate and (distance, term)
    expansion order."""
    w = word.lower()
    pred = f"levenshtein(term, {_sql_quote(w)}) <= {int(fuzziness)}"
    if prefix_length > 0:
        esc = (
            w[: int(prefix_length)]
            .replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        )
        pred += f" AND term LIKE {_sql_quote(esc + '%')} ESCAPE '\\'"
    return _expanded_bm25_sql(
        pred, k, max_expansions,
        order_sql=f"levenshtein(term, {_sql_quote(w)}), term",
    )


def regexp_topk_sql(
    pattern: str, k: int = 10, max_expansions: int = DEFAULT_MAX_EXPANSIONS
) -> str:
    pred = f"regexp_matches(term, {_sql_quote('^(?:' + pattern + ')$')})"
    return _expanded_bm25_sql(pred, k, max_expansions)


def match_bool_prefix_topk(
    index: dict,
    terms: list[str],
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """ES `match_bool_prefix` (the search-as-you-type query): every term
    but the last is a plain term clause, the last is a PREFIX clause,
    all combined as a bool should — each clause scores independently
    with its own idf and the doc score is the sum (contrast
    match_phrase_prefix, which requires the phrase positionally).  The
    prefix clause uses the scoring_boolean rewrite (prefix_topk's
    contract): expansion against the sorted term dictionary in term-enum
    order, capped at max_expansions.  The rewritten query is exactly a
    WAND disjunction over (full terms) U (expanded terms) — served by
    the verified wand_topk path, so block-max pruning applies."""
    *full, last = terms
    exp = expand_prefix(index, last, max_expansions)
    all_terms = sorted(set(full) | set(exp))
    if not all_terms:
        return _empty(index)
    return wand_topk(index, all_terms, k=k)


def match_bool_prefix_sql(
    terms: list[str],
    k: int = 10,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> str:
    """DuckDB oracle: qterms = literal full terms UNION the capped
    prefix expansion over the corpus vocabulary."""
    *full, last = terms
    esc = last.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    pred = f"term LIKE {_sql_quote(esc + '%')} ESCAPE '\\'"
    lits = ", ".join(_sql_quote(t) for t in sorted(set(full))) or "NULL"
    extra = f"SELECT unnest([{lits}]) AS term" if full else None
    base = _expanded_bm25_sql(pred, k, max_expansions)
    if not extra:
        return base
    # splice the literal-terms union into the qterms CTE; the capped
    # expansion is wrapped so ORDER BY/LIMIT bind to it, not the union
    old = (
        f"  SELECT term FROM (SELECT DISTINCT term FROM toks) WHERE {pred}\n"
        f"  ORDER BY term LIMIT {max_expansions}\n),"
    )
    assert old in base, "qterms CTE shape changed"
    new = (
        "  SELECT term FROM (\n"
        f"    SELECT term FROM (SELECT DISTINCT term FROM toks) WHERE {pred}\n"
        f"    ORDER BY term LIMIT {max_expansions})\n"
        f"  UNION {extra}\n),"
    )
    return base.replace(old, new)


def terms_enum(
    index: dict,
    prefix: str = "",
    search_after: str | None = None,
    size: int = 10,
) -> DataFrame:
    """ES `_terms_enum` API: enumerate index terms matching a prefix, in
    term order, with keyset pagination (`search_after` = last term of the
    previous page) — the low-latency autocomplete primitive that reads
    ONLY the term dictionary (never postings, never docs).

    Returns (term, df, cf).  Scan shape: the sorted dictionary artifact
    gives StartsWith pushdown + range-partition pruning (the FST-walk
    analogue, same path as prefix_topk); the cursor is one more pushed
    range predicate, so page N costs what page 1 costs."""
    d = _dict_for_scan(index).filter(F.col("term").startswith(prefix))
    if search_after is not None:
        d = d.filter(F.col("term") > search_after)
    return (
        d.select("term", "df", "cf")
        .orderBy("term")
        .limit(int(size))
    )


def terms_enum_sql(
    prefix: str = "", search_after: str | None = None, size: int = 10
) -> str:
    from ..corpus import CORPUS_CTE
    from ..functions.tokenizer import TOKEN_SPLIT_RE

    esc = prefix.replace("'", "''")
    after = (
        f"AND term > '" + search_after.replace("'", "''") + "'"
        if search_after is not None
        else ""
    )
    return f"""
WITH {CORPUS_CTE.strip()},
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
td AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
         CAST(count(*) AS BIGINT) AS cf
  FROM toks GROUP BY term
)
SELECT term, df, cf FROM td
WHERE starts_with(term, '{esc}') {after}
ORDER BY term LIMIT {int(size)}
"""


def match_fuzzy_topk(
    index: dict,
    words: list[str],
    k: int = 10,
    fuzziness: int = 2,
    prefix_length: int = 0,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """ES `match` query with `fuzziness` set: each analyzed token
    rewrites to its fuzzy expansion set, and the expansions of one token
    score as ONE blended clause (Lucene's top_terms_blended_freqs
    rewrite: the clause uses the max docFreq across its expansions —
    exactly SynonymQuery semantics), clauses summing like any match.

    Composition: expansion = the verified fuzzy term-dict scan
    (expand_fuzzy — Levenshtein over the sorted dictionary, pruned by
    the shared-prefix pushdown when prefix_length > 0); scoring = the
    verified synonym kernel (termset.synonym_topk), whose per-group
    tf = member sum / df = member max IS the blended-freqs contract.
    A token with no expansions contributes nothing (ES: zero clauses).
    Scale: expansion is dictionary-bounded and driver-collected
    (<= max_expansions per token); scoring touches only the expanded
    terms' postings."""
    from .termset import synonym_topk

    groups = [
        expand_fuzzy(index, w, fuzziness, prefix_length, max_expansions)
        for w in words
    ]
    groups = [g for g in groups if g]
    if not groups:
        spark = index["doc_map"].sparkSession
        return spark.createDataFrame([], "doc_id long, url string, score double")
    return synonym_topk(index, groups, k=k)


def match_fuzzy_topk_sql(
    words: list[str],
    k: int = 10,
    fuzziness: int = 2,
    prefix_length: int = 0,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> str:
    """DuckDB oracle: per-token expansion computed IN SQL from the corpus
    vocabulary (same (distance, term) cap order as expand_fuzzy), then
    blended-clause scoring — per clause df = max member df, tf = member
    sum — summed across clauses and rounded once, mirroring the synonym
    kernel's accumulation."""
    from ..corpus import CORPUS_CTE
    from ..functions.tokenizer import DOC_LEN_SQL, TOKEN_SPLIT_RE
    from .bm25 import B, K1, SCORE_DECIMALS

    q_ctes, g_blocks, u_parts = [], [], []
    for i, w in enumerate(words):
        wl = w.lower()
        pred = f"levenshtein(term, {_sql_quote(wl)}) <= {int(fuzziness)}"
        if prefix_length > 0:
            esc = (
                wl[: int(prefix_length)]
                .replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
            )
            pred += f" AND term LIKE {_sql_quote(esc + '%')} ESCAPE '\\'"
        q_ctes.append(
            f"""q{i} AS (
  SELECT term FROM vocab WHERE {pred}
  ORDER BY levenshtein(term, {_sql_quote(wl)}), term LIMIT {int(max_expansions)}
)"""
        )
        g_blocks.append(
            f"""gdf{i} AS (
  SELECT max(df) AS df_g FROM tdf WHERE term IN (SELECT term FROM q{i})
),
gw{i} AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n - gdf{i}.df_g + 0.5) / (gdf{i}.df_g + 0.5))
         * sum(tf.tf) * ({K1} + 1.0)
         / (sum(tf.tf) + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl)) AS w
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN stats CROSS JOIN gdf{i}
  WHERE tf.term IN (SELECT term FROM q{i})
  GROUP BY tf.doc_id, gdf{i}.df_g, stats.n, stats.avgdl, dl.doc_len
)"""
        )
        u_parts.append(f"SELECT * FROM gw{i}")
    q_ctes_sql = ",\n".join(q_ctes)
    g_blocks_sql = ",\n".join(g_blocks)
    allq_sql = " UNION ".join(f"SELECT term FROM q{i}" for i in range(len(words)))
    union_sql = " UNION ALL ".join(u_parts)
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
vocab AS (SELECT DISTINCT term FROM toks),
{q_ctes_sql},
allq AS ({allq_sql}),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN (SELECT term FROM allq) GROUP BY doc_id, term
),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
{g_blocks_sql},
u AS ({union_sql}),
scored AS (
  SELECT doc_id, round(sum(w), {SCORE_DECIMALS}) AS score
  FROM u GROUP BY doc_id
)
SELECT s.doc_id, dl.url, s.score
FROM scored s JOIN dl ON s.doc_id = dl.doc_id
ORDER BY s.score DESC, s.doc_id ASC
LIMIT {int(k)}
"""
