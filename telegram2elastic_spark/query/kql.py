"""KQL — the Kibana Query Language (the Discover search-box default).

The reference's serving surface is Kibana over ES (README.md:5); since
7.0 the Discover/dashboard filter bar speaks KQL, not Lucene syntax
(https://www.elastic.co/guide/en/kibana/current/kuery-query.html).  KQL
is FILTER CONTEXT only — no scoring — so the natural operator is the
Discover page itself: predicate + newest-first sort + page limit.

Supported subset (out-of-subset syntax raises ValueError — the KQL
parse-error banner):

    spark merge                 bare terms  -> match on text (terms ORed,
                                               the ES `match` default)
    "merge batch"               bare phrase -> match_phrase on text
    lang:en  source:src2        keyword equality
    text:spark  text:"a b"      analyzed match / match_phrase
    url:*page/7*                wildcard (LIKE) on keyword fields
    text:sp*                    wildcard over analyzed tokens
    n_chars >= 200  doc_id < 9  range operators (numbers; warc_ts via
                                quoted timestamp literal)
    lang:*                      exists (IS NOT NULL)
    lang:(en or de)             value group (or / and inside the parens)
    and / or / not, parens      boolean composition (case-insensitive,
                                explicit — KQL has no implicit operator
                                between clauses)

Both emitters render the SAME AST (the essql dual-rendering discipline):
text clauses become token-array expressions over the engine tokenizer
(reusing the ES|QL MATCH/MATCH_PHRASE emitters — query/esql.py), keyword
and range clauses become plain comparisons, so the oracle cannot drift
from the engine.

Scale shape: one pushed-filter scan + TakeOrderedAndProject — keyword and
range predicates reach the parquet scan; token predicates evaluate inside
whole-stage codegen (no UDF, no shuffle).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import py_tokenize
from .esql import (
    _lit_duck,
    _lit_spark,
    _like_pattern,
    _phrase_expr,
    _tokens_duck,
    _tokens_spark,
)

KEYWORD_COLS = ("url", "lang", "source")
NUMERIC_COLS = ("doc_id", "n_chars")
TS_COLS = ("warc_ts",)
TEXT_COL = "text"
ALL_COLS = KEYWORD_COLS + NUMERIC_COLS + TS_COLS + (TEXT_COL,)

_TOK = re.compile(
    r"\s*(?:"
    r'(?P<q>"(?:[^"\\]|\\.)*")'
    r"|(?P<op><=|>=|<|>|:|\(|\))"
    r"|(?P<w>[^\s():<>\"]+)"
    r")"
)


def _lex(q: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(q):
        m = _TOK.match(q, pos)
        if m is None:
            if q[pos:].strip() == "":
                break
            raise ValueError(f"cannot lex KQL at: {q[pos:pos + 20]!r}")
        pos = m.end()
        if m.group("q") is not None:
            body = m.group("q")[1:-1]
            out.append(("quoted", re.sub(r'\\(.)', r"\1", body)))
        elif m.group("op") is not None:
            out.append(("op", m.group("op")))
        else:
            w = m.group("w")
            if w.lower() in ("and", "or", "not"):
                out.append(("kw", w.lower()))
            else:
                out.append(("word", w))
    return out


# ------------------------------- AST -----------------------------------

# nodes: ("or"|"and", [children]) | ("not", child)
#        ("match", field, value, quoted: bool)  value may carry * wildcards
#        ("range", field, op, value)
#        ("exists", field)
#        ("bare", [words], quoted: bool)


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t


def parse_kql(q: str):
    p = _P(_lex(q))
    ast = _or(p)
    if p.peek()[0] != "eof":
        raise ValueError(f"trailing KQL input at: {p.peek()[1]!r}")
    _render(ast, "spark")  # value/type validation happens at render time
    return ast


def _or(p):
    xs = [_and(p)]
    while p.peek() == ("kw", "or"):
        p.next()
        xs.append(_and(p))
    return xs[0] if len(xs) == 1 else ("or", xs)


def _and(p):
    xs = [_not(p)]
    while p.peek() == ("kw", "and"):
        p.next()
        xs.append(_not(p))
    return xs[0] if len(xs) == 1 else ("and", xs)


def _not(p):
    if p.peek() == ("kw", "not"):
        p.next()
        return ("not", _not(p))
    return _primary(p)


def _primary(p):
    t, v = p.peek()
    if (t, v) == ("op", "("):
        p.next()
        e = _or(p)
        if p.next() != ("op", ")"):
            raise ValueError("unbalanced parenthesis in KQL")
        return e
    if t == "quoted":
        p.next()
        return ("bare", py_tokenize(v), True)
    if t != "word":
        raise ValueError(f"unexpected KQL token: {v!r}")
    p.next()
    nt, nv = p.peek()
    if (nt, nv) == ("op", ":"):
        field = v.lower()
        if field not in ALL_COLS:
            raise ValueError(f"unknown KQL field: {v!r}")
        p.next()
        return _field_value(p, field)
    if nt == "op" and nv in ("<", "<=", ">", ">="):
        field = v.lower()
        if field not in NUMERIC_COLS + TS_COLS:
            raise ValueError(f"range on non-orderable field: {v!r}")
        p.next()
        lt, lv = p.next()
        if field in TS_COLS:
            if lt != "quoted":
                raise ValueError("timestamp ranges need a quoted literal")
            return ("range", field, nv, ("ts", lv))
        if lt != "word" or not re.fullmatch(r"\d+(\.\d+)?", lv):
            raise ValueError(f"range needs a numeric literal, got {lv!r}")
        return ("range", field, nv, ("num", lv))
    # bare term(s): swallow consecutive plain words into ONE match clause
    words = list(py_tokenize(v))
    while p.peek()[0] == "word" and not (
        p.toks[p.i + 1:p.i + 2] and p.toks[p.i + 1] in
        [("op", ":"), ("op", "<"), ("op", "<="), ("op", ">"), ("op", ">=")]
    ):
        words.extend(py_tokenize(p.next()[1]))
    if not words:
        raise ValueError("empty bare term")
    return ("bare", words, False)


def _field_value(p, field):
    t, v = p.peek()
    if (t, v) == ("op", "("):
        p.next()
        vals = [_one_value(p, field)]
        mode = None
        while p.peek()[0] == "kw" and p.peek()[1] in ("or", "and"):
            m = p.next()[1]
            if mode is None:
                mode = m
            elif mode != m:
                raise ValueError("mixed or/and inside a value group")
            vals.append(_one_value(p, field))
        if p.next() != ("op", ")"):
            raise ValueError("unbalanced parenthesis in value group")
        return (mode or "or", vals)
    return _one_value(p, field)


def _one_value(p, field):
    t, v = p.next()
    if t == "quoted":
        return ("match", field, v, True)
    if t != "word":
        raise ValueError(f"bad KQL value: {v!r}")
    if v == "*":
        return ("exists", field)
    return ("match", field, v, False)


# ----------------------------- rendering --------------------------------


def _lit(v, dialect):
    return _lit_spark(v) if dialect == "spark" else _lit_duck(v)


def _token_any(field, terms, dialect):
    """Containment of ANY of `terms` in the analyzed token stream — ES
    `match` (default operator OR) in filter context."""
    if len(terms) == 1 and "*" not in terms[0]:
        tk = _tokens_spark(field) if dialect == "spark" else _tokens_duck(field)
        fn = "array_contains" if dialect == "spark" else "list_contains"
        return f"{fn}({tk}, {_lit(terms[0], dialect)})"
    parts = []
    for t in terms:
        if "*" in t:
            parts.append(_token_wild(field, t, dialect))
        else:
            tk = _tokens_spark(field) if dialect == "spark" \
                else _tokens_duck(field)
            fn = "array_contains" if dialect == "spark" else "list_contains"
            parts.append(f"{fn}({tk}, {_lit(t, dialect)})")
    return "(" + " OR ".join(parts) + ")"


def _token_wild(field, pat, dialect):
    """Wildcard over analyzed tokens: any token LIKE the pattern."""
    like = _like_pattern(pat.lower())
    if dialect == "spark":
        tk = _tokens_spark(field)
        return f"exists({tk}, t -> t LIKE {_lit_spark(like)})"
    tk = _tokens_duck(field)
    return (f"(len(list_filter({tk}, t -> t LIKE "
            f"{_lit_duck(like)})) > 0)")


def _render(node, dialect) -> str:
    kind = node[0]
    if kind in ("or", "and"):
        op = " OR " if kind == "or" else " AND "
        return "(" + op.join(_render(x, dialect) for x in node[1]) + ")"
    if kind == "not":
        return "(NOT " + _render(node[1], dialect) + ")"
    if kind == "bare":
        _, words, quoted = node
        if quoted and len(words) > 1:
            return _phrase_expr(TEXT_COL, words, dialect)
        return _token_any(TEXT_COL, words, dialect)
    if kind == "exists":
        return f"{node[1]} IS NOT NULL"
    if kind == "range":
        _, field, op, (lt, lv) = node
        lit = f"TIMESTAMP '{lv}'" if lt == "ts" else lv
        return f"{field} {op} {lit}"
    if kind == "match":
        _, field, value, quoted = node
        if field == TEXT_COL:
            toks = py_tokenize(value) if "*" not in value else [value.lower()]
            if not toks:
                raise ValueError(f"KQL text value tokenizes empty: {value!r}")
            if quoted and len(toks) > 1:
                return _phrase_expr(TEXT_COL, toks, dialect)
            return _token_any(TEXT_COL, toks, dialect)
        if field in NUMERIC_COLS:
            if not re.fullmatch(r"\d+(\.\d+)?", value):
                raise ValueError(f"numeric field needs a number: {value!r}")
            return f"{field} = {value}"
        if field in TS_COLS:
            return f"{field} = TIMESTAMP '{value}'"
        # keyword field: exact term, or LIKE when the value carries *
        if "*" in value:
            return f"{field} LIKE {_lit(_like_pattern(value), dialect)}"
        return f"{field} = {_lit(value, dialect)}"
    raise ValueError(f"cannot render KQL node {node!r}")


def kql_predicate(q: str, dialect: str = "spark") -> str:
    """Compile a KQL string to a boolean SQL expression (filter context)."""
    return _render(parse_kql(q), dialect)


def kql_search(corpus: DataFrame, q: str, k: int = 20) -> DataFrame:
    """The Kibana Discover page: KQL filter, newest-first, top k.

    Returns (doc_id, url, warc_ts) ordered by warc_ts desc, doc_id desc
    (the deterministic tie-break both engines share).
    """
    pred = kql_predicate(q, "spark")
    return (
        corpus.filter(F.expr(pred))
        .orderBy(F.col("warc_ts").desc(), F.col("doc_id").desc())
        .limit(k)
        .select("doc_id", "url", "warc_ts")
    )


def kql_search_sql(q: str, k: int = 20) -> str:
    """DuckDB oracle for kql_search — same AST, duck rendering."""
    pred = kql_predicate(q, "duck")
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id, url, warc_ts FROM corpus
WHERE {pred}
ORDER BY warc_ts DESC, doc_id DESC
LIMIT {int(k)}
"""


def kql_count(corpus: DataFrame, q: str) -> DataFrame:
    """The Discover hit-count readout: matching-doc count for a KQL bar."""
    pred = kql_predicate(q, "spark")
    return corpus.filter(F.expr(pred)).agg(
        F.count(F.lit(1)).alias("hits")
    )


def kql_count_sql(q: str) -> str:
    pred = kql_predicate(q, "duck")
    return (f"WITH {CORPUS_CTE.strip()} "
            f"SELECT CAST(count(*) AS BIGINT) AS hits "
            f"FROM corpus WHERE {pred}")


def validate_kql(q: str) -> dict:
    """Parse-only validation (the Kibana syntax banner): never raises."""
    try:
        parse_kql(q)
        return {"valid": True, "spark": kql_predicate(q, "spark")}
    except ValueError as e:
        return {"valid": False, "error": str(e)}
