"""ES|QL — Elasticsearch's piped query language, compiled to Spark.

The reference stack serves Kibana over Elasticsearch (README.md:5); since
8.11 that surface includes ES|QL (`POST /_query {"query": "FROM idx | ..."}`),
a piped language executed by ES's own compute engine over doc values.  The
Spark-native analogue is a *compiler*: one pass parses the pipe chain into a
small typed AST, then two emitters lower every stage —

* onto a DataFrame chain (each stage is a declarative `filter` /
  `withColumn` / `groupBy().agg` / `orderBy().limit` — Catalyst fuses the
  EVAL/WHERE/KEEP stages into one codegen'd map and pushes filters to the
  scan, so `FROM corpus | WHERE lang == "en" | STATS ...` reads only the
  pruned columns: the 100 TB shape is scan → map → one hash agg), and
* onto a DuckDB CTE chain (`s0 AS (...), s1 AS (...)`) used as the oracle —
  the text is dialect-translated per node (`==`→`=`, LIKE wildcards
  `*`/`?`→`%`/`_`, `SPLIT`→`string_split`, span literals →
  `date_trunc('day', ..)`), so DuckDB independently executes the same
  logical program.

Supported commands (the stable ES|QL core):
  FROM <corpus|documents|events|embeddings>
  TS events                      9.1 time-series source: STATS items become
                                 two-level `outer(inner_over_time(field))`
                                 — inner per series (the dims _tsid) within
                                 each BY group, outer across series.  RATE
                                 is counter-only (reset-compensated
                                 increase / observed seconds), the
                                 *_OVER_TIME family is gauge-only.  Scale
                                 shape: two hash aggregations (series-local
                                 first — partial states shuffle, never raw
                                 samples twice)
  | WHERE <expr>                 boolean expr; full-text MATCH(field, "q"),
                                 MATCH_PHRASE(field, "a b") (ES|QL 9.1,
                                 consecutive analyzed terms) and
                                 TERM(field, "t") (9.1, query side NOT
                                 analyzed — must be in index form to hit)
  | WHERE KNN(field, [v...], k)  ES|QL 9.2 kNN: keep the k nearest rows by
                                 exact cosine, append _score; must be the
                                 WHERE's only expression (a top-k is not a
                                 per-row predicate); the query vector may
                                 be TEXT_EMBEDDING("text") — the
                                 deterministic stub inference endpoint,
                                 resolved at compile time
  | EVAL a = expr, b = expr      later items may use earlier ones; replaces
  | STATS agg [, ...] [BY k...]  COUNT(*) COUNT SUM AVG MIN MAX
                                 COUNT_DISTINCT MEDIAN PERCENTILE
  | SORT e [ASC|DESC] [, ...]
  | LIMIT n                      with a preceding SORT = TakeOrdered
  | KEEP c, ... / DROP c, ...
  | RENAME old AS new [, ...]
  | DISSECT field "%{a}://%{b}"  ingest-pipeline dissect, NULL on no-match
  | GROK field "^%{WORD:w}"      shared portable regex vocabulary
  | MV_EXPAND col                explode a multivalue column
  | ENRICH policy ON col [WITH f, ...]   enrich-policy lookup (LEFT join
                                 against a small dimension — broadcast on
                                 the Spark side, never a shuffle)
  | LOOKUP JOIN table ON col     ES 8.18 lookup join: col must exist under
                                 the SAME name on both sides; appends the
                                 lookup table's other columns (broadcast)
  | INLINESTATS agg [BY k...]    window-function aggregates: adds the agg
                                 columns WITHOUT collapsing rows (one
                                 partitioned window per BY key set)
  | SAMPLE p                     ES 8.19 probabilistic sample; determinism
                                 contract replaces ES's per-run seed with
                                 RNG-free hash membership on the row's
                                 identity column (url/doc_id/...): both
                                 engines and every re-run pick the same set
  | FORK (cmds) (cmds) ...       ES 8.19 branch union: each branch is a
                                 sub-pipeline over the SAME input; output =
                                 UNION BY NAME of the branches plus a _fork
                                 discriminator column ("fork1".."forkN");
                                 missing columns fill with NULL, branch type
                                 conflicts are compile-time errors, nesting
                                 is rejected (as in ES)
  | FUSE [RRF | LINEAR]          ES|QL 9.1 result fusion: must immediately
                                 follow FORK, every branch must produce a
                                 numeric _score; rows identical on every
                                 non-(_score,_fork) column merge into one.
                                 RRF (default): _score = sum over branches
                                 of 1/(60 + rank), rank by (_score DESC,
                                 keys ASC) inside the branch — ties share a
                                 rank so the result is partition- and
                                 engine-independent.  LINEAR: _score = sum
                                 of the branches' raw _score.  Compose with
                                 `| SORT _score DESC, <key>` for the final
                                 ranking (FUSE itself imposes no order)

STATS aggregates accept the ES 8.16 per-aggregate filter:
`STATS en = COUNT(*) WHERE lang == "en", total = COUNT(*) BY source` —
compiled to a WHEN-masked aggregate on Spark and a FILTER clause in DuckDB
(identical semantics: every supported aggregate ignores NULLs).

BUCKET(expr, 1 day) buckets timestamps by span; BUCKET(expr, width)
buckets numerics by literal width (floor(x / w) * w) — the ES|QL
grouping function, usable in EVAL and as a STATS BY input.

Expression vocabulary: literals (string/int/float/bool/NULL, `1 day` spans),
arithmetic (`/` is float division in BOTH dialects), comparisons, AND/OR/NOT,
LIKE (ES|QL `*`/`?` wildcards), RLIKE, IN, IS [NOT] NULL, and the scalar
functions in FUNCS below.  Unknown commands, functions, or columns raise
ValueError at compile time (the `_validate/query` contract) — never at run
time on an executor.

Determinism contract: a LIMIT is only reproducible under a preceding SORT
whose keys form a total order (registered pairs tie-break on doc_id);
PERCENTILE/MEDIAN emit exact interpolated values — round them with EVAL
ROUND(x, 4) before comparing engines (the agg_percentiles convention).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE, load_corpus, load_documents, load_embeddings, load_events
from ..functions.tokenizer import TOKEN_SPLIT_RE
from ..operators.ingest_pipeline import compile_dissect, compile_grok

# ---------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<str>"(?:[^"\\]|\\.)*")
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op>==|!=|<=|>=|\|\||&&|[|,()=<>+\-*/%\[\]])
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "FROM", "ROW", "WHERE", "EVAL", "STATS", "BY", "SORT", "LIMIT", "KEEP",
    "DROP", "RENAME", "AS", "DISSECT", "GROK", "MV_EXPAND",
    "ENRICH", "ON", "WITH", "LOOKUP", "JOIN", "INLINESTATS",
    "CHANGE_POINT", "COMPLETION", "RERANK",
    "SAMPLE", "FORK", "FUSE",
    "AND", "OR", "NOT", "LIKE", "RLIKE", "IN", "IS", "NULL",
    "TRUE", "FALSE", "ASC", "DESC", "NULLS", "FIRST", "LAST",
}

_SPAN_UNITS = {
    "year": "year", "years": "year", "month": "month", "months": "month",
    "week": "week", "weeks": "week", "day": "day", "days": "day",
    "hour": "hour", "hours": "hour", "minute": "minute",
    "minutes": "minute", "second": "second", "seconds": "second",
}


@dataclass
class Tok:
    kind: str  # 'str' | 'num' | 'name' | 'kw' | 'op'
    text: str


def _lex(q: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    while pos < len(q):
        m = _TOKEN_RE.match(q, pos)
        if not m:
            raise ValueError(f"ES|QL: cannot lex at ...{q[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        kind, text = m.lastgroup, m.group()
        if kind == "name" and text.upper() in _KEYWORDS:
            kind, text = "kw", text.upper()
        toks.append(Tok(kind, text))
    return toks


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", lambda m: m.group(1), body)


# ------------------------------------------------------------- AST nodes


@dataclass
class Lit:
    value: object  # str | int | float | bool | None
    typ: str


@dataclass
class Col:
    name: str
    typ: str = ""


@dataclass
class Bin:
    op: str
    left: object
    right: object
    typ: str = ""


@dataclass
class Un:
    op: str  # 'NOT' | '-'
    operand: object
    typ: str = ""


@dataclass
class Func:
    name: str
    args: list
    typ: str = ""


@dataclass
class Like:
    operand: object
    pattern: str  # raw ES|QL wildcard pattern
    regex: bool
    negated: bool
    typ: str = "bool"


@dataclass
class InList:
    operand: object
    items: list
    negated: bool
    typ: str = "bool"


@dataclass
class IsNull:
    operand: object
    negated: bool
    typ: str = "bool"


@dataclass
class Span:
    n: int
    unit: str
    typ: str = "span"


# ----------------------------------------------------- expression parser


class _P:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise ValueError("ES|QL: unexpected end of expression")
        self.i += 1
        return t

    def accept(self, kind: str, text: str | None = None) -> Tok | None:
        t = self.peek()
        if t and t.kind == kind and (text is None or t.text == text):
            self.i += 1
            return t
        return None

    def expect(self, kind: str, text: str | None = None) -> Tok:
        t = self.accept(kind, text)
        if t is None:
            raise ValueError(
                f"ES|QL: expected {text or kind}, got "
                f"{self.peek().text if self.peek() else 'EOF'!r}"
            )
        return t

    # precedence: OR < AND < NOT < cmp/LIKE/IN/IS < add < mul < unary
    def expr(self):
        return self._or()

    def _or(self):
        e = self._and()
        while self.accept("kw", "OR"):
            e = Bin("OR", e, self._and(), "bool")
        return e

    def _and(self):
        e = self._not()
        while self.accept("kw", "AND"):
            e = Bin("AND", e, self._not(), "bool")
        return e

    def _not(self):
        if self.accept("kw", "NOT"):
            return Un("NOT", self._not(), "bool")
        return self._cmp()

    def _cmp(self):
        e = self._add()
        t = self.peek()
        if t and t.kind == "op" and t.text in ("==", "!=", "<", ">", "<=", ">="):
            self.next()
            return Bin(t.text, e, self._add(), "bool")
        if t and t.kind == "kw" and t.text in ("LIKE", "RLIKE"):
            self.next()
            pat = _unquote(self.expect("str").text)
            return Like(e, pat, regex=(t.text == "RLIKE"), negated=False)
        if t and t.kind == "kw" and t.text == "NOT":
            # x NOT LIKE / NOT RLIKE / NOT IN
            save = self.i
            self.next()
            t2 = self.peek()
            if t2 and t2.kind == "kw" and t2.text in ("LIKE", "RLIKE"):
                self.next()
                pat = _unquote(self.expect("str").text)
                return Like(e, pat, regex=(t2.text == "RLIKE"), negated=True)
            if t2 and t2.kind == "kw" and t2.text == "IN":
                self.next()
                return self._in(e, negated=True)
            self.i = save
        if t and t.kind == "kw" and t.text == "IN":
            self.next()
            return self._in(e, negated=False)
        if t and t.kind == "kw" and t.text == "IS":
            self.next()
            neg = self.accept("kw", "NOT") is not None
            self.expect("kw", "NULL")
            return IsNull(e, negated=neg)
        return e

    def _in(self, e, negated: bool):
        self.expect("op", "(")
        items = [self._add()]
        while self.accept("op", ","):
            items.append(self._add())
        self.expect("op", ")")
        return InList(e, items, negated)

    def _add(self):
        e = self._mul()
        while True:
            t = self.peek()
            if t and t.kind == "op" and t.text in ("+", "-"):
                self.next()
                e = Bin(t.text, e, self._mul())
            else:
                return e

    def _mul(self):
        e = self._unary()
        while True:
            t = self.peek()
            if t and t.kind == "op" and t.text in ("*", "/", "%"):
                self.next()
                e = Bin(t.text, e, self._unary())
            else:
                return e

    def _unary(self):
        if self.accept("op", "-"):
            return Un("-", self._unary())
        return self._atom()

    def _atom(self):
        t = self.next()
        if t.kind == "str":
            return Lit(_unquote(t.text), "string")
        if t.kind == "num":
            # `1 day` span literal (DATE_TRUNC's first argument)
            nxt = self.peek()
            if (
                nxt
                and nxt.kind == "name"
                and nxt.text.lower() in _SPAN_UNITS
                and "." not in t.text
            ):
                self.next()
                return Span(int(t.text), _SPAN_UNITS[nxt.text.lower()])
            if "." in t.text:
                return Lit(float(t.text), "double")
            return Lit(int(t.text), "long")
        if t.kind == "kw" and t.text in ("TRUE", "FALSE"):
            return Lit(t.text == "TRUE", "bool")
        if t.kind == "kw" and t.text == "NULL":
            return Lit(None, "null")
        if t.kind == "op" and t.text == "[":
            # numeric multivalue literal — the KNN query-vector carrier
            vals: list[float] = []
            if not self.accept("op", "]"):
                while True:
                    neg = self.accept("op", "-") is not None
                    lt = self.expect("num")
                    v = float(lt.text)
                    vals.append(-v if neg else v)
                    if not self.accept("op", ","):
                        break
                self.expect("op", "]")
            return Lit(tuple(vals), "array<double>")
        if t.kind == "op" and t.text == "(":
            e = self.expr()
            self.expect("op", ")")
            return e
        if t.kind == "name":
            if self.accept("op", "("):
                args = []
                if not self.accept("op", ")"):
                    # COUNT(*)
                    if (
                        t.text.upper() == "COUNT"
                        and self.peek()
                        and self.peek().kind == "op"
                        and self.peek().text == "*"
                    ):
                        self.next()
                        self.expect("op", ")")
                        return Func("COUNT_STAR", [])
                    args.append(self.expr())
                    while self.accept("op", ","):
                        args.append(self.expr())
                    self.expect("op", ")")
                return Func(t.text.upper(), args)
            return Col(t.text)
        raise ValueError(f"ES|QL: unexpected token {t.text!r}")


# ----------------------------------------------------------- type check

_NUM = ("long", "double")


def _typecheck(e, schema: dict[str, str]) -> str:
    """Assign .typ throughout; raise on unknown columns/functions."""
    if isinstance(e, Lit):
        return e.typ
    if isinstance(e, Span):
        return "span"
    if isinstance(e, Col):
        if e.name not in schema:
            raise ValueError(f"ES|QL: unknown column {e.name!r}")
        e.typ = schema[e.name]
        return e.typ
    if isinstance(e, Un):
        t = _typecheck(e.operand, schema)
        e.typ = "bool" if e.op == "NOT" else t
        return e.typ
    if isinstance(e, Bin):
        lt = _typecheck(e.left, schema)
        rt = _typecheck(e.right, schema)
        if e.op in ("AND", "OR", "==", "!=", "<", ">", "<=", ">="):
            e.typ = "bool"
        elif e.op == "/":
            e.typ = "double"
        else:
            e.typ = "double" if "double" in (lt, rt) else lt
        return e.typ
    if isinstance(e, (Like, InList, IsNull)):
        _typecheck(e.operand, schema)
        if isinstance(e, InList):
            for it in e.items:
                _typecheck(it, schema)
        return "bool"
    if isinstance(e, Func):
        if e.name == "KNN":
            raise ValueError(
                "ES|QL: KNN must be the only expression of a WHERE command"
            )
        if e.name == "TEXT_EMBEDDING":
            raise ValueError(
                "ES|QL: TEXT_EMBEDDING is only supported as the KNN "
                "query vector"
            )
        if e.name not in FUNCS:
            raise ValueError(f"ES|QL: unknown function {e.name}")
        spec = FUNCS[e.name]
        lo, hi = spec["arity"]
        if not (lo <= len(e.args) <= hi):
            raise ValueError(
                f"ES|QL: {e.name} takes {lo}..{hi} args, got {len(e.args)}"
            )
        argts = [_typecheck(a, schema) for a in e.args]
        if "span" in argts and e.name not in ("DATE_TRUNC", "BUCKET"):
            raise ValueError("ES|QL: span literal outside DATE_TRUNC/BUCKET")
        if e.name == "DATE_TRUNC":
            _span(e.args[0])  # validate the span at compile time
        if e.name == "BUCKET":
            _bucket_emit(["x"], e.args, "spark")  # shape-validate
        if e.name in ("MATCH", "MATCH_PHRASE"):
            _match_terms(e.args)  # literal, non-empty query
        if e.name == "TERM":
            _term_lit(e.args)  # literal, non-empty, kept verbatim
        if e.name == "DATE_FORMAT":
            _fmt_duck(_strlit(e.args[0]))  # format validated at compile
        if e.name == "DATE_PARSE":
            _fmt_duck(_strlit(e.args[0]))
        if e.name == "MV_SORT":
            _mv_sort_desc(e.args)  # order literal validated at compile
        if e.name == "DATE_DIFF":
            _diff_unit_seconds(e.args[0])
        rt = spec["ret"]
        e.typ = rt(argts) if callable(rt) else rt
        return e.typ
    raise ValueError(f"ES|QL: bad expression node {e!r}")


# ------------------------------------------------------------- emitters


def _lit_spark(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
    if isinstance(v, tuple):
        raise ValueError(
            "ES|QL: array literals are only supported as the KNN query vector"
        )
    return repr(v)


def _lit_duck(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, tuple):
        raise ValueError(
            "ES|QL: array literals are only supported as the KNN query vector"
        )
    return repr(v)


def _like_pattern(p: str) -> str:
    """ES|QL wildcard (* ?) -> SQL LIKE pattern with \\ escapes."""
    out = []
    for ch in p:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


# Plain concatenation, NOT str.format — TOKEN_SPLIT_RE contains literal
# braces ({L}, {N}) that format() would treat as placeholders.
def _tokens_spark(x: str) -> str:
    # Spark SQL string literals are backslash-escaped (ANSI off), so the
    # regex backslashes must be doubled to survive F.expr parsing.
    rx = TOKEN_SPLIT_RE.replace("\\", "\\\\")
    return f"filter(split(lower({x}), '{rx}'), t -> t != '')"


def _tokens_duck(x: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({x}), "
        f"'{TOKEN_SPLIT_RE}'), t -> t <> '')"
    )


def _phrase_expr(field: str, terms: list[str], dialect: str) -> str:
    """ES|QL 9.1 MATCH_PHRASE as a pure array expression over the analyzed
    token stream: positions i where every phrase term matches at i+j.
    Both engines walk the same window starts; no UDF, no positional index
    (ES|QL match functions run as post-filters on the row, same shape)."""
    m = len(terms)
    if dialect == "spark":
        tk = _tokens_spark(field)
        if m == 1:
            return f"array_contains({tk}, {_lit_spark(terms[0])})"
        conds = " AND ".join(
            f"element_at(tkv, i + {j}) = {_lit_spark(t)}"
            for j, t in enumerate(terms)
        )
        # The token array is bound ONCE as a lambda variable via a
        # 1-element fold (Spark SQL has no LET; referencing the tokenize
        # expression inside the window lambda would re-run the regex per
        # phrase term).  The size guard comes first because sequence(1, n)
        # DESCENDS when n < 1.
        return (
            f"aggregate(array({tk}), false, (acc, tkv) -> acc OR ("
            f"size(tkv) >= {m} AND exists("
            f"sequence(1, size(tkv) - {m - 1}), i -> {conds})))"
        )
    tk = _tokens_duck(field)
    if m == 1:
        return f"list_contains({tk}, {_lit_duck(terms[0])})"
    conds = " AND ".join(
        f"({tk})[i + {j}] = {_lit_duck(t)}" for j, t in enumerate(terms)
    )
    return (
        f"(len({tk}) >= {m} AND len(list_filter("
        f"range(1, len({tk}) - {m - 1} + 1), i -> {conds})) > 0)"
    )


def _rerank_expr(qtext: str, field: str, dialect: str) -> str:
    """Integer dot product of the compile-time query embedding and the
    field's token stream (see the RERANK parser note)."""
    from .semantic import SEM_DIM, embed_query

    qv = embed_query(qtext)
    if dialect == "spark":
        h = "CAST(conv(substring(md5({x}), 1, 15), 16, 10) AS BIGINT)"
    else:
        h = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
    bucket = f"({h.format(x='t')} % {SEM_DIM})"
    sign = (
        f"(CASE WHEN {h.format(x=chr(39) + 's:' + chr(39) + ' || t')} % 2 = 0 "
        "THEN 1 ELSE -1 END)"
    )
    if qv:
        whens = " ".join(
            f"WHEN {b} THEN {v}" for b, v in sorted(qv.items())
        )
        qval = f"(CASE {bucket} {whens} ELSE 0 END)"
    else:
        qval = "0"
    contrib = f"CAST({sign} * {qval} AS BIGINT)"
    if dialect == "spark":
        toks = _tokens_spark(field)
        return (
            f"aggregate({toks}, CAST(0 AS BIGINT), "
            f"(acc, t) -> acc + {contrib})"
        )
    toks = _tokens_duck(field)
    # list_sum yields HUGEINT in DuckDB — cast back to the declared long
    return (
        f"CAST(COALESCE(list_sum(list_transform({toks}, t -> {contrib})),"
        f" 0) AS BIGINT)"
    )


def _match_terms(args) -> list[str]:
    if (
        len(args) != 2
        or not isinstance(args[1], Lit)
        or args[1].typ != "string"
    ):
        raise ValueError("ES|QL: MATCH(field, \"query\") needs a string literal")
    terms = args[1].value.lower().split()
    if not terms:
        raise ValueError("ES|QL: MATCH with an empty query")
    return terms


# FUNCS: name -> arity range, return type, spark emitter, duck emitter.
# Emitters receive already-emitted arg strings (and the raw AST args for
# the few functions that need literal inspection).
FUNCS: dict[str, dict] = {
    "LENGTH": dict(arity=(1, 1), ret="long",
                   spark=lambda a, r: f"CAST(length({a[0]}) AS BIGINT)",
                   duck=lambda a, r: f"CAST(length({a[0]}) AS BIGINT)"),
    "SUBSTRING": dict(arity=(2, 3), ret="string",
                      spark=lambda a, r: f"substring({', '.join(a)})",
                      duck=lambda a, r: f"substring({', '.join(a)})"),
    "CONCAT": dict(arity=(2, 99), ret="string",
                   spark=lambda a, r: f"concat({', '.join(a)})",
                   duck=lambda a, r: "(" + " || ".join(a) + ")"),
    "TO_LOWER": dict(arity=(1, 1), ret="string",
                     spark=lambda a, r: f"lower({a[0]})",
                     duck=lambda a, r: f"lower({a[0]})"),
    "TO_UPPER": dict(arity=(1, 1), ret="string",
                     spark=lambda a, r: f"upper({a[0]})",
                     duck=lambda a, r: f"upper({a[0]})"),
    "TRIM": dict(arity=(1, 1), ret="string",
                 spark=lambda a, r: f"trim({a[0]})",
                 duck=lambda a, r: f"trim({a[0]})"),
    "ABS": dict(arity=(1, 1), ret=lambda t: t[0],
                spark=lambda a, r: f"abs({a[0]})",
                duck=lambda a, r: f"abs({a[0]})"),
    "ROUND": dict(arity=(1, 2), ret="double",
                  spark=lambda a, r: f"round({', '.join(a)})",
                  duck=lambda a, r: f"round({', '.join(a)})"),
    "FLOOR": dict(arity=(1, 1), ret="double",
                  spark=lambda a, r: f"floor({a[0]})",
                  duck=lambda a, r: f"floor({a[0]})"),
    "CEIL": dict(arity=(1, 1), ret="double",
                 spark=lambda a, r: f"ceil({a[0]})",
                 duck=lambda a, r: f"ceil({a[0]})"),
    "STARTS_WITH": dict(arity=(2, 2), ret="bool",
                        spark=lambda a, r: f"startswith({a[0]}, {a[1]})",
                        duck=lambda a, r: f"starts_with({a[0]}, {a[1]})"),
    "ENDS_WITH": dict(arity=(2, 2), ret="bool",
                      spark=lambda a, r: f"endswith({a[0]}, {a[1]})",
                      duck=lambda a, r: f"ends_with({a[0]}, {a[1]})"),
    "COALESCE": dict(arity=(2, 99), ret=lambda t: t[0],
                     spark=lambda a, r: f"coalesce({', '.join(a)})",
                     duck=lambda a, r: f"coalesce({', '.join(a)})"),
    "TO_LONG": dict(arity=(1, 1), ret="long",
                    spark=lambda a, r: f"CAST({a[0]} AS BIGINT)",
                    duck=lambda a, r: f"CAST({a[0]} AS BIGINT)"),
    "TO_DOUBLE": dict(arity=(1, 1), ret="double",
                      spark=lambda a, r: f"CAST({a[0]} AS DOUBLE)",
                      duck=lambda a, r: f"CAST({a[0]} AS DOUBLE)"),
    "TO_STRING": dict(arity=(1, 1), ret="string",
                      spark=lambda a, r: f"CAST({a[0]} AS STRING)",
                      duck=lambda a, r: f"CAST({a[0]} AS VARCHAR)"),
    "TO_DATETIME": dict(arity=(1, 1), ret="timestamp",
                        spark=lambda a, r: f"CAST({a[0]} AS TIMESTAMP)",
                        duck=lambda a, r: f"CAST({a[0]} AS TIMESTAMP)"),
    # DATE_TRUNC(1 day, ts) — span literal first, the ES|QL signature.
    # DuckDB returns DATE for day-and-coarser granularities; cast back so
    # both engines agree on timestamp (Spark's date_trunc type).
    "DATE_TRUNC": dict(
        arity=(2, 2), ret="timestamp",
        spark=lambda a, r: f"date_trunc('{_span(r[0])}', {a[1]})",
        duck=lambda a, r: (
            f"CAST(date_trunc('{_span(r[0])}', {a[1]}) AS TIMESTAMP)"
        ),
    ),
    "DATE_EXTRACT": dict(
        arity=(2, 2), ret="long",
        spark=lambda a, r: f"CAST(extract({_datepart(r[0])} FROM {a[1]}) AS BIGINT)",
        duck=lambda a, r: f"CAST(extract({_datepart(r[0])} FROM {a[1]}) AS BIGINT)",
    ),
    # SPLIT(s, delim) — literal (non-regex) delimiter in both dialects.
    "SPLIT": dict(
        arity=(2, 2), ret="array<string>",
        spark=lambda a, r: f"split({a[0]}, {_lit_spark(re.escape(_strlit(r[1])))})",
        duck=lambda a, r: f"string_split({a[0]}, {_lit_duck(_strlit(r[1]))})",
    ),
    "MV_COUNT": dict(arity=(1, 1), ret="long",
                     spark=lambda a, r: f"CAST(size({a[0]}) AS BIGINT)",
                     duck=lambda a, r: f"CAST(len({a[0]}) AS BIGINT)"),
    "MV_MIN": dict(arity=(1, 1), ret="double",
                   spark=lambda a, r: f"CAST(array_min({a[0]}) AS DOUBLE)",
                   duck=lambda a, r: f"CAST(list_min({a[0]}) AS DOUBLE)"),
    "MV_MAX": dict(arity=(1, 1), ret="double",
                   spark=lambda a, r: f"CAST(array_max({a[0]}) AS DOUBLE)",
                   duck=lambda a, r: f"CAST(list_max({a[0]}) AS DOUBLE)"),
    # Left fold in element order on BOTH sides (same rounding trajectory).
    "MV_SUM": dict(
        arity=(1, 1), ret="double",
        spark=lambda a, r: (
            f"aggregate({a[0]}, CAST(0.0 AS DOUBLE), "
            "(acc, v) -> acc + CAST(v AS DOUBLE))"
        ),
        duck=lambda a, r: (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform({a[0]}, v -> CAST(v AS DOUBLE))), "
            "(acc, v) -> acc + v)"
        ),
    ),
    "MV_AVG": dict(
        arity=(1, 1), ret="double",
        spark=lambda a, r: (
            f"aggregate({a[0]}, CAST(0.0 AS DOUBLE), "
            "(acc, v) -> acc + CAST(v AS DOUBLE)) "
            f"/ CAST(size({a[0]}) AS DOUBLE)"
        ),
        duck=lambda a, r: (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform({a[0]}, v -> CAST(v AS DOUBLE))), "
            f"(acc, v) -> acc + v) / CAST(len({a[0]}) AS DOUBLE)"
        ),
    ),
    "GREATEST": dict(arity=(2, 99), ret=lambda t: t[0],
                     spark=lambda a, r: f"greatest({', '.join(a)})",
                     duck=lambda a, r: f"greatest({', '.join(a)})"),
    "LEAST": dict(arity=(2, 99), ret=lambda t: t[0],
                  spark=lambda a, r: f"least({', '.join(a)})",
                  duck=lambda a, r: f"least({', '.join(a)})"),
    "LEFT": dict(arity=(2, 2), ret="string",
                 spark=lambda a, r: f"left({a[0]}, {a[1]})",
                 duck=lambda a, r: f"left({a[0]}, {a[1]})"),
    "RIGHT": dict(arity=(2, 2), ret="string",
                  spark=lambda a, r: f"right({a[0]}, {a[1]})",
                  duck=lambda a, r: f"right({a[0]}, {a[1]})"),
    # ES|QL REPLACE is regex-replace-all; DuckDB needs the 'g' flag.
    "REPLACE": dict(
        arity=(3, 3), ret="string",
        spark=lambda a, r: f"regexp_replace({a[0]}, {a[1]}, {a[2]})",
        duck=lambda a, r: f"regexp_replace({a[0]}, {a[1]}, {a[2]}, 'g')",
    ),
    "POW": dict(arity=(2, 2), ret="double",
                spark=lambda a, r: f"power({a[0]}, {a[1]})",
                duck=lambda a, r: f"power({a[0]}, {a[1]})"),
    "SQRT": dict(arity=(1, 1), ret="double",
                 spark=lambda a, r: f"sqrt({a[0]})",
                 duck=lambda a, r: f"sqrt({a[0]})"),
    "EXP": dict(arity=(1, 1), ret="double",
                spark=lambda a, r: f"exp({a[0]})",
                duck=lambda a, r: f"exp({a[0]})"),
    "LOG10": dict(arity=(1, 1), ret="double",
                  spark=lambda a, r: f"log10({a[0]})",
                  duck=lambda a, r: f"log10({a[0]})"),
    "LOG": dict(arity=(1, 1), ret="double",
                spark=lambda a, r: f"ln({a[0]})",
                duck=lambda a, r: f"ln({a[0]})"),
    # DATE_FORMAT(\"yyyy-MM-dd HH:mm:ss\", ts) — Java-pattern subset
    # translated to strftime for DuckDB (unknown letters raise).
    "DATE_FORMAT": dict(
        arity=(2, 2), ret="string",
        spark=lambda a, r: (
            f"date_format({a[1]}, {_lit_spark(_strlit(r[0]))})"
        ),
        duck=lambda a, r: (
            f"strftime({a[1]}, {_lit_duck(_fmt_duck(_strlit(r[0])))})"
        ),
    ),
    # BUCKET(ts, 1 day) == date_trunc for multi-unit spans too (7 day ->
    # 7-day-aligned from epoch); BUCKET(x, 50) == floor(x/50)*50.
    "BUCKET": dict(
        arity=(2, 2),
        ret=lambda t: "timestamp" if t and t[0] == "timestamp" else "double",
        spark=lambda a, r: _bucket_emit(a, r, "spark"),
        duck=lambda a, r: _bucket_emit(a, r, "duck"),
    ),
    # DATE_DIFF(\"hour\", start, end): complete units, truncation toward
    # zero — emitted as epoch arithmetic in BOTH dialects because the
    # built-ins disagree (Spark timestampdiff counts complete periods,
    # DuckDB date_diff counts boundary crossings).
    "DATE_DIFF": dict(
        arity=(3, 3), ret="long",
        spark=lambda a, r: (
            f"CAST((unix_timestamp({a[2]}) - unix_timestamp({a[1]})) "
            f"/ {_diff_unit_seconds(r[0])} AS BIGINT)"
        ),
        duck=lambda a, r: (
            f"CAST(trunc((epoch({a[2]}) - epoch({a[1]})) "
            f"/ {_diff_unit_seconds(r[0])}) AS BIGINT)"
        ),
    ),
    "CASE": dict(arity=(3, 99), ret=lambda t: t[1],
                 spark=lambda a, r: _case(a),
                 duck=lambda a, r: _case(a)),
    # Multivalue round-out (ES|QL mv_* family).  MV_DEDUPE is defined as
    # SORTED dedupe here: ES documents the output order as unspecified,
    # and an unspecified order cannot be a cross-engine contract.
    "MV_DEDUPE": dict(
        arity=(1, 1), ret=lambda t: t[0],
        spark=lambda a, r: f"array_sort(array_distinct({a[0]}))",
        duck=lambda a, r: f"list_sort(list_distinct({a[0]}))",
    ),
    "MV_SORT": dict(
        arity=(1, 2), ret=lambda t: t[0],
        spark=lambda a, r: (
            f"sort_array({a[0]}, "
            + ("false" if _mv_sort_desc(r) else "true")
            + ")"
        ),
        duck=lambda a, r: (
            f"list_sort({a[0]}, "
            + ("'DESC'" if _mv_sort_desc(r) else "'ASC'")
            + ")"
        ),
    ),
    "MV_FIRST": dict(
        arity=(1, 1), ret=lambda t: _mv_elem(t[0]),
        spark=lambda a, r: f"element_at({a[0]}, 1)",
        duck=lambda a, r: f"({a[0]})[1]",
    ),
    "MV_LAST": dict(
        arity=(1, 1), ret=lambda t: _mv_elem(t[0]),
        spark=lambda a, r: f"element_at({a[0]}, -1)",
        duck=lambda a, r: f"({a[0]})[-1]",
    ),
    # LOCATE(string, substring) — ES arg order; Spark's locate() flips it
    "LOCATE": dict(
        arity=(2, 2), ret="long",
        spark=lambda a, r: f"CAST(locate({a[1]}, {a[0]}) AS BIGINT)",
        duck=lambda a, r: f"CAST(strpos({a[0]}, {a[1]}) AS BIGINT)",
    ),
    "REVERSE": dict(arity=(1, 1), ret="string",
                    spark=lambda a, r: f"reverse({a[0]})",
                    duck=lambda a, r: f"reverse({a[0]})"),
    "LTRIM": dict(arity=(1, 1), ret="string",
                  spark=lambda a, r: f"ltrim({a[0]})",
                  duck=lambda a, r: f"ltrim({a[0]})"),
    "RTRIM": dict(arity=(1, 1), ret="string",
                  spark=lambda a, r: f"rtrim({a[0]})",
                  duck=lambda a, r: f"rtrim({a[0]})"),
    "SIGNUM": dict(arity=(1, 1), ret="double",
                   spark=lambda a, r: f"CAST(signum({a[0]}) AS DOUBLE)",
                   duck=lambda a, r: f"CAST(sign({a[0]}) AS DOUBLE)"),
    # DATE_PARSE(format, dateString) — ES arg order; the Java format
    # vocabulary is translated for strptime by the DATE_FORMAT table
    "DATE_PARSE": dict(
        arity=(2, 2), ret="timestamp",
        spark=lambda a, r: (
            f"to_timestamp({a[1]}, {_lit_spark(_strlit(r[0]))})"
        ),
        duck=lambda a, r: (
            f"strptime({a[1]}, {_lit_duck(_fmt_duck(_strlit(r[0])))})"
        ),
    ),
    # TRY_CAST on the oracle side: Spark's non-ANSI CAST nulls malformed
    # input, DuckDB's plain CAST raises
    "TO_BOOLEAN": dict(arity=(1, 1), ret="bool",
                       spark=lambda a, r: f"CAST({a[0]} AS BOOLEAN)",
                       duck=lambda a, r: f"TRY_CAST({a[0]} AS BOOLEAN)"),
    # Full-text: ES match semantics (OR of analyzed terms) as a predicate.
    "MATCH": dict(
        arity=(2, 2), ret="bool",
        spark=lambda a, r: (
            "arrays_overlap("
            + _tokens_spark(a[0])
            + ", array("
            + ", ".join(_lit_spark(t) for t in _match_terms(r))
            + "))"
        ),
        duck=lambda a, r: (
            "len(list_intersect("
            + _tokens_duck(a[0])
            + ", ["
            + ", ".join(_lit_duck(t) for t in _match_terms(r))
            + "])) > 0"
        ),
    ),
    # ES|QL 9.1 MATCH_PHRASE: consecutive analyzed terms as a predicate.
    "MATCH_PHRASE": dict(
        arity=(2, 2), ret="bool",
        spark=lambda a, r: _phrase_expr(a[0], _match_terms(r), "spark"),
        duck=lambda a, r: _phrase_expr(a[0], _match_terms(r), "duck"),
    ),
    # ES|QL CATEGORIZE (9.x grouping function): deterministic drain-style
    # category key — digit-bearing tokens dropped (the variable parts of a
    # log/doc line), first 4 surviving analyzed tokens joined.  ES runs an
    # ML categorizer HERE; this re-spec is the load-order-independent
    # deterministic twin (usable in EVAL, then BY the result — ES|QL
    # limits CATEGORIZE to BY, where an EVAL-then-BY is the same plan).
    "CATEGORIZE": dict(
        arity=(1, 1), ret="string",
        spark=lambda a, r: (
            "array_join(slice(filter("
            + _tokens_spark(a[0])
            + ", t -> NOT (t RLIKE '[0-9]')), 1, 4), ' ')"
        ),
        duck=lambda a, r: (
            "array_to_string((list_filter("
            + _tokens_duck(a[0])
            + ", t -> NOT regexp_matches(t, '[0-9]')))[1:4], ' ')"
        ),
    ),
    # ES|QL 9.1 TERM: exact term lookup, query side NOT analyzed — the
    # literal must already be in index form (lowercase) to hit, exactly
    # the classic ES term-vs-match contract.
    "TERM": dict(
        arity=(2, 2), ret="bool",
        spark=lambda a, r: (
            f"array_contains({_tokens_spark(a[0])}, "
            f"{_lit_spark(_term_lit(r))})"
        ),
        duck=lambda a, r: (
            f"list_contains({_tokens_duck(a[0])}, "
            f"{_lit_duck(_term_lit(r))})"
        ),
    ),
}


def _knn_score(field: str, qv: tuple, dialect: str) -> str:
    """Exact cosine of `field` against the literal query vector, rounded
    to 5 decimals — one sequential fold per side in BOTH engines, and the
    query norm is ONE shared double literal (computed once here), so the
    score is engine- and partitioning-exact up to libm ulps absorbed by
    the rounding (the cosine_topk convention)."""
    if dialect == "spark":
        arr = "array(" + ", ".join(repr(float(x)) for x in qv) + ")"
        dot_vq = (
            f"aggregate(zip_with({field}, {arr}, (a, b) -> a * b), "
            "CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
        )
        dot_vv = (
            f"aggregate(zip_with({field}, {field}, (a, b) -> a * b), "
            "CAST(0.0 AS DOUBLE), (s, x) -> s + x)"
        )
    else:
        arr = "[" + ", ".join(repr(float(x)) for x in qv) + "]"
        dot_vq = f"list_dot_product({field}, {arr})"
        dot_vv = f"list_dot_product({field}, {field})"
    qn = 0.0
    for x in qv:
        qn += float(x) * float(x)
    qn = math.sqrt(qn)
    return f"round(({dot_vq}) / (sqrt({dot_vv}) * {qn!r}), 5)"


def _mv_elem(t: str) -> str:
    return t[6:-1] if t.startswith("array<") else t


def _mv_sort_desc(args) -> bool:
    if len(args) < 2:
        return False
    if not isinstance(args[1], Lit) or args[1].value not in ("ASC", "DESC"):
        raise ValueError('ES|QL: MV_SORT order must be "ASC" or "DESC"')
    return args[1].value == "DESC"


def _term_lit(args) -> str:
    if (
        len(args) != 2
        or not isinstance(args[1], Lit)
        or args[1].typ != "string"
        or not args[1].value
    ):
        raise ValueError(
            'ES|QL: TERM(field, "term") needs a non-empty string literal'
        )
    return args[1].value

_AGGS = {
    "COUNT_STAR": ("count(*)", "long"),
    "COUNT": ("count({0})", "long"),
    "SUM": ("sum({0})", None),  # type follows input
    "AVG": ("avg({0})", "double"),
    "MIN": ("min({0})", None),
    "MAX": ("max({0})", None),
    "COUNT_DISTINCT": ("count(DISTINCT {0})", "long"),
    "MEDIAN": ("median({0})", "double"),
    "PERCENTILE": (None, "double"),  # dialect-specific
    "STD_DEV": ("stddev_pop({0})", "double"),
}


def _span(node) -> str:
    if not isinstance(node, Span):
        raise ValueError("ES|QL: DATE_TRUNC needs a span literal like `1 day`")
    if node.n != 1:
        raise ValueError("ES|QL: only 1-unit spans supported (e.g. `1 day`)")
    return node.unit


def _datepart(node) -> str:
    if not (isinstance(node, Lit) and node.typ == "string"):
        raise ValueError("ES|QL: DATE_EXTRACT needs a string literal part")
    part = node.value.lower()
    if part not in ("year", "month", "day", "hour", "minute", "second"):
        raise ValueError(f"ES|QL: unsupported date part {part!r}")
    return part


def _strlit(node) -> str:
    if not (isinstance(node, Lit) and node.typ == "string"):
        raise ValueError("ES|QL: expected a string literal argument")
    return node.value


# Java date-pattern subset -> strftime; longest token first.
_FMT_MAP = [
    ("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"),
    ("HH", "%H"), ("mm", "%M"), ("ss", "%S"),
]


def _fmt_duck(fmt: str) -> str:
    out = []
    pos = 0
    while pos < len(fmt):
        for tok, rep in _FMT_MAP:
            if fmt.startswith(tok, pos):
                out.append(rep)
                pos += len(tok)
                break
        else:
            ch = fmt[pos]
            if ch.isalpha():
                raise ValueError(
                    f"ES|QL: unsupported DATE_FORMAT token at {fmt[pos:]!r}"
                )
            out.append("%%" if ch == "%" else ch)
            pos += 1
    return "".join(out)


_DIFF_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}

_EPOCH_UNITS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def _bucket_emit(a: list, r: list, dialect: str) -> str:
    arg = a[0]
    node = r[1]
    if isinstance(node, Span):
        if node.n == 1:
            # calendar-aligned single-unit spans (incl. week/month/year)
            if dialect == "spark":
                return f"date_trunc('{node.unit}', {arg})"
            return f"CAST(date_trunc('{node.unit}', {arg}) AS TIMESTAMP)"
        if node.unit not in _EPOCH_UNITS:
            raise ValueError(
                f"ES|QL: BUCKET multi-unit span needs a fixed-width unit "
                f"(second/minute/hour/day), got {node.n} {node.unit}"
            )
        n = node.n * _EPOCH_UNITS[node.unit]
        if dialect == "spark":
            return (
                f"timestamp_seconds(CAST(floor(unix_timestamp({arg}) "
                f"/ {n}) * {n} AS BIGINT))"
            )
        return (
            f"(TIMESTAMP '1970-01-01 00:00:00' + CAST(floor(epoch({arg}) "
            f"/ {n}) * {n} AS BIGINT) * INTERVAL 1 SECOND)"
        )
    if isinstance(node, Lit) and node.typ in ("long", "double"):
        w = float(node.value)
        if w <= 0:
            raise ValueError("ES|QL: BUCKET width must be positive")
        # width as CAST(.. AS DOUBLE): Spark parses a bare `25.0` literal
        # as DECIMAL(3,1), and bigint*decimal yields a Decimal column that
        # would diverge from the oracle's float64
        wd = f"CAST({w!r} AS DOUBLE)"
        return f"(floor(CAST({arg} AS DOUBLE) / {wd}) * {wd})"
    raise ValueError(
        "ES|QL: BUCKET needs a span (`1 day`) or a numeric width literal"
    )


def _diff_unit_seconds(node) -> int:
    unit = _strlit(node).lower()
    if unit not in _DIFF_UNITS:
        raise ValueError(f"ES|QL: unsupported DATE_DIFF unit {unit!r}")
    return _DIFF_UNITS[unit]


def _case(a: list[str]) -> str:
    out = ["CASE"]
    i = 0
    while i + 1 < len(a):
        out.append(f"WHEN {a[i]} THEN {a[i + 1]}")
        i += 2
    if i < len(a):
        out.append(f"ELSE {a[i]}")
    out.append("END")
    return " ".join(out)


def _emit(e, dialect: str) -> str:
    """AST -> SQL text in the given dialect ('spark' | 'duck')."""
    lit = _lit_spark if dialect == "spark" else _lit_duck
    if isinstance(e, Lit):
        return lit(e.value)
    if isinstance(e, Span):
        raise ValueError("ES|QL: span literal outside DATE_TRUNC")
    if isinstance(e, Col):
        return e.name
    if isinstance(e, Un):
        if e.op == "NOT":
            return f"(NOT {_emit(e.operand, dialect)})"
        return f"(- {_emit(e.operand, dialect)})"
    if isinstance(e, Bin):
        op = {"==": "=", "!=": "<>"}.get(e.op, e.op)
        return f"({_emit(e.left, dialect)} {op} {_emit(e.right, dialect)})"
    if isinstance(e, Like):
        x = _emit(e.operand, dialect)
        if e.regex:
            body = (
                f"{x} RLIKE {lit(e.pattern)}"
                if dialect == "spark"
                else f"regexp_matches({x}, {lit(e.pattern)})"
            )
        else:
            p = _like_pattern(e.pattern)
            body = (
                f"{x} LIKE {lit(p)}"
                if dialect == "spark"
                else f"{x} LIKE {lit(p)} ESCAPE '\\'"
            )
        return f"(NOT ({body}))" if e.negated else f"({body})"
    if isinstance(e, InList):
        items = ", ".join(_emit(i, dialect) for i in e.items)
        body = f"{_emit(e.operand, dialect)} IN ({items})"
        return f"(NOT ({body}))" if e.negated else f"({body})"
    if isinstance(e, IsNull):
        neg = " NOT" if e.negated else ""
        return f"({_emit(e.operand, dialect)} IS{neg} NULL)"
    if isinstance(e, Func):
        spec = FUNCS[e.name]
        # Span args are consumed via the raw AST (r) by DATE_TRUNC only —
        # typecheck already rejected spans anywhere else.
        args = [
            None if isinstance(a, Span) else _emit(a, dialect)
            for a in e.args
        ]
        return spec[dialect](args, e.args)
    raise ValueError(f"ES|QL: bad node {e!r}")


# ------------------------------------------------------------- commands

_BASE_SCHEMAS = {
    "corpus": {
        "doc_id": "long", "url": "string", "warc_ts": "timestamp",
        "html": "binary", "text": "string", "lang": "string",
        "source": "string", "n_chars": "long",
    },
    "documents": {
        "doc_id": "long", "text": "string", "lang": "string",
        "source": "string", "n_chars": "long",
    },
    "events": {
        "event_id": "long", "ts": "timestamp", "user_id": "long",
        "event_type": "string", "value": "double", "props": "string",
    },
    "embeddings": {
        "vec_id": "long", "embedding": "array<double>", "label": "long",
    },
}

# Small dimension tables servable as ENRICH policies / LOOKUP JOIN targets.
# At 100 TB these stay KB-sized — both execution paths must keep them on
# the build side of a broadcast join (asserted by the plan test).
_LOOKUP_SCHEMAS = {
    "nation": {"n_nationkey": "long", "n_name": "string",
               "n_regionkey": "long"},
    "region": {"r_regionkey": "long", "r_name": "string"},
    "customer": {"c_custkey": "long", "c_name": "string",
                 "c_nationkey": "long", "c_acctbal": "double",
                 "c_mktsegment": "string"},
    "supplier": {"s_suppkey": "long", "s_name": "string",
                 "s_nationkey": "long", "s_acctbal": "double"},
}

# ES|QL 9.1 TS command (time-series source, tech preview): the metrics
# mapping the TSDB index would declare.  `dims` identify a series (the
# _tsid), `ts` is the timestamp, counters are monotone-increasing values
# (RATE only), everything else numeric is a gauge (*_OVER_TIME only) —
# the same split ES enforces via `time_series_metric: counter|gauge`.
# event_id is the monotone counter by construction (a global sequence is
# monotone on every series subset).
_TS_MAPPINGS = {
    "events": {
        "dims": ["event_type", "user_id"],
        "ts": "ts",
        "counters": {"event_id"},
    },
}

# inner (per-series, per-bucket) over-time functions -> result type
# (None = follows the field type)
_TS_INNER = {
    "RATE": "double",
    "MAX_OVER_TIME": None,
    "MIN_OVER_TIME": None,
    "SUM_OVER_TIME": None,
    "AVG_OVER_TIME": "double",
    "COUNT_OVER_TIME": "long",
    "FIRST_OVER_TIME": None,
    "LAST_OVER_TIME": None,
}
_TS_OUTER = {"SUM", "AVG", "MIN", "MAX", "COUNT"}


# ENRICH policies: name -> (lookup table, match field, enrich fields).
# The ES analogue is the enrich-policy index built by _enrich/policy; here
# the policy is a declared mapping onto the dimension tables above.
ENRICH_POLICIES = {
    "user_customer": ("customer", "c_custkey",
                      ["c_name", "c_nationkey", "c_mktsegment",
                       "c_acctbal"]),
    "nation_name": ("nation", "n_nationkey", ["n_name", "n_regionkey"]),
    "region_name": ("region", "r_regionkey", ["r_name"]),
}


def _split_pipes(toks: list[Tok]) -> list[list[Tok]]:
    # depth-aware: a `|` inside parentheses (FORK branches, function args)
    # does not terminate the pipe segment.
    out: list[list[Tok]] = [[]]
    depth = 0
    for t in toks:
        if t.kind == "op" and t.text == "(":
            depth += 1
        elif t.kind == "op" and t.text == ")":
            depth -= 1
        if t.kind == "op" and t.text == "|" and depth == 0:
            out.append([])
        else:
            out[-1].append(t)
    if any(not seg for seg in out):
        raise ValueError("ES|QL: empty pipe segment")
    return out


@dataclass
class _SortItem:
    expr: object
    desc: bool
    nulls_first: bool | None  # None = dialect default tie to direction


class EsqlPlan:
    """Parsed + type-checked program; `.dataframe(tables)` executes on
    Spark, `.to_duckdb_sql()` renders the oracle."""

    def __init__(self, query: str):
        self.query = query
        segs = _split_pipes(_lex(query))
        p0 = _P(segs[0])
        self.row_items: list | None = None
        self.time_series = False
        if p0.accept("kw", "ROW"):
            # ES|QL ROW source: literal one-row relation (constant
            # expressions only — the empty input schema enforces it)
            items = []
            while True:
                name = p0.expect("name").text
                p0.expect("op", "=")
                e = p0.expr()
                _typecheck(e, {})
                items.append((name, e))
                if not p0.accept("op", ","):
                    break
            if p0.peek() is not None:
                raise ValueError("ES|QL: trailing tokens after ROW items")
            if not items:
                raise ValueError("ES|QL: ROW needs at least one item")
            self.source = "__row__"
            self.schema = {name: e.typ for name, e in items}
            self.row_items = items
        else:
            # TS (9.1 time-series source) is deliberately NOT a lexer
            # keyword — `ts` is a column name everywhere else; it is
            # recognized positionally at the program head only.
            nxt = p0.peek()
            ts_mode = (
                nxt is not None
                and nxt.kind == "name"
                and nxt.text.upper() == "TS"
            )
            if ts_mode:
                p0.next()
            else:
                p0.expect("kw", "FROM")
            src = p0.expect("name").text
            if p0.peek() is not None:
                raise ValueError("ES|QL: trailing tokens after FROM <table>")
            if src not in _BASE_SCHEMAS:
                raise ValueError(f"ES|QL: unknown source table {src!r}")
            if ts_mode and src not in _TS_MAPPINGS:
                raise ValueError(
                    f"ES|QL: {src!r} is not a time-series (TSDB) source"
                )
            self.source = src
            self.schema = dict(_BASE_SCHEMAS[src])
            self.time_series = ts_mode
        self._schema0 = dict(self.schema)
        self.stages: list[tuple] = []  # (kind, payload)
        self.pending_sort: list[_SortItem] | None = None
        self._in_fork = False
        for seg in segs[1:]:
            self._command(seg)

    # -- per-command parse + static schema evolution ----------------

    def _knn_stage(self, e) -> None:
        """ES|QL 9.2 `WHERE KNN(field, [query_vector], k)` — keep the k
        nearest rows by exact cosine and append `_score`.  A top-k is not
        a per-row predicate, so KNN must be the WHERE's only expression
        (ES restricts knn prefilter composition the same way); ties at
        the k boundary break by the row identity column ascending, so the
        admitted set is engine- and partitioning-exact."""
        if len(e.args) != 3:
            raise ValueError("ES|QL: KNN(field, [query_vector], k)")
        f, q, kk = e.args
        if not isinstance(f, Col) or self.schema.get(f.name) != "array<double>":
            raise ValueError("ES|QL: KNN field must be an array<double> column")
        if isinstance(q, Func) and q.name == "TEXT_EMBEDDING":
            # ES|QL 9.2 TEXT_EMBEDDING: the engine's deterministic stub
            # inference endpoint (hashing-trick embedder, semantic.py) —
            # resolved at COMPILE time into the query-vector literal, so
            # both emitters carry the identical doubles
            if len(q.args) != 1 or not (
                isinstance(q.args[0], Lit)
                and q.args[0].typ == "string"
                and q.args[0].value
            ):
                raise ValueError(
                    'ES|QL: TEXT_EMBEDDING("text") needs a non-empty '
                    "string literal"
                )
            from .semantic import SEM_DIM, embed_query

            sparse = embed_query(q.args[0].value)
            if not sparse:
                raise ValueError(
                    "ES|QL: TEXT_EMBEDDING produced an all-zero vector"
                )
            q = Lit(
                tuple(float(sparse.get(b, 0)) for b in range(SEM_DIM)),
                "array<double>",
            )
        if not (isinstance(q, Lit) and q.typ == "array<double>" and q.value):
            raise ValueError(
                "ES|QL: KNN query vector must be a non-empty array literal"
            )
        if not (
            isinstance(kk, Lit) and kk.typ == "long" and int(kk.value) > 0
        ):
            raise ValueError("ES|QL: KNN k must be a positive integer literal")
        idc = next(
            (
                c
                for c in ("vec_id", "doc_id", "event_id")
                if c in self.schema
            ),
            None,
        )
        if idc is None:
            raise ValueError(
                "ES|QL: KNN needs a row identity column "
                "(vec_id / doc_id / event_id) still in scope"
            )
        self.schema["_score"] = "double"
        self.stages.append(("knn", (f.name, q.value, int(kk.value), idc)))

    def _command(self, seg: list[Tok]) -> None:
        p = _P(seg)
        head = p.next()
        if head.kind != "kw":
            raise ValueError(f"ES|QL: expected a command, got {head.text!r}")
        k = head.text
        if k == "WHERE":
            e = p.expr()
            self._end(p)
            if isinstance(e, Func) and e.name == "KNN":
                self._knn_stage(e)
                return
            if _typecheck(e, self.schema) != "bool":
                raise ValueError("ES|QL: WHERE expression is not boolean")
            self.stages.append(("where", e))
        elif k == "EVAL":
            items = []
            while True:
                name = p.expect("name").text
                p.expect("op", "=")
                e = p.expr()
                _typecheck(e, self.schema)
                self.schema[name] = e.typ
                items.append((name, e))
                if not p.accept("op", ","):
                    break
            self._end(p)
            self.stages.append(("eval", items))
        elif k == "STATS" and self.time_series:
            self._ts_stats_cmd(p)
        elif k == "STATS":
            aggs = []
            while True:
                name = p.expect("name").text
                p.expect("op", "=")
                e = p.expr()
                if not isinstance(e, Func) or e.name not in _AGGS:
                    raise ValueError(
                        "ES|QL: STATS items must be aggregate calls"
                    )
                argt = (
                    _typecheck(e.args[0], self.schema) if e.args else "long"
                )
                if e.name == "PERCENTILE":
                    if len(e.args) != 2 or not isinstance(e.args[1], Lit):
                        raise ValueError(
                            "ES|QL: PERCENTILE(col, p) needs a literal p"
                        )
                rett = _AGGS[e.name][1] or argt
                # ES 8.16 filtered aggregate: `agg WHERE cond` evaluates the
                # condition against the PRE-aggregation row.
                filt = None
                if p.accept("kw", "WHERE"):
                    filt = p.expr()
                    if _typecheck(filt, self.schema) != "bool":
                        raise ValueError(
                            "ES|QL: STATS WHERE expression is not boolean"
                        )
                aggs.append((name, e, rett, filt))
                if not p.accept("op", ","):
                    break
            keys: list[str] = []
            if p.accept("kw", "BY"):
                while True:
                    keys.append(p.expect("name").text)
                    if not p.accept("op", ","):
                        break
            self._end(p)
            for key in keys:
                if key not in self.schema:
                    raise ValueError(f"ES|QL: unknown BY column {key!r}")
            new_schema = {key: self.schema[key] for key in keys}
            for name, _, rett, _filt in aggs:
                new_schema[name] = rett
            self.schema = new_schema
            self.stages.append(("stats", (aggs, keys)))
        elif k == "INLINESTATS":
            aggs = []
            while True:
                name = p.expect("name").text
                p.expect("op", "=")
                e = p.expr()
                if (
                    not isinstance(e, Func)
                    or e.name not in _AGGS
                    or e.name in ("COUNT_DISTINCT", "MEDIAN", "PERCENTILE")
                ):
                    raise ValueError(
                        "ES|QL: INLINESTATS supports COUNT/SUM/AVG/MIN/MAX"
                    )
                argt = (
                    _typecheck(e.args[0], self.schema) if e.args else "long"
                )
                rett = _AGGS[e.name][1] or argt
                aggs.append((name, e, rett))
                if not p.accept("op", ","):
                    break
            keys: list[str] = []
            if p.accept("kw", "BY"):
                while True:
                    keys.append(p.expect("name").text)
                    if not p.accept("op", ","):
                        break
            self._end(p)
            for key in keys:
                if key not in self.schema:
                    raise ValueError(f"ES|QL: unknown BY column {key!r}")
            for name, _, rett in aggs:
                self.schema[name] = rett  # adds columns, keeps all rows
            self.stages.append(("inlinestats", (aggs, keys)))
        elif k == "CHANGE_POINT":
            # ES|QL 8.18 CHANGE_POINT <value> ON <key> [AS type, pvalue]:
            # appends two columns, set only on the detected change row.
            # Deterministic re-spec (agg_change_point's contract): the
            # mean-shift statistic |mean_r - mean_l| * sqrt(l*r/n) over
            # rows ordered by key, argmax marked 'step_change' (earliest
            # key on ties); the emitted "pvalue" carries the rounded
            # statistic.  The key must be unique per row (a bucket axis,
            # e.g. a preceding STATS BY) — like ES, which caps the input
            # at 1000 buckets, the window is axis-sized by contract.
            val = p.expect("name").text
            p.expect("kw", "ON")
            key = p.expect("name").text
            tname, pname = "type", "pvalue"
            if p.accept("kw", "AS"):
                tname = p.expect("name").text
                p.expect("op", ",")
                pname = p.expect("name").text
            self._end(p)
            if val not in self.schema:
                raise ValueError(f"ES|QL: unknown column {val!r}")
            if self.schema[val] not in ("long", "double"):
                raise ValueError("ES|QL: CHANGE_POINT value must be numeric")
            if key not in self.schema:
                raise ValueError(f"ES|QL: unknown column {key!r}")
            self.schema[tname] = "string"
            self.schema[pname] = "double"
            self.stages.append(("change_point", (val, key, tname, pname)))
        elif k == "COMPLETION":
            # ES|QL 8.19 COMPLETION col = <prompt expr> WITH <inference_id>.
            # The sandbox has no inference service; the endpoint is the
            # engine's deterministic stub LM (the reference mocks its LLM
            # the same way): completion = the prompt's first 8 tokens
            # re-joined + ' #' + an md5-derived tag — pure codegen'd
            # string exprs, one md5 per row, identical in both engines.
            name = p.expect("name").text
            p.expect("op", "=")
            e = p.expr()
            if _typecheck(e, self.schema) != "string":
                raise ValueError("ES|QL: COMPLETION prompt must be a string")
            p.expect("kw", "WITH")
            inference_id = p.expect("name").text
            self._end(p)
            self.schema[name] = "string"
            self.stages.append(("completion", (name, e, inference_id)))
        elif k == "RERANK":
            # ES|QL 8.19 RERANK "query" ON <field> [WITH <inference_id>]:
            # appends `_score`.  Deterministic reranker = the semantic
            # hashing-trick model (query/semantic.py): score = EXACT
            # integer dot product of the compile-time query embedding and
            # the row field's token stream (a flat fold — sign(t) *
            # qval[bucket(t)] summed over occurrences; distributivity
            # makes bucket grouping unnecessary).  No float anywhere, so
            # cross-engine equality is bit-trivial.  Rows are NOT
            # reordered — compose with `| SORT _score DESC, <key>` for a
            # total order (the determinism contract every LIMIT here
            # already follows).
            qtok = p.expect("str")
            p.expect("kw", "ON")
            field = p.expect("name").text
            inference_id = "semantic_stub"
            if p.accept("kw", "WITH"):
                inference_id = p.expect("name").text
            self._end(p)
            if self.schema.get(field) != "string":
                raise ValueError("ES|QL: RERANK field must be a string column")
            self.schema["_score"] = "long"
            self.stages.append(
                ("rerank", (_unquote(qtok.text), field, inference_id))
            )
        elif k == "SORT":
            items: list[_SortItem] = []
            while True:
                e = p.expr()
                _typecheck(e, self.schema)
                desc = False
                if p.accept("kw", "DESC"):
                    desc = True
                else:
                    p.accept("kw", "ASC")
                nf: bool | None = None
                if p.accept("kw", "NULLS"):
                    nf = p.next().text == "FIRST"
                items.append(_SortItem(e, desc, nf))
                if not p.accept("op", ","):
                    break
            self._end(p)
            self.stages.append(("sort", items))
        elif k == "LIMIT":
            n = int(p.expect("num").text)
            self._end(p)
            self.stages.append(("limit", n))
        elif k in ("KEEP", "DROP"):
            names = [p.expect("name").text]
            while p.accept("op", ","):
                names.append(p.expect("name").text)
            self._end(p)
            for nm in names:
                if nm not in self.schema:
                    raise ValueError(f"ES|QL: unknown column {nm!r} in {k}")
            if k == "KEEP":
                self.schema = {nm: self.schema[nm] for nm in names}
            else:
                for nm in names:
                    del self.schema[nm]
            self.stages.append((k.lower(), names))
        elif k == "RENAME":
            pairs = []
            while True:
                old = p.expect("name").text
                p.expect("kw", "AS")
                new = p.expect("name").text
                if old not in self.schema:
                    raise ValueError(f"ES|QL: unknown column {old!r}")
                self.schema[new] = self.schema.pop(old)
                pairs.append((old, new))
                if not p.accept("op", ","):
                    break
            self._end(p)
            self.stages.append(("rename", pairs))
        elif k in ("DISSECT", "GROK"):
            field = p.expect("name").text
            pat = _unquote(p.expect("str").text)
            self._end(p)
            if field not in self.schema:
                raise ValueError(f"ES|QL: unknown column {field!r}")
            if k == "DISSECT":
                rx, keys = compile_dissect(pat)
                fields = [(key, "string") for key in keys]
            else:
                rx, fields = compile_grok(pat)
            for name, typ in fields:
                self.schema[name] = (
                    "long" if typ in ("int", "long")
                    else "double" if typ == "float" else "string"
                )
            self.stages.append(("extract", (field, rx, fields)))
        elif k == "MV_EXPAND":
            col = p.expect("name").text
            self._end(p)
            if col not in self.schema:
                raise ValueError(f"ES|QL: unknown column {col!r}")
            if not self.schema[col].startswith("array"):
                raise ValueError(f"ES|QL: MV_EXPAND on non-multivalue {col!r}")
            self.schema[col] = self.schema[col][6:-1]
            self.stages.append(("mv_expand", col))
        elif k == "ENRICH":
            policy = p.expect("name").text
            if policy not in ENRICH_POLICIES:
                raise ValueError(f"ES|QL: unknown enrich policy {policy!r}")
            table, match, all_fields = ENRICH_POLICIES[policy]
            p.expect("kw", "ON")
            col = p.expect("name").text
            if col not in self.schema:
                raise ValueError(f"ES|QL: unknown column {col!r}")
            fields = list(all_fields)
            if p.accept("kw", "WITH"):
                fields = [p.expect("name").text]
                while p.accept("op", ","):
                    fields.append(p.expect("name").text)
                for f in fields:
                    if f not in all_fields:
                        raise ValueError(
                            f"ES|QL: field {f!r} not in policy {policy!r}"
                        )
            self._end(p)
            for f in fields:
                if f in self.schema:
                    raise ValueError(
                        f"ES|QL: enrich field {f!r} collides with an "
                        "existing column"
                    )
                self.schema[f] = _LOOKUP_SCHEMAS[table][f]
            self.stages.append(("enrich", (table, match, col, fields)))
        elif k == "LOOKUP":
            p.expect("kw", "JOIN")
            table = p.expect("name").text
            if table not in _LOOKUP_SCHEMAS:
                raise ValueError(f"ES|QL: unknown lookup table {table!r}")
            p.expect("kw", "ON")
            col = p.expect("name").text
            self._end(p)
            if col not in self.schema:
                raise ValueError(f"ES|QL: unknown column {col!r}")
            if col not in _LOOKUP_SCHEMAS[table]:
                raise ValueError(
                    f"ES|QL: join column {col!r} not in lookup "
                    f"table {table!r} (LOOKUP JOIN matches by NAME — "
                    "RENAME the local column first)"
                )
            fields = [
                (f, t) for f, t in _LOOKUP_SCHEMAS[table].items() if f != col
            ]
            for f, t in fields:
                if f in self.schema:
                    raise ValueError(
                        f"ES|QL: lookup column {f!r} collides with an "
                        "existing column"
                    )
                self.schema[f] = t
            self.stages.append(("lookup", (table, col, fields)))
        elif k == "SAMPLE":
            # ES 8.19 SAMPLE <probability>.  ES hashes internal doc ids
            # under a per-run seed; the engine's determinism contract
            # replaces the seed with RNG-free hash membership on the row's
            # identity column (the agg_random_sampler convention), so both
            # engines — and every re-run — select the identical subset.
            t = p.expect("num")
            prob = float(t.text)
            self._end(p)
            if not 0.0 < prob < 1.0:
                raise ValueError("ES|QL: SAMPLE probability must be in (0, 1)")
            permille = int(round(prob * 1000))
            if not 1 <= permille <= 999:
                raise ValueError(
                    "ES|QL: SAMPLE probability resolves outside "
                    "[0.001, 0.999]"
                )
            id_col = next(
                (
                    c
                    for c in ("url", "doc_id", "event_id", "vec_id")
                    if c in self.schema
                ),
                None,
            )
            if id_col is None:
                raise ValueError(
                    "ES|QL: SAMPLE needs the row identity column "
                    "(url / doc_id / event_id / vec_id) still in scope"
                )
            self.stages.append(("sample", (id_col, permille)))
        elif k == "FORK":
            if self._in_fork:
                raise ValueError("ES|QL: FORK cannot be nested")
            entry_schema = dict(self.schema)
            branches: list[tuple[list[tuple], dict]] = []
            while p.peek() is not None:
                p.expect("op", "(")
                depth, toks = 1, []
                while True:
                    t = p.next()
                    if t.kind == "op" and t.text == "(":
                        depth += 1
                    elif t.kind == "op" and t.text == ")":
                        depth -= 1
                        if depth == 0:
                            break
                    toks.append(t)
                segs: list[list[Tok]] = [[]]
                d2 = 0
                for t in toks:
                    if t.kind == "op" and t.text == "(":
                        d2 += 1
                    elif t.kind == "op" and t.text == ")":
                        d2 -= 1
                    if t.kind == "op" and t.text == "|" and d2 == 0:
                        segs.append([])
                    else:
                        segs[-1].append(t)
                saved_stages, saved_schema = self.stages, self.schema
                self.stages, self.schema = [], dict(entry_schema)
                self._in_fork = True
                try:
                    for seg in segs:
                        if not seg:
                            raise ValueError("ES|QL: empty FORK branch command")
                        self._command(seg)
                    branches.append((self.stages, dict(self.schema)))
                finally:
                    self._in_fork = False
                    self.stages, self.schema = saved_stages, saved_schema
            if not 2 <= len(branches) <= 8:
                raise ValueError("ES|QL: FORK takes 2-8 branches")
            merged: dict[str, str] = {}
            for _, bschema in branches:
                for c, typ in bschema.items():
                    if c == "_fork":
                        raise ValueError(
                            "ES|QL: FORK branches may not define _fork"
                        )
                    if c in merged and merged[c] != typ:
                        raise ValueError(
                            f"ES|QL: FORK branches disagree on the type of "
                            f"{c!r} ({merged[c]} vs {typ})"
                        )
                    merged.setdefault(c, typ)
            merged["_fork"] = "string"
            self.schema = merged
            self.stages.append(("fork", branches))
        elif k == "FUSE":
            if self._in_fork:
                raise ValueError("ES|QL: FUSE cannot appear inside a FORK branch")
            method = "rrf"
            t = p.peek()
            if t is not None and t.text.upper() in ("RRF", "LINEAR"):
                p.next()
                method = t.text.upper().lower()
            self._end(p)
            if not self.stages or self.stages[-1][0] != "fork":
                raise ValueError("ES|QL: FUSE must immediately follow FORK")
            if self.schema.get("_score") not in ("long", "integer", "double"):
                raise ValueError(
                    "ES|QL: FUSE needs a numeric _score column from the "
                    "FORK branches"
                )
            branches = self.stages[-1][1]
            for _, bschema in branches:
                if bschema.get("_score") not in ("long", "integer", "double"):
                    raise ValueError(
                        "ES|QL: every FORK branch must produce a numeric "
                        "_score for FUSE"
                    )
            keys = [c for c in self.schema if c not in ("_fork", "_score")]
            if not keys:
                raise ValueError("ES|QL: FUSE has no identity columns")
            self.schema = {
                c: t for c, t in self.schema.items() if c != "_fork"
            }
            self.schema["_score"] = "double"
            self.stages.append(("fuse", (method, len(branches), keys)))
        else:
            raise ValueError(f"ES|QL: unsupported command {k}")

    @staticmethod
    def _end(p: _P) -> None:
        if p.peek() is not None:
            raise ValueError(
                f"ES|QL: trailing tokens from {p.peek().text!r}"
            )

    def _ts_stats_cmd(self, p: _P) -> None:
        """TS-mode STATS (ES|QL 9.1): every item is a two-level
        `outer(inner_over_time(field))` — the inner aggregate runs per
        SERIES (the dims _tsid) within each BY group, the outer combines
        across series.  RATE is counter-only, the *_OVER_TIME family is
        gauge-only — the split ES enforces in the TSDB field mapping."""
        mapping = _TS_MAPPINGS[self.source]
        dims, tscol = mapping["dims"], mapping["ts"]
        for c in (*dims, tscol):
            if c not in self.schema:
                raise ValueError(
                    f"ES|QL: TS STATS needs column {c!r} (dropped upstream)"
                )
        items = []  # (name, outer, inner, field, inner_rett, outer_rett)
        while True:
            name = p.expect("name").text
            p.expect("op", "=")
            outer = p.expect("name").text.upper()
            if outer not in _TS_OUTER:
                raise ValueError(
                    f"ES|QL: TS STATS outer aggregate must be one of "
                    f"{sorted(_TS_OUTER)}, got {outer!r}"
                )
            p.expect("op", "(")
            inner = p.expect("name").text.upper()
            if inner not in _TS_INNER:
                raise ValueError(
                    f"ES|QL: TS STATS inner function must be one of "
                    f"{sorted(_TS_INNER)}, got {inner!r}"
                )
            p.expect("op", "(")
            field = p.expect("name").text
            p.expect("op", ")")
            p.expect("op", ")")
            if field not in self.schema:
                raise ValueError(f"ES|QL: unknown column {field!r}")
            is_counter = field in mapping["counters"]
            if inner == "RATE" and not is_counter:
                raise ValueError(
                    f"ES|QL: RATE needs a counter field, {field!r} is a "
                    "gauge"
                )
            if inner not in ("RATE", "COUNT_OVER_TIME") and is_counter:
                raise ValueError(
                    f"ES|QL: counter field {field!r} only supports RATE"
                )
            if self.schema[field] not in ("long", "double"):
                raise ValueError(
                    f"ES|QL: TS STATS needs a numeric field, {field!r} is "
                    f"{self.schema[field]}"
                )
            inner_rett = _TS_INNER[inner] or self.schema[field]
            outer_rett = _AGGS[outer][1] or inner_rett
            items.append((name, outer, inner, field, inner_rett, outer_rett))
            if not p.accept("op", ","):
                break
        keys: list[str] = []
        if p.accept("kw", "BY"):
            while True:
                keys.append(p.expect("name").text)
                if not p.accept("op", ","):
                    break
        self._end(p)
        for key in keys:
            if key not in self.schema:
                raise ValueError(f"ES|QL: unknown BY column {key!r}")
        new_schema = {key: self.schema[key] for key in keys}
        for name, _o, _i, _f, _ir, outer_rett in items:
            new_schema[name] = outer_rett
        self.schema = new_schema
        self.stages.append(("ts_stats", (items, keys, dims, tscol)))
        # after the aggregation the relation is no longer per-sample: any
        # later STATS is an ordinary one
        self.time_series = False

    # -- Spark execution --------------------------------------------

    def dataframe(
        self,
        spark: SparkSession,
        sf_dir: str,
        tables: dict[str, DataFrame] | None = None,
    ) -> DataFrame:
        """Execute on Spark.  `tables` overrides the default sf_dir loaders
        (bench runs the program against the expanded corpus this way)."""
        if self.row_items is not None:
            df = spark.range(1).select(
                *[
                    F.expr(_emit(e, "spark")).alias(name)
                    for name, e in self.row_items
                ]
            )
            return self._apply_stages(df, self.stages, spark, sf_dir)
        if tables and self.source in tables:
            df = tables[self.source]
        else:
            loaders = {
                "corpus": load_corpus,
                "documents": load_documents,
                "events": load_events,
                "embeddings": load_embeddings,
            }
            df = loaders[self.source](spark, sf_dir)
        return self._apply_stages(df, self.stages, spark, sf_dir)

    def _apply_stages(
        self,
        df: DataFrame,
        stages: list[tuple],
        spark: SparkSession,
        sf_dir: str,
    ) -> DataFrame:
        pending_sort: list[_SortItem] | None = None

        def apply_sort(d: DataFrame, items: list[_SortItem]) -> DataFrame:
            cols = []
            for it in items:
                c = F.expr(_emit(it.expr, "spark"))
                if it.desc:
                    c = (
                        c.desc_nulls_first()
                        if it.nulls_first
                        else c.desc_nulls_last()
                        if it.nulls_first is not None
                        else c.desc()
                    )
                else:
                    c = (
                        c.asc_nulls_first()
                        if it.nulls_first
                        else c.asc_nulls_last()
                        if it.nulls_first is not None
                        else c.asc()
                    )
                cols.append(c)
            return d.orderBy(*cols)

        for kind, payload in stages:
            if kind == "where":
                df = df.filter(F.expr(_emit(payload, "spark")))
            elif kind == "eval":
                for name, e in payload:
                    df = df.withColumn(name, F.expr(_emit(e, "spark")))
            elif kind == "stats":
                aggs, keys = payload
                cols = [
                    self._agg_spark(e, filt).alias(name)
                    for name, e, _, filt in aggs
                ]
                df = df.groupBy(*keys).agg(*cols) if keys else df.agg(*cols)
            elif kind == "ts_stats":
                items, keys, dims, tscol = payload
                from pyspark.sql import Window as _W

                inner_keys = list(dict.fromkeys([*dims, *keys]))
                rate_fields = sorted(
                    {f for _n, _o, inn, f, _ir, _or in items if inn == "RATE"}
                )
                for rf in rate_fields:
                    # per-series sample order; the events timestamp is a
                    # strictly increasing sequence so the order is total
                    w = _W.partitionBy(*inner_keys).orderBy(tscol)
                    df = df.withColumn(f"__prev_{rf}", F.lag(rf).over(w))
                epoch = F.unix_timestamp(F.col(tscol))
                inner_cols = []
                for name, _outer, inn, f, _ir, _or in items:
                    c = F.col(f)
                    if inn == "RATE":
                        prev = F.col(f"__prev_{f}")
                        # reset-compensated increase: a drop means the
                        # counter restarted, so the new value IS the step
                        step = F.when(
                            prev.isNull(), F.lit(None)
                        ).otherwise(
                            F.when(c >= prev, c - prev).otherwise(c)
                        )
                        tspan = F.max(epoch) - F.min(epoch)
                        expr = F.when(
                            tspan > 0,
                            F.sum(step).cast("double") / tspan,
                        )
                    elif inn == "MAX_OVER_TIME":
                        expr = F.max(c)
                    elif inn == "MIN_OVER_TIME":
                        expr = F.min(c)
                    elif inn == "SUM_OVER_TIME":
                        expr = F.sum(c)
                    elif inn == "AVG_OVER_TIME":
                        expr = F.avg(c)
                    elif inn == "COUNT_OVER_TIME":
                        expr = F.count(c)
                    elif inn == "FIRST_OVER_TIME":
                        expr = F.min_by(c, F.col(tscol))
                    else:  # LAST_OVER_TIME
                        expr = F.max_by(c, F.col(tscol))
                    inner_cols.append(expr.alias(f"__ot_{name}"))
                g1 = df.groupBy(*inner_keys).agg(*inner_cols)
                outer_fns = {
                    "SUM": F.sum, "AVG": F.avg, "MIN": F.min,
                    "MAX": F.max, "COUNT": F.count,
                }
                outer_cols = [
                    outer_fns[outer](F.col(f"__ot_{name}")).alias(name)
                    for name, outer, _i, _f, _ir, _or in items
                ]
                df = (
                    g1.groupBy(*keys).agg(*outer_cols)
                    if keys
                    else g1.agg(*outer_cols)
                )
            elif kind == "sort":
                pending_sort = payload
                df = apply_sort(df, payload)
            elif kind == "limit":
                df = df.limit(payload)
                pending_sort = None
            elif kind == "keep":
                df = df.select(*payload)
            elif kind == "drop":
                df = df.drop(*payload)
            elif kind == "rename":
                for old, new in payload:
                    df = df.withColumnRenamed(old, new)
            elif kind == "extract":
                field, rx, fields = payload
                matched = F.col(field).rlike(rx)
                for gi, (name, typ) in enumerate(fields, start=1):
                    c = F.when(matched, F.regexp_extract(F.col(field), rx, gi))
                    if typ in ("int", "long"):
                        c = c.cast("bigint")
                    elif typ == "float":
                        c = c.cast("double")
                    df = df.withColumn(name, c)
            elif kind == "mv_expand":
                df = df.withColumn(payload, F.explode(F.col(payload)))
            elif kind == "inlinestats":
                aggs, keys = payload
                from pyspark.sql import Window as _W

                w = (
                    _W.partitionBy(*keys)
                    if keys
                    # global inline stats: a deliberate single-partition
                    # window — ES computes the same global aggregate
                    else _W.partitionBy(F.lit(0))
                )
                for name, e, _ in aggs:
                    df = df.withColumn(name, self._agg_spark(e).over(w))
            elif kind == "change_point":
                val, key, tname, pname = payload
                from pyspark.sql import Window as _W

                # axis-sized input by contract (see parser note) — the
                # single-partition window is bounded and deliberate
                w = (
                    _W.partitionBy(F.lit(0))
                    .orderBy(key)
                    .rowsBetween(_W.unboundedPreceding, _W.currentRow)
                )
                wall = _W.partitionBy(F.lit(0))
                d = (
                    df.withColumn(
                        "__rn",
                        F.row_number().over(
                            _W.partitionBy(F.lit(0)).orderBy(key)
                        ),
                    )
                    .withColumn("__cum", F.sum(val).over(w))
                    .withColumn("__n", F.count(F.lit(1)).over(wall))
                    .withColumn("__tot", F.sum(val).over(wall))
                )
                lc = F.col("__rn") - 1
                rc = F.col("__n") - F.col("__rn") + 1
                ls = F.col("__cum") - F.col(val)
                mean_l = ls / lc
                mean_r = (F.col("__tot") - ls) / rc
                d = d.withColumn(
                    "__score",
                    F.when(
                        F.col("__rn") >= 2,
                        F.round(
                            F.abs(mean_r - mean_l)
                            * F.sqrt(
                                (lc * rc).cast("double") / F.col("__n")
                            ),
                            4,
                        ),
                    ),
                )
                d = d.withColumn("__best", F.max("__score").over(wall))
                d = d.withColumn(
                    "__bkey",
                    F.min(
                        F.when(
                            F.col("__score") == F.col("__best"), F.col(key)
                        )
                    ).over(wall),
                )
                is_cp = (
                    F.col("__score").isNotNull()
                    & (F.col("__score") == F.col("__best"))
                    & (F.col(key) == F.col("__bkey"))
                )
                df = (
                    d.withColumn(tname, F.when(is_cp, F.lit("step_change")))
                    .withColumn(pname, F.when(is_cp, F.col("__score")))
                    .drop(
                        "__rn", "__cum", "__n", "__tot", "__score",
                        "__best", "__bkey",
                    )
                )
            elif kind == "completion":
                name, e, _inf = payload
                pe = _emit(e, "spark")
                toks = _tokens_spark(pe)
                df = df.withColumn(
                    name,
                    F.expr(
                        f"concat(array_join(slice({toks}, 1, 8), ' '), "
                        f"' #', substring(md5({pe}), 1, 8))"
                    ),
                )
            elif kind == "rerank":
                qtext, field, _inf = payload
                df = df.withColumn(
                    "_score", F.expr(_rerank_expr(qtext, field, "spark"))
                )
            elif kind == "enrich":
                table, match, col, fields = payload
                lk = spark.read.parquet(f"{sf_dir}/{table}.parquet").select(
                    F.col(match).alias("__enrich_key__"), *fields
                )
                df = df.join(
                    F.broadcast(lk),
                    df[col] == F.col("__enrich_key__"),
                    "left",
                ).drop("__enrich_key__")
            elif kind == "lookup":
                table, col, fields = payload
                lk = spark.read.parquet(f"{sf_dir}/{table}.parquet").select(
                    col, *[f for f, _ in fields]
                )
                df = df.join(F.broadcast(lk), on=col, how="left")
            elif kind == "sample":
                from ..operators.dedup import h64

                id_col, permille = payload
                df = df.filter(
                    F.pmod(h64(F.col(id_col).cast("string")), F.lit(1000))
                    < permille
                )
            elif kind == "knn":
                field, qv, kk, idc = payload
                df = (
                    df.withColumn(
                        "_score", F.expr(_knn_score(field, qv, "spark"))
                    )
                    .orderBy(F.desc("_score"), F.asc(idc))
                    .limit(kk)
                )
            elif kind == "fork":
                # branch trailing SORTs (without LIMIT) are no-ops: the
                # union destroys order in both engines.
                parts = []
                for j, (bstages, _bschema) in enumerate(payload, start=1):
                    b = self._apply_stages(df, bstages, spark, sf_dir)
                    parts.append(b.withColumn("_fork", F.lit(f"fork{j}")))
                out = parts[0]
                for b in parts[1:]:
                    out = out.unionByName(b, allowMissingColumns=True)
                df = out
            elif kind == "fuse":
                from pyspark.sql import Window

                method, nb, keys = payload
                w = Window.partitionBy("_fork").orderBy(
                    F.col("_score").desc_nulls_last(),
                    *[F.col(c).asc_nulls_last() for c in keys],
                )
                contrib = (
                    F.lit(1.0) / (F.lit(60.0) + F.rank().over(w).cast("double"))
                    if method == "rrf"
                    else F.col("_score").cast("double")
                )
                ranked = df.withColumn("__c", contrib)
                # fixed-branch-order sum (fork1..forkN) so the float total
                # is the same in any engine/partitioning
                per = [
                    F.max(
                        F.when(F.col("_fork") == f"fork{j}", F.col("__c"))
                    ).alias(f"__c{j}")
                    for j in range(1, nb + 1)
                ]
                g = ranked.groupBy(*[F.col(c) for c in keys]).agg(*per)
                total = F.coalesce(F.col("__c1"), F.lit(0.0))
                for j in range(2, nb + 1):
                    total = total + F.coalesce(F.col(f"__c{j}"), F.lit(0.0))
                df = g.select(*keys, total.alias("_score"))
        _ = pending_sort
        return df

    @staticmethod
    def _agg_spark(e: Func, filt=None):
        # Filtered aggregate (`agg WHERE cond`, ES 8.16): every supported
        # aggregate ignores NULL inputs, so masking the argument with
        # WHEN(cond) is exactly SQL's FILTER clause.
        cond = F.expr(_emit(filt, "spark")) if filt is not None else None
        if e.name == "COUNT_STAR":
            return (
                F.count(F.when(cond, F.lit(1)))
                if cond is not None
                else F.count(F.lit(1))
            )
        arg = F.expr(_emit(e.args[0], "spark"))
        if cond is not None:
            arg = F.when(cond, arg)
        if e.name == "COUNT":
            return F.count(arg)
        if e.name == "SUM":
            return F.sum(arg)
        if e.name == "AVG":
            return F.avg(arg)
        if e.name == "MIN":
            return F.min(arg)
        if e.name == "MAX":
            return F.max(arg)
        if e.name == "COUNT_DISTINCT":
            return F.count_distinct(arg)
        if e.name == "MEDIAN":
            return F.median(arg)
        if e.name == "PERCENTILE":
            p = e.args[1].value
            return F.percentile(arg, F.lit(p / 100.0))
        if e.name == "STD_DEV":
            return F.stddev_pop(arg)
        raise ValueError(f"ES|QL: bad aggregate {e.name}")

    # -- DuckDB oracle -----------------------------------------------

    def to_duckdb_sql(self) -> str:
        ctes: list[str] = []
        if self.row_items is not None:
            items = ", ".join(
                f"{_emit(e, 'duck')} AS {name}" for name, e in self.row_items
            )
            ctes.append(f"rowsrc AS (SELECT {items})")
            prev = "rowsrc"
        elif self.source == "corpus":
            ctes.append(CORPUS_CTE.strip())
            prev = "corpus"
        else:
            prev = self.source
        schema = dict(self._schema0)
        prev, _i, schema, order_tail = self._stages_duck(
            self.stages, ctes, prev, 0, schema
        )
        body = f"WITH {', '.join(ctes)} " if ctes else ""
        return f"{body}SELECT * FROM {prev}{order_tail}"

    def _stages_duck(
        self,
        stages: list[tuple],
        ctes: list[str],
        prev: str,
        i: int,
        schema: dict,
    ) -> tuple[str, int, dict, str]:
        order_tail = ""

        def add(select_sql: str) -> None:
            nonlocal prev, i
            ctes.append(f"e{i} AS (SELECT {select_sql} FROM {prev})")
            prev = f"e{i}"
            i += 1

        for kind, payload in stages:
            if kind == "where":
                nonlocal_sql = _emit(payload, "duck")
                ctes.append(
                    f"e{i} AS (SELECT * FROM {prev} WHERE {nonlocal_sql})"
                )
                prev = f"e{i}"
                i += 1
            elif kind == "eval":
                for name, e in payload:
                    sql = _emit(e, "duck")
                    if name in schema:
                        add(f"* REPLACE ({sql} AS {name})")
                    else:
                        schema[name] = e.typ
                        add(f"*, {sql} AS {name}")
            elif kind == "stats":
                aggs, keys = payload
                parts = list(keys)
                for name, e, rett, filt in aggs:
                    fs = _emit(filt, "duck") if filt is not None else None
                    parts.append(f"{self._agg_duck(e, rett, fs)} AS {name}")
                sel = ", ".join(parts)
                group = (
                    f" GROUP BY {', '.join(keys)}" if keys else ""
                )
                ctes.append(f"e{i} AS (SELECT {sel} FROM {prev}{group})")
                prev = f"e{i}"
                i += 1
                schema = {key: schema[key] for key in keys}
                for name, _, rett, _filt in aggs:
                    schema[name] = rett
            elif kind == "ts_stats":
                items, keys, dims, tscol = payload
                inner_keys = list(dict.fromkeys([*dims, *keys]))
                ik = ", ".join(inner_keys)
                rate_fields = sorted(
                    {f for _n, _o, inn, f, _ir, _or in items if inn == "RATE"}
                )
                if rate_fields:
                    lags = ", ".join(
                        f"lag({rf}) OVER (PARTITION BY {ik} "
                        f"ORDER BY {tscol}) AS __prev_{rf}"
                        for rf in rate_fields
                    )
                    ctes.append(f"e{i} AS (SELECT *, {lags} FROM {prev})")
                    prev = f"e{i}"
                    i += 1
                ep = f"CAST(epoch({tscol}) AS BIGINT)"
                parts = list(inner_keys)
                for name, _outer, inn, f, inner_rett, _or in items:
                    if inn == "RATE":
                        step = (
                            f"CASE WHEN __prev_{f} IS NULL THEN NULL "
                            f"WHEN {f} >= __prev_{f} THEN {f} - __prev_{f} "
                            f"ELSE {f} END"
                        )
                        span = f"(max({ep}) - min({ep}))"
                        sql = (
                            f"CASE WHEN {span} > 0 THEN "
                            f"CAST(sum({step}) AS DOUBLE) / {span} END"
                        )
                    elif inn == "MAX_OVER_TIME":
                        sql = f"max({f})"
                    elif inn == "MIN_OVER_TIME":
                        sql = f"min({f})"
                    elif inn == "SUM_OVER_TIME":
                        cast = "BIGINT" if inner_rett == "long" else "DOUBLE"
                        sql = f"CAST(sum({f}) AS {cast})"
                    elif inn == "AVG_OVER_TIME":
                        sql = f"avg({f})"
                    elif inn == "COUNT_OVER_TIME":
                        sql = f"CAST(count({f}) AS BIGINT)"
                    elif inn == "FIRST_OVER_TIME":
                        sql = f"arg_min({f}, {tscol})"
                    else:  # LAST_OVER_TIME
                        sql = f"arg_max({f}, {tscol})"
                    parts.append(f"{sql} AS __ot_{name}")
                ctes.append(
                    f"e{i} AS (SELECT {', '.join(parts)} FROM {prev} "
                    f"GROUP BY {ik})"
                )
                prev = f"e{i}"
                i += 1
                outer_parts = list(keys)
                for name, outer, _i2, _f, _ir, outer_rett in items:
                    col = f"__ot_{name}"
                    if outer == "COUNT":
                        o = f"CAST(count({col}) AS BIGINT)"
                    elif outer == "SUM":
                        cast = "BIGINT" if outer_rett == "long" else "DOUBLE"
                        o = f"CAST(sum({col}) AS {cast})"
                    elif outer == "AVG":
                        o = f"avg({col})"
                    else:
                        o = f"{outer.lower()}({col})"
                    outer_parts.append(f"{o} AS {name}")
                group = f" GROUP BY {', '.join(keys)}" if keys else ""
                ctes.append(
                    f"e{i} AS (SELECT {', '.join(outer_parts)} "
                    f"FROM {prev}{group})"
                )
                prev = f"e{i}"
                i += 1
                schema = {key: schema[key] for key in keys}
                for name, _o, _i2, _f, _ir, outer_rett in items:
                    schema[name] = outer_rett
            elif kind == "sort":
                terms = []
                for it in payload:
                    t = _emit(it.expr, "duck")
                    t += " DESC" if it.desc else " ASC"
                    if it.nulls_first is True:
                        t += " NULLS FIRST"
                    elif it.nulls_first is False:
                        t += " NULLS LAST"
                    terms.append(t)
                order_tail = " ORDER BY " + ", ".join(terms)
            elif kind == "limit":
                ctes.append(
                    f"e{i} AS (SELECT * FROM {prev}{order_tail} "
                    f"LIMIT {payload})"
                )
                prev = f"e{i}"
                i += 1
                order_tail = ""
            elif kind == "keep":
                add(", ".join(payload))
                schema = {nm: schema[nm] for nm in payload}
            elif kind == "drop":
                add(f"* EXCLUDE ({', '.join(payload)})")
                for nm in payload:
                    schema.pop(nm, None)
            elif kind == "rename":
                for old, new in payload:
                    add(f"* EXCLUDE ({old}), {old} AS {new}")
                    schema[new] = schema.pop(old)
            elif kind == "extract":
                field, rx, fields = payload
                parts = []
                for gi, (name, typ) in enumerate(fields, start=1):
                    e = (
                        f"CASE WHEN regexp_matches({field}, "
                        f"{_lit_duck(rx)}) THEN regexp_extract({field}, "
                        f"{_lit_duck(rx)}, {gi}) END"
                    )
                    if typ in ("int", "long"):
                        e = f"TRY_CAST({e} AS BIGINT)"
                    elif typ == "float":
                        e = f"TRY_CAST({e} AS DOUBLE)"
                    parts.append((name, e))
                repl = [f"{e} AS {nm}" for nm, e in parts if nm in schema]
                app = [f"{e} AS {nm}" for nm, e in parts if nm not in schema]
                sel = "*"
                if repl:
                    sel += " REPLACE (" + ", ".join(repl) + ")"
                if app:
                    sel += ", " + ", ".join(app)
                add(sel)
                for nm, _ in parts:
                    schema.setdefault(nm, "string")
            elif kind == "mv_expand":
                add(f"* EXCLUDE ({payload}), unnest({payload}) AS {payload}")
            elif kind == "inlinestats":
                aggs, keys = payload
                part = (
                    f"PARTITION BY {', '.join(keys)}" if keys else ""
                )
                parts = []
                for name, e, rett in aggs:
                    parts.append(
                        f"{self._agg_duck_window(e, rett, part)} AS {name}"
                    )
                add("*, " + ", ".join(parts))
                for name, _, rett in aggs:
                    schema[name] = rett
            elif kind == "change_point":
                val, key, tname, pname = payload
                base_cols = ", ".join(schema)
                add(
                    f"*, row_number() OVER (ORDER BY {key}) AS __rn, "
                    f"sum({val}) OVER (ORDER BY {key} ROWS UNBOUNDED "
                    f"PRECEDING) AS __cum, count(*) OVER () AS __n, "
                    f"sum({val}) OVER () AS __tot"
                )
                add(
                    "*, CASE WHEN __rn >= 2 THEN round(abs("
                    f"(__tot - __cum + {val}) * 1.0 / (__n - __rn + 1) - "
                    f"(__cum - {val}) * 1.0 / (__rn - 1)) * "
                    "sqrt((__rn - 1.0) * (__n - __rn + 1.0) / __n), 4) "
                    "END AS __score"
                )
                add("*, max(__score) OVER () AS __best")
                add(
                    f"*, min(CASE WHEN __score = __best THEN {key} END) "
                    "OVER () AS __bkey"
                )
                add(
                    f"{base_cols}, CASE WHEN __score IS NOT NULL AND "
                    f"__score = __best AND {key} = __bkey "
                    f"THEN 'step_change' END AS {tname}, "
                    f"CASE WHEN __score IS NOT NULL AND __score = __best "
                    f"AND {key} = __bkey THEN __score END AS {pname}"
                )
                schema[tname] = "string"
                schema[pname] = "double"
            elif kind == "completion":
                name, e, _inf = payload
                pe = _emit(e, "duck")
                toks = _tokens_duck(pe)
                add(
                    f"*, array_to_string(({toks})[1:8], ' ') || ' #' || "
                    f"substr(md5({pe}), 1, 8) AS {name}"
                )
                schema[name] = "string"
            elif kind == "rerank":
                qtext, field, _inf = payload
                add(f"*, {_rerank_expr(qtext, field, 'duck')} AS _score")
                schema["_score"] = "long"
            elif kind == "enrich":
                table, match, col, fields = payload
                cols = ", ".join(f"l.{f}" for f in fields)
                ctes.append(
                    f"e{i} AS (SELECT p.*, {cols} FROM {prev} p "
                    f"LEFT JOIN {table} l ON p.{col} = l.{match})"
                )
                prev = f"e{i}"
                i += 1
                for f in fields:
                    schema[f] = _LOOKUP_SCHEMAS[table][f]
            elif kind == "lookup":
                table, col, fields = payload
                cols = ", ".join(f"l.{f}" for f, _ in fields)
                ctes.append(
                    f"e{i} AS (SELECT p.*, {cols} FROM {prev} p "
                    f"LEFT JOIN {table} l ON p.{col} = l.{col})"
                )
                prev = f"e{i}"
                i += 1
                for f, t in fields:
                    schema[f] = t
            elif kind == "sample":
                from ..operators.dedup import H64_SQL

                id_col, permille = payload
                h = H64_SQL.format(x=f"CAST({id_col} AS VARCHAR)")
                ctes.append(
                    f"e{i} AS (SELECT * FROM {prev} "
                    f"WHERE ({h}) % 1000 < {permille})"
                )
                prev = f"e{i}"
                i += 1
            elif kind == "knn":
                field, qv, kk, idc = payload
                ctes.append(
                    f"e{i} AS (SELECT *, {_knn_score(field, qv, 'duck')} "
                    f"AS _score FROM {prev} "
                    f"ORDER BY _score DESC, {idc} ASC LIMIT {kk})"
                )
                schema["_score"] = "double"
                prev = f"e{i}"
                i += 1
            elif kind == "fork":
                legs = []
                for j, (bstages, _bschema) in enumerate(payload, start=1):
                    bprev, i, _bs, _btail = self._stages_duck(
                        bstages, ctes, prev, i, dict(schema)
                    )
                    legs.append(
                        f"SELECT *, 'fork{j}' AS _fork FROM {bprev}"
                    )
                ctes.append(f"e{i} AS ({' UNION ALL BY NAME '.join(legs)})")
                prev = f"e{i}"
                i += 1
                merged: dict = {}
                for _, bs in payload:
                    for c, t in bs.items():
                        merged.setdefault(c, t)
                merged["_fork"] = "string"
                schema = merged
            elif kind == "fuse":
                method, nb, keys = payload
                order = ", ".join(
                    ["_score DESC NULLS LAST"]
                    + [f'"{c}" ASC NULLS LAST' for c in keys]
                )
                contrib = (
                    "1.0 / (60.0 + CAST(rank() OVER "
                    f"(PARTITION BY _fork ORDER BY {order}) AS DOUBLE))"
                    if method == "rrf"
                    else "CAST(_score AS DOUBLE)"
                )
                ctes.append(
                    f"e{i} AS (SELECT *, {contrib} AS __c FROM {prev})"
                )
                prev = f"e{i}"
                i += 1
                klist = ", ".join(f'"{c}"' for c in keys)
                per = " + ".join(
                    f"COALESCE(max(CASE WHEN _fork = 'fork{j}' "
                    "THEN __c END), 0.0)"
                    for j in range(1, nb + 1)
                )
                ctes.append(
                    f"e{i} AS (SELECT {klist}, {per} AS _score "
                    f"FROM {prev} GROUP BY {klist})"
                )
                prev = f"e{i}"
                i += 1
                schema = {c: schema[c] for c in keys}
                schema["_score"] = "double"
        return prev, i, schema, order_tail

    @staticmethod
    def _agg_duck_window(e: Func, rett: str, partition: str) -> str:
        """Window-function form: OVER binds to the call, casts wrap it."""
        over = f"OVER ({partition})"
        if e.name == "COUNT_STAR":
            return f"CAST(count(*) {over} AS BIGINT)"
        arg = _emit(e.args[0], "duck")
        if e.name == "COUNT":
            return f"CAST(count({arg}) {over} AS BIGINT)"
        if e.name == "SUM":
            cast = "BIGINT" if rett == "long" else "DOUBLE"
            return f"CAST(sum({arg}) {over} AS {cast})"
        if e.name in ("AVG", "MIN", "MAX"):
            return f"{e.name.lower()}({arg}) {over}"
        raise ValueError(f"ES|QL: bad inline aggregate {e.name}")

    @staticmethod
    def _agg_duck(e: Func, rett: str, filt_sql: str | None = None) -> str:
        # FILTER binds to the aggregate call; any CAST wraps the filtered
        # call (`CAST(count(*) FILTER (WHERE c) AS BIGINT)`).
        tail = f" FILTER (WHERE {filt_sql})" if filt_sql else ""
        if e.name == "COUNT_STAR":
            return f"CAST(count(*){tail} AS BIGINT)"
        arg = _emit(e.args[0], "duck")
        if e.name == "COUNT":
            return f"CAST(count({arg}){tail} AS BIGINT)"
        if e.name == "SUM":
            cast = "BIGINT" if rett == "long" else "DOUBLE"
            return f"CAST(sum({arg}){tail} AS {cast})"
        if e.name == "AVG":
            return f"avg({arg}){tail}"
        if e.name == "MIN":
            return f"min({arg}){tail}"
        if e.name == "MAX":
            return f"max({arg}){tail}"
        if e.name == "COUNT_DISTINCT":
            return f"CAST(count(DISTINCT {arg}){tail} AS BIGINT)"
        if e.name == "MEDIAN":
            return f"CAST(median({arg}){tail} AS DOUBLE)"
        if e.name == "PERCENTILE":
            p = e.args[1].value
            return f"quantile_cont({arg}, {p / 100.0!r}){tail}"
        if e.name == "STD_DEV":
            # population stddev matches Spark cell-for-cell: 0.0 on a
            # single value, NULL on an empty (fully filtered) group
            return f"stddev_pop({arg}){tail}"
        raise ValueError(f"ES|QL: bad aggregate {e.name}")


# ----------------------------------------------------------- public API


def execute_esql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """POST /_query analogue: compile and run an ES|QL program."""
    return EsqlPlan(query).dataframe(spark, sf_dir)


def esql_to_duckdb(query: str) -> str:
    """The oracle: the same program rendered as a DuckDB CTE chain."""
    return EsqlPlan(query).to_duckdb_sql()


def validate_esql(query: str) -> dict:
    """_validate-style parse check: never raises."""
    try:
        plan = EsqlPlan(query)
        return {
            "valid": True,
            "source": plan.source,
            "stages": [k for k, _ in plan.stages],
            "columns": list(plan.schema),
        }
    except ValueError as exc:
        return {"valid": False, "error": str(exc)}
