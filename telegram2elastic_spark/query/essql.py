"""Elasticsearch SQL (`_sql` endpoint) over the verified engine paths.

The reference serves its corpus through Elasticsearch (README.md:5,
output/elasticsearch.py:33), whose fourth query surface — after the JSON
DSL, EQL and ES|QL — is ES SQL: ANSI-flavoured SELECT statements with the
full-text extensions ``MATCH(field, 'query')`` and ``SCORE()``
(https://www.elastic.co/guide/en/elasticsearch/reference/current/xpack-sql.html).
This module is that endpoint: a recursive-descent parser for the supported
subset and two emitters that compile the SAME AST onto already-verified
machinery — routing only, zero new scoring or aggregation semantics.

Supported subset (out-of-subset constructs raise ValueError at parse time,
the `_sql` 400 contract):

    SELECT  cols | aggregates (COUNT/SUM/AVG/MIN/MAX) [AS alias] | SCORE()
    FROM    documents
    WHERE   =  <>  !=  <  <=  >  >=  IN  BETWEEN  LIKE  IS [NOT] NULL
            AND / OR / NOT, parentheses, and MATCH(text, '...') as a
            top-level conjunct (ES's own restriction: a full-text
            predicate cannot sit under OR/NOT because score and filter
            context would mix)
    GROUP BY / HAVING / ORDER BY ... [ASC|DESC] / LIMIT n

Dispatch:
  * MATCH present  -> the compressed-index WAND path (`wand_topk`) with the
    remaining conjuncts as ES filter context (`doc_filter`, global stats) —
    rank-identical to bm25_topk(global_stats=True) by the existing
    wand_doc_filter contract.  SCORE() is the BM25 score.
  * no MATCH       -> a plain Catalyst plan over the corpus: pushed-down
    predicate scan, hash aggregate, TakeOrderedAndProject.

Determinism under LIMIT: both emitters append tie-break keys to ORDER BY
(doc_id asc for detail queries, the group keys asc for aggregates) so the
limited prefix is engine- and partitioning-independent.

Why one predicate *string* feeds both engines: the WHERE compiler renders
the AST to ANSI that is valid verbatim in Spark SQL (`F.expr`) and DuckDB —
a single rendering cannot drift between the engine and its oracle.

Scale shape: the relational path is one pushed-filter scan + (optionally)
one hash aggregate + TakeOrdered — no shuffle beyond the aggregate's own.
The MATCH path inherits wand_topk's per-salt bounded-emission plan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import py_tokenize
from .bm25 import bm25_topk_sql
from .wand import wand_topk

CORPUS_COLS = ("doc_id", "url", "warc_ts", "html", "text", "lang",
               "source", "n_chars")
# html is binary — orderable/comparable surface excludes it
SCALAR_COLS = tuple(c for c in CORPUS_COLS if c != "html")
AGG_FNS = ("count", "sum", "avg", "min", "max")
NUMERIC_COLS = ("doc_id", "n_chars")

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<str>'(?:[^']|'')*')"
    r"|(?P<num>\d+\.\d+|\d+)"
    r"|(?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\*)"
    r"|(?P<word>[A-Za-z_][A-Za-z_0-9]*)"
    r")"
)


def _lex(sql: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if m is None:
            if sql[pos:].strip() == "":
                break
            raise ValueError(f"cannot lex ES SQL at: {sql[pos:pos + 20]!r}")
        pos = m.end()
        if m.group("str") is not None:
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.group("num") is not None:
            out.append(("num", m.group("num")))
        elif m.group("op") is not None:
            out.append(("op", m.group("op")))
        else:
            out.append(("word", m.group("word")))
    return out


# ------------------------------- AST ----------------------------------


@dataclass
class Lit:
    kind: str  # 'str' | 'num' | 'ts'
    value: str

    def sql(self) -> str:
        if self.kind == "num":
            return self.value
        if self.kind == "ts":
            return "TIMESTAMP '" + self.value.replace("'", "''") + "'"
        return "'" + self.value.replace("'", "''") + "'"


@dataclass
class Cmp:
    col: str
    op: str  # = <> < <= > >=
    lit: Lit


@dataclass
class InList:
    col: str
    lits: list[Lit]
    neg: bool = False


@dataclass
class Between:
    col: str
    lo: Lit
    hi: Lit


@dataclass
class LikeP:
    col: str
    pat: Lit
    neg: bool = False


@dataclass
class NullP:
    col: str
    neg: bool  # True => IS NOT NULL


@dataclass
class Match:
    col: str
    query: str


@dataclass
class Not:
    x: object


@dataclass
class And:
    xs: list


@dataclass
class Or:
    xs: list


@dataclass
class SelectItem:
    kind: str  # 'col' | 'agg' | 'score' | 'star'
    col: str | None = None
    fn: str | None = None
    alias: str | None = None

    def name(self) -> str:
        if self.alias:
            return self.alias
        if self.kind == "col":
            return self.col
        if self.kind == "score":
            return "score"
        arg = self.col if self.col else "*"
        return f"{self.fn}({arg})"


@dataclass
class Query:
    items: list[SelectItem]
    table: str
    where: object | None
    group_by: list[str] = field(default_factory=list)
    having: object | None = None
    order_by: list[tuple[str, bool]] = field(default_factory=list)  # (key, desc)
    limit: int | None = None


class _P:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def kw(self) -> str:
        t, v = self.peek()
        return v.upper() if t == "word" else ""

    def next(self) -> tuple[str, str]:
        t = self.peek()
        self.i += 1
        return t

    def expect_kw(self, w: str) -> None:
        t, v = self.next()
        if t != "word" or v.upper() != w:
            raise ValueError(f"expected {w}, got {v!r}")

    def expect_op(self, o: str) -> None:
        t, v = self.next()
        if t != "op" or v != o:
            raise ValueError(f"expected {o!r}, got {v!r}")


def parse_es_sql(sql: str) -> Query:
    """Parse the supported ES SQL subset; ValueError otherwise."""
    p = _P(_lex(sql))
    p.expect_kw("SELECT")
    items = [_select_item(p)]
    while p.peek() == ("op", ","):
        p.next()
        items.append(_select_item(p))
    p.expect_kw("FROM")
    t, table = p.next()
    if t != "word":
        raise ValueError("expected table name after FROM")
    where = None
    if p.kw() == "WHERE":
        p.next()
        where = _or_expr(p)
    group_by: list[str] = []
    if p.kw() == "GROUP":
        p.next()
        p.expect_kw("BY")
        group_by.append(_colname(p))
        while p.peek() == ("op", ","):
            p.next()
            group_by.append(_colname(p))
    having = None
    if p.kw() == "HAVING":
        p.next()
        having = _or_expr(p, allow_agg=True)
    order_by: list[tuple[str, bool]] = []
    if p.kw() == "ORDER":
        p.next()
        p.expect_kw("BY")
        order_by.append(_order_key(p))
        while p.peek() == ("op", ","):
            p.next()
            order_by.append(_order_key(p))
    limit = None
    if p.kw() == "LIMIT":
        p.next()
        t, v = p.next()
        if t != "num" or "." in v:
            raise ValueError("LIMIT takes an integer")
        limit = int(v)
    if p.peek()[0] != "eof":
        raise ValueError(f"trailing input at: {p.peek()[1]!r}")
    q = Query(items, table, where, group_by, having, order_by, limit)
    _validate(q)
    return q


def _select_item(p: _P) -> SelectItem:
    t, v = p.peek()
    if (t, v) == ("op", "*"):
        p.next()
        return SelectItem("star")
    if t != "word":
        raise ValueError(f"bad select item at {v!r}")
    up = v.upper()
    if up == "SCORE":
        p.next()
        p.expect_op("(")
        p.expect_op(")")
        return SelectItem("score", alias=_maybe_alias(p))
    if up.lower() in AGG_FNS and p.toks[p.i + 1:p.i + 2] == [("op", "(")]:
        p.next()
        p.next()  # '('
        if p.peek() == ("op", "*"):
            if up != "COUNT":
                raise ValueError(f"{up}(*) is only valid for COUNT")
            p.next()
            col = None
        else:
            col = _colname(p)
        p.expect_op(")")
        return SelectItem("agg", col=col, fn=up.lower(), alias=_maybe_alias(p))
    col = _colname(p)
    return SelectItem("col", col=col, alias=_maybe_alias(p))


def _maybe_alias(p: _P) -> str | None:
    if p.kw() == "AS":
        p.next()
        t, v = p.next()
        if t != "word":
            raise ValueError("expected alias after AS")
        return v.lower()
    return None


def _colname(p: _P) -> str:
    t, v = p.next()
    if t != "word" or v.lower() not in CORPUS_COLS:
        raise ValueError(f"unknown column: {v!r}")
    return v.lower()


def _order_key(p: _P) -> tuple[str, bool]:
    t, v = p.next()
    if t != "word":
        raise ValueError("expected ORDER BY key")
    if v.upper() == "SCORE":
        p.expect_op("(")
        p.expect_op(")")
        key = "score()"
    else:
        key = v.lower()
    desc = False
    if p.kw() in ("ASC", "DESC"):
        desc = p.kw() == "DESC"
        p.next()
    return key, desc


def _or_expr(p: _P, allow_agg: bool = False):
    xs = [_and_expr(p, allow_agg)]
    while p.kw() == "OR":
        p.next()
        xs.append(_and_expr(p, allow_agg))
    return xs[0] if len(xs) == 1 else Or(xs)


def _and_expr(p: _P, allow_agg: bool):
    xs = [_unary(p, allow_agg)]
    while p.kw() == "AND":
        p.next()
        xs.append(_unary(p, allow_agg))
    return xs[0] if len(xs) == 1 else And(xs)


def _unary(p: _P, allow_agg: bool):
    if p.kw() == "NOT":
        p.next()
        return Not(_unary(p, allow_agg))
    if p.peek() == ("op", "("):
        p.next()
        e = _or_expr(p, allow_agg)
        p.expect_op(")")
        return e
    return _pred(p, allow_agg)


def _literal(p: _P) -> Lit:
    t, v = p.peek()
    if t == "word" and v.upper() == "TIMESTAMP":
        p.next()
        t2, v2 = p.next()
        if t2 != "str":
            raise ValueError("TIMESTAMP literal needs a quoted string")
        return Lit("ts", v2)
    p.next()
    if t == "num":
        return Lit("num", v)
    if t == "str":
        return Lit("str", v)
    raise ValueError(f"expected literal, got {v!r}")


def _pred(p: _P, allow_agg: bool):
    t, v = p.peek()
    if t == "word" and v.upper() == "MATCH":
        p.next()
        p.expect_op("(")
        col = _colname(p)
        p.expect_op(",")
        t2, qv = p.next()
        if t2 != "str":
            raise ValueError("MATCH query must be a string literal")
        p.expect_op(")")
        if col != "text":
            raise ValueError("MATCH is only supported on the text field")
        return Match(col, qv)
    # HAVING side: aggregate comparisons
    if allow_agg and t == "word" and v.lower() in AGG_FNS \
            and p.toks[p.i + 1:p.i + 2] == [("op", "(")]:
        fn = v.lower()
        p.next()
        p.next()
        if p.peek() == ("op", "*"):
            if fn != "count":
                raise ValueError(f"{fn}(*) is only valid for COUNT")
            p.next()
            col = None
        else:
            col = _colname(p)
        p.expect_op(")")
        to, vo = p.next()
        if to != "op" or vo not in ("=", "<>", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"expected comparison after aggregate, got {vo!r}")
        lit = _literal(p)
        name = f"{fn}({col if col else '*'})"
        return Cmp(name, "<>" if vo == "!=" else vo, lit)
    col = _colname(p)
    if p.kw() == "IS":
        p.next()
        neg = False
        if p.kw() == "NOT":
            p.next()
            neg = True
        p.expect_kw("NULL")
        return NullP(col, neg)
    neg = False
    if p.kw() == "NOT":
        p.next()
        neg = True
        if p.kw() not in ("IN", "LIKE", "BETWEEN"):
            raise ValueError("NOT here must precede IN/LIKE/BETWEEN")
    if p.kw() == "IN":
        p.next()
        p.expect_op("(")
        lits = [_literal(p)]
        while p.peek() == ("op", ","):
            p.next()
            lits.append(_literal(p))
        p.expect_op(")")
        return InList(col, lits, neg)
    if p.kw() == "LIKE":
        p.next()
        lit = _literal(p)
        if lit.kind != "str":
            raise ValueError("LIKE pattern must be a string")
        return LikeP(col, lit, neg)
    if p.kw() == "BETWEEN":
        p.next()
        lo = _literal(p)
        p.expect_kw("AND")
        hi = _literal(p)
        return Between(col, lo, hi)
    if neg:
        raise ValueError("dangling NOT")
    to, vo = p.next()
    if to != "op" or vo not in ("=", "<>", "!=", "<", "<=", ">", ">="):
        raise ValueError(f"expected comparison operator, got {vo!r}")
    return Cmp(col, "<>" if vo == "!=" else vo, _literal(p))


def _validate(q: Query) -> None:
    if q.table != "documents":
        raise ValueError(f"unknown index: {q.table!r}")
    matches = _collect_matches(q.where)
    has_score = any(it.kind == "score" for it in q.items) or any(
        key == "score()" for key, _ in q.order_by
    )
    if matches and q.group_by:
        raise ValueError("MATCH with GROUP BY is out of subset")
    if len(matches) > 1:
        raise ValueError("at most one MATCH predicate is supported")
    if has_score and not matches:
        raise ValueError("SCORE() requires a MATCH predicate")
    if q.having is not None and not q.group_by:
        raise ValueError("HAVING requires GROUP BY")
    if q.having is not None:
        _render_having(q)  # raises if a HAVING aggregate is not selected
    aggs = [it for it in q.items if it.kind == "agg"]
    if q.group_by:
        for it in q.items:
            if it.kind == "star":
                raise ValueError("SELECT * with GROUP BY is out of subset")
            if it.kind == "col" and it.col not in q.group_by:
                raise ValueError(
                    f"column {it.col!r} must appear in GROUP BY"
                )
    elif aggs and any(it.kind in ("col", "star") for it in q.items):
        raise ValueError("mixing aggregates and columns needs GROUP BY")
    if matches:
        for it in q.items:
            if it.kind == "star":
                continue
            if it.kind == "agg":
                raise ValueError("aggregates with MATCH are out of subset")
            if it.kind == "col" and it.col not in ("doc_id", "url"):
                raise ValueError(
                    "MATCH queries project doc_id/url/SCORE() only"
                )
        for key, desc in q.order_by:
            if key == "score()":
                if not desc:
                    raise ValueError("ORDER BY SCORE() must be DESC")
            elif key != "doc_id":
                raise ValueError(
                    "MATCH queries order by SCORE() DESC [, doc_id]"
                )
    # ORDER BY keys must resolve to a projected alias or a corpus column
    names = {it.name() for it in q.items}
    for key, _ in q.order_by:
        if key == "score()":
            continue
        if key not in names and key not in SCALAR_COLS:
            raise ValueError(f"cannot ORDER BY {key!r}")
        if q.group_by and key not in names and key not in q.group_by:
            raise ValueError(f"ORDER BY {key!r} is not grouped")


def _collect_matches(e) -> list[Match]:
    """MATCH predicates, enforcing the top-level-conjunct restriction."""
    if e is None:
        return []
    out: list[Match] = []

    def walk(node, conjunctive_top: bool):
        if isinstance(node, Match):
            if not conjunctive_top:
                raise ValueError(
                    "MATCH must be a top-level AND conjunct (no OR/NOT)"
                )
            out.append(node)
        elif isinstance(node, And):
            for x in node.xs:
                walk(x, conjunctive_top)
        elif isinstance(node, Or):
            for x in node.xs:
                walk(x, False)
        elif isinstance(node, Not):
            walk(node.x, False)

    walk(e, True)
    return out


# --------------------------- predicate rendering ------------------------


def _render_pred(e, drop_match: bool = False) -> str | None:
    """Render the AST to ANSI SQL valid in BOTH Spark SQL and DuckDB.

    With drop_match=True, MATCH conjuncts are removed (they are carried by
    the retrieval path); returns None if nothing remains.
    """
    if isinstance(e, Match):
        if drop_match:
            return None
        raise ValueError("MATCH cannot be rendered relationally")
    if isinstance(e, And):
        parts = [_render_pred(x, drop_match) for x in e.xs]
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return "(" + " AND ".join(parts) + ")"
    if isinstance(e, Or):
        return "(" + " OR ".join(_render_pred(x) for x in e.xs) + ")"
    if isinstance(e, Not):
        return "(NOT " + _render_pred(e.x) + ")"
    if isinstance(e, Cmp):
        return f"{e.col} {e.op} {e.lit.sql()}"
    if isinstance(e, InList):
        body = ", ".join(x.sql() for x in e.lits)
        neg = "NOT " if e.neg else ""
        return f"{e.col} {neg}IN ({body})"
    if isinstance(e, Between):
        return f"{e.col} BETWEEN {e.lo.sql()} AND {e.hi.sql()}"
    if isinstance(e, LikeP):
        neg = "NOT " if e.neg else ""
        return f"{e.col} {neg}LIKE {e.pat.sql()}"
    if isinstance(e, NullP):
        return f"{e.col} IS {'NOT ' if e.neg else ''}NULL"
    raise ValueError(f"cannot render {e!r}")


def _order_with_tiebreak(q: Query) -> list[tuple[str, bool]]:
    keys = list(q.order_by)
    present = {k for k, _ in keys}
    if any(it.kind == "agg" for it in q.items) and not q.group_by:
        return keys  # global aggregate: a single row, no tie-break needed
    if q.group_by:
        for g in q.group_by:
            name = g
            for it in q.items:
                if it.kind == "col" and it.col == g and it.alias:
                    name = it.alias
            if name not in present and g not in present:
                keys.append((name, False))
                present.add(name)
    else:
        if "doc_id" not in present:
            keys.append(("doc_id", False))
    return keys


# ------------------------------ emitters --------------------------------


def es_sql_query(
    corpus: DataFrame,
    sql: str,
    index: dict | None = None,
    default_limit: int = 10,
) -> DataFrame:
    """Execute an ES SQL statement; MATCH routes onto the WAND index path
    (filter-context doc_filter, global stats), everything else compiles to
    one Catalyst plan over the corpus."""
    q = parse_es_sql(sql)
    matches = _collect_matches(q.where)
    if matches:
        if index is None:
            raise ValueError("MATCH queries need index=")
        terms = py_tokenize(matches[0].query)
        if not terms:
            raise ValueError("empty MATCH query")
        doc_filter = _render_pred(q.where, drop_match=True)
        k = q.limit if q.limit is not None else default_limit
        hits = wand_topk(index, sorted(set(terms)), k=k, doc_filter=doc_filter)
        cols = []
        star = any(it.kind == "star" for it in q.items)
        if star:
            cols = [F.col("doc_id"), F.col("url"),
                    F.col("score").alias("score")]
        else:
            for it in q.items:
                if it.kind == "score":
                    cols.append(F.col("score").alias(it.name()))
                else:
                    cols.append(F.col(it.col).alias(it.name()))
        return hits.select(*cols)

    base = corpus
    pred = _render_pred(q.where) if q.where is not None else None
    if pred:
        base = base.filter(F.expr(pred))

    if q.group_by or any(it.kind == "agg" for it in q.items):
        gb = base.groupBy(*[F.col(g) for g in q.group_by]) if q.group_by \
            else base.groupBy()
        aggs = []
        for it in q.items:
            if it.kind != "agg":
                continue
            name = it.name()
            if it.fn == "count":
                e = F.count(F.lit(1)) if it.col is None else F.count(it.col)
            elif it.fn == "sum":
                e = F.sum(it.col).cast("long") \
                    if it.col in NUMERIC_COLS else F.sum(it.col)
            elif it.fn == "avg":
                e = F.avg(it.col)
            elif it.fn == "min":
                e = F.min(it.col)
            else:
                e = F.max(it.col)
            aggs.append(e.alias(name))
        out = gb.agg(*aggs)
        # rename group keys to their aliases
        for it in q.items:
            if it.kind == "col" and it.alias:
                out = out.withColumnRenamed(it.col, it.alias)
        if q.having is not None:
            out = out.filter(F.expr(_render_having_spark(q)))
        order = [
            F.col(f"`{_havename(q, k)}`").desc() if d
            else F.col(f"`{_havename(q, k)}`").asc()
            for k, d in _order_with_tiebreak(q)
        ]
        if order:
            out = out.orderBy(*order)
        if q.limit is not None:
            out = out.limit(q.limit)
        # aggregate names may contain parens (count(*)) — backtick-quote
        return out.select(*[F.col(f"`{it.name()}`") for it in q.items])

    order = [
        F.col(k).desc() if d else F.col(k).asc()
        for k, d in _order_with_tiebreak(q)
    ]
    out = base.orderBy(*order)
    if q.limit is not None:
        out = out.limit(q.limit)
    if any(it.kind == "star" for it in q.items):
        return out.select(*[c for c in CORPUS_COLS])
    sel = []
    for it in q.items:
        sel.append(F.col(it.col).alias(it.name()))
    return out.select(*sel)


def _havename(q: Query, key: str) -> str:
    """ORDER BY keys may reference either the alias or the raw form."""
    for it in q.items:
        if it.name() == key:
            return key
        if it.kind == "col" and it.col == key and it.alias:
            return it.alias
    return key


def _render_having(q: Query, lq: str = '"', rq: str = '"') -> str:
    """HAVING over the already-aggregated relation: rewrite aggregate
    calls to their select-list aliases (both engines filter the nested
    aggregate relation, so alias references are always valid).  lq/rq:
    identifier quotes — double quotes for DuckDB, backticks for Spark."""

    def ren(e) -> str:
        if isinstance(e, And):
            return "(" + " AND ".join(ren(x) for x in e.xs) + ")"
        if isinstance(e, Or):
            return "(" + " OR ".join(ren(x) for x in e.xs) + ")"
        if isinstance(e, Not):
            return "(NOT " + ren(e.x) + ")"
        if isinstance(e, Cmp):
            name = e.col
            for it in q.items:
                if it.kind == "agg" and f"{it.fn}({it.col if it.col else '*'})" == name:
                    name = it.name()
                    break
            else:
                if "(" in name:
                    raise ValueError(
                        f"HAVING aggregate {name!r} must appear in SELECT"
                    )
            return f"{lq}{name}{rq} {e.op} {e.lit.sql()}" if "(" in name \
                else f"{name} {e.op} {e.lit.sql()}"
        raise ValueError("HAVING supports aggregate comparisons only")

    return ren(q.having)


def _render_having_spark(q: Query) -> str:
    return _render_having(q, "`", "`")


def es_sql_oracle(sql: str, default_limit: int = 10) -> str:
    """DuckDB SQL for the same statement — the MATCH path reuses the BM25
    oracle (global stats + extra_pred filter context), the relational path
    renders the identical AST over CORPUS_CTE."""
    q = parse_es_sql(sql)
    matches = _collect_matches(q.where)
    if matches:
        terms = sorted(set(py_tokenize(matches[0].query)))
        doc_filter = _render_pred(q.where, drop_match=True)
        k = q.limit if q.limit is not None else default_limit
        inner = bm25_topk_sql(
            terms, k=k, global_stats=True, extra_pred=doc_filter
        )
        star = any(it.kind == "star" for it in q.items)
        if star:
            proj = "doc_id, url, score"
        else:
            parts = []
            for it in q.items:
                src = "score" if it.kind == "score" else it.col
                parts.append(f"{src} AS {it.name()}" if src != it.name()
                             else src)
            proj = ", ".join(parts)
        return f"SELECT {proj} FROM ({inner})"

    pred = _render_pred(q.where) if q.where is not None else None
    where = f"WHERE {pred}" if pred else ""
    order_keys = _order_with_tiebreak(q)
    limit = f"LIMIT {q.limit}" if q.limit is not None else ""

    if q.group_by or any(it.kind == "agg" for it in q.items):
        parts = []
        for it in q.items:
            if it.kind == "agg":
                arg = it.col if it.col else "*"
                expr = f"{it.fn}({arg})"
                if it.fn == "count" or (
                    it.fn == "sum" and it.col in NUMERIC_COLS
                ):
                    expr = f"CAST({expr} AS BIGINT)"
                parts.append(f'{expr} AS "{it.name()}"')
            else:
                parts.append(f'{it.col} AS "{it.name()}"'
                             if it.name() != it.col else it.col)
        gb = "GROUP BY " + ", ".join(q.group_by) if q.group_by else ""
        inner = (f"SELECT {', '.join(parts)} FROM corpus {where} {gb}")
        hv = f"WHERE {_render_having(q)}" if q.having is not None else ""
        ob = ("ORDER BY " + ", ".join(
            f'"{_havename(q, k)}" {"DESC" if d else "ASC"}'
            for k, d in order_keys
        )) if order_keys else ""
        return (f"WITH {CORPUS_CTE.strip()} "
                f"SELECT * FROM ({inner}) {hv} {ob} {limit}")

    if any(it.kind == "star" for it in q.items):
        proj = ", ".join(CORPUS_COLS)
    else:
        proj = ", ".join(
            f"{it.col} AS {it.name()}" if it.name() != it.col else it.col
            for it in q.items
        )
    ob = "ORDER BY " + ", ".join(
        f"{k} {'DESC' if d else 'ASC'}" for k, d in order_keys
    )
    # ORDER BY underlying (possibly unprojected) columns: order the base
    # relation first, then project — same shape as the DataFrame emitter.
    return (f"WITH {CORPUS_CTE.strip()}, "
            f"ordered AS (SELECT * FROM corpus {where} {ob} {limit}) "
            f"SELECT {proj} FROM ordered")


def es_sql_query_local(
    index: dict,
    sql: str,
    default_limit: int = 10,
) -> list[dict]:
    """Driver-local serving twin for MATCH statements: the same parse +
    dispatch, retrieval via wand_topk_local's resident hot-shard cache
    (no Spark job once warm).  Relational statements are an analytics
    surface, not a serving one — they raise here."""
    from .wand import wand_topk_local

    q = parse_es_sql(sql)
    matches = _collect_matches(q.where)
    if not matches:
        raise ValueError("the local path serves MATCH statements only")
    terms = sorted(set(py_tokenize(matches[0].query)))
    doc_filter = _render_pred(q.where, drop_match=True)
    k = q.limit if q.limit is not None else default_limit
    rows = wand_topk_local(index, terms, k=k, doc_filter=doc_filter)
    star = any(it.kind == "star" for it in q.items)
    names = (["doc_id", "url", "score"] if star
             else [it.name() for it in q.items])
    srcs = (["doc_id", "url", "score"] if star
            else ["score" if it.kind == "score" else it.col
                  for it in q.items])
    from ..corpus import py_url

    vals = {"doc_id": lambda d, s: int(d),
            "url": lambda d, s: py_url(int(d)),
            "score": lambda d, s: float(s)}
    return [
        {n: vals[s](d, sc) for n, s in zip(names, srcs)}
        for d, sc in rows
    ]


def es_sql_translate(sql: str) -> dict:
    """The `_sql/translate` analogue: parse + describe the dispatch without
    executing anything (never raises past parse errors)."""
    q = parse_es_sql(sql)
    matches = _collect_matches(q.where)
    if matches:
        return {
            "path": "wand_topk",
            "terms": sorted(set(py_tokenize(matches[0].query))),
            "doc_filter": _render_pred(q.where, drop_match=True),
            "k": q.limit,
            "projection": [it.name() for it in q.items],
        }
    return {
        "path": "aggregate" if (
            q.group_by or any(it.kind == "agg" for it in q.items)
        ) else "scan",
        "where": _render_pred(q.where) if q.where is not None else None,
        "group_by": q.group_by,
        "order_by": _order_with_tiebreak(q),
        "limit": q.limit,
        "projection": [it.name() for it in q.items],
    }
