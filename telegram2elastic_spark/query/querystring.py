"""ES `query_string` mini-language over the compound machinery.

The reference's serving surface is Kibana over ES (README.md:5), whose
search box speaks the Lucene query-string syntax.  Supported subset —
each construct maps onto an existing, oracle-verified engine path:

    spark merge            plain terms            -> WAND disjunction
    "merge batch"          quoted phrase          -> positional phrase
    "merge batch"~2        phrase with slop       -> ordered proximity
    -vector                negated term (NOT)     -> WAND must_not
    sc*                    trailing-* prefix      -> term-dict expansion

Tokens run through the engine tokenizer, so punctuation/case behave
exactly like indexed text.  Out-of-subset constructs (field:term, AND/OR
precedence, fuzzies) raise ValueError — a serving API should reject what
it cannot rank correctly rather than silently drop operators.

Dispatch: phrase present -> compound_topk (terms OR phrase, WAND-pruned);
otherwise wand_topk with exclude_terms.  Phrase+negation together and
multiple phrases are out of subset (compound_topk carries one phrase
clause and no exclusion set).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..functions.tokenizer import py_tokenize
from .compound import compound_topk, compound_topk_sql
from .expand import DEFAULT_MAX_EXPANSIONS, expand_prefix
from .wand import wand_topk

_TOKEN = re.compile(r'-?"([^"]*)"(~(\d+))?|(\S+)')


@dataclass
class ParsedQuery:
    terms: list[str] = field(default_factory=list)
    prefixes: list[str] = field(default_factory=list)
    must_not: list[str] = field(default_factory=list)
    phrases: list[tuple[list[str], int]] = field(default_factory=list)


def parse_query_string(q: str) -> ParsedQuery:
    """Parse the supported subset; ValueError on out-of-subset syntax."""
    out = ParsedQuery()
    for m in _TOKEN.finditer(q):
        if m.group(1) is not None:
            if m.group(0).startswith("-"):
                raise ValueError("negated phrases are out of subset")
            toks = py_tokenize(m.group(1))
            if toks:
                out.phrases.append((toks, int(m.group(3) or 0)))
            continue
        tok = m.group(4)
        if ":" in tok:
            raise ValueError(f"field queries are out of subset: {tok!r}")
        if tok in ("AND", "OR", "NOT", "(", ")"):
            raise ValueError(f"boolean operators are out of subset: {tok!r}")
        neg = tok.startswith("-")
        if neg:
            tok = tok[1:]
        if tok.endswith("*") and "*" not in tok[:-1] and "?" not in tok:
            if neg:
                raise ValueError("negated prefixes are out of subset")
            body = py_tokenize(tok[:-1])
            if len(body) != 1:
                raise ValueError(f"bad prefix token: {tok!r}")
            out.prefixes.append(body[0])
            continue
        toks = py_tokenize(tok)
        (out.must_not if neg else out.terms).extend(toks)
    return out


def query_string_topk(
    index: dict,
    q: str,
    k: int = 10,
    doc_filter: str | None = None,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """Top-k (doc_id, url, score) for a query-string — parse, expand
    prefixes against the term dictionary, dispatch to the matching
    verified engine path."""
    p = parse_query_string(q)
    terms = list(p.terms)
    for pre in p.prefixes:
        terms.extend(expand_prefix(index, pre, max_expansions))
    terms = sorted(set(terms))
    if p.phrases:
        if p.must_not:
            raise ValueError("phrase + negation is out of subset")
        if len(p.phrases) > 1:
            raise ValueError("multiple phrases are out of subset")
        phrase, slop = p.phrases[0]
        return compound_topk(index, terms, phrase, k=k,
                             doc_filter=doc_filter, slop=slop)
    return wand_topk(
        index, terms, k=k, doc_filter=doc_filter,
        exclude_terms=p.must_not or None,
    )


def query_string_sql(q: str, k: int = 10) -> str:
    """DuckDB oracle, mirroring the dispatch.  Prefix expansion is
    data-dependent (term-dictionary contents), so the oracle covers the
    prefix-free subset; the prefix path's identity with
    expand_prefix + wand_topk is pytest-pinned instead."""
    from .bm25 import bm25_topk_sql

    p = parse_query_string(q)
    if p.prefixes:
        raise ValueError("oracle covers the prefix-free subset")
    if p.phrases:
        phrase, slop = p.phrases[0]
        return compound_topk_sql(sorted(set(p.terms)), phrase, k=k, slop=slop)
    return bm25_topk_sql(
        sorted(set(p.terms)), k=k,
        exclude_terms=p.must_not or None,
        global_stats=bool(p.must_not),
    )


def query_string_topk_local(
    index: dict,
    q: str,
    k: int = 10,
    doc_filter: str | None = None,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> list[tuple]:
    """[(doc_id, score)] / [(doc_id, url, score)] — the serving-loop
    twin: same parse + dispatch, driver-local retrieval (hot-shard
    caches, cached vocab for prefix expansion)."""
    from .compound import compound_topk_local
    from .local import expand_prefix_local
    from .wand import wand_topk_local

    p = parse_query_string(q)
    terms = list(p.terms)
    for pre in p.prefixes:
        terms.extend(expand_prefix_local(index, pre, max_expansions))
    terms = sorted(set(terms))
    if p.phrases:
        if p.must_not:
            raise ValueError("phrase + negation is out of subset")
        if len(p.phrases) > 1:
            raise ValueError("multiple phrases are out of subset")
        phrase, slop = p.phrases[0]
        return compound_topk_local(index, terms, phrase, k=k,
                                   doc_filter=doc_filter, slop=slop)
    return wand_topk_local(
        index, terms, k=k, doc_filter=doc_filter,
        exclude_terms=p.must_not or None,
    )


# --- ES simple_query_string (lenient) ---------------------------------------

def parse_simple_query_string(q: str) -> ParsedQuery:
    """ES `simple_query_string`: the lenient sibling — syntax NEVER
    raises.  Supported flag set (ES lets callers pick flags; this engine
    fixes OR|NOT|PHRASE|PREFIX|WHITESPACE):

        spark merge      OR terms (default_operator=or)
        -vector          NOT term
        "merge batch"~2  phrase with slop
        sc*              trailing-* prefix

    Everything out of that set degrades to plain text instead of
    erroring — ES's documented simple_query_string philosophy:
      * field:term, AND/OR/NOT keywords, parens, '+', '|', '~' on bare
        terms: tokenized as text (the engine tokenizer strips the
        punctuation);
      * unbalanced quotes: text;
      * a negated phrase degrades to negated TERMS (conservative:
        excludes any doc containing all the phrase's words anywhere);
      * phrases beyond the first — or any phrase when NOT terms are
        present — degrade to plain terms (the engine's compound clause
        carries one positive phrase and no exclusions).
    """
    out = ParsedQuery()
    for m in _TOKEN.finditer(q):
        if m.group(1) is not None:
            toks = py_tokenize(m.group(1))
            if not toks:
                continue
            if m.group(0).startswith("-"):
                out.must_not.extend(toks)  # lenient degradation
            else:
                out.phrases.append((toks, int(m.group(3) or 0)))
            continue
        tok = m.group(4)
        neg = tok.startswith("-") and len(tok) > 1
        if neg:
            tok = tok[1:]
        if (
            not neg
            and tok.endswith("*")
            and "*" not in tok[:-1]
            and "?" not in tok
            and len(py_tokenize(tok[:-1])) == 1
        ):
            out.prefixes.append(py_tokenize(tok[:-1])[0])
            continue
        toks = py_tokenize(tok)
        (out.must_not if neg else out.terms).extend(toks)
    # degrade combinations the compound clause cannot carry
    if out.phrases and (out.must_not or len(out.phrases) > 1):
        keep_first = not out.must_not
        for i, (ph, _slop) in enumerate(out.phrases):
            if keep_first and i == 0:
                continue
            out.terms.extend(ph)
        out.phrases = out.phrases[:1] if keep_first else []
    return out


def simple_query_string_topk(
    index: dict,
    q: str,
    k: int = 10,
    doc_filter: str | None = None,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> DataFrame:
    """Lenient parse, then the exact same verified dispatch as
    query_string_topk (WAND / compound)."""
    p = parse_simple_query_string(q)
    terms = list(p.terms)
    for pre in p.prefixes:
        terms.extend(expand_prefix(index, pre, max_expansions))
    terms = sorted(set(terms))
    if p.phrases:
        phrase, slop = p.phrases[0]
        return compound_topk(index, terms, phrase, k=k,
                             doc_filter=doc_filter, slop=slop)
    return wand_topk(
        index, terms, k=k, doc_filter=doc_filter,
        exclude_terms=p.must_not or None,
    )


def simple_query_string_sql(q: str, k: int = 10) -> str:
    """Oracle mirroring the lenient dispatch (prefix-free subset, like
    query_string_sql)."""
    from .bm25 import bm25_topk_sql

    p = parse_simple_query_string(q)
    if p.prefixes:
        raise ValueError("oracle covers the prefix-free subset")
    if p.phrases:
        phrase, slop = p.phrases[0]
        return compound_topk_sql(sorted(set(p.terms)), phrase, k=k, slop=slop)
    return bm25_topk_sql(
        sorted(set(p.terms)), k=k,
        exclude_terms=p.must_not or None,
        global_stats=bool(p.must_not),
    )


def simple_query_string_topk_local(
    index: dict,
    q: str,
    k: int = 10,
    doc_filter: str | None = None,
    max_expansions: int = DEFAULT_MAX_EXPANSIONS,
) -> list[tuple]:
    """Driver-local serving twin (lenient parse + local dispatch)."""
    from .compound import compound_topk_local
    from .local import expand_prefix_local
    from .wand import wand_topk_local

    p = parse_simple_query_string(q)
    terms = list(p.terms)
    for pre in p.prefixes:
        terms.extend(expand_prefix_local(index, pre, max_expansions))
    terms = sorted(set(terms))
    if p.phrases:
        phrase, slop = p.phrases[0]
        return compound_topk_local(index, terms, phrase, k=k,
                                   doc_filter=doc_filter, slop=slop)
    return wand_topk_local(
        index, terms, k=k, doc_filter=doc_filter,
        exclude_terms=p.must_not or None,
    )
