"""ES `_search` request-body subset + stored search templates.

The reference queries ES through Kibana (README.md:5) and its API layer
builds ES bodies (poc/src/api/routes/search.py); this module is the body
entrypoint: a JSON query DSL dict dispatched onto the engine's VERIFIED
paths — no new scoring code, only routing.  Out-of-subset constructs
raise ValueError (like query_string's contract; simple_query_string is
the lenient twin for user-typed syntax).

Supported subset:

    {"query": <q>, "size": k}
    <q> :=
      {"match":        {"text": "spark merge"
                        | {"query": "...", "minimum_should_match": m}}}
      {"match_phrase": {"text": "merge batch"
                        | {"query": "...", "slop": n}}}
      {"sparse_vector": {"field": "text", "query_vector": {tok: w}}}
      {"prefix":       {"text": "sc"}}
      {"ids":          {"values": [id, ...]}}            (constant 1.0)
      {"wrapper":      {"query": "<base64 of a body's query>"}}
      {"match": {"text": {"query": "...", "fuzziness": f}}}
                                   (blended fuzzy expansion per token)
      {"script_score": {"query": {"match": ...},
                        "script": {"source": "<painless subset>"},
                        "min_score": x}}   (query/scriptscore.py grammar)
      {"bool": {"must":     [match | match_phrase, ...],
                "must_not": [match, ...],
                "filter":   [{"term":  {field: value}}
                             | {"range": {field: {"gte"/"lt"/...: v}}}
                             | {"ids": {"values": [...]}}
                             | {"exists": {"field": f}}, ...]}}

Search templates are the ES `_search/template` mustache flavor over the
same subset: `{{var}}` substitutes a JSON-encoded scalar, `{{#toJson}}
var{{/toJson}}` splices any JSON value; rendering then dispatches through
execute_dsl, so a template query is exactly as verified as its expansion.
"""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _text_clause(spec, knob: str) -> tuple[list[str], int]:
    """Normalize {"text": "q"} / {"text": {"query": "q", knob: n}}."""
    from ..functions.tokenizer import py_tokenize

    if not isinstance(spec, dict) or list(spec) != ["text"]:
        raise ValueError(f"only the 'text' field is searchable, got {spec!r}")
    v = spec["text"]
    if isinstance(v, str):
        return py_tokenize(v), 0
    if isinstance(v, dict):
        extra = set(v) - {"query", knob}
        if extra:
            raise ValueError(f"out-of-subset match options: {sorted(extra)}")
        return py_tokenize(str(v["query"])), int(v.get(knob, 0))
    raise ValueError(f"bad clause value {v!r}")


_FILTER_FIELDS = {"lang", "source", "doc_id", "n_chars"}
_RANGE_OPS = {"gte": ">=", "gt": ">", "lte": "<=", "lt": "<"}


def _filter_pred(clauses: list) -> str | None:
    """bool.filter -> one SQL predicate string (the engine's filter-context
    carrier: wand ships admitted ids per salt via cogroup)."""
    preds = []
    for c in clauses or []:
        if not isinstance(c, dict) or len(c) != 1:
            raise ValueError(f"bad filter clause {c!r}")
        kind, body = next(iter(c.items()))
        if kind == "term":
            (fld, val), = body.items()
            if fld not in _FILTER_FIELDS:
                raise ValueError(f"unfilterable field {fld!r}")
            if isinstance(val, str):
                preds.append(f"{fld} = '" + val.replace("'", "''") + "'")
            else:
                preds.append(f"{fld} = {val!r}")
        elif kind == "range":
            (fld, ops), = body.items()
            if fld not in _FILTER_FIELDS:
                raise ValueError(f"unfilterable field {fld!r}")
            for op, val in sorted(ops.items()):
                if op not in _RANGE_OPS:
                    raise ValueError(f"bad range op {op!r}")
                preds.append(f"{fld} {_RANGE_OPS[op]} {val!r}")
        elif kind == "ids":
            vals = body.get("values")
            if not isinstance(vals, list) or not vals:
                raise ValueError("ids filter needs a non-empty values list")
            ids = ", ".join(str(int(v)) for v in vals)
            preds.append(f"doc_id IN ({ids})")
        elif kind == "exists":
            fld = body.get("field")
            if fld not in _FILTER_FIELDS:
                raise ValueError(f"unfilterable field {fld!r}")
            preds.append(f"{fld} IS NOT NULL")
        else:
            raise ValueError(f"out-of-subset filter {kind!r}")
    return " AND ".join(preds) if preds else None


class _Parsed:
    terms: list[str]
    msm: int
    phrase: list[str]
    slop: int
    must_not: list[str]
    doc_filter: str | None
    sparse: dict[str, float] | None
    prefix: str | None
    ids: list[int] | None
    fuzziness: int | None

    def __init__(self):
        self.terms, self.msm = [], 0
        self.phrase, self.slop = [], 0
        self.must_not = []
        self.doc_filter = None
        self.sparse = None
        self.prefix = None
        self.ids = None
        self.fuzziness = None
        self.script = None
        self.script_min_score = None


def parse_dsl(body: dict) -> tuple[_Parsed, int]:
    if not isinstance(body, dict):
        raise ValueError("body must be a dict")
    extra = set(body) - {"query", "size"}
    if extra:
        raise ValueError(f"out-of-subset body keys: {sorted(extra)}")
    k = int(body.get("size", 10))
    q = body.get("query")
    if not isinstance(q, dict) or len(q) != 1:
        raise ValueError("body.query must hold exactly one query")
    p = _Parsed()
    kind, spec = next(iter(q.items()))
    if kind == "wrapper":
        # ES wrapper query: base64-encoded JSON of an inner query object;
        # decode and re-dispatch — as verified as its expansion
        import base64

        if not isinstance(spec, dict) or list(spec) != ["query"]:
            raise ValueError("wrapper needs exactly {'query': <base64>}")
        inner = json.loads(base64.b64decode(spec["query"]).decode("utf-8"))
        return parse_dsl({"query": inner, "size": k})
    if kind == "script_score":
        # ES script_score: inner query scored, then re-ranked by the
        # script; the script COMPILES here (parse-time error, like ES)
        if not isinstance(spec, dict):
            raise ValueError("script_score needs an object body")
        extra = set(spec) - {"query", "script", "min_score"}
        if extra:
            raise ValueError(f"out-of-subset script_score keys: {sorted(extra)}")
        inner = spec.get("query")
        if not isinstance(inner, dict) or len(inner) != 1:
            raise ValueError("script_score needs exactly one inner query")
        script = spec.get("script")
        if not (isinstance(script, dict) and isinstance(script.get("source"), str)):
            raise ValueError("script_score needs script.source")
        ip, _ = parse_dsl({"query": inner, "size": k})
        if (
            ip.phrase or ip.sparse is not None or ip.prefix is not None
            or ip.ids is not None or ip.fuzziness is not None
            or ip.must_not or ip.doc_filter or ip.msm or ip.script
        ):
            raise ValueError(
                "script_score inner query supports a plain match only"
            )
        from .scriptscore import parse_script

        parse_script(script["source"])
        p.terms = ip.terms
        p.script = script["source"]
        ms = spec.get("min_score")
        p.script_min_score = float(ms) if ms is not None else None
        return p, k
    if kind == "ids":
        vals = spec.get("values") if isinstance(spec, dict) else None
        if not isinstance(vals, list) or not vals:
            raise ValueError("ids query needs a non-empty values list")
        p.ids = sorted({int(v) for v in vals})
        return p, k
    if kind == "match" and isinstance(spec.get("text"), dict) and "fuzziness" in spec["text"]:
        v = spec["text"]
        extra = set(v) - {"query", "fuzziness"}
        if extra:
            raise ValueError(f"out-of-subset fuzzy-match options: {sorted(extra)}")
        from ..functions.tokenizer import py_tokenize

        p.terms = py_tokenize(str(v["query"]))
        p.fuzziness = int(v["fuzziness"])
        return p, k
    if kind == "match":
        p.terms, p.msm = _text_clause(spec, "minimum_should_match")
    elif kind == "match_phrase":
        p.phrase, p.slop = _text_clause(spec, "slop")
    elif kind == "sparse_vector":
        if spec.get("field", "text") != "text":
            raise ValueError("sparse_vector only over 'text'")
        p.sparse = {str(t): float(w) for t, w in spec["query_vector"].items()}
    elif kind == "prefix":
        if list(spec) != ["text"]:
            raise ValueError("prefix only over 'text'")
        p.prefix = str(spec["text"])
    elif kind == "bool":
        extra = set(spec) - {"must", "must_not", "filter"}
        if extra:
            raise ValueError(f"out-of-subset bool keys: {sorted(extra)}")
        for c in spec.get("must", []) or []:
            ck, cs = next(iter(c.items()))
            if ck == "match":
                t, m = _text_clause(cs, "minimum_should_match")
                p.terms.extend(t)
                p.msm = max(p.msm, m)
            elif ck == "match_phrase":
                if p.phrase:
                    raise ValueError("one phrase clause per bool")
                p.phrase, p.slop = _text_clause(cs, "slop")
            else:
                raise ValueError(f"out-of-subset must clause {ck!r}")
        for c in spec.get("must_not", []) or []:
            ck, cs = next(iter(c.items()))
            if ck != "match":
                raise ValueError("must_not supports match only")
            t, _ = _text_clause(cs, "minimum_should_match")
            p.must_not.extend(t)
        p.doc_filter = _filter_pred(spec.get("filter"))
    else:
        raise ValueError(f"out-of-subset query {kind!r}")
    p.terms = sorted(set(p.terms))
    p.must_not = sorted(set(p.must_not))
    return p, k


def execute_dsl(index: dict, body: dict) -> DataFrame:
    """Dispatch a request body onto the verified engine paths."""
    from .compound import compound_topk
    from .expand import prefix_topk
    from .phrase import phrase_topk
    from .sparse import sparse_vector_topk
    from .wand import wand_topk

    p, k = parse_dsl(body)
    if p.ids is not None:
        # ES ids query: constant 1.0 for the named live docs — a doc_map
        # point lookup, postings never touched
        from pyspark.sql import functions as F

        return (
            index["doc_map"]
            .filter(F.col("doc_id").isin(p.ids))
            .select("doc_id", "url", F.lit(1.0).alias("score"))
            .orderBy("doc_id")
            .limit(k)
        )
    if p.fuzziness is not None:
        from .expand import match_fuzzy_topk

        return match_fuzzy_topk(index, p.terms, k=k, fuzziness=p.fuzziness)
    if p.script is not None:
        from .scriptscore import script_score_topk

        return script_score_topk(
            None, p.terms, p.script, k=k, index=index,
            min_score=p.script_min_score,
        )
    if p.sparse is not None:
        return sparse_vector_topk(index, p.sparse, k=k)
    if p.prefix is not None:
        return prefix_topk(index, p.prefix, k=k)
    if p.phrase and p.terms:
        if p.must_not:
            raise ValueError("phrase + must_not is out of subset")
        return compound_topk(
            index, p.terms, p.phrase, k=k, slop=p.slop,
            doc_filter=p.doc_filter,
        )
    if p.phrase:
        return phrase_topk(
            index, p.phrase, k=k, slop=p.slop, doc_filter=p.doc_filter
        )
    return wand_topk(
        index, p.terms, k=k, min_should_match=p.msm,
        exclude_terms=p.must_not or None, doc_filter=p.doc_filter,
    )


def dsl_sql(body: dict) -> str:
    """DuckDB oracle mirroring the dispatch (prefix expansion is
    data-dependent, so the oracle covers the prefix-free subset — same
    contract as query_string_sql)."""
    from .bm25 import bm25_topk_sql
    from .compound import compound_topk_sql
    from .phrase import phrase_topk_sql
    from .sparse import sparse_vector_topk_sql

    p, k = parse_dsl(body)
    if p.ids is not None:
        from ..corpus import CORPUS_CTE

        ids = ", ".join(str(v) for v in p.ids)
        return f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id, url, 1.0 AS score FROM corpus
WHERE doc_id IN ({ids}) ORDER BY doc_id LIMIT {k}
"""
    if p.fuzziness is not None:
        from .expand import match_fuzzy_topk_sql

        return match_fuzzy_topk_sql(p.terms, k=k, fuzziness=p.fuzziness)
    if p.script is not None:
        from .scriptscore import script_score_sql

        return script_score_sql(
            p.terms, p.script, k=k, min_score=p.script_min_score
        )
    if p.prefix is not None:
        raise ValueError("oracle covers the prefix-free subset")
    if p.sparse is not None:
        return sparse_vector_topk_sql(p.sparse, k=k)
    if p.phrase and p.doc_filter:
        # the Spark path supports filtered phrases (identity-tested in
        # tests/test_phrase.py); the SQL oracle covers the unfiltered
        # phrase subset, same contract as query_string_sql's prefixes
        raise ValueError("oracle covers unfiltered phrase bodies")
    if p.phrase and p.terms:
        return compound_topk_sql(p.terms, p.phrase, k=k, slop=p.slop)
    if p.phrase:
        return phrase_topk_sql(p.phrase, k=k, slop=p.slop)
    return bm25_topk_sql(
        p.terms, k=k, min_should_match=p.msm,
        exclude_terms=p.must_not or None,
        global_stats=bool(p.must_not or p.doc_filter),
        extra_pred=p.doc_filter,
    )


def msearch(index: dict, bodies: list[dict]) -> DataFrame:
    """ES `_msearch`: N request bodies answered as FEW Spark jobs.

    Every body parses through the same `parse_dsl`; routing puts each
    one in the WIDEST batch kernel that expresses it —

    * terms bodies (match / bool, incl. per-body minimum_should_match,
      must_not and filter context) -> ONE `wand_topk_batch`,
    * unfiltered phrase bodies -> ONE `phrase_topk_batch` (per-body slop),
    * terms+phrase bool bodies -> ONE `compound_topk_batch`,
    * everything else (ids / fuzziness / sparse / prefix, filtered
      phrases) -> its verified single-body dispatch,

    and ALL legs are unioned into one DataFrame, so a `.collect()` is
    still one Spark action; the batch kernels share their per-salt decode
    caches across the bodies exactly as msearch shares segment readers in
    ES.  Per-body `size` differs, so the batch legs run at max(size) and
    a per-query rank window (over <= n_bodies x k rows) trims each body
    back — ordering ties (score desc, doc_id asc) are the kernels' own.

    Returns (query_id, doc_id, url, score), query_id = body position,
    ordered by (query_id, score desc, doc_id)."""
    from pyspark.sql.window import Window

    from .compound import compound_topk, compound_topk_batch
    from .phrase import phrase_topk, phrase_topk_batch
    from .wand import wand_topk_batch

    wand_q: dict[int, list[str]] = {}
    wand_msm: dict[int, int] = {}
    wand_excl: dict[int, list[str]] = {}
    wand_filt: dict[int, str] = {}
    phrase_q: dict[int, list[str]] = {}
    phrase_slop: dict[int, int] = {}
    comp_q: dict[int, tuple[list[str], list[str]]] = {}
    comp_slop: dict[int, int] = {}
    singles: list[tuple[int, int, DataFrame]] = []
    sizes: dict[int, int] = {}
    for qid, body in enumerate(bodies):
        p, k = parse_dsl(body)
        sizes[qid] = k
        if (
            p.ids is not None
            or p.fuzziness is not None
            or p.sparse is not None
            or p.prefix is not None
            or p.script is not None
        ):
            singles.append((qid, k, execute_dsl(index, body)))
        elif p.phrase and p.terms:
            if p.doc_filter:
                singles.append(
                    (qid, k, compound_topk(
                        index, p.terms, p.phrase, k=k, slop=p.slop,
                        doc_filter=p.doc_filter,
                    ))
                )
            else:
                comp_q[qid] = (p.terms, p.phrase)
                comp_slop[qid] = p.slop
        elif p.phrase:
            if p.doc_filter:
                singles.append(
                    (qid, k, phrase_topk(
                        index, p.phrase, k=k, slop=p.slop,
                        doc_filter=p.doc_filter,
                    ))
                )
            else:
                phrase_q[qid] = p.phrase
                phrase_slop[qid] = p.slop
        else:
            wand_q[qid] = p.terms
            if p.msm:
                wand_msm[qid] = p.msm
            if p.must_not:
                wand_excl[qid] = p.must_not
            if p.doc_filter:
                wand_filt[qid] = p.doc_filter
    legs: list[DataFrame] = []
    if wand_q:
        legs.append(
            wand_topk_batch(
                index, wand_q, k=max(sizes[q] for q in wand_q),
                min_should_match=wand_msm or None,
                exclude_terms=wand_excl or None,
                doc_filter=wand_filt or None,
            )
        )
    if phrase_q:
        legs.append(
            phrase_topk_batch(
                index, phrase_q, k=max(sizes[q] for q in phrase_q),
                slop=phrase_slop,
            )
        )
    if comp_q:
        legs.append(
            compound_topk_batch(
                index, comp_q, k=max(sizes[q] for q in comp_q),
                slop=comp_slop,
            )
        )
    for qid, _k, df in singles:
        if "url" not in df.columns:
            df = df.join(index["doc_map"].select("doc_id", "url"), "doc_id")
        legs.append(
            df.select(
                F.lit(int(qid)).alias("query_id"), "doc_id", "url", "score"
            )
        )
    if not legs:
        raise ValueError("msearch needs at least one body")
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    # trim per-body size: the window runs over <= n_bodies x max_k rows
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    size_expr = F.create_map(
        *[F.lit(v) for kv in sizes.items() for v in kv]
    )
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= size_expr[F.col("query_id")])
        .drop("_rk")
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )


def msearch_sql(bodies: list[dict]) -> str:
    """DuckDB oracle: each body's verified dsl_sql, query_id-tagged and
    unioned (bodies outside dsl_sql's oracle subset raise, same contract
    as the single-body oracle)."""
    parts = [
        f"SELECT {qid} AS query_id, * FROM ({dsl_sql(body)})"
        for qid, body in enumerate(bodies)
    ]
    return (
        "\nUNION ALL\n".join(parts)
        + "\nORDER BY query_id, score DESC, doc_id ASC"
    )


def msearch_local(index: dict, bodies: list[dict]) -> list:
    """Query-node twin: the same routing is pointless locally (no job
    overhead to amortize) — each body runs its verified local dispatch;
    [(query_id, doc_id, score)], rank-identical to msearch."""
    out = []
    for qid, body in enumerate(bodies):
        out.extend((qid, d, s) for d, s in execute_dsl_local(index, body))
    return out


# --- search templates ---------------------------------------------------------

_TOJSON = re.compile(r"\{\{#toJson\}\}\s*([A-Za-z_][A-Za-z0-9_]*)\s*\{\{/toJson\}\}")
_VAR = re.compile(r"\{\{([A-Za-z_][A-Za-z0-9_]*)\}\}")


def render_template(source: str, params: dict) -> dict:
    """Render the mustache subset into a request body dict.

    `{{#toJson}}var{{/toJson}}` splices json.dumps(params[var]);
    `{{var}}` substitutes a scalar — json-encoded, then string-quotes
    stripped when the placeholder sits inside an existing string literal
    (the ES template convention: "{{q}}" renders into "spark merge").
    Unknown placeholders raise (ES renders empty; silent empties make
    queries that match everything — fail loud instead)."""

    def _tojson(m):
        name = m.group(1)
        if name not in params:
            raise ValueError(f"missing template param {name!r}")
        return json.dumps(params[name])

    def _var(m):
        name = m.group(1)
        if name not in params:
            raise ValueError(f"missing template param {name!r}")
        v = params[name]
        if isinstance(v, str):
            # inside a string literal: splice escaped contents only
            return json.dumps(v)[1:-1]
        return json.dumps(v)

    rendered = _VAR.sub(_var, _TOJSON.sub(_tojson, source))
    return json.loads(rendered)


def search_template_topk(
    index: dict, source: str, params: dict
) -> DataFrame:
    """ES `_search/template`: render, then execute through the verified
    dispatch — a template query is exactly as verified as its
    expansion."""
    return execute_dsl(index, render_template(source, params))


def search_template_sql(source: str, params: dict) -> str:
    return dsl_sql(render_template(source, params))


def execute_dsl_local(index: dict, body: dict) -> list:
    """Query-node twin: the same dispatch onto the driver-local paths
    (hot-shard caches, zero Spark jobs warm).  [(doc_id, score)], rank-
    identical to execute_dsl."""
    from .compound import compound_topk_local
    from .local import prefix_topk_local
    from .phrase import phrase_topk_local
    from .sparse import sparse_vector_topk_local
    from .wand import wand_topk_local

    p, k = parse_dsl(body)
    if p.script is not None:
        from .scriptscore import script_score_topk_local

        return script_score_topk_local(
            index, p.terms, p.script, k=k, min_score=p.script_min_score
        )
    if p.sparse is not None:
        return sparse_vector_topk_local(index, p.sparse, k=k)
    if p.prefix is not None:
        return prefix_topk_local(index, p.prefix, k=k)
    if p.phrase and p.terms:
        if p.must_not:
            raise ValueError("phrase + must_not is out of subset")
        return compound_topk_local(
            index, p.terms, p.phrase, k=k, slop=p.slop,
            doc_filter=p.doc_filter,
        )
    if p.phrase:
        return phrase_topk_local(
            index, p.phrase, k=k, slop=p.slop, doc_filter=p.doc_filter
        )
    return wand_topk_local(
        index, p.terms, k=k, min_should_match=p.msm,
        exclude_terms=p.must_not or None, doc_filter=p.doc_filter,
    )


def search_template_topk_local(
    index: dict, source: str, params: dict
) -> list:
    return execute_dsl_local(index, render_template(source, params))


def validate_query(body: dict) -> dict:
    """ES `_validate/query` (+explain): parse-only — no execution, no
    Spark job.  Returns {"valid": bool, "explanation": str}: for a valid
    body the explanation is the normalized dispatch description (which
    verified path would run, with its parameters), for an invalid one
    the parser error — the same ValueError execute_dsl would raise,
    caught instead of thrown, exactly the ES endpoint contract."""
    try:
        p, k = parse_dsl(body)
    except (ValueError, KeyError, TypeError) as e:  # noqa: PERF203
        return {"valid": False, "explanation": str(e)}
    if p.ids is not None:
        desc = f"ids:{p.ids} k={k}"
    elif p.fuzziness is not None:
        desc = f"match_fuzzy:{p.terms} fuzziness={p.fuzziness} k={k}"
    elif p.sparse is not None:
        desc = f"sparse_vector:{sorted(p.sparse)} k={k}"
    elif p.script is not None:
        desc = (
            f"script_score terms:{p.terms} script={p.script!r} "
            f"min_score={p.script_min_score} k={k}"
        )
    elif p.prefix is not None:
        desc = f"prefix:{p.prefix} k={k}"
    elif p.phrase and p.terms:
        desc = (
            f"compound terms:{p.terms} phrase:{p.phrase} slop={p.slop} "
            f"filter={p.doc_filter!r} k={k}"
        )
    elif p.phrase:
        desc = f"phrase:{p.phrase} slop={p.slop} filter={p.doc_filter!r} k={k}"
    else:
        desc = (
            f"wand terms:{p.terms} msm={p.msm} must_not={p.must_not} "
            f"filter={p.doc_filter!r} k={k}"
        )
    return {"valid": True, "explanation": desc}
