"""ES 8.10+ query rules: `rule_query` + the query-rules APIs.

A ruleset is an ordered list of rules; each rule carries criteria over
the request's `match_criteria` metadata (exact / prefix / suffix /
contains / gt / gte / lt / lte / always — the ES criteria vocabulary)
and an action: `pinned` (the listed ids lead the results, in rule then
list order) or `exclude` (the ids are removed entirely; exclusion wins
when a doc is both pinned and excluded).  ALL of a rule's criteria must
match for the rule to apply, and ES caps the total pins a rule_query may
produce (MAX_PINNED, 25).

Rule evaluation is request-scoped driver work — exactly where ES does it
(the coordinator rewrites rule_query into pinned/boolean form before any
shard sees it) — so the data-plane query is the already-verified pinned
path: organic WAND with the pinned+excluded ids as a pushed doc_filter,
pins as a |pins|-row broadcast doc_map lookup.

Reference analogue: ranked retrieval is delegated to ES
(output/elasticsearch.py); query rules are ES's curated-search layer on
the same endpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAX_PINNED = 25

_CRITERIA_TYPES = {
    "exact", "prefix", "suffix", "contains", "gt", "gte", "lt", "lte",
    "always",
}


def _criterion_matches(crit: dict, match_criteria: dict) -> bool:
    ctype = crit.get("type", "exact")
    if ctype not in _CRITERIA_TYPES:
        raise ValueError(f"unknown criteria type: {ctype!r}")
    if ctype == "always":
        return True
    meta = crit["metadata"]
    if meta not in match_criteria:
        return False
    actual = match_criteria[meta]
    values = crit.get("values", [])
    if ctype in ("gt", "gte", "lt", "lte"):
        a = float(actual)
        for v in values:
            v = float(v)
            if (
                (ctype == "gt" and a > v)
                or (ctype == "gte" and a >= v)
                or (ctype == "lt" and a < v)
                or (ctype == "lte" and a <= v)
            ):
                return True
        return False
    s = str(actual)
    for v in values:
        v = str(v)
        if (
            (ctype == "exact" and s == v)
            or (ctype == "prefix" and s.startswith(v))
            or (ctype == "suffix" and s.endswith(v))
            or (ctype == "contains" and v in s)
        ):
            return True
    return False


def applied_rules(
    ruleset: list[dict], match_criteria: dict
) -> tuple[list[int], list[int]]:
    """(pinned_ids in rule order deduped and capped at MAX_PINNED,
    excluded_ids).  A rule applies when ALL its criteria match."""
    pins: list[int] = []
    excl: list[int] = []
    for rule in ruleset:
        crits = rule.get("criteria", [])
        if not all(_criterion_matches(c, match_criteria) for c in crits):
            continue
        ids = [int(i) for i in rule.get("ids", [])]
        if rule.get("type", "pinned") == "exclude":
            excl.extend(i for i in ids if i not in excl)
        else:
            pins.extend(i for i in ids if i not in pins)
    return pins[:MAX_PINNED], excl


def rule_query_topk(
    index: dict,
    ruleset: list[dict],
    match_criteria: dict,
    terms: list[str],
    k: int = 10,
) -> DataFrame:
    """ES `rule_query` served from the index: evaluate the ruleset
    against the request metadata, then run the verified pinned path with
    the resulting pins/excludes.  Returns (rank, doc_id, url, pinned,
    score) like pinned_topk."""
    from .boosting import pinned_topk

    pins, excl = applied_rules(ruleset, match_criteria)
    return pinned_topk(index, terms, pins, k=k, exclude_ids=excl)


def rule_query_sql(
    ruleset: list[dict],
    match_criteria: dict,
    terms: list[str],
    k: int = 10,
) -> str:
    """Oracle: the pinned SQL over the SAME rule evaluation (the rule
    rewrite is coordinator logic shared verbatim by both engines)."""
    from .boosting import pinned_sql

    pins, excl = applied_rules(ruleset, match_criteria)
    return pinned_sql(terms, pins, k=k, exclude_ids=excl)


def rule_query_topk_local(
    index: dict,
    ruleset: list[dict],
    match_criteria: dict,
    terms: list[str],
    k: int = 10,
    corpus: DataFrame | None = None,
) -> list[tuple]:
    """Query-node twin: same rewrite, served by the local pinned path."""
    from .local import pinned_topk_local

    pins, excl = applied_rules(ruleset, match_criteria)
    return pinned_topk_local(
        index, terms, pins, k=k, corpus=corpus, exclude_ids=excl
    )
