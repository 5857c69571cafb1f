"""EQL — ES Event Query Language core (sequence / until / sample) over the
append-only events table.

The reference ingests a realtime event stream (telegram2elastic.py:527-535)
and delegates querying to Elasticsearch; EQL (ES 7.9) is the ES surface for
ordered-event matching over exactly such streams (SIEM funnels: "signup
followed by error within 10 minutes, per user").  This module re-expresses
the EQL core as deterministic DataFrame plans with exact DuckDB oracles.

Semantics contract (documented precisely because EQL's state machine has
engine-specific tie handling):

* ``eql_sequence(steps, maxspan)`` — **anchored greedy-earliest funnel**.
  Every step-1 event is an anchor.  Step i+1 binds to the EARLIEST step-i+1
  event strictly after the bound step-i event (strictly after = (ts,
  event_id) tuple order — event_id breaks timestamp ties), subject to
  ``ts_last - ts_first <= maxspan`` (the ES rule: maxspan spans the whole
  sequence, first event to last).  One output row per anchor that
  completes.  This is the deterministic funnel semantics (ClickHouse
  windowFunnel, Snowplow); ES's engine additionally retires an anchor when
  a later anchor completes first with a shared tail event — that dedup is
  load-order dependent in ES and deliberately NOT reproduced.
* ``until=``: an until-event strictly after the anchor expires it — the
  sequence survives only if its completion (last event) precedes the first
  until event after the anchor (tuple order again).  Because every
  intermediate step precedes the completion in tuple order, "completion
  before first until" is equivalent to "no until between any two bound
  steps", which is the ES rule.
* ``eql_sample(categories)`` — ES 8.6 ``sample by key``: keys that have at
  least one event of EVERY category; the emitted sample is the EARLIEST
  event per category (ES returns an arbitrary sample; earliest-by-(ts,
  event_id) is the deterministic pin).

Determinism: all ordering arithmetic is integer (epoch microseconds +
event_id tie-break), so Spark and DuckDB agree bit-for-bit; no floats
anywhere.

Scale shape: each step is a selective filter over the events scan
(predicate pushed down); the chain join is per-key between FILTERED step
relations — cardinality per key is bounded by per-key step-event counts,
the same shape every distributed funnel engine uses.  The per-anchor
reduction is min_by inside ONE hash aggregate (map-side combine, no
window/sort).  Skewed keys are AQE skew-join territory; at web scale the
standard pre-step is sessionization (streaming/windows.py) so maxspan
bounds the join range per session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def _umicros(col: str):
    """Integer epoch microseconds for ordering/span arithmetic only (never
    emitted).  The driver table is TIMESTAMP_NTZ; casting to TIMESTAMP
    applies the session zone, but any fixed offset cancels in both the
    tuple ordering and the span difference, so the mapping only needs to
    be monotone — which a zone shift is."""
    return F.unix_micros(F.col(col).cast("timestamp"))


import re as _re

# Restricted per-step `where` grammar: numeric comparisons on the value
# field.  The literal is pinned to this shape so the SAME text is valid in
# both engines (== is rewritten to = for SQL).
_WHERE_RE = _re.compile(
    r"^\s*value\s*(>=|<=|==|!=|>|<)\s*(-?\d+(?:\.\d+)?)\s*$"
)


def _parse_step(step) -> tuple[str, str | None]:
    """A step is an event_type string or {'type': ..., 'where': 'value >= N'}."""
    if isinstance(step, str):
        return step, None
    t, w = step["type"], step.get("where")
    if w is not None and not _WHERE_RE.match(w):
        raise ValueError(f"unsupported step predicate: {w!r}")
    return t, w


def _steps(events: DataFrame, step, i: int) -> DataFrame:
    """Selective step relation: (key, e{i}_id, ts{i}, u{i})."""
    event_type, where = _parse_step(step)
    df = events.where(F.col("event_type") == event_type)
    if where is not None:
        df = df.where(F.expr(where.replace("==", "=")))
    return df.select(
        F.col("user_id"),
        F.col("event_id").alias(f"e{i}_id"),
        F.col("ts").alias(f"ts{i}"),
        _umicros("ts").alias(f"u{i}"),
    )


def _after(u_prev: str, id_prev: str, u_next: str, id_next: str):
    """Strictly-after in (ts, event_id) tuple order — integer columns."""
    return (F.col(u_next) > F.col(u_prev)) | (
        (F.col(u_next) == F.col(u_prev)) & (F.col(id_next) > F.col(id_prev))
    )



# Total-order scalar key for (micros, event_id): key = u * 10^19 + id in
# DECIMAL(38,0).  Both components are < 10^19 non-negative BIGINTs, so the
# key preserves tuple order exactly and fits 38 digits.  A SCALAR ordering
# key keeps min_by inside a HashAggregate (map-side combine); the struct
# key forced a SortAggregate.
_DEC_SHIFT = "CAST(10000000000000000000 AS DECIMAL(20,0))"


def _ord_key(u_col: str, id_col: str):
    return F.col(u_col).cast("decimal(38,0)") * F.expr(_DEC_SHIFT) + F.col(
        id_col
    ).cast("decimal(38,0)")


def eql_sequence(
    events: DataFrame,
    steps: list[str],
    maxspan_sec: int,
    until: str | None = None,
    k: int = 100,
    tail: bool = False,
) -> DataFrame:
    """EQL ``sequence by user_id [t=s0] [t=s1] (...) with maxspan`` —
    anchored greedy-earliest funnel (module docstring for the exact
    semantics).  2 or 3 steps.

    Returns one row per completing anchor:
    (user_id, e1_id, ts1, e2_id, ts2[, e3_id, ts3]), ordered by
    (user_id, e1_id), LIMIT k.
    """
    if len(steps) not in (2, 3):
        raise ValueError("eql_sequence supports 2 or 3 steps")
    if maxspan_sec <= 0:
        raise ValueError("maxspan_sec must be positive")
    span_us = maxspan_sec * _US

    s1 = _steps(events, steps[0], 1)
    s2 = _steps(events, steps[1], 2)

    # Bind step 2: earliest step-2 event after the anchor within maxspan.
    j2 = s1.join(s2, "user_id").where(
        _after("u1", "e1_id", "u2", "e2_id")
        & (F.col("u2") - F.col("u1") <= F.lit(span_us))
    )
    k2 = _ord_key("u2", "e2_id")
    a2 = j2.groupBy("user_id", "e1_id", "ts1", "u1").agg(
        F.min_by("e2_id", k2).alias("e2_id"),
        F.min_by("ts2", k2).alias("ts2"),
        F.min_by("u2", k2).alias("u2"),
    )

    if len(steps) == 3:
        s3 = _steps(events, steps[2], 3)
        j3 = a2.join(s3, "user_id").where(
            _after("u2", "e2_id", "u3", "e3_id")
            & (F.col("u3") - F.col("u1") <= F.lit(span_us))
        )
        k3 = _ord_key("u3", "e3_id")
        chain = j3.groupBy(
            "user_id", "e1_id", "ts1", "u1", "e2_id", "ts2", "u2"
        ).agg(
            F.min_by("e3_id", k3).alias("e3_id"),
            F.min_by("ts3", k3).alias("ts3"),
            F.min_by("u3", k3).alias("u3"),
        )
        last_u, last_id = "u3", "e3_id"
        out_cols = ["user_id", "e1_id", "ts1", "e2_id", "ts2", "e3_id", "ts3"]
    else:
        chain = a2
        last_u, last_id = "u2", "e2_id"
        out_cols = ["user_id", "e1_id", "ts1", "e2_id", "ts2"]

    if until is not None:
        su = events.where(F.col("event_type") == until).select(
            "user_id",
            F.col("event_id").alias("eu_id"),
            _umicros("ts").alias("uu"),
        )
        # First until event after the anchor (within maxspan — later ones
        # cannot precede a within-span completion anyway, but the bound
        # keeps the join range-limited like the step joins).
        ju = chain.select("user_id", "e1_id", "u1").join(su, "user_id").where(
            _after("u1", "e1_id", "uu", "eu_id")
            & (F.col("uu") - F.col("u1") <= F.lit(span_us))
        )
        cut = ju.groupBy("user_id", "e1_id").agg(
            F.min(_ord_key("uu", "eu_id")).alias("cut")
        )
        chain = chain.join(cut, ["user_id", "e1_id"], "left").where(
            F.col("cut").isNull()
            | (_ord_key(last_u, last_id) < F.col("cut"))
        )

    out = chain.select(*out_cols)
    if tail:
        # EQL `| tail N`: the LAST k rows of the result order — TakeOrdered
        # on the reversed order, re-sorted ascending for presentation
        return (
            out.orderBy(F.desc("user_id"), F.desc("e1_id"))
            .limit(k)
            .orderBy("user_id", "e1_id")
        )
    return out.orderBy("user_id", "e1_id").limit(k)


def eql_sequence_sql(
    steps: list[str],
    maxspan_sec: int,
    until: str | None = None,
    k: int = 100,
    tail: bool = False,
) -> str:
    """DuckDB oracle for eql_sequence — same integer tuple ordering, the
    per-anchor argmin expressed as QUALIFY row_number()."""
    if len(steps) not in (2, 3):
        raise ValueError("eql_sequence supports 2 or 3 steps")
    span_us = maxspan_sec * _US

    def step_cte(i: int, step) -> str:
        t, w = _parse_step(step)
        extra = f" AND ({w.replace('==', '=')})" if w is not None else ""
        return (
            f"s{i} AS (SELECT user_id, event_id AS e{i}_id, ts AS ts{i}, "
            f"epoch_us(ts) AS u{i} FROM events WHERE event_type = '{t}'"
            f"{extra})"
        )

    ctes = [step_cte(i + 1, t) for i, t in enumerate(steps)]
    ctes.append(
        "a2 AS (SELECT s1.user_id, e1_id, ts1, u1, e2_id, ts2, u2 "
        "FROM s1 JOIN s2 USING (user_id) "
        "WHERE (u2 > u1 OR (u2 = u1 AND e2_id > e1_id)) "
        f"AND u2 - u1 <= {span_us} "
        "QUALIFY row_number() OVER (PARTITION BY s1.user_id, e1_id "
        "ORDER BY u2, e2_id) = 1)"
    )
    if len(steps) == 3:
        ctes.append(
            "a3 AS (SELECT a2.user_id, e1_id, ts1, u1, e2_id, ts2, u2, "
            "e3_id, ts3, u3 FROM a2 JOIN s3 USING (user_id) "
            "WHERE (u3 > u2 OR (u3 = u2 AND e3_id > e2_id)) "
            f"AND u3 - u1 <= {span_us} "
            "QUALIFY row_number() OVER (PARTITION BY a2.user_id, e1_id, "
            "e2_id ORDER BY u3, e3_id) = 1)"
        )
        final, last_u, last_id = "a3", "u3", "e3_id"
        cols = "user_id, e1_id, ts1, e2_id, ts2, e3_id, ts3"
    else:
        final, last_u, last_id = "a2", "u2", "e2_id"
        cols = "user_id, e1_id, ts1, e2_id, ts2"

    guard = ""
    if until is not None:
        ctes.append(
            f"su AS (SELECT user_id, event_id AS eu_id, epoch_us(ts) AS uu "
            f"FROM events WHERE event_type = '{until}')"
        )
        ctes.append(
            f"cut AS (SELECT f.user_id, f.e1_id, min(ROW(uu, eu_id)) AS c "
            f"FROM {final} f JOIN su USING (user_id) "
            "WHERE (uu > u1 OR (uu = u1 AND eu_id > e1_id)) "
            f"AND uu - u1 <= {span_us} GROUP BY f.user_id, f.e1_id)"
        )
        guard = (
            f" LEFT JOIN cut USING (user_id, e1_id)"
        )
        where = f" WHERE c IS NULL OR ROW({last_u}, {last_id}) < c"
    else:
        where = ""

    body = (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {cols} FROM {final}{guard}{where} "
    )
    if tail:
        return (
            f"SELECT * FROM ({body} ORDER BY user_id DESC, e1_id DESC "
            f"LIMIT {k}) ORDER BY user_id, e1_id"
        )
    return body + f"ORDER BY user_id, e1_id LIMIT {k}"


def eql_sample(events: DataFrame, categories: list[str], k: int = 100) -> DataFrame:
    """EQL ``sample by user_id`` (ES 8.6): keys with >= 1 event of EVERY
    category; the deterministic sample is the earliest (ts, event_id)
    event per category.  Returns (user_id, e1_id, ts1, ..., eN_id, tsN)
    ordered by user_id, LIMIT k.

    Scale shape: one selective-filtered hash agg per category (map-side
    combine to one row per key), then an N-way equi-join of |keys|-sized
    relations — broadcastable when the key space is small, plain shuffle
    join otherwise.
    """
    if not 2 <= len(categories) <= 4:
        raise ValueError("eql_sample supports 2-4 categories")
    parts = []
    for i, cat in enumerate(categories, start=1):
        kc = _umicros("ts").cast("decimal(38,0)") * F.expr(
            _DEC_SHIFT
        ) + F.col("event_id").cast("decimal(38,0)")
        parts.append(
            events.where(F.col("event_type") == cat)
            .groupBy("user_id")
            .agg(
                F.min_by("event_id", kc).alias(f"e{i}_id"),
                F.min_by("ts", kc).alias(f"ts{i}"),
            )
        )
    joined = parts[0]
    for p in parts[1:]:
        joined = joined.join(p, "user_id")
    cols = [F.col("user_id")]
    for i in range(1, len(categories) + 1):
        cols += [F.col(f"e{i}_id"), F.col(f"ts{i}")]
    return joined.select(*cols).orderBy("user_id").limit(k)


def eql_sample_sql(categories: list[str], k: int = 100) -> str:
    if not 2 <= len(categories) <= 4:
        raise ValueError("eql_sample supports 2-4 categories")
    ctes = []
    for i, cat in enumerate(categories, start=1):
        ctes.append(
            f"c{i} AS (SELECT user_id, event_id AS e{i}_id, ts AS ts{i} "
            f"FROM events WHERE event_type = '{cat}' "
            "QUALIFY row_number() OVER (PARTITION BY user_id "
            "ORDER BY epoch_us(ts), event_id) = 1)"
        )
    joins = "c1" + "".join(
        f" JOIN c{i} USING (user_id)" for i in range(2, len(categories) + 1)
    )
    cols = "user_id, " + ", ".join(
        f"e{i}_id, ts{i}" for i in range(1, len(categories) + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT {cols} FROM {joins} ORDER BY user_id LIMIT {k}"
    )


# --------------------------------------------------------------------------
# EQL text parser — the _eql/search surface (category = event_type)
# --------------------------------------------------------------------------

_MAXSPAN_RE = _re.compile(r"^(\d+)(s|m|h|d)$")
_SPAN_MULT = {"s": 1, "m": 60, "h": 3600, "d": 86400}
_STEP_RE = _re.compile(r"\[([^\]]*)\]")
_HEAD_SEQ_RE = _re.compile(
    r"^sequence\s+by\s+(\w+)(?:\s+with\s+maxspan\s*=\s*(\S+))?\s*", _re.I
)
_HEAD_SAMPLE_RE = _re.compile(r"^sample\s+by\s+(\w+)\s*", _re.I)


def _parse_bracket(body: str):
    """`category` or `category where <cond>`; `where true` is a no-op."""
    parts = body.strip().split(None, 1)
    if not parts:
        raise ValueError("empty [ ] step")
    cat = parts[0]
    if not _re.fullmatch(r"\w+", cat):
        raise ValueError(f"bad event category {cat!r}")
    if len(parts) == 1:
        return cat
    rest = parts[1].strip()
    if not rest.lower().startswith("where"):
        raise ValueError(f"expected 'where' in step {body!r}")
    cond = rest[5:].strip()
    if cond.lower() == "true":
        return cat
    return {"type": cat, "where": cond}  # grammar checked by _parse_step


def parse_eql(query: str) -> dict:
    """Parse the EQL core grammar:

        sequence by user_id with maxspan=<N><s|m|h|d>
          [ <category> (where true | where value <cmp> <num>) ] x2-3
        (until [ <category> ])?
      | sample by user_id [ <category> ] x2-4

    The join key must be user_id (the events table's entity key); the
    step category matches event_type.  Returns the argument dict for
    eql_sequence / eql_sample.
    """
    q = query.strip()
    pipe = None
    pm = _re.search(r"\|\s*(head|tail)\s+(\d+)\s*$", q, _re.I)
    if pm:
        pipe = (pm.group(1).lower(), int(pm.group(2)))
        if pipe[1] < 1:
            raise ValueError("pipe size must be >= 1")
        q = q[: pm.start()].strip()
    if "|" in q:
        raise ValueError("only one trailing | head/tail pipe is supported")
    m = _HEAD_SAMPLE_RE.match(q)
    if m:
        if m.group(1) != "user_id":
            raise ValueError("sample key must be user_id")
        body = q[m.end():]
        if _STEP_RE.sub("", body).strip():
            raise ValueError(
                f"unparsed text outside [ ] steps: {_STEP_RE.sub('', body).strip()!r}"
            )
        cats = [_parse_bracket(b) for b in _STEP_RE.findall(body)]
        if any(not isinstance(c, str) for c in cats):
            raise ValueError("sample steps take no where clause")
        return {"kind": "sample", "categories": cats, "pipe": pipe}
    m = _HEAD_SEQ_RE.match(q)
    if not m:
        raise ValueError("query must start with 'sequence by' or 'sample by'")
    if m.group(1) != "user_id":
        raise ValueError("sequence key must be user_id")
    if m.group(2) is None:
        raise ValueError("sequence requires 'with maxspan=' (unbounded spans "
                         "are not supported)")
    sm = _MAXSPAN_RE.match(m.group(2))
    if not sm:
        raise ValueError(f"bad maxspan {m.group(2)!r}")
    maxspan_sec = int(sm.group(1)) * _SPAN_MULT[sm.group(2)]
    rest = q[m.end():]
    until = None
    um = _re.search(r"until\s*\[([^\]]*)\]\s*$", rest, _re.I)
    if um:
        u = _parse_bracket(um.group(1))
        if not isinstance(u, str):
            raise ValueError("until takes no where clause")
        until = u
        rest = rest[: um.start()]
    if _STEP_RE.sub("", rest).strip():
        # e.g. an `until` clause not in trailing position would otherwise
        # be silently swallowed and its bracket read as a plain step
        raise ValueError(
            f"unparsed text outside [ ] steps: {_STEP_RE.sub('', rest).strip()!r}"
        )
    steps = [_parse_bracket(b) for b in _STEP_RE.findall(rest)]
    # Validate step predicates eagerly (parse-time contract errors).
    for s in steps:
        _parse_step(s)
    return {
        "kind": "sequence",
        "steps": steps,
        "maxspan_sec": maxspan_sec,
        "until": until,
        "pipe": pipe,
    }


def eql_search(events: DataFrame, query: str, k: int = 100) -> DataFrame:
    """Execute an EQL query string — the _eql/search endpoint: parse once,
    dispatch onto the verified sequence/sample plans (routing only)."""
    p = parse_eql(query)
    kk, tail = k, False
    if p["pipe"] is not None:
        kk, tail = p["pipe"][1], p["pipe"][0] == "tail"
    if p["kind"] == "sample":
        if tail:
            raise ValueError("| tail is not supported on sample queries")
        return eql_sample(events, p["categories"], k=kk)
    return eql_sequence(
        events, p["steps"], p["maxspan_sec"], until=p["until"], k=kk,
        tail=tail,
    )


def eql_search_sql(query: str, k: int = 100) -> str:
    p = parse_eql(query)
    kk, tail = k, False
    if p["pipe"] is not None:
        kk, tail = p["pipe"][1], p["pipe"][0] == "tail"
    if p["kind"] == "sample":
        if tail:
            raise ValueError("| tail is not supported on sample queries")
        return eql_sample_sql(p["categories"], k=kk)
    return eql_sequence_sql(
        p["steps"], p["maxspan_sec"], until=p["until"], k=kk, tail=tail
    )
