"""EQL sequence / until / sample — oracle parity, pure-Python recompute of
the anchored greedy-earliest funnel, crafted edge cases."""

import datetime as dt

import pytest

from telegram2elastic_spark.corpus import load_events
from telegram2elastic_spark.query import eql
from tests.oracle import assert_same


def _ev(spark, rows):
    """rows: (event_id, ts_seconds_offset, user_id, event_type)."""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, base + dt.timedelta(seconds=off), uid, t, 0.0, "{}")
            for eid, off, uid, t in rows
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    )


# ---------------------------------------------------------------- parity


def test_sequence2_oracle_parity(spark, sf_dir, duck):
    df = eql.eql_sequence(load_events(spark, sf_dir), ["signup", "error"], 7200, k=50)
    assert_same(df, duck.execute(eql.eql_sequence_sql(["signup", "error"], 7200, k=50)).fetchdf())
    assert df.count() > 0


def test_sequence3_oracle_parity(spark, sf_dir, duck):
    args = (["signup", "click", "purchase"], 21600)
    df = eql.eql_sequence(load_events(spark, sf_dir), *args, k=50)
    assert_same(df, duck.execute(eql.eql_sequence_sql(*args, k=50)).fetchdf())
    assert df.count() > 0


def test_sequence_until_oracle_parity(spark, sf_dir, duck):
    df = eql.eql_sequence(
        load_events(spark, sf_dir), ["signup", "purchase"], 21600, until="error", k=50
    )
    odf = duck.execute(
        eql.eql_sequence_sql(["signup", "purchase"], 21600, until="error", k=50)
    ).fetchdf()
    assert_same(df, odf)
    assert df.count() > 0


def test_sample_oracle_parity(spark, sf_dir, duck):
    cats = ["signup", "error", "purchase"]
    df = eql.eql_sample(load_events(spark, sf_dir), cats, k=50)
    assert_same(df, duck.execute(eql.eql_sample_sql(cats, k=50)).fetchdf())
    assert df.count() > 0


# ------------------------------------------- independent Python recompute


def _py_funnel(rows, steps, span_sec, until=None):
    """Anchored greedy-earliest funnel in plain Python over
    (event_id, ts, user_id, event_type) tuples."""
    by_user = {}
    for eid, ts, uid, t in rows:
        by_user.setdefault(uid, []).append((ts, eid, t))
    out = []
    for uid, evs in by_user.items():
        evs.sort()
        for ts1, e1, t in evs:
            if t != steps[0]:
                continue
            cur_ts, cur_id = ts1, e1
            bound = [(e1, ts1)]
            ok = True
            for s in steps[1:]:
                nxt = [
                    (ts, eid)
                    for ts, eid, tt in evs
                    if tt == s
                    and (ts, eid) > (cur_ts, cur_id)
                    and (ts - ts1).total_seconds() <= span_sec
                ]
                if not nxt:
                    ok = False
                    break
                cur_ts, cur_id = min(nxt)
                bound.append((cur_id, cur_ts))
            if not ok:
                continue
            if until is not None:
                cuts = [
                    (ts, eid)
                    for ts, eid, tt in evs
                    if tt == until
                    and (ts, eid) > (ts1, e1)
                    and (ts - ts1).total_seconds() <= span_sec
                ]
                if cuts and min(cuts) < (cur_ts, cur_id):
                    continue
            out.append((uid, *[x for pair in bound for x in pair]))
    return sorted(out)


def test_sequence_matches_python_recompute(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    rows = [
        (r.event_id, r.ts, r.user_id, r.event_type)
        for r in ev.collect()
    ]
    expected = _py_funnel(rows, ["signup", "error"], 7200)
    got = [
        (r.user_id, r.e1_id, r.ts1, r.e2_id, r.ts2)
        for r in eql.eql_sequence(ev, ["signup", "error"], 7200, k=10**6).collect()
    ]
    assert sorted(got) == expected


def test_sequence_until_matches_python_recompute(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    rows = [(r.event_id, r.ts, r.user_id, r.event_type) for r in ev.collect()]
    expected = _py_funnel(rows, ["signup", "purchase"], 21600, until="error")
    got = [
        (r.user_id, r.e1_id, r.ts1, r.e2_id, r.ts2)
        for r in eql.eql_sequence(
            ev, ["signup", "purchase"], 21600, until="error", k=10**6
        ).collect()
    ]
    assert sorted(got) == expected


# ------------------------------------------------------ crafted edge cases


def test_until_cancels_inflight_sequence(spark):
    # u1: A .. X .. B  -> until X precedes the completion, killed.
    # u2: A .. B .. X  -> until after completion, survives.
    ev = _ev(spark, [
        (1, 0, 1, "A"), (2, 10, 1, "X"), (3, 20, 1, "B"),
        (4, 0, 2, "A"), (5, 10, 2, "B"), (6, 20, 2, "X"),
    ])
    got = eql.eql_sequence(ev, ["A", "B"], 3600, until="X").collect()
    assert [(r.user_id, r.e1_id, r.e2_id) for r in got] == [(2, 4, 5)]


def test_maxspan_boundary_inclusive(spark):
    ev = _ev(spark, [
        (1, 0, 1, "A"), (2, 100, 1, "B"),   # exactly at maxspan
        (3, 0, 2, "A"), (4, 101, 2, "B"),   # one second past
    ])
    got = eql.eql_sequence(ev, ["A", "B"], 100).collect()
    assert [(r.user_id, r.e1_id, r.e2_id) for r in got] == [(1, 1, 2)]


def test_greedy_earliest_binding_and_tie_break(spark):
    # Two Bs after the anchor: binds the earliest; same-ts pair breaks by
    # event_id; a B at the anchor's own (ts, id) or earlier never binds.
    ev = _ev(spark, [
        (5, 0, 1, "A"),
        (3, 0, 1, "B"),    # same ts, smaller id -> NOT after the anchor
        (6, 0, 1, "B"),    # same ts, larger id -> earliest qualifying
        (7, 50, 1, "B"),
    ])
    got = eql.eql_sequence(ev, ["A", "B"], 3600).collect()
    assert [(r.user_id, r.e1_id, r.e2_id) for r in got] == [(1, 5, 6)]


def test_maxspan_is_first_to_last(spark):
    # 3-step: each hop within span of the previous, but last - first > span.
    ev = _ev(spark, [
        (1, 0, 1, "A"), (2, 80, 1, "B"), (3, 160, 1, "C"),
    ])
    assert eql.eql_sequence(ev, ["A", "B", "C"], 100).count() == 0
    assert eql.eql_sequence(ev, ["A", "B", "C"], 160).count() == 1


def test_sample_requires_every_category(spark):
    ev = _ev(spark, [
        (1, 0, 1, "A"), (2, 10, 1, "B"),
        (3, 0, 2, "A"),                      # no B -> excluded
        (4, 30, 3, "B"), (5, 20, 3, "A"), (6, 5, 3, "B"),
    ])
    got = eql.eql_sample(ev, ["A", "B"]).collect()
    assert [(r.user_id, r.e1_id, r.e2_id) for r in got] == [(1, 1, 2), (3, 5, 6)]


def test_arg_validation(spark):
    ev = _ev(spark, [(1, 0, 1, "A")])
    with pytest.raises(ValueError):
        eql.eql_sequence(ev, ["A"], 100)
    with pytest.raises(ValueError):
        eql.eql_sequence(ev, ["A", "B"], 0)
    with pytest.raises(ValueError):
        eql.eql_sequence_sql(["A", "B", "C", "D"], 10)
    with pytest.raises(ValueError):
        eql.eql_sample(ev, ["A"])


# --------------------------------------------------------------- parser


EQL_Q = (
    "sequence by user_id with maxspan=6h "
    '[ signup where true ] [ purchase where value >= 100 ] '
    "until [ error ]"
)


def test_parser_roundtrip_sequence(spark, sf_dir, duck):
    ev = load_events(spark, sf_dir)
    df = eql.eql_search(ev, EQL_Q, k=50)
    assert_same(df, duck.execute(eql.eql_search_sql(EQL_Q, k=50)).fetchdf())
    # routing identity: same rows as the direct call
    direct = eql.eql_sequence(
        ev, ["signup", {"type": "purchase", "where": "value >= 100"}],
        21600, until="error", k=50,
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, direct.collect()))
    assert df.count() > 0


def test_parser_roundtrip_sample(spark, sf_dir, duck):
    q = "sample by user_id [ signup ] [ error ]"
    df = eql.eql_search(load_events(spark, sf_dir), q, k=50)
    assert_same(df, duck.execute(eql.eql_search_sql(q, k=50)).fetchdf())


def test_step_where_filters_rows(spark):
    ev = _ev(spark, [(1, 0, 1, "A"), (2, 10, 1, "B"), (3, 20, 1, "B")])
    # value column is 0.0 in _ev; a predicate excluding it kills the match
    assert eql.eql_sequence(
        ev, ["A", {"type": "B", "where": "value > 5"}], 3600
    ).count() == 0
    assert eql.eql_sequence(
        ev, ["A", {"type": "B", "where": "value >= 0"}], 3600
    ).count() == 1


def test_parser_errors():
    import pytest as _pytest

    for bad in [
        "sequence by other_key with maxspan=1h [ a ] [ b ]",
        "sequence by user_id [ a ] [ b ]",                     # no maxspan
        "sequence by user_id with maxspan=10x [ a ] [ b ]",
        "sequence by user_id with maxspan=1h [ a where props == 'x' ] [ b ]",
        "sample by user_id [ a where value > 1 ] [ b ]",
        "retrospect by user_id [ a ] [ b ]",
        "sequence by user_id with maxspan=1h [ ] [ b ]",
    ]:
        with _pytest.raises(ValueError):
            eql.parse_eql(bad)


def test_parser_maxspan_units():
    assert eql.parse_eql(
        "sequence by user_id with maxspan=2m [ a ] [ b ]"
    )["maxspan_sec"] == 120
    assert eql.parse_eql(
        "sequence by user_id with maxspan=1d [ a ] [ b ]"
    )["maxspan_sec"] == 86400


def test_parser_rejects_unparsed_text():
    import pytest as _pytest

    # a non-trailing until would otherwise be swallowed silently
    with _pytest.raises(ValueError, match="unparsed text"):
        eql.parse_eql(
            "sequence by user_id with maxspan=1h until [ x ] [ a ] [ b ]"
        )
    with _pytest.raises(ValueError, match="unparsed text"):
        eql.parse_eql("sample by user_id [ a ] garbage [ b ]")
    # trailing until still parses
    p = eql.parse_eql(
        "sequence by user_id with maxspan=1h [ a ] [ b ] until [ x ]"
    )
    assert p["until"] == "x" and p["steps"] == ["a", "b"]


def test_pipes_head_tail(spark, sf_dir, duck):
    ev = load_events(spark, sf_dir)
    base = "sequence by user_id with maxspan=6h [ signup ] [ error ]"
    full = eql.eql_sequence(ev, ["signup", "error"], 21600, k=10**6).collect()
    head = eql.eql_search(ev, base + " | head 3").collect()
    assert [tuple(r) for r in head] == [tuple(r) for r in full[:3]]
    tail = eql.eql_search(ev, base + " | tail 3").collect()
    assert [tuple(r) for r in tail] == [tuple(r) for r in full[-3:]]
    # oracle parity for both pipes
    from tests.oracle import assert_same

    assert_same(
        eql.eql_search(ev, base + " | head 3"),
        duck.execute(eql.eql_search_sql(base + " | head 3")).fetchdf(),
    )
    assert_same(
        eql.eql_search(ev, base + " | tail 3"),
        duck.execute(eql.eql_search_sql(base + " | tail 3")).fetchdf(),
    )


def test_pipe_errors():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        eql.parse_eql("sequence by user_id with maxspan=1h [ a ] [ b ] | head 0")
    with _pytest.raises(ValueError):
        eql.parse_eql(
            "sequence by user_id with maxspan=1h [ a ] [ b ] | head 2 | tail 1"
        )
    with _pytest.raises(ValueError):
        eql.eql_search_sql("sample by user_id [ a ] [ b ] | tail 2")
