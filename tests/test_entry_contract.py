"""Pre-verify the driver's correctness gate: run every queries()/oracle_sql()
pair against DuckDB exactly like the driver does (sf0.001 here for speed;
the driver uses sf0.01 — same generator, larger N)."""

import pytest

import __spark_entry__ as entry_mod

from .oracle import assert_same


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "url", "score"]


def test_keys_align():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracle keys without queries: {missing}"
    # every query SHOULD have an oracle unless documented non-SQL
    assert set(q) == set(o)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, duck, sf_dir, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    got = q(spark, sf_dir)
    if sql is None:
        assert got.count() >= 0
        return
    want = duck.execute(sql).df()
    assert_same(got, want)


def test_never_driver_rowed_entries_in_sample_window():
    """The driver's correctness gate samples the first 50 registered
    entries; every entry without a prior driver row must sit inside that
    window or it can never earn one."""
    import json
    import os

    import __spark_entry__ as e

    import glob

    # The window was packed for round 5 (_R05_WINDOW): its invariant is
    # over the artifacts that existed when it was packed.  Artifacts from
    # that round on (CORRECTNESS_r05+) row the window entries themselves,
    # so including them would self-invalidate the test the moment the
    # round-5 results land (ADVICE r5, medium).
    _PACKED_FOR_ROUND = 5
    rowed = set()
    for p in glob.glob(
        os.path.join(os.path.dirname(e.__file__), "CORRECTNESS_r*.json")
    ):
        rnum = int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
        if rnum >= _PACKED_FOR_ROUND:
            continue
        rowed |= set(json.load(open(p)))
    if not rowed:
        return  # fresh clone without driver artifacts
    order = list(e.queries())
    never = [k for k in order if k not in rowed]
    outside = [k for k in never if k not in set(order[:50])]
    if len(never) <= 50:
        assert outside == [], outside
    else:
        # more new entries this round than the driver can sample: the
        # window must then be FULLY packed with never-rowed entries
        # (maximal sampling); the overflow rotates in next round.
        window_rowed = [k for k in order[:50] if k in rowed]
        assert window_rowed == [], window_rowed


def test_every_query_has_oracle():
    import __spark_entry__ as e

    qs, o = e.queries(), e.oracle_sql()
    assert [k for k in qs if k not in o] == []


def test_no_duplicate_registry_keys_in_source():
    """r4 postmortem: duplicate keys inside ONE dict literal collapse
    silently (last lambda wins) before any runtime check can see them,
    which swapped the tested variant of categorize_text / terms_enum /
    ccnet_buckets.  Scan the registry module's AST: every dict literal
    anywhere in queries()/oracle_sql() must have unique string keys."""
    import ast

    import __spark_entry__ as e

    tree = ast.parse(open(e.__file__).read())
    funcs = {
        n.name: n
        for n in ast.walk(tree)
        if isinstance(n, ast.FunctionDef) and n.name in ("queries", "oracle_sql")
    }
    assert set(funcs) == {"queries", "oracle_sql"}
    for fname, fn in funcs.items():
        for node in ast.walk(fn):
            if not isinstance(node, ast.Dict):
                continue
            seen = set()
            for k in node.keys:
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    assert k.value not in seen, (
                        f"duplicate key {k.value!r} in a {fname}() dict "
                        f"literal (line {k.lineno})"
                    )
                    seen.add(k.value)


def test_merge_unique_raises_on_collision():
    import pytest as _pytest

    import __spark_entry__ as e

    merged = e._merge_unique({"a": 1}, {"b": 2})
    assert merged == {"a": 1, "b": 2}
    with _pytest.raises(ValueError, match="duplicate registry key"):
        e._merge_unique({"a": 1}, {"a": 2})


def test_r05_window_is_50_never_rowed():
    """The round-5 sample window must be exactly the 50 entries in
    _R05_WINDOW, all of which had no driver row in r01-r04."""
    import glob
    import json
    import os

    import __spark_entry__ as e

    order = list(e.queries())
    assert order[:50] == list(e._R05_WINDOW)
    rowed = set()
    for p in glob.glob(
        os.path.join(os.path.dirname(e.__file__), "CORRECTNESS_r0[1-4].json")
    ):
        rowed |= set(json.load(open(p)))
    if rowed:
        assert [k for k in e._R05_WINDOW if k in rowed] == []


def test_extract_entities_plan_has_no_python_udf(spark, sf_dir):
    """VERDICT r4 Wrong #3: the entity extractor must be pure Column
    expressions (regexp_extract_all), no pandas/Python UDF in the plan."""
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.operators import enrichment as en

    plan = en.extract_entities(load_corpus(spark, sf_dir))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEvalPython" not in plan, plan
