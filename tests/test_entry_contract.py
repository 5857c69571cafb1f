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

    rowed = set()
    for p in glob.glob(
        os.path.join(os.path.dirname(e.__file__), "CORRECTNESS_r*.json")
    ):
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
