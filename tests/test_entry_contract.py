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
