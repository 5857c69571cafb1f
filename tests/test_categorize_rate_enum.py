"""categorize_text / agg_rate / terms_enum — parity + semantics."""

import pytest

from telegram2elastic_spark.corpus import as_corpus, load_corpus, load_events
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.operators import aggregates as agg
from telegram2elastic_spark.query import facets, meta
from tests.oracle import assert_same


def test_categorize_text_oracle_parity(spark, sf_dir, duck):
    df = facets.categorize_text(load_corpus(spark, sf_dir), 5, k=20)
    assert_same(df, duck.execute(facets.categorize_text_sql(5, k=20)).fetchdf())
    assert df.count() > 0


def _mini(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' lang", "'x' source", "length(text) n_chars"
    )
    return as_corpus(docs)


def test_categorize_digit_tokens_are_variable_parts(spark):
    c = _mini(spark, [
        (0, "error in shard 17 timeout"),
        (1, "error in shard 42 timeout"),
        (2, "error in shard x9 timeout"),   # x9 contains a digit -> dropped
        (3, "startup complete"),
        (4, "1234 9999"),                    # all variable -> uncategorized
    ])
    got = {(r.category, r.doc_count) for r in facets.categorize_text(c, 5).collect()}
    assert got == {("error in shard timeout", 3), ("startup complete", 1)}


def test_categorize_prefix_truncation(spark):
    c = _mini(spark, [(0, "a b c d e f g"), (1, "a b c d e zzz")])
    got = facets.categorize_text(c, 3).collect()
    assert [(r.category, r.doc_count) for r in got] == [("a b c", 2)]


def test_events_value_rate_oracle_parity(spark, sf_dir, duck):
    df = agg.events_value_rate(load_events(spark, sf_dir))
    assert_same(df, duck.execute(agg.EVENTS_VALUE_RATE_SQL).fetchdf())
    assert df.count() > 0


def test_events_value_rate_unit_rescale(spark, sf_dir):
    """rate(unit=hour) over day buckets = daily count / 24, sum of exact
    cents / 2400 — recomputed in Python."""
    ev = load_events(spark, sf_dir)
    rows = ev.collect()
    by_day = {}
    for r in rows:
        d = r.ts.strftime("%Y-%m-%d")
        n, c = by_day.get(d, (0, 0))
        by_day[d] = (n + 1, c + round(r.value * 100))
    got = {r.day: (r.events_per_hour, r.value_per_hour)
           for r in agg.events_value_rate(ev).collect()}
    assert set(got) == set(by_day)
    for d, (n, cents) in by_day.items():
        assert got[d][0] == n / 24.0
        assert got[d][1] == cents / 2400.0


def test_terms_enum_parity_and_order(spark, sf_dir, duck):
    idx = build_index(load_corpus(spark, sf_dir))
    df = meta.terms_enum(idx, "s", 50)
    odf = duck.execute(meta.terms_enum_sql("s", 50)).fetchdf()
    assert_same(df, odf)
    terms = [r.term for r in df.collect()]
    assert terms == sorted(terms) and all(t.startswith("s") for t in terms)


def test_terms_enum_size_cap(spark, sf_dir):
    idx = build_index(load_corpus(spark, sf_dir))
    assert meta.terms_enum(idx, "s", 2).count() == 2


def test_categorize_arg_validation(spark, sf_dir):
    with pytest.raises(ValueError):
        facets.categorize_text(load_corpus(spark, sf_dir), 0)
    with pytest.raises(ValueError):
        facets.categorize_text_sql(0)
