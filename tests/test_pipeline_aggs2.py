"""bucket_sort / serial_diff pipeline aggs, _analyze and _mtermvectors."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import aggregates as agg
from telegram2elastic_spark.query import meta

from .oracle import assert_same


@pytest.mark.parametrize("size,skip", [(10, 0), (5, 5)])
def test_bucket_sort_vs_oracle(spark, duck, sf_dir, size, skip):
    got = agg.timeline_bucket_sort(load_corpus(spark, sf_dir), size=size, skip=skip)
    want = duck.execute(agg.timeline_bucket_sort_sql(size=size, skip=skip)).df()
    assert_same(got, want)


def test_bucket_sort_pages_are_disjoint(spark, sf_dir):
    c = load_corpus(spark, sf_dir)
    p1 = {r["hour"] for r in agg.timeline_bucket_sort(c, size=5, skip=0).collect()}
    p2 = {r["hour"] for r in agg.timeline_bucket_sort(c, size=5, skip=5).collect()}
    assert p1 and p2 and not (p1 & p2)


@pytest.mark.parametrize("lag", [1, 24])
def test_serial_diff_vs_oracle(spark, duck, sf_dir, lag):
    got = agg.timeline_serial_diff(load_corpus(spark, sf_dir), lag=lag)
    want = duck.execute(agg.timeline_serial_diff_sql(lag=lag)).df()
    assert_same(got, want)


def test_serial_diff_leading_nulls(spark, sf_dir):
    rows = agg.timeline_serial_diff(load_corpus(spark, sf_dir), lag=3).collect()
    assert all(r["diff"] is None for r in rows[:3])
    assert any(r["diff"] is not None for r in rows[3:])


def test_mtermvectors_vs_oracle(spark, duck, sf_dir):
    got = agg.mtermvectors(load_corpus(spark, sf_dir), [3, 7, 11])
    want = duck.execute(agg.mtermvectors_sql([3, 7, 11])).df()
    assert_same(got, want)


def test_mtermvectors_matches_single(spark, sf_dir):
    c = load_corpus(spark, sf_dir)
    multi = [
        (r["term"], r["freq"], r["first_pos"])
        for r in agg.mtermvectors(c, [7]).collect()
    ]
    single = [
        (r["term"], r["freq"], r["first_pos"])
        for r in agg.doc_termvectors(c, 7).collect()
    ]
    assert multi == single


@pytest.mark.parametrize(
    "text",
    [
        "The QUICK brown-fox, jumps_over 42 lazy-dogs. the the",
        "  leading and trailing  ",
        "",
        "répété Ünïcode tokens répété",
    ],
)
def test_analyze_vs_oracle(spark, duck, text):
    got = meta.analyze_text(spark, text)
    want = duck.execute(meta.analyze_text_sql(text)).df()
    assert_same(got, want)


def test_analyze_offsets_slice_back(spark):
    """Each (start, end) slices the lowered original to the token."""
    s = "Mixed CASE text with-dashes and_underscores"
    for r in meta.analyze_text(spark, s).collect():
        assert s.lower()[r["start_offset"]:r["end_offset"]] == r["token"]
