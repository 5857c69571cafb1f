"""ES bucket-agg surface: range / date_range (overlapping buckets),
adjacency_matrix, diversified_sampler, bucket_script + bucket_selector."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import aggregates as agg
from telegram2elastic_spark.query import facets

from .oracle import assert_same


def test_agg_range_vs_oracle(spark, duck, sf_dir):
    got = facets.agg_range(load_corpus(spark, sf_dir))
    want = duck.execute(facets.agg_range_sql()).df()
    assert_same(got, want)


def test_agg_range_overlap_double_counts(spark, sf_dir):
    """Overlapping ES ranges place one doc in several buckets: the bucket
    counts must sum to MORE than the corpus rows whenever the overlap
    regions are populated."""
    corpus = load_corpus(spark, sf_dir)
    rows = facets.agg_range(corpus).collect()
    n = corpus.count()
    overlap_docs = corpus.filter(
        "(n_chars >= 100 AND n_chars < 200) OR (n_chars >= 300 AND n_chars < 400)"
    ).count()
    assert sum(r["cnt"] for r in rows) == n + overlap_docs


def test_agg_range_custom_ranges(spark, duck, sf_dir):
    ranges = [("tiny", None, 120), ("rest", 120, None)]
    got = facets.agg_range(load_corpus(spark, sf_dir), ranges=ranges)
    want = duck.execute(facets.agg_range_sql(ranges=ranges)).df()
    assert_same(got, want)


def test_agg_date_range_vs_oracle(spark, duck, sf_dir):
    got = facets.agg_date_range(load_corpus(spark, sf_dir))
    want = duck.execute(facets.agg_date_range_sql()).df()
    assert_same(got, want)
    # every default bucket populated at every driver sf (boundary choice)
    assert got.count() == 3


def test_agg_adjacency_matrix_vs_oracle(spark, duck, sf_dir):
    got = facets.agg_adjacency_matrix(load_corpus(spark, sf_dir))
    want = duck.execute(facets.agg_adjacency_matrix_sql()).df()
    assert_same(got, want)


def test_agg_adjacency_matrix_single_scan(spark, sf_dir):
    """All singles + pairs come from ONE aggregate over ONE scan."""
    corpus = load_corpus(spark, sf_dir)
    plan = (
        facets.agg_adjacency_matrix(corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1


def test_agg_adjacency_pair_bounded_by_singles(spark, sf_dir):
    rows = {
        r["key"]: r["cnt"]
        for r in facets.agg_adjacency_matrix(load_corpus(spark, sf_dir)).collect()
    }
    for key, cnt in rows.items():
        if "&" in key:
            a, b = key.split("&")
            assert cnt <= min(rows.get(a, 0), rows.get(b, 0))


def test_sampler_diversified_vs_oracle(spark, duck, sf_dir):
    got = facets.sampler_diversified(load_corpus(spark, sf_dir))
    want = duck.execute(facets.sampler_diversified_sql()).df()
    assert_same(got, want)


def test_sampler_respects_caps(spark, sf_dir):
    rows = facets.sampler_diversified(
        load_corpus(spark, sf_dir), q=None, shard_size=30, max_per_lang=4
    ).collect()
    assert all(r["cnt"] <= 4 for r in rows)
    assert sum(r["cnt"] for r in rows) <= 30


def test_timeline_bucket_script_vs_oracle(spark, duck, sf_dir):
    got = agg.timeline_bucket_script(load_corpus(spark, sf_dir), min_docs=5)
    want = duck.execute(agg.timeline_bucket_script_sql(min_docs=5)).df()
    assert_same(got, want)


def test_bucket_selector_drops_thin_buckets(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    unfiltered = agg.timeline_bucket_script(corpus, min_docs=0).collect()
    kept = agg.timeline_bucket_script(corpus, min_docs=40).collect()
    assert len(kept) <= len(unfiltered)
    assert all(r["n_docs"] >= 40 for r in kept)
    for r in kept:
        assert abs(r["match_ratio"] - r["match_docs"] / r["n_docs"]) < 1e-6
