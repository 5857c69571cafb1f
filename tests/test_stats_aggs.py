"""matrix_stats, auto_date_histogram, sliced scroll."""

import math

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import aggregates as agg
from telegram2elastic_spark.query import facets, search

from .oracle import assert_same


def test_matrix_stats_vs_oracle(spark, duck, sf_dir):
    got = agg.matrix_stats(load_corpus(spark, sf_dir))
    want = duck.execute(agg.matrix_stats_sql()).df()
    assert_same(got, want)


def test_matrix_stats_correlation_sane(spark, sf_dir):
    """chars vs tokens are strongly positively correlated by construction
    (more text, more tokens) and |r| <= 1."""
    r = agg.matrix_stats(load_corpus(spark, sf_dir)).first()
    assert 0.5 < r["correlation"] <= 1.0
    assert math.isclose(
        r["covariance"] / math.sqrt(r["var_chars"] * r["var_tokens"]),
        r["correlation"],
        abs_tol=1e-5,
    )


@pytest.mark.parametrize("target", [5, 20, 100])
def test_auto_date_histogram_vs_oracle(spark, duck, sf_dir, target):
    got = facets.auto_date_histogram(load_corpus(spark, sf_dir), target_buckets=target)
    want = duck.execute(facets.auto_date_histogram_sql(target_buckets=target)).df()
    assert_same(got, want)


def test_auto_date_histogram_respects_target(spark, sf_dir):
    for target in (5, 20, 100):
        rows = facets.auto_date_histogram(
            load_corpus(spark, sf_dir), target_buckets=target
        ).collect()
        assert 1 <= len(rows) <= target
    # tighter target -> same or coarser interval
    iv5 = facets.auto_date_histogram(load_corpus(spark, sf_dir), 5).first()["interval_sec"]
    iv100 = facets.auto_date_histogram(load_corpus(spark, sf_dir), 100).first()["interval_sec"]
    assert iv5 >= iv100


def test_scan_sliced_vs_oracle(spark, duck, sf_dir):
    got = search.scan_sliced(load_corpus(spark, sf_dir), 2, 5, limit=100)
    want = duck.execute(search.scan_sliced_sql(2, 5, limit=100)).df()
    assert_same(got, want)


def test_slices_partition_the_corpus(spark, sf_dir):
    """Slices are disjoint and their union is the whole corpus."""
    corpus = load_corpus(spark, sf_dir)
    n = corpus.count()
    seen = set()
    for s in range(5):
        ids = {
            r["doc_id"]
            for r in search.scan_sliced(corpus, s, 5, limit=n).collect()
        }
        assert not (seen & ids)
        seen |= ids
    assert len(seen) == n


def test_slice_filter_pushed_to_scan(spark, sf_dir):
    plan = (
        search.scan_sliced(load_corpus(spark, sf_dir), 1, 4, limit=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan or "Filter" in plan  # predicate present
    assert "Exchange" not in plan.split("TakeOrdered")[0].split("Scan")[0]
