"""ES terms agg with shard_size truncation + doc_count_error_upper_bound."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import facets

from .oracle import assert_same


@pytest.mark.parametrize(
    "size,shard_size,n_shards", [(10, 15, 4), (8, 5, 4), (10, 3, 2)]
)
def test_terms_agg_sharded_vs_oracle(spark, duck, sf_dir, size, shard_size, n_shards):
    got = facets.terms_agg_sharded(
        load_corpus(spark, sf_dir), size, shard_size, n_shards
    )
    want = duck.execute(
        facets.terms_agg_sharded_sql(size, shard_size, n_shards)
    ).df()
    assert_same(got, want)


def test_unbounded_shard_size_is_exact(spark, duck, sf_dir):
    """shard_size >= vocab: every bucket error_ub = 0 and doc_count is
    the true global df (cross-checked against a direct df query)."""
    c = load_corpus(spark, sf_dir)
    rows = facets.terms_agg_sharded(c, size=10, shard_size=10**6).collect()
    assert all(r["error_ub"] == 0 for r in rows)
    truth = {
        r["term"]: r["df"]
        for r in duck.execute(facets.rare_terms_sql(10**9, 10**9))
        .df()
        .to_dict("records")
    }
    for r in rows:
        assert truth[r["term"]] == r["doc_count"], r["term"]


def test_truncation_only_undercounts(spark, sf_dir):
    """A truncated run's doc_count never exceeds the exact run's, and
    exact >= truncated count is within the reported error bound."""
    c = load_corpus(spark, sf_dir)
    exact = {
        r["term"]: r["doc_count"]
        for r in facets.terms_agg_sharded(c, size=50, shard_size=10**6).collect()
    }
    approx = facets.terms_agg_sharded(c, size=10, shard_size=5).collect()
    for r in approx:
        ex = exact.get(r["term"])
        if ex is None:
            continue
        assert r["doc_count"] <= ex
        assert ex - r["doc_count"] <= r["error_ub"]
