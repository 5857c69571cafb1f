"""Session-8 ES agg surface vs DuckDB: global/missing, MAD,
cumulative_cardinality, rate, percentiles_bucket, random_sampler,
variable_width_histogram."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import aggregates as agg

from .oracle import assert_same


def test_global_vs_oracle(spark, duck, sf_dir):
    assert_same(
        agg.agg_global(load_corpus(spark, sf_dir), lang="en"),
        duck.execute(agg.agg_global_sql(lang="en")).df(),
    )


def test_missing_vs_oracle(spark, duck, sf_dir):
    assert_same(
        agg.agg_missing(load_corpus(spark, sf_dir)),
        duck.execute(agg.agg_missing_sql()).df(),
    )


def test_missing_counts_sum_to_corpus(spark, sf_dir):
    c = load_corpus(spark, sf_dir)
    r = agg.agg_missing(c).first()
    assert r["missing_docs"] + r["present_docs"] == c.count()
    assert r["missing_docs"] > 0  # the derived field is genuinely optional


def test_mad_vs_oracle(spark, duck, sf_dir):
    assert_same(
        agg.agg_mad(load_corpus(spark, sf_dir)),
        duck.execute(agg.agg_mad_sql()).df(),
    )


def test_mad_known_values(spark):
    from telegram2elastic_spark.corpus import as_corpus

    rows = [(i, "t", "en", "s", v) for i, v in enumerate([1, 1, 2, 2, 4, 6, 9])]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    r = agg.agg_mad(as_corpus(docs)).first()
    # median = 2; |x-2| = [1,1,0,0,2,4,7] -> sorted [0,0,1,1,2,4,7] -> median 1
    assert r["median_chars"] == 2.0 and r["mad_chars"] == 1.0


def test_cumulative_cardinality_vs_oracle(spark, duck, sf_dir):
    assert_same(
        agg.agg_cumulative_cardinality(load_corpus(spark, sf_dir)),
        duck.execute(agg.agg_cumulative_cardinality_sql()).df(),
    )


def test_cumulative_cardinality_monotone_and_total(spark, sf_dir):
    from pyspark.sql import functions as F

    c = load_corpus(spark, sf_dir)
    rows = agg.agg_cumulative_cardinality(c).collect()
    cums = [r["cum_hosts"] for r in rows]
    assert cums == sorted(cums)
    n_hosts = (
        c.select(F.regexp_extract("url", "^[a-z]+://([^/]+)", 1).alias("h"))
        .distinct()
        .count()
    )
    assert cums[-1] == n_hosts


def test_rate_vs_oracle(spark, duck, sf_dir):
    assert_same(
        agg.agg_rate(load_corpus(spark, sf_dir)),
        duck.execute(agg.agg_rate_sql()).df(),
    )


def test_percentiles_bucket_vs_oracle(spark, duck, sf_dir):
    assert_same(
        agg.agg_percentiles_bucket(load_corpus(spark, sf_dir)),
        duck.execute(agg.agg_percentiles_bucket_sql()).df(),
    )


@pytest.mark.parametrize("permille", [200, 500])
def test_random_sampler_vs_oracle(spark, duck, sf_dir, permille):
    assert_same(
        agg.agg_random_sampler(load_corpus(spark, sf_dir), permille=permille),
        duck.execute(agg.agg_random_sampler_sql(permille=permille)).df(),
    )


def test_random_sampler_estimate_near_truth(spark, sf_dir):
    c = load_corpus(spark, sf_dir)
    r = agg.agg_random_sampler(c, permille=500).first()
    true = c.count()
    assert abs(r["est_total_docs"] - true) / true < 0.25


@pytest.mark.parametrize("k,iters", [(4, 2), (3, 1)])
def test_vwh_vs_oracle(spark, duck, sf_dir, k, iters):
    assert_same(
        agg.variable_width_histogram(load_corpus(spark, sf_dir), k=k, iters=iters),
        duck.execute(agg.variable_width_histogram_sql(k=k, iters=iters)).df(),
    )


def test_vwh_buckets_partition_the_range(spark, sf_dir):
    """Buckets are contiguous, non-overlapping ranges covering all docs."""
    c = load_corpus(spark, sf_dir)
    rows = agg.variable_width_histogram(c, k=4, iters=2).collect()
    assert sum(r["n_docs"] for r in rows) == c.count()
    for a, b in zip(rows, rows[1:]):
        assert a["max_chars"] < b["min_chars"]


def test_moving_percentiles_vs_oracle(spark, duck, sf_dir):
    assert_same(
        agg.agg_moving_percentiles(load_corpus(spark, sf_dir), window=3),
        duck.execute(agg.agg_moving_percentiles_sql(window=3)).df(),
    )


def test_moving_percentiles_single_day_equals_docs(spark, sf_dir):
    rows = agg.agg_moving_percentiles(load_corpus(spark, sf_dir), window=3).collect()
    # first bucket's trailing window is itself
    assert rows[0]["moving_p50"] == float(rows[0]["docs"])


def test_random_sampler_rejects_bad_permille(spark, sf_dir):
    with pytest.raises(ValueError):
        agg.agg_random_sampler(load_corpus(spark, sf_dir), permille=0)
    with pytest.raises(ValueError):
        agg.agg_random_sampler(load_corpus(spark, sf_dir), permille=1001)


class TestBucketSelector:
    def test_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import aggregates as agg
        from .oracle import assert_same

        got = agg.agg_bucket_selector(load_corpus(spark, sf_dir))
        want = duck.execute(agg.agg_bucket_selector_sql()).df()
        assert_same(got, want)

    def test_predicate_semantics(self, spark, sf_dir):
        """Selector output == parent histogram minus failing buckets, key
        order preserved; an impossible predicate empties the result."""
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import aggregates as agg

        corpus = load_corpus(spark, sf_dir)
        kept = agg.agg_bucket_selector(corpus, min_docs=5,
                                       min_avg_chars=200.0).collect()
        everything = agg.agg_bucket_selector(corpus, min_docs=0,
                                             min_avg_chars=-1.0).collect()
        want = [r for r in everything
                if r["n_docs"] >= 5 and r["avg_chars"] > 200.0]
        assert [tuple(r) for r in kept] == [tuple(r) for r in want]
        days = [r["day"] for r in kept]
        assert days == sorted(days)
        assert agg.agg_bucket_selector(corpus, min_docs=10**9).count() == 0


class TestIpRange:
    def test_vs_oracle(self, spark, duck, sf_dir):
        assert_same(
            agg.agg_ip_range(load_corpus(spark, sf_dir)),
            duck.execute(agg.agg_ip_range_sql()).df(),
        )

    def test_mask_and_overlap_vs_oracle(self, spark, duck, sf_dir):
        ranges = [
            {"mask": "0.0.0.0/1"},
            {"key": "low-quarter", "to": "64.0.0.0"},
            {"from": "255.0.0.0"},
        ]
        assert_same(
            agg.agg_ip_range(load_corpus(spark, sf_dir), ranges),
            duck.execute(agg.agg_ip_range_sql(ranges)).df(),
        )

    def test_semantics(self, spark, sf_dir):
        corpus = load_corpus(spark, sf_dir)
        n = corpus.count()
        rows = agg.agg_ip_range(corpus).collect()
        # default ranges partition the space: counts sum to n, order kept
        assert sum(r["doc_count"] for r in rows) == n
        assert [r["ord"] for r in rows] == [0, 1, 2]
        # empty range still emitted
        rows2 = agg.agg_ip_range(
            corpus,
            [{"key": "none", "from": "255.255.255.0", "to": "255.255.255.8"},
             {"key": "all"}],
        ).collect()
        assert rows2[0]["doc_count"] == 0 and rows2[1]["doc_count"] == n
        # CIDR /1 == explicit half
        half = agg.agg_ip_range(corpus, [{"mask": "0.0.0.0/1"}]).collect()
        explicit = agg.agg_ip_range(
            corpus, [{"to": "128.0.0.0"}]).collect()
        assert half[0]["doc_count"] == explicit[0]["doc_count"]
        import pytest as _pytest

        with _pytest.raises(ValueError):
            agg.agg_ip_range(corpus, [{"from": "300.0.0.1"}])


class TestMlSiblingAggs:
    def test_bucket_correlation_vs_oracle(self, spark, duck, sf_dir):
        assert_same(
            agg.agg_bucket_correlation(load_corpus(spark, sf_dir)),
            duck.execute(agg.agg_bucket_correlation_sql()).df(),
        )

    def test_ks_test_vs_oracle(self, spark, duck, sf_dir):
        assert_same(
            agg.agg_bucket_count_ks_test(load_corpus(spark, sf_dir)),
            duck.execute(agg.agg_bucket_count_ks_test_sql()).df(),
        )

    def test_ks_statistic_bounds(self, spark, sf_dir):
        row = agg.agg_bucket_count_ks_test(load_corpus(spark, sf_dir)).first()
        assert 0.0 <= row["ks_statistic"] <= 1.0
        row2 = agg.agg_bucket_correlation(load_corpus(spark, sf_dir)).first()
        assert row2["correlation"] is None or -1.0 <= row2["correlation"] <= 1.0
