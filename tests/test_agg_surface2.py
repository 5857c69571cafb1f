"""Session-5 agg surface: multi_terms, weighted_avg, string_stats,
bucket-metric pipeline aggs, normalize, geotile_grid, geo_bounds."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import aggregates as agg
from telegram2elastic_spark.query import geo

from .oracle import assert_same


@pytest.mark.parametrize(
    "fn,sql",
    [
        (agg.agg_multi_terms, agg.agg_multi_terms_sql()),
        (agg.agg_weighted_avg, agg.agg_weighted_avg_sql()),
        (agg.agg_string_stats, agg.agg_string_stats_sql()),
        (agg.agg_bucket_metrics, agg.agg_bucket_metrics_sql()),
        (agg.agg_normalize_pct, agg.agg_normalize_pct_sql()),
    ],
    ids=["multi_terms", "weighted_avg", "string_stats", "bucket_metrics",
         "normalize"],
)
def test_agg_vs_oracle(spark, duck, sf_dir, fn, sql):
    got = fn(load_corpus(spark, sf_dir))
    want = duck.execute(sql).df()
    assert_same(got, want)


@pytest.mark.parametrize("zoom", [1, 3, 6])
def test_geotile_vs_oracle(spark, duck, sf_dir, zoom):
    corpus = load_corpus(spark, sf_dir)
    got = geo.geotile_grid(corpus, zoom=zoom, k=10)
    want = duck.execute(geo.geotile_grid_sql(zoom=zoom, k=10)).df()
    assert_same(got, want)


@pytest.mark.parametrize("lang", ["en", None])
def test_geo_bounds_vs_oracle(spark, duck, sf_dir, lang):
    corpus = load_corpus(spark, sf_dir)
    got = geo.geo_bounds_centroid(corpus, lang=lang)
    want = duck.execute(geo.geo_bounds_centroid_sql(lang=lang)).df()
    assert_same(got, want)


def test_geotile_keys_in_range(spark, sf_dir):
    """Every tile key parses as z/x/y with 0 <= x,y < 2^z (pole rows
    clamp into the edge tiles, never out of range)."""
    rows = geo.geotile_grid(load_corpus(spark, sf_dir), zoom=2, k=100).collect()
    for r in rows:
        z, x, y = (int(p) for p in r["tile"].split("/"))
        assert z == 2 and 0 <= x < 4 and 0 <= y < 4
