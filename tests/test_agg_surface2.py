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


@pytest.mark.parametrize("p", [2, 4, 6])
def test_geohash_vs_oracle(spark, duck, sf_dir, p):
    corpus = load_corpus(spark, sf_dir)
    got = geo.geohash_grid(corpus, precision=p, k=10)
    want = duck.execute(geo.geohash_grid_sql(precision=p, k=10)).df()
    assert_same(got, want)


def _classic_geohash(lat, lon, p):
    """Independent reference: textbook interval-halving geohash."""
    latr, lonr = [-90.0, 90.0], [-180.0, 180.0]
    bits, even = [], True
    while len(bits) < 5 * p:
        r, x = (lonr, lon) if even else (latr, lat)
        mid = (r[0] + r[1]) / 2
        if x >= mid:
            bits.append(1)
            r[0] = mid
        else:
            bits.append(0)
            r[1] = mid
        even = not even
    out = ""
    for c in range(p):
        v = 0
        for b in bits[5 * c:5 * c + 5]:
            v = v * 2 + b
        out += geo.GEOHASH32[v]
    return out


def test_geohash_matches_classic_halving(spark, sf_dir):
    """The quantize-then-interleave encoding equals textbook interval
    halving on the corpus's derived 0.01-degree grid coordinates
    (plus the standard published test vectors)."""
    assert _classic_geohash(57.64911, 10.40744, 6) == "u4pruy"
    assert _classic_geohash(-25.382708, -49.265506, 8) == "6gkzwgjz"
    corpus = load_corpus(spark, sf_dir).limit(200)
    rows = geo._latlon(corpus).select("doc_id", "lat", "lon").collect()
    got = {
        r["gh"]
        for r in geo.geohash_grid(corpus, precision=5, k=10**6)
        .select("gh")
        .collect()
    }
    want = {_classic_geohash(r.lat, r.lon, 5) for r in rows}
    assert got == want


def test_geohash_precision_validation(spark, sf_dir):
    with pytest.raises(ValueError):
        geo.geohash_grid(load_corpus(spark, sf_dir), precision=0)


class TestSearchMvt:
    @pytest.mark.parametrize("z,x,y,p", [(2, 1, 1, 5), (1, 0, 0, 3), (3, 7, 2, 8)])
    def test_vs_oracle(self, spark, duck, sf_dir, z, x, y, p):
        got = geo.search_mvt(
            load_corpus(spark, sf_dir), z=z, x=x, y=y, grid_precision=p
        )
        want = duck.execute(
            geo.search_mvt_sql(z=z, x=x, y=y, grid_precision=p)
        ).df()
        assert_same(got, want)

    def test_layers_consistent(self, spark, sf_dir):
        """Grid counts sum to the tile's doc population; hit pixels fall
        inside the extent; every hit's coarse cell is an occupied grid
        cell (the two layers describe the same tile)."""
        corpus = load_corpus(spark, sf_dir)
        rows = geo.search_mvt(
            corpus, z=2, x=1, y=1, extent=4096, grid_precision=5, hits=10
        ).collect()
        grid = [r for r in rows if r["layer"] == "grid"]
        hits = [r for r in rows if r["layer"] == "hits"]
        cells = {(r["px"], r["py"]) for r in grid}
        assert all(0 <= r["px"] < 4096 and 0 <= r["py"] < 4096 for r in hits)
        # extent -> cell: shift by log2(4096/32) = 7 bits
        assert all((r["px"] >> 7, r["py"] >> 7) in cells for r in hits)
        n_in_tile = sum(r["cnt"] for r in grid)
        assert 0 < n_in_tile < corpus.count()
        assert len(hits) == min(10, n_in_tile)
