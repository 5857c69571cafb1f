"""ES geo_distance / geo_bounding_box vs DuckDB, plus bbox-superset and
pole-safety properties of the fast-phase filter."""

import math

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import geo

from .oracle import assert_same


@pytest.mark.parametrize(
    "lat0,lon0,radius",
    [(48.2, 16.4, 3000.0), (0.0, 0.0, 1500.0), (-70.0, 170.0, 5000.0)],
)
def test_geo_distance_vs_oracle(spark, duck, sf_dir, lat0, lon0, radius):
    corpus = load_corpus(spark, sf_dir)
    got = geo.geo_distance_page(corpus, lat0, lon0, radius, k=20)
    want = duck.execute(geo.geo_distance_sql(lat0, lon0, radius, k=20)).df()
    assert_same(got, want)


def test_geo_bbox_counts_vs_oracle(spark, duck, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    got = geo.geo_bbox_counts(corpus)
    want = duck.execute(geo.geo_bbox_counts_sql()).df()
    assert_same(got, want)


def test_bbox_prefilter_is_superset(spark, sf_dir):
    """The bbox fast-phase must never drop a doc that the exact haversine
    would keep: distances of every in-radius doc computed WITHOUT the bbox
    must equal the paged result."""
    corpus = load_corpus(spark, sf_dir)
    from pyspark.sql import functions as F

    lat0, lon0, radius = 48.2, 16.4, 3000.0
    full = (
        geo._latlon(corpus)
        .withColumn("dist_km", F.round(geo._haversine_col(lat0, lon0), 3))
        .filter(F.col("dist_km") <= radius)
        .select("doc_id", "url", "dist_km")
        .orderBy(F.asc("dist_km"), F.asc("doc_id"))
        .limit(20)
        .collect()
    )
    paged = geo.geo_distance_page(corpus, lat0, lon0, radius, k=20).collect()
    assert [tuple(r) for r in paged] == [tuple(r) for r in full]


def test_bbox_near_pole_finite():
    """Longitude half-width stays finite (cos floor) for a box touching
    the pole."""
    dlat = 5000.0 / 111.195
    lat_far = min(89.9, abs(88.0) + dlat)
    coslat = max(0.01, math.cos(math.radians(lat_far)))
    dlon = 5000.0 / (111.195 * coslat)
    assert math.isfinite(dlon) and dlon > 0


def test_geo_distance_agg_vs_oracle(spark, duck, sf_dir):
    got = geo.geo_distance_agg(load_corpus(spark, sf_dir))
    want = duck.execute(geo.geo_distance_agg_sql()).df()
    assert_same(got, want)


def test_geo_distance_agg_rings_complete(spark, sf_dir):
    """Every ring emitted (even empty ones — pass edges past the antipode
    so the outer rings MUST be empty) and counts sum to the corpus size."""
    corpus = load_corpus(spark, sf_dir)
    rows = geo.geo_distance_agg(
        corpus, edges=(2000.0, 25000.0, 30000.0)
    ).collect()
    assert {r["key"] for r in rows} == {
        "*-2000.0", "2000.0-25000.0", "25000.0-30000.0", "30000.0-*",
    }
    by = {r["key"]: r["doc_count"] for r in rows}
    # half the earth's circumference is ~20015 km: nothing is farther
    assert by["25000.0-30000.0"] == 0 and by["30000.0-*"] == 0
    assert sum(by.values()) == corpus.count()


def test_geo_distance_agg_rejects_unsorted_edges():
    with pytest.raises(ValueError):
        geo.geo_distance_agg(None, edges=(5000.0, 2000.0))


# --- ES 8.3 geo_grid query ----------------------------------------------


@pytest.mark.parametrize("cell", ["3/5/3", "00", "0"])
def test_geo_grid_parity(spark, sf_dir, duck, cell):
    corpus = load_corpus(spark, sf_dir)
    got = geo.geo_grid_page(corpus, cell, k=20).toPandas()
    want = duck.execute(geo.geo_grid_sql(cell, k=20)).fetchdf()
    assert got.values.tolist() == want.values.tolist()


def test_geo_grid_empty_cell(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    assert geo.geo_grid_page(corpus, "zz", k=5).count() == 0


def test_geo_grid_members_agree_with_grid_agg(spark, sf_dir):
    # every doc the query returns must land in that tile per the agg's
    # own arithmetic (filter form == aggregation form)
    corpus = load_corpus(spark, sf_dir)
    rows = geo.geo_grid_page(corpus, "3/5/3", k=1000).collect()
    from telegram2elastic_spark.query.geo import _geotile_xy, _latlon
    import pyspark.sql.functions as F

    df = _latlon(corpus)
    x, y = _geotile_xy(3)
    member = {
        r.doc_id
        for r in df.select("doc_id", x.alias("x"), y.alias("y"))
        .filter((F.col("x") == 5) & (F.col("y") == 3))
        .collect()
    }
    assert {r.doc_id for r in rows} == member


def test_geo_grid_bad_cells(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    for bad in ["3/5", "99/0/0", "abc!", "123456789"]:
        with pytest.raises(ValueError):
            geo.geo_grid_page(corpus, bad)
