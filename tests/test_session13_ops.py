"""Session-13 ops: parent agg, time_series agg, tf-idf keywords,
URL quality filter, token-budget selection, cross-snapshot dedup."""

from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import load_corpus, load_events
from telegram2elastic_spark.operators import aggregates as agg
from telegram2elastic_spark.query import parentchild

from .oracle import assert_same


def test_parent_agg_vs_oracle(spark, duck, sf_dir):
    got = parentchild.parent_agg(load_corpus(spark, sf_dir))
    want = duck.execute(parentchild.parent_agg_sql()).df()
    assert_same(got, want)


def test_parent_agg_counts_each_parent_once_per_bucket(spark, sf_dir):
    """The scope hop dedupes children: a site with many pages in the same
    language contributes its parent attributes exactly once to that
    bucket — the defining difference from a child-scope aggregation."""
    corpus = load_corpus(spark, sf_dir)
    rows = {r["lang"]: r for r in parentchild.parent_agg(corpus).collect()}
    pages = corpus.withColumn(
        "host", F.regexp_extract("url", "^[a-z]+://([^/]+)", 1)
    )
    for lang in list(rows)[:2]:
        hosts = {
            r["host"]
            for r in pages.filter(F.col("lang") == lang)
            .select("host")
            .distinct()
            .collect()
        }
        assert rows[lang]["n_sites"] == len(hosts)
        # parent_pages counts ALL pages of those sites, not just the
        # bucket's own children (parent-scope metric)
        all_pages = pages.filter(F.col("host").isin(list(hosts))).count()
        assert rows[lang]["parent_pages"] == all_pages


def test_time_series_agg_vs_oracle(spark, duck, sf_dir):
    got = agg.time_series_agg(load_events(spark, sf_dir), size=50)
    want = duck.execute(agg.time_series_agg_sql(size=50)).df()
    assert_same(got, want)


def test_time_series_agg_series_semantics(spark, sf_dir):
    """Each bucket is one tsid; last_value is the max-event_id read and
    the time span brackets every row of the series."""
    ev = load_events(spark, sf_dir)
    rows = agg.time_series_agg(ev, size=5).collect()
    assert len(rows) == 5
    keys = [(r["event_type"], r["user_id"]) for r in rows]
    assert keys == sorted(keys)  # tsid-ordered buckets
    r0 = rows[0]
    series = ev.filter(
        (F.col("event_type") == r0["event_type"])
        & (F.col("user_id") == r0["user_id"])
    )
    assert r0["doc_count"] == series.count()
    last = series.orderBy(F.desc("event_id")).select("value").first()[0]
    assert abs(r0["value_last"] - round(last, 5)) < 1e-9
    lo, hi = series.agg(F.min("ts"), F.max("ts")).first()
    assert r0["ts_first"] == lo and r0["ts_last"] == hi
