"""Streaming windowed aggregation + sessionization."""

from telegram2elastic_spark.corpus import load_events
from telegram2elastic_spark.streaming import windows as W

from .oracle import assert_same


def test_windowed_counts_batch_vs_duckdb(spark, duck, sf_dir):
    assert_same(
        W.windowed_counts_batch(load_events(spark, sf_dir)),
        duck.execute(W.WINDOWED_COUNTS_SQL).df(),
    )


def test_streaming_equals_batch(spark, duck, sf_dir, tmp_path):
    # file stream source needs a directory; testdata is a single file
    epath = str(tmp_path / "events")
    load_events(spark, sf_dir).repartition(4).write.parquet(epath)
    got = W.run_windowed_counts_availablenow(
        spark, epath, str(tmp_path / "ckpt")
    )
    assert_same(got, duck.execute(W.WINDOWED_COUNTS_SQL).df())


def test_sessionize_vs_duckdb(spark, duck, sf_dir):
    assert_same(
        W.sessionize(load_events(spark, sf_dir), gap_minutes=30),
        duck.execute(W.sessionize_sql(gap_minutes=30)).df(),
    )
