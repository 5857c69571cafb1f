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


def test_stateful_first_seen_dedup(spark, sf_dir, tmp_path):
    """applyInPandasWithState: re-delivered urls are dropped by operator
    state across micro-batches."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.streaming.windows import streaming_first_seen

    corpus = load_corpus(spark, sf_dir).select("url", "doc_id", "lang")
    # duplicate the whole corpus with shifted doc_ids -> every url re-delivered
    dup = corpus.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    both = corpus.unionByName(dup)
    cpath = str(tmp_path / "stream_in")
    both.repartition(6).write.parquet(cpath)

    got = streaming_first_seen(spark, cpath, str(tmp_path / "ckpt"))
    rows = got.collect()
    n_urls = corpus.select("url").distinct().count()
    assert len(rows) == n_urls
    # exactly one row per url, and it is the min-doc_id occurrence seen
    assert len({r["url"] for r in rows}) == n_urls
