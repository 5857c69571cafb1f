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


def test_streaming_latest_matches_batch_transform(spark, sf_dir, tmp_path):
    """Continuous _transform/latest == batch transform_latest on the same
    corpus, with the stream split across micro-batches."""
    import pandas as pd

    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.operators.aggregates import transform_latest
    from telegram2elastic_spark.streaming.windows import streaming_latest

    corpus = load_corpus(spark, sf_dir)
    pdf = corpus.select("doc_id", "url", "warc_ts", "text", "lang",
                        "source", "n_chars").toPandas()
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    pdf["html"] = b""
    d = tmp_path / "cl"
    d.mkdir()
    import time as _t

    step = (len(pdf) + 2) // 3
    for i in range(3):
        chunk = pdf.iloc[i * step:(i + 1) * step]
        if len(chunk):
            chunk.to_parquet(d / f"part-{i:03d}.parquet", index=False)
            _t.sleep(0.05)
    got = streaming_latest(spark, str(d), str(tmp_path / "ckl")).collect()
    exp = transform_latest(corpus).select("host", "doc_id", "url").collect()
    assert [(r.host, r.doc_id, r.url) for r in got] == [
        (r.host, r.doc_id, r.url) for r in exp
    ]
