"""Cross-doc boilerplate removal and temperature sampling vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import dedup, training

from .oracle import assert_same


@pytest.mark.parametrize("block,min_docs", [(10, 3), (5, 2)])
def test_remove_boilerplate_vs_oracle(spark, duck, sf_dir, block, min_docs):
    got = dedup.remove_boilerplate(
        load_corpus(spark, sf_dir), block=block, min_docs=min_docs
    )
    want = duck.execute(
        dedup.remove_boilerplate_sql(block=block, min_docs=min_docs)
    ).df()
    assert_same(got, want)


def test_boilerplate_drops_all_occurrences(spark):
    """A block shared by >= min_docs docs vanishes from EVERY doc,
    including the first (contrast dedup_blocks keep-first)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (i, f"https://s{i}.example/x", "en", f"{shared} unique{i}")
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, lang string, text string"
    )
    out = dedup.remove_boilerplate(df, block=10, min_docs=3).collect()
    for r in out:
        assert "alpha" not in r["text_kept"], r
        assert r["blocks_dropped"] >= 1


def test_boilerplate_keeps_rare_blocks(spark, sf_dir):
    """min_docs above any block frequency keeps everything."""
    c = load_corpus(spark, sf_dir)
    out = dedup.remove_boilerplate(c, block=10, min_docs=10**9)
    assert out.filter("blocks_dropped > 0").count() == 0


@pytest.mark.parametrize("budget", [50, 200])
def test_temperature_sample_vs_oracle(spark, duck, sf_dir, budget):
    got = training.temperature_sample(load_corpus(spark, sf_dir), budget=budget)
    want = duck.execute(training.temperature_sample_sql(budget=budget)).df()
    assert_same(got, want)


def test_temperature_sample_nested(spark, sf_dir):
    """Budget growth only adds docs (same url-hash membership)."""
    c = load_corpus(spark, sf_dir)
    small = {r["doc_id"] for r in training.temperature_sample(c, budget=50).collect()}
    big = {r["doc_id"] for r in training.temperature_sample(c, budget=200).collect()}
    assert small <= big


def test_temperature_upweights_low_resource(spark, sf_dir):
    """Sampled lang shares are flatter than corpus shares: the rarest
    lang's sampling RATE exceeds the most common lang's rate."""
    c = load_corpus(spark, sf_dir)
    corpus_counts = {r["lang"]: r["count"] for r in c.groupBy("lang").count().collect()}
    samp = training.temperature_sample(c, budget=200)
    samp_counts = {r["lang"]: r["count"] for r in samp.groupBy("lang").count().collect()}
    lo = min(corpus_counts, key=corpus_counts.get)
    hi = max(corpus_counts, key=corpus_counts.get)
    if lo == hi or lo not in samp_counts:
        pytest.skip("corpus not multilingual enough at this SF")
    rate = lambda l: samp_counts.get(l, 0) / corpus_counts[l]
    assert rate(lo) >= rate(hi)


def test_pipeline_funnel_vs_oracle(spark, duck, sf_dir):
    got = training.pipeline_funnel(load_corpus(spark, sf_dir))
    want = duck.execute(training.pipeline_funnel_sql()).df()
    assert_same(got, want)


def test_pipeline_funnel_monotone(spark, sf_dir):
    rows = training.pipeline_funnel(load_corpus(spark, sf_dir)).collect()
    vals = [r["survivors"] for r in sorted(rows, key=lambda r: r["stage"])]
    assert vals == sorted(vals, reverse=True)
    assert vals[0] > 0
