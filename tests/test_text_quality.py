"""Text analysis operators vs DuckDB oracles."""

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.functions import text_quality as tq

from .oracle import assert_same


def test_lang_id(spark, duck, sf_dir):
    assert_same(
        tq.lang_id(load_corpus(spark, sf_dir)),
        duck.execute(tq.lang_id_sql()).df(),
    )


def test_quality_scores(spark, duck, sf_dir):
    assert_same(
        tq.quality_scores(load_corpus(spark, sf_dir)),
        duck.execute(tq.quality_scores_sql()).df(),
    )


def test_token_counts(spark, duck, sf_dir):
    assert_same(
        tq.token_counts(load_corpus(spark, sf_dir)),
        duck.execute(tq.TOKEN_COUNTS_SQL).df(),
    )


def test_fingerprints(spark, duck, sf_dir):
    assert_same(
        tq.fingerprints(load_corpus(spark, sf_dir)),
        duck.execute(tq.fingerprints_sql()).df(),
    )
