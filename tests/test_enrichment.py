"""Enrichment operators vs DuckDB oracles."""

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import enrichment as en

from .oracle import assert_same


def test_extract_entities(spark, duck, sf_dir):
    assert_same(
        en.extract_entities(load_corpus(spark, sf_dir)),
        duck.execute(en.extract_entities_sql()).df(),
    )


def test_docs_mentioning(spark, duck, sf_dir):
    assert_same(
        en.docs_mentioning(load_corpus(spark, sf_dir), "spark"),
        duck.execute(en.docs_mentioning_sql("spark")).df(),
    )


def test_classify_stub(spark, duck, sf_dir):
    got = en.classify_stub(load_corpus(spark, sf_dir))
    assert_same(got, duck.execute(en.classify_stub_sql()).df())
    # contract: clamped to [0,100]; topics never empty
    rows = got.collect()
    assert all(0 <= r["osint_value"] <= 100 for r in rows)
    assert all(r["topics"] for r in rows)


def test_parse_fenced_json(spark, duck, sf_dir):
    assert_same(
        en.parse_fenced_json(load_corpus(spark, sf_dir)),
        duck.execute(en.PARSE_FENCED_SQL).df(),
    )
