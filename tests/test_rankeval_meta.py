"""_rank_eval metrics, _field_caps introspection, runtime fields."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import meta, rankeval

from .oracle import assert_same


def test_rank_eval_vs_oracle(spark, duck, sf_dir):
    got = rankeval.rank_eval(load_corpus(spark, sf_dir))
    want = duck.execute(rankeval.rank_eval_sql()).df()
    assert_same(got, want)


def test_rank_eval_discriminates(spark, sf_dir):
    """The phrase-graded rating rule must yield non-degenerate metrics
    (BM25 cannot see adjacency, so ndcg < 1 for the default requests)."""
    rows = rankeval.rank_eval(load_corpus(spark, sf_dir)).collect()
    assert rows and any(r["ndcg"] < 1.0 for r in rows)
    assert all(0.0 <= r["ndcg"] <= 1.0 for r in rows)
    assert all(0.0 <= r["mrr"] <= 1.0 for r in rows)


def test_rank_eval_custom_requests(spark, duck, sf_dir):
    reqs = {7: ["table", "scan"], 9: ["zzznotaterm", "spark"]}
    got = rankeval.rank_eval(load_corpus(spark, sf_dir), reqs, k=5)
    want = duck.execute(rankeval.rank_eval_sql(reqs, k=5)).df()
    assert_same(got, want)


def test_field_caps_vs_oracle(spark, duck, sf_dir):
    got = meta.field_caps(load_corpus(spark, sf_dir))
    want = duck.execute(meta.field_caps_sql()).df()
    assert_same(got, want)


def test_field_caps_rules(spark, sf_dir):
    rows = {r["field"]: r for r in meta.field_caps(load_corpus(spark, sf_dir)).collect()}
    assert rows["text"]["es_type"] == "text" and not rows["text"]["aggregatable"]
    assert rows["html"]["es_type"] == "binary" and not rows["html"]["searchable"]
    assert rows["url"]["es_type"] == "keyword" and rows["url"]["aggregatable"]
    assert rows["warc_ts"]["es_type"] == "date"


def test_runtime_fields_vs_oracle(spark, duck, sf_dir):
    got = meta.runtime_fields_page(load_corpus(spark, sf_dir))
    want = duck.execute(meta.runtime_fields_page_sql()).df()
    assert_same(got, want)
