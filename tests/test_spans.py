"""ES span queries: span_first and span_near(in_order=false)."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import spans
from telegram2elastic_spark.query.phrase import phrase_topk

from .oracle import assert_same


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=4, positions=True)


@pytest.mark.parametrize("end", [1, 12, 10_000])
def test_span_first_vs_oracle(spark, duck, sf_dir, idx, end):
    got = spans.span_first_topk(idx, "spark", end=end, k=10)
    want = duck.execute(spans.span_first_sql("spark", end=end, k=10)).df()
    assert_same(got, want)


def test_span_first_widening_end_monotone(spark, sf_dir, idx):
    """Doc sets grow monotonically with `end` (df_s check via row pool)."""
    small = {r["doc_id"] for r in spans.span_first_topk(idx, "merge", end=3, k=500).collect()}
    large = {r["doc_id"] for r in spans.span_first_topk(idx, "merge", end=50, k=500).collect()}
    assert small <= large


@pytest.mark.parametrize("terms,slop", [
    (["merge", "batch"], 0),
    (["merge", "batch"], 2),
    (["table", "scan", "merge"], 3),
])
def test_span_near_vs_oracle(spark, duck, sf_dir, idx, terms, slop):
    got = spans.span_near_topk(idx, terms, slop=slop, k=10)
    want = duck.execute(spans.span_near_sql(terms, slop=slop, k=10)).df()
    assert_same(got, want)


def test_span_near_superset_of_ordered_phrase(spark, sf_dir, idx):
    """Unordered window matching admits every ordered sloppy-phrase doc:
    an ordered match of width <= m + slop is an unordered co-occurrence.
    (Scores differ — tf definitions differ — compare doc sets.)"""
    ph = {r["doc_id"] for r in phrase_topk(idx, ["merge", "batch"], k=500, slop=2).collect()}
    sp = {r["doc_id"] for r in spans.span_near_topk(idx, ["merge", "batch"], slop=2, k=500).collect()}
    assert ph <= sp


def test_span_near_order_free(spark, sf_dir, idx):
    """in_order=false: member order must not change the result."""
    a = spans.span_near_topk(idx, ["merge", "batch"], slop=2, k=10).collect()
    b = spans.span_near_topk(idx, ["batch", "merge"], slop=2, k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_span_dead_term_empty(spark, sf_dir, idx):
    assert spans.span_first_topk(idx, "zzznotaterm", end=10, k=10).count() == 0
    assert spans.span_near_topk(idx, ["merge", "zzznotaterm"], slop=1, k=10).count() == 0
