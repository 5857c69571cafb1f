"""ES intervals query (ordered match / any_of) vs the DuckDB oracle."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import intervals as iv

from .oracle import assert_same


@pytest.fixture(scope="module")
def pindex(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=4, positions=True)


@pytest.mark.parametrize(
    "terms,max_gaps",
    [
        (["the", "fast"], 0),       # adjacency — chain == phrase
        (["merge", "batch"], 3),    # gap budget opens more docs
        (["table", "scan", "merge"], 5),
        (["the", "the"], 2),        # repeated term: strict ordering within one list
        (["data", "zzznotaterm"], 4),  # dead member -> empty
    ],
)
def test_intervals_ordered_vs_oracle(duck, pindex, terms, max_gaps):
    got = iv.intervals_ordered_topk(pindex, terms, max_gaps=max_gaps)
    want = duck.execute(iv.intervals_ordered_sql(terms, max_gaps=max_gaps)).df()
    assert_same(got, want)


def test_ordered_requires_order(spark, pindex):
    """Gap budget never admits a reversed-order co-occurrence: for any
    doc, the ordered tf of (a, b) counts only chains with a before b."""
    a = {r["doc_id"]: r["score"] for r in
         iv.intervals_ordered_topk(pindex, ["merge", "batch"], 10**6, k=10**4).collect()}
    both = {r["doc_id"] for r in
            iv.intervals_ordered_topk(pindex, ["batch", "merge"], 10**6, k=10**4).collect()}
    # with an unbounded budget, a doc matches (a,b) iff some a precedes
    # some b; docs where every 'batch' precedes every 'merge' appear in
    # the reversed query only
    assert both - set(a)  # the corpus exercises the asymmetry


def test_gap_budget_monotone(pindex):
    """Raising max_gaps can only add matched docs."""
    lo = {r["doc_id"] for r in
          iv.intervals_ordered_topk(pindex, ["table", "scan"], 0, k=10**4).collect()}
    hi = {r["doc_id"] for r in
          iv.intervals_ordered_topk(pindex, ["table", "scan"], 8, k=10**4).collect()}
    assert lo <= hi


@pytest.mark.parametrize(
    "sources,max_gaps",
    [
        ([["the", "fast"], ["merge", "batch"]], 1),
        ([["vector"], ["window", "scan"]], 2),
        ([["zzznotaterm", "x"], ["table", "scan"]], 3),  # dead source dropped
    ],
)
def test_intervals_any_of_vs_oracle(duck, pindex, sources, max_gaps):
    got = iv.intervals_any_of_topk(pindex, sources, max_gaps=max_gaps)
    live = [s for s in sources if "zzznotaterm" not in s]
    want = duck.execute(iv.intervals_any_of_sql(live, max_gaps=max_gaps)).df()
    assert_same(got, want)


def test_any_of_all_dead(spark, pindex):
    assert iv.intervals_any_of_topk(pindex, [["zzzz", "qqqq"]], 1).count() == 0
