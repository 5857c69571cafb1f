"""Query-time synonyms (Lucene SynonymQuery semantics) vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import synonyms as syn
from telegram2elastic_spark.query.wand import wand_topk

from .oracle import assert_same


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=4)


GROUPS = [["spark"], ["merge", "join", "combine"]]


def test_vs_oracle(spark, duck, sf_dir, idx):
    assert_same(
        syn.synonym_match_topk(idx, GROUPS, k=10),
        duck.execute(syn.synonym_match_sql(GROUPS, k=10)).df(),
    )


def test_singleton_groups_equal_wand(spark, sf_dir, idx):
    """All-singleton groups degrade to the plain match query (same docs
    AND scores as the WAND path)."""
    got = [tuple(r) for r in syn.synonym_match_topk(
        idx, [["spark"], ["merge"]], k=10).collect()]
    want = [tuple(r) for r in wand_topk(idx, ["spark", "merge"], k=10).collect()]
    assert got == want


def test_blending_not_sum_of_scores(spark, sf_dir, idx):
    """A two-member group must NOT score like the two-term disjunction:
    tf blends before saturation and df is the max, not per-term."""
    got = {r["doc_id"]: r["score"] for r in syn.synonym_match_topk(
        idx, [["merge", "batch"]], k=50).collect()}
    wand = {r["doc_id"]: r["score"] for r in wand_topk(
        idx, ["merge", "batch"], k=50).collect()}
    common = set(got) & set(wand)
    assert common and any(got[d] != wand[d] for d in common)


def test_dead_members_and_groups(spark, sf_dir, idx):
    # unknown member inside a live group is ignored; fully dead group
    # drops out; all-dead query returns empty
    live = syn.synonym_match_topk(idx, [["merge", "zzzznope"]], k=10)
    base = syn.synonym_match_topk(idx, [["merge"]], k=10)
    assert [tuple(r) for r in live.collect()] == [
        tuple(r) for r in base.collect()
    ]
    both = syn.synonym_match_topk(idx, [["merge"], ["qqqq"]], k=10)
    assert [tuple(r) for r in both.collect()] == [
        tuple(r) for r in base.collect()
    ]
    assert syn.synonym_match_topk(idx, [["qqqq"]], k=10).count() == 0
