"""boosting / constant_score / distance_feature / match_phrase_prefix vs
DuckDB, plus the demote-not-exclude and shared-clause-term edge cases."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import boosting as bq
from telegram2elastic_spark.query import phrase as ph

from .oracle import assert_same


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=8)


@pytest.fixture(scope="module")
def idxp(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=8, positions=True)


@pytest.mark.parametrize(
    "pos,neg,nb",
    [
        (["spark", "merge"], ["batch"], 0.3),
        (["the", "data"], ["row"], 0.0),
        # a term in BOTH clauses: still scored, still demoted
        (["spark", "merge"], ["merge"], 0.5),
        (["vector"], ["zzznope"], 0.1),
    ],
)
def test_boosting_vs_oracle(spark, duck, idx, pos, neg, nb):
    got = bq.boosting_topk(idx, pos, neg, nb, k=10)
    want = duck.execute(bq.boosting_sql(pos, neg, nb, k=10)).df()
    assert_same(got, want)


def test_boosting_demotes_not_excludes(spark, idx):
    """negative_boost=1.0 must be identical to the plain disjunction —
    demotion never drops a doc."""
    from telegram2elastic_spark.query.wand import wand_topk

    base = wand_topk(idx, ["spark", "merge"], k=10).collect()
    boosted = bq.boosting_topk(idx, ["spark", "merge"], ["batch"], 1.0, k=10).collect()
    assert [tuple(r) for r in boosted] == [tuple(r) for r in base]


@pytest.mark.parametrize("flt", [None, "lang = 'en'"])
def test_constant_score_vs_oracle(spark, duck, idx, flt):
    got = bq.constant_score_topk(
        idx, ["vector", "window", "batch"], 1.2, k=10, doc_filter=flt
    )
    want = duck.execute(
        bq.constant_score_sql(
            ["vector", "window", "batch"], 1.2, k=10, doc_filter_sql=flt
        )
    ).df()
    assert_same(got, want)


@pytest.mark.parametrize("pivot,boost", [(3600, 2.0), (60, 10.0)])
def test_distance_feature_vs_oracle(spark, duck, idx, pivot, boost):
    got = bq.distance_feature_topk(idx, ["table", "scan"], pivot, boost, k=10)
    want = duck.execute(
        bq.distance_feature_sql(["table", "scan"], pivot, boost, k=10)
    ).df()
    assert_same(got, want)


@pytest.mark.parametrize(
    "phrase", [["merge", "bat"], ["the", "fa"], ["sc"], ["merge", "zzzznope"]]
)
def test_match_phrase_prefix_vs_oracle(spark, duck, idxp, phrase):
    got = ph.match_phrase_prefix_topk(idxp, phrase, k=10)
    want = duck.execute(ph.match_phrase_prefix_sql(phrase, k=10)).df()
    assert_same(got, want)


def test_match_phrase_prefix_expansion_cap(spark, duck, idxp):
    """max_expansions caps the variant set in TERM ORDER on both engines."""
    got = ph.match_phrase_prefix_topk(idxp, ["the", "s"], k=10, max_expansions=3)
    want = duck.execute(
        ph.match_phrase_prefix_sql(["the", "s"], k=10, max_expansions=3)
    ).df()
    assert_same(got, want)
