"""Hybrid retrieval (RRF + linear fusion) vs DuckDB and rank sanity."""

import pytest

from telegram2elastic_spark.corpus import load_corpus, load_embeddings
from telegram2elastic_spark.query import hybrid

from .oracle import assert_same


@pytest.mark.parametrize(
    "terms,qv", [(["spark", "merge"], 0), (["the"], 7), (["zzznope"], 3)]
)
def test_rrf_vs_oracle(spark, duck, sf_dir, terms, qv):
    got = hybrid.rrf_hybrid_topk(
        load_corpus(spark, sf_dir), load_embeddings(spark, sf_dir),
        terms, query_vec_id=qv, k=10, window=20,
    )
    want = duck.execute(
        hybrid.rrf_hybrid_sql(terms, query_vec_id=qv, k=10, window=20)
    ).df()
    assert_same(got, want)


def test_linear_vs_oracle(spark, duck, sf_dir):
    got = hybrid.linear_hybrid_topk(
        load_corpus(spark, sf_dir), load_embeddings(spark, sf_dir),
        ["spark", "merge"], query_vec_id=0, k=10, window=20,
    )
    want = duck.execute(
        hybrid.linear_hybrid_sql(["spark", "merge"], query_vec_id=0, k=10, window=20)
    ).df()
    assert_same(got, want)


def test_rrf_both_legs_beat_single_leg(spark, sf_dir):
    """A doc present in BOTH windows at rank r scores strictly above a
    doc present in ONE window at the same rank r (the RRF contract)."""
    rows = hybrid.rrf_hybrid_topk(
        load_corpus(spark, sf_dir), load_embeddings(spark, sf_dir),
        ["spark", "merge"], query_vec_id=0, k=50, window=20,
    ).collect()
    both = [r for r in rows if r["lex_rank"] and r["sem_rank"]]
    solo = [r for r in rows if (r["lex_rank"] is None) != (r["sem_rank"] is None)]
    for b in both:
        for s in solo:
            s_rank = s["lex_rank"] or s["sem_rank"]
            if s_rank >= min(b["lex_rank"], b["sem_rank"]):
                assert b["rrf_score"] > s["rrf_score"]


def test_rrf_ranks_consistent_with_legs(spark, sf_dir):
    """lex_rank must equal the standalone BM25 ranking position."""
    from telegram2elastic_spark.query.bm25 import bm25_topk

    c = load_corpus(spark, sf_dir)
    lex_order = [r["doc_id"] for r in bm25_topk(c, ["spark", "merge"], k=20).collect()]
    rows = hybrid.rrf_hybrid_topk(
        c, load_embeddings(spark, sf_dir), ["spark", "merge"],
        query_vec_id=0, k=40, window=20,
    ).collect()
    for r in rows:
        if r["lex_rank"] is not None:
            assert lex_order[r["lex_rank"] - 1] == r["doc_id"]


def test_linear_scores_bounded(spark, sf_dir):
    rows = hybrid.linear_hybrid_topk(
        load_corpus(spark, sf_dir), load_embeddings(spark, sf_dir),
        ["spark", "merge"], query_vec_id=0, k=10, window=20,
        w_lex=0.7, w_sem=0.3,
    ).collect()
    assert rows, "non-empty fusion expected"
    for r in rows:
        assert 0.0 <= r["fused_score"] <= 1.0 + 1e-9
