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


def test_cosine_batch_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.operators import similarity as sim

    got = sim.cosine_topk_batch(
        __import__("telegram2elastic_spark.corpus", fromlist=["load_embeddings"])
        .load_embeddings(spark, sf_dir),
        [0, 7, 13],
        k=5,
    )
    want = duck.execute(sim.cosine_topk_batch_sql([0, 7, 13], k=5)).df()
    from .oracle import assert_same

    assert_same(got, want)


def test_cosine_batch_matches_single(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_embeddings
    from telegram2elastic_spark.operators import similarity as sim

    e = load_embeddings(spark, sf_dir)
    batch = sim.cosine_topk_batch(e, [0, 7], k=5).collect()
    for q in (0, 7):
        single = [
            (r["vec_id"], r["cosine"])
            for r in sim.cosine_topk(e, query_vec_id=q, k=5).collect()
        ]
        got = [(r["vec_id"], r["cosine"]) for r in batch if r["query_vec_id"] == q]
        assert got == single, q


def test_rrf_local_identity(spark, sf_dir):
    """Driver-local hybrid == the relational RRF pair (wand leg is
    rank-identical to BM25 by the core invariant; cosine leg recomputed
    with fold-order-exact rounding)."""
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query import hybrid

    c = load_corpus(spark, sf_dir)
    idx = build_index(c, n_doc_parts=8)
    emb_path = f"{sf_dir}/embeddings.parquet"
    for terms, qv in [(["spark", "merge"], 0), (["the"], 7)]:
        a = [
            (r["doc_id"], r["lex_rank"], r["sem_rank"], r["rrf_score"])
            for r in hybrid.rrf_hybrid_topk(
                c, spark.read.parquet(emb_path), terms, query_vec_id=qv,
                k=10, window=20,
            ).collect()
        ]
        b = hybrid.rrf_hybrid_local(
            idx, emb_path, terms, query_vec_id=qv, k=10, window=20
        )
        assert a == b, (terms, qv)


def test_index_backed_legs_identical_and_no_tokenize(spark, sf_dir, tmp_path):
    """With index=, the lexical leg is WAND (rank-identical by the core
    invariant) and — on a disk index, the serving shape — the per-query
    plan never re-tokenizes the corpus."""
    from telegram2elastic_spark.index.build import (
        build_index, read_index, write_index,
    )

    corpus = load_corpus(spark, sf_dir)
    emb = load_embeddings(spark, sf_dir)
    write_index(build_index(corpus, n_doc_parts=8), str(tmp_path / "idx"))
    idx = read_index(spark, str(tmp_path / "idx"))
    for fn, kwargs in (
        (hybrid.rrf_hybrid_topk, dict(query_vec_id=0, k=10, window=20)),
        (hybrid.linear_hybrid_topk, dict(query_vec_id=0, k=10, window=20)),
        (
            hybrid.text_similarity_reranker_topk,
            dict(query_vec_id=0, k=10, rank_window_size=30),
        ),
    ):
        rel = fn(corpus, emb, ["spark", "merge"], **kwargs).collect()
        via_idx = fn(None, emb, ["spark", "merge"], index=idx, **kwargs)
        assert via_idx.collect() == rel
        plan = via_idx._jdf.queryExecution().executedPlan().toString()
        assert "split(" not in plan  # no corpus tokenize in the query path


def test_knn_quantized_local_identity(spark, sf_dir):
    """Driver-local quantized kNN twins == the Spark paths, for both the
    int8 (corrective-offset dot) and bit (hamming) candidate generators."""
    from telegram2elastic_spark.corpus import load_embeddings
    from telegram2elastic_spark.operators import similarity as sim
    from telegram2elastic_spark.query import hybrid

    emb_path = f"{sf_dir}/embeddings.parquet"
    emb = load_embeddings(spark, sf_dir)
    idx: dict = {}
    for qv in (0, 7, 13):
        a = [
            (r["vec_id"], r["dot"])
            for r in sim.knn_int8_topk(emb, qv, k=5, oversample=4).collect()
        ]
        b = hybrid.knn_int8_local(idx, emb_path, qv, k=5, oversample=4)
        assert a == b, ("int8", qv)
        a = [
            (r["vec_id"], r["cosine"])
            for r in sim.knn_bit_topk(emb, qv, k=5, oversample=5).collect()
        ]
        b = hybrid.knn_bit_local(idx, emb_path, qv, k=5, oversample=5)
        assert a == b, ("bit", qv)


def test_knn_quantized_local_missing_vec(spark, sf_dir):
    from telegram2elastic_spark.query import hybrid

    emb_path = f"{sf_dir}/embeddings.parquet"
    assert hybrid.knn_int8_local({}, emb_path, 10_000_000, k=5) == []
    assert hybrid.knn_bit_local({}, emb_path, 10_000_000, k=5) == []
