"""ES sparse_vector (learned-sparse / ELSER-style) retrieval."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import sparse as sv

from .oracle import assert_same

WEIGHTS = {"spark": 2.1, "merge": 1.4, "vector": 0.7}


def test_relational_vs_oracle(spark, duck, sf_dir):
    got = sv.sparse_vector_topk_relational(
        load_corpus(spark, sf_dir), WEIGHTS, k=10
    )
    want = duck.execute(sv.sparse_vector_topk_sql(WEIGHTS, k=10)).df()
    assert_same(got, want)


def test_indexed_matches_relational(spark, sf_dir):
    """The WAND kernel under stats_override returns the identical ranking
    (score algebra is idf-slot substitution, pruning exact)."""
    c = load_corpus(spark, sf_dir)
    idx = build_index(c, n_doc_parts=4)
    got = [
        (r["doc_id"], r["score"])
        for r in sv.sparse_vector_topk(idx, WEIGHTS, k=10).collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in sv.sparse_vector_topk_relational(c, WEIGHTS, k=10).collect()
    ]
    assert got == want


def test_weight_scaling_monotone(spark, sf_dir):
    """Scaling every weight by a constant scales scores, same ranking."""
    c = load_corpus(spark, sf_dir)
    idx = build_index(c, n_doc_parts=4)
    a = sv.sparse_vector_topk(idx, WEIGHTS, k=10).collect()
    b = sv.sparse_vector_topk(
        idx, {t: 2 * v for t, v in WEIGHTS.items()}, k=10
    ).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]
    for ra, rb in zip(a, b):
        assert abs(rb["score"] - 2 * ra["score"]) < 1e-4


def test_rejects_nonpositive_weights(spark, sf_dir):
    with pytest.raises(ValueError, match="positive"):
        sv.sparse_vector_topk_relational(
            load_corpus(spark, sf_dir), {"spark": 0.0}, k=5
        )
    with pytest.raises(ValueError, match="positive"):
        sv.sparse_vector_topk_sql({"spark": -1.0})


def test_unknown_tokens_contribute_nothing(spark, sf_dir):
    """Tokens absent from the corpus drop out (no postings, no rows)."""
    c = load_corpus(spark, sf_dir)
    idx = build_index(c, n_doc_parts=4)
    a = sv.sparse_vector_topk(idx, WEIGHTS, k=10).collect()
    b = sv.sparse_vector_topk(
        idx, dict(WEIGHTS, zzznotaterm=3.0), k=10
    ).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_local_matches_indexed(spark, sf_dir):
    c = load_corpus(spark, sf_dir)
    idx = build_index(c, n_doc_parts=4)
    want = [
        (r["doc_id"], r["score"])
        for r in sv.sparse_vector_topk(idx, WEIGHTS, k=10).collect()
    ]
    got = sv.sparse_vector_topk_local(idx, WEIGHTS, k=10)
    assert [(d, s) for d, s in got] == want
