"""Dedup operators vs DuckDB oracles."""

from telegram2elastic_spark.corpus import load_corpus, load_embeddings
from telegram2elastic_spark.operators import dedup

from .oracle import assert_same


def test_exact_dup_groups(spark, duck, sf_dir):
    assert_same(
        dedup.exact_dup_groups(load_corpus(spark, sf_dir)),
        duck.execute(dedup.EXACT_DUP_SQL).df(),
    )


def test_dedup_keep_first(spark, duck, sf_dir):
    assert_same(
        dedup.dedup_keep_first(load_corpus(spark, sf_dir)),
        duck.execute(dedup.DEDUP_KEEP_FIRST_SQL).df(),
    )


def test_ngram_jaccard(spark, duck, sf_dir):
    assert_same(
        dedup.ngram_jaccard_pairs(load_corpus(spark, sf_dir), threshold=0.5),
        duck.execute(dedup.ngram_jaccard_sql(threshold=0.5)).df(),
    )


def test_minhash_signatures(spark, duck, sf_dir):
    assert_same(
        dedup.minhash_signatures(load_corpus(spark, sf_dir)),
        duck.execute(dedup.minhash_signatures_sql()).df(),
    )


def test_minhash_lsh_pairs(spark, duck, sf_dir):
    assert_same(
        dedup.minhash_lsh_pairs(load_corpus(spark, sf_dir)),
        duck.execute(dedup.minhash_lsh_pairs_sql()).df(),
    )


def test_simhash(spark, duck, sf_dir):
    assert_same(
        dedup.simhash(load_corpus(spark, sf_dir)),
        duck.execute(dedup.SIMHASH_SQL).df(),
    )


def test_simhash_near_pairs(spark, duck, sf_dir):
    assert_same(
        dedup.simhash_near_pairs(load_corpus(spark, sf_dir), max_hamming=3),
        duck.execute(dedup.simhash_near_pairs_sql(max_hamming=3)).df(),
    )


def test_embedding_near_pairs(spark, duck, sf_dir):
    assert_same(
        dedup.embedding_near_pairs(load_embeddings(spark, sf_dir), threshold=0.9),
        duck.execute(dedup.embedding_near_pairs_sql(threshold=0.9)).df(),
    )


def test_lsh_recall_vs_true_jaccard(spark, sf_dir):
    """LSH candidates must contain every truly-similar pair (recall check
    at jaccard >= 0.9 — with 4 bands x 2 rows, P(miss) = (1-j^2)^4 < 4%
    at j=0.9; the tiny corpus has few such pairs so this is stable)."""
    corpus = load_corpus(spark, sf_dir)
    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(corpus, threshold=0.95).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(corpus).collect()
    }
    missed = true_pairs - cand
    assert len(missed) <= max(1, len(true_pairs) // 10), (
        f"LSH missed too many near-identical pairs: {missed}"
    )
