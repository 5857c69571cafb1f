"""Degenerate inputs: empty corpus, single doc, all-duplicate text,
punctuation-only docs — the build/query path must stay total."""

from telegram2elastic_spark.corpus import as_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query.bm25 import bm25_topk
from telegram2elastic_spark.query.wand import wand_topk, wand_topk_local


def _mk(spark, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    return as_corpus(
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )


def test_empty_corpus(spark):
    corpus = _mk(spark, []).filter("doc_id > 0")
    idx = build_index(corpus, n_doc_parts=4)
    assert idx["postings"].count() == 0
    assert wand_topk(idx, ["anything"], k=5).count() == 0
    assert bm25_topk(corpus, ["anything"], k=5).count() == 0


def test_single_doc(spark):
    corpus = _mk(spark, ["only one document here"])
    idx = build_index(corpus, n_doc_parts=4)
    got = wand_topk_local(idx, ["document"], k=5)
    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(corpus, ["document"], k=5).collect()
    ]
    assert got == want and len(got) == 1


def test_punctuation_only_docs(spark):
    """Zero-token docs count toward N/avgdl but produce no postings."""
    corpus = _mk(spark, ["... !!! ???", "real words here", "---"])
    idx = build_index(corpus, n_doc_parts=2)
    assert idx["stats"].first()["n_docs"] == 3
    got = wand_topk_local(idx, ["words"], k=5)
    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(corpus, ["words"], k=5).collect()
    ]
    assert got == want


def test_all_duplicate_text(spark):
    corpus = _mk(spark, ["same text"] * 10)
    idx = build_index(corpus, n_doc_parts=4)
    got = wand_topk_local(idx, ["same"], k=20)
    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(corpus, ["same"], k=20).collect()
    ]
    assert got == want and len(got) == 10
    # identical scores -> tie-break purely by doc_id
    assert [d for d, _ in got] == list(range(10))
