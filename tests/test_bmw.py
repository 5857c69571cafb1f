"""Pivot-based DAAT Block-Max WAND == vectorized kernel == relational BM25."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query.bmw import bmw_topk_local
from telegram2elastic_spark.query.wand import wand_topk_local

QUERIES = [
    ["spark", "merge"],
    ["the"],
    ["vector", "window", "batch"],
    ["the", "data", "row"],
    ["dup"],
    ["zzzznotaterm"],
    ["the", "a", "data", "row"],
]


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    for n in ("doc_map", "term_dict", "postings", "stats"):
        idx[n] = idx[n].cache()
        idx[n].count()
    return idx


@pytest.mark.parametrize("terms", QUERIES)
def test_bmw_matches_vectorized_kernel(index, terms):
    assert bmw_topk_local(index, terms, k=10) == wand_topk_local(
        index, terms, k=10
    ), terms


def test_bmw_on_zipf_skew(spark):
    from tests.test_skew import _zipf_corpus

    corpus = _zipf_corpus(spark)
    idx = build_index(corpus, n_doc_parts=8)
    for terms in (["the"], ["the", "mid3"], ["rare100", "the"]):
        assert bmw_topk_local(idx, terms, k=10) == wand_topk_local(
            idx, terms, k=10
        ), terms


def test_bmw_large_k(index):
    assert bmw_topk_local(index, ["the"], k=1000) == wand_topk_local(
        index, ["the"], k=1000
    )


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.mark.parametrize("terms", QUERIES)
def test_distributed_bmw_matches_maxscore(index, terms):
    """wand_topk(algo='bmw') — the pivot DAAT cursors running INSIDE the
    per-salt executor kernel — must be rank-identical to the default."""
    from telegram2elastic_spark.query.wand import wand_topk

    assert _rows(wand_topk(index, terms, k=10, algo="bmw")) == _rows(
        wand_topk(index, terms, k=10)
    ), terms


def test_distributed_bmw_with_doc_filter(index, spark, sf_dir):
    from telegram2elastic_spark.query.bm25 import bm25_topk
    from telegram2elastic_spark.query.wand import wand_topk

    got = _rows(
        wand_topk(index, ["the", "data"], k=10, doc_filter="lang = 'en'", algo="bmw")
    )
    want = _rows(
        bm25_topk(
            load_corpus(spark, sf_dir), ["the", "data"], k=10,
            lang="en", global_stats=True,
        )
    )
    assert got == want


def test_distributed_bmw_with_tombstones(spark, sf_dir, tmp_path):
    """Segmented index with tombstones: bmw kernel (or its fallback when
    ranges interleave) must match the maxscore path exactly."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.query.wand import wand_topk
    from telegram2elastic_spark.streaming.ingest import IncrementalIndexer

    corpus = load_corpus(spark, sf_dir).filter("doc_id < 100")
    ix = IncrementalIndexer(spark, str(tmp_path / "bmwix"), n_doc_parts=4)
    ix.ingest_batch(corpus.filter("doc_id < 50"), "b0")
    ix.ingest_batch(corpus.filter("doc_id >= 50"), "b1")
    edited = corpus.filter("doc_id % 7 = 0").withColumn(
        "text", F.lit("replacement text about nothing")
    )
    ix.upsert_batch(edited, "b2")
    idx = ix.as_index()
    assert _rows(wand_topk(idx, ["spark", "merge"], k=10, algo="bmw")) == _rows(
        wand_topk(idx, ["spark", "merge"], k=10)
    )


def test_bmw_pruning_skips_blocks_on_zipf(spark):
    """Pruning effectiveness: on the Zipf corpus a selective query must
    decode strictly fewer blocks than exist (block-max skipping works)."""
    import pandas as pd

    from telegram2elastic_spark.query.bmw import bmw_topk_blocks
    from telegram2elastic_spark.query.wand import _collect_idfs, _postings_for_terms
    from tests.test_skew import _zipf_corpus

    corpus = _zipf_corpus(spark)
    idx = build_index(corpus, n_doc_parts=1)  # one salt: one cursor stream
    terms = ["the", "rare100"]
    idfs, avgdl = _collect_idfs(idx, terms)
    pdf = _postings_for_terms(idx, list(idfs)).toPandas()
    stats = {}
    # k=1: once the (rare100 AND the) doc is scored, theta exceeds the
    # summed bound of the remaining "the"-only stream -> the tail blocks
    # of "the" are pruned (never decoded) and the loop terminates early.
    res = bmw_topk_blocks(pdf, idfs, avgdl, k=1, stats=stats)
    assert stats["blocks_total"] == len(pdf)
    assert 0 < stats["blocks_decoded"] < stats["blocks_total"], stats
    # and the answer is still exact
    assert res == wand_topk_local(idx, terms, k=1)
