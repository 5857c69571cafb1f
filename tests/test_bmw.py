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
