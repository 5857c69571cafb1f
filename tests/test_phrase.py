"""Phrase queries over positional postings vs DuckDB tokenized-adjacency
oracle."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query.phrase import phrase_topk, phrase_topk_sql

from .oracle import assert_same


@pytest.fixture(scope="module")
def pindex(spark, sf_dir):
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4, positions=True)
    for nm in ("doc_map", "term_dict", "postings", "stats"):
        idx[nm] = idx[nm].cache()
        idx[nm].count()
    return idx


PHRASES = [
    ["the", "fast"],
    ["merge", "part"],
    ["table", "scan", "merge"],
    ["spark", "zzzznotaterm"],   # no match
    ["batch", "batch"],          # repeated-term phrase
]


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_vs_duckdb(spark, duck, sf_dir, pindex, phrase):
    got = phrase_topk(pindex, phrase, k=10)
    want = duck.execute(phrase_topk_sql(phrase, k=10)).df()
    assert_same(got, want)


def test_phrase_positions_roundtrip(spark, pindex):
    """Every phrase hit really contains the adjacent tokens."""
    from telegram2elastic_spark.functions.tokenizer import py_tokenize

    corpus = {r["doc_id"]: r["text"] for r in
              load_corpus(spark, "/root/testdata/sf0.001").collect()}
    hits = phrase_topk(pindex, ["the", "fast"], k=50).collect()
    assert hits
    for r in hits:
        toks = py_tokenize(corpus[r["doc_id"]])
        assert any(
            toks[i] == "the" and toks[i + 1] == "fast"
            for i in range(len(toks) - 1)
        ), r["doc_id"]
