"""Driver-local query-node paths for the expansion-based ops must be
rank-identical to their Spark-path twins (query/local.py)."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import expand as exq
from telegram2elastic_spark.query import highlight as hl
from telegram2elastic_spark.query import local as lq
from telegram2elastic_spark.query import mlt as ml
from telegram2elastic_spark.query import suggest as sg


@pytest.fixture(scope="module")
def lindex(spark, sf_dir):
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    for name in ("doc_map", "term_dict", "postings", "stats"):
        idx[name] = idx[name].cache()
    return idx


@pytest.mark.parametrize("prefix", ["sc", "s", "zzz"])
def test_expand_prefix_local_matches_spark(lindex, prefix):
    assert lq.expand_prefix_local(lindex, prefix) == exq.expand_prefix(
        lindex, prefix
    )


@pytest.mark.parametrize("pattern", ["s?a*", "mer*", "*zzz*"])
def test_expand_wildcard_local_matches_spark(lindex, pattern):
    assert lq.expand_wildcard_local(lindex, pattern) == exq.expand_wildcard(
        lindex, pattern
    )


@pytest.mark.parametrize("prefix", ["sc", "me"])
def test_prefix_topk_local_matches_spark(lindex, prefix):
    want = [
        (r["doc_id"], r["score"])
        for r in exq.prefix_topk(lindex, prefix, k=10).collect()
    ]
    assert lq.prefix_topk_local(lindex, prefix, k=10) == want


def test_wildcard_topk_local_matches_spark(lindex):
    want = [
        (r["doc_id"], r["score"])
        for r in exq.wildcard_topk(lindex, "s?a*", k=10).collect()
    ]
    assert lq.wildcard_topk_local(lindex, "s?a*", k=10) == want


def test_prefix_local_respects_doc_filter(lindex):
    want = [
        (r["doc_id"], r["score"])
        for r in exq.prefix_topk(
            lindex, "sc", k=10, doc_filter="lang = 'en'"
        ).collect()
    ]
    assert lq.prefix_topk_local(
        lindex, "sc", k=10, doc_filter="lang = 'en'"
    ) == want


@pytest.mark.parametrize("prefix", ["s", "sc"])
def test_suggest_complete_local_matches_spark(lindex, prefix):
    want = [
        (r["term"], r["cf"])
        for r in sg.suggest_complete(lindex, prefix, k=10).collect()
    ]
    assert lq.suggest_complete_local(lindex, prefix, k=10) == want


@pytest.mark.parametrize("word,min_sim", [("scap", 0.1), ("mergge", 0.3)])
def test_suggest_spelling_local_matches_spark(lindex, word, min_sim):
    want = [
        (r["term"], r["sim"])
        for r in sg.suggest_spelling(
            lindex, word, k=5, min_sim=min_sim
        ).collect()
    ]
    assert lq.suggest_spelling_local(lindex, word, k=5, min_sim=min_sim) == want


def test_mlt_local_matches_spark(spark, sf_dir, lindex):
    corpus = load_corpus(spark, sf_dir)
    want = [
        (r["doc_id"], r["score"])
        for r in ml.more_like_this(lindex, corpus, 7, k=10).collect()
    ]
    assert lq.more_like_this_local(lindex, corpus, 7, k=10) == want


def test_rescore_local_matches_spark(lindex):
    want = [
        (r["doc_id"], r["url"], r["score"], r["rescored"])
        for r in ml.rescore_recency(
            lindex, ["spark", "merge"], k=10, window_size=50
        ).collect()
    ]
    got = lq.rescore_recency_local(
        lindex, ["spark", "merge"], k=10, window_size=50
    )
    assert got == want


def test_highlight_local_matches_spark(spark, sf_dir, lindex):
    corpus = load_corpus(spark, sf_dir)
    want = [
        (r["doc_id"], r["url"], r["score"], r["snippet"])
        for r in hl.search_highlight(
            corpus, ["spark", "merge"], k=10, index=lindex
        ).collect()
    ]
    got = lq.search_highlight_local(lindex, corpus, ["spark", "merge"], k=10)
    assert got == want


def test_multi_match_local_matches_spark(spark, sf_dir):
    from telegram2elastic_spark.query import multifield as mff

    corpus = load_corpus(spark, sf_dir)
    fidx = mff.build_field_indexes(
        corpus, {"text": "text", "url": "url"}, n_doc_parts=4
    )
    w = {"text": 1.0, "url": 2.0}
    want = [
        (r["doc_id"], r["score"])
        for r in mff.multi_match_topk(fidx, w, ["spark", "page"], k=10).collect()
    ]
    got = lq.multi_match_topk_local(fidx, w, ["spark", "page"], k=10)
    assert got == want
    # repeated query: served from the per-field hot-shard caches
    assert lq.multi_match_topk_local(fidx, w, ["spark", "page"], k=10) == want
