"""more_like_this + gauss-decay rescore vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import mlt

from .oracle import assert_same


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=8)
    for nm in ("doc_map", "term_dict", "postings", "stats"):
        idx[nm] = idx[nm].cache()
        idx[nm].count()
    return idx


@pytest.mark.parametrize("doc_id", [7, 123, 444])
def test_more_like_this_vs_oracle(spark, duck, sf_dir, index, doc_id):
    corpus = load_corpus(spark, sf_dir)
    got = mlt.more_like_this(index, corpus, doc_id, k=10)
    want = duck.execute(mlt.more_like_this_sql(doc_id, k=10)).df()
    assert_same(got, want)


def test_more_like_this_excludes_source(spark, sf_dir, index):
    corpus = load_corpus(spark, sf_dir)
    hits = mlt.more_like_this(index, corpus, 7, k=25).collect()
    assert hits and all(r["doc_id"] != 7 for r in hits)


def test_more_like_this_missing_doc(spark, sf_dir, index):
    corpus = load_corpus(spark, sf_dir)
    assert mlt.more_like_this(index, corpus, -999, k=10).count() == 0


def test_mlt_term_selection_caps_and_filters(spark, sf_dir, index):
    """max_query_terms caps the selection; min_doc_freq drops rare terms."""
    corpus = load_corpus(spark, sf_dir)
    full = mlt.select_mlt_terms(index, corpus, 7, max_query_terms=1000)
    capped = mlt.select_mlt_terms(index, corpus, 7, max_query_terms=5)
    assert capped == full[:5]
    strict = mlt.select_mlt_terms(index, corpus, 7, min_doc_freq=10**9)
    assert strict == []


def test_rescore_recency_vs_oracle(spark, duck, sf_dir, index):
    got = mlt.rescore_recency(index, ["spark", "merge"], k=10, window_size=50)
    want = duck.execute(
        mlt.rescore_recency_sql(["spark", "merge"], k=10, window_size=50)
    ).df()
    assert_same(got, want)


def test_rescore_only_touches_window(spark, sf_dir, index):
    """Rescoring reorders within the base top-window: every rescored hit
    is a member of the BM25 top-window_size set."""
    from telegram2elastic_spark.query.wand import wand_topk

    window = {
        r["doc_id"]
        for r in wand_topk(index, ["spark", "merge"], k=50).collect()
    }
    hits = mlt.rescore_recency(
        index, ["spark", "merge"], k=10, window_size=50
    ).collect()
    assert hits and all(r["doc_id"] in window for r in hits)
    # decay is live: rescored != base score ordering for this corpus
    assert [r["doc_id"] for r in hits] != sorted(
        (r["doc_id"] for r in hits)
    ) or any(r["rescored"] != r["score"] for r in hits)


def test_more_like_this_k9_oracle_not_corrupted(spark, duck, sf_dir, index):
    """k=9 regression: the final LIMIT patch must not touch the qterms
    expansion cap ("LIMIT 10" is a prefix of "LIMIT 1000000000")."""
    corpus = load_corpus(spark, sf_dir)
    sql = mlt.more_like_this_sql(7, k=9)
    assert "LIMIT 1000000000" in sql and sql.rstrip().endswith("LIMIT 9")
    got = mlt.more_like_this(index, corpus, 7, k=9)
    want = duck.execute(sql).df()
    assert_same(got, want)
