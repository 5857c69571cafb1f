"""Keyset pagination: page chain == offset pagination, vs DuckDB oracle."""

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import search

from .oracle import assert_same


def test_search_after_vs_duckdb(spark, duck, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    # page 1
    p1 = search.search_after(corpus, None, q=None, limit=10)
    assert_same(p1, duck.execute(search.search_after_sql(None, limit=10)).df())
    # cursor from last row of page 1 -> page 2
    last = p1.collect()[-1]
    cursor = (last["score"], last["ts"], last["doc_id"])
    p2 = search.search_after(corpus, cursor, q=None, limit=10)
    assert_same(
        p2, duck.execute(search.search_after_sql(cursor, limit=10)).df()
    )


def test_keyset_chain_equals_offset(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    # offset-based rows 1..20 (ordered identically)
    want = [
        (r["doc_id"], r["score"])
        for r in search.search_page(corpus, offset=0, limit=20).collect()
    ]
    p1 = search.search_after(corpus, None, limit=10).collect()
    last = p1[-1]
    p2 = search.search_after(
        corpus, (last["score"], last["ts"], last["doc_id"]), limit=10
    ).collect()
    got = [(r["doc_id"], r["score"]) for r in [*p1, *p2]]
    assert got == want
