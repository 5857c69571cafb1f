"""BM25 relational path vs DuckDB oracle + a hand-computable numpy oracle."""

import math

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.functions.tokenizer import py_tokenize
from telegram2elastic_spark.query.bm25 import B, K1, bm25_topk, bm25_topk_sql

from .oracle import assert_same


QUERIES = [
    (["spark", "merge"], None, None, None),
    (["the"], None, None, None),                      # heavy hitter
    (["vector", "window", "batch"], None, None, None),
    (["zzzznotaterm"], None, None, None),             # zero-hit
    (["join", "filter"], "en", None, None),           # lang filter
    (["table", "scan"], None, "2022-01-01 00:30:00", "2022-01-03 00:00:00"),
]


@pytest.mark.parametrize("terms,lang,min_ts,max_ts", QUERIES)
def test_bm25_vs_duckdb(spark, duck, sf_dir, terms, lang, min_ts, max_ts):
    corpus = load_corpus(spark, sf_dir)
    got = bm25_topk(corpus, terms, k=10, lang=lang, min_ts=min_ts, max_ts=max_ts)
    want = duck.execute(
        bm25_topk_sql(terms, k=10, lang=lang, min_ts=min_ts, max_ts=max_ts)
    ).df()
    assert_same(got, want)


def test_bm25_hand_oracle(spark):
    """20-doc hand corpus, exact scores vs a pure-python BM25."""
    texts = [
        "red fox jumps", "red red fox", "blue fox", "red", "blue blue",
        "fox fox fox red", "green", "red blue fox", "", "fox",
        "red green blue", "jumps jumps", "red fox", "blue jumps", "green fox",
        "red red red red", "fox blue", "green green red", "jumps", "blue",
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from telegram2elastic_spark.corpus import as_corpus

    corpus = as_corpus(docs)
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(corpus, ["red", "fox"], k=20).collect()
    }

    # python oracle
    toks = [py_tokenize(t) for t in texts]
    n = len(texts)
    avgdl = sum(len(t) for t in toks) / n
    expected = {}
    for q in ["red", "fox"]:
        df = sum(1 for t in toks if q in t)
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, t in enumerate(toks):
            tf = t.count(q)
            if tf:
                dl = len(t)
                w = idf * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
                expected[i] = expected.get(i, 0.0) + w
    expected = {i: round(s, 5) for i, s in expected.items()}
    assert got == expected
