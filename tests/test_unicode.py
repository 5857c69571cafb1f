"""Unicode corpus: the tokenizer regex and BM25 pipeline must behave
identically in Spark (Java regex) and DuckDB (RE2) for non-ASCII text —
Cyrillic with case endings (the reference's home domain,
poc/tests/test_entity_extractor.py), CJK, accents, emoji, mixed scripts."""

import pandas as pd
import pytest

from telegram2elastic_spark.corpus import as_corpus
from telegram2elastic_spark.query.bm25 import bm25_topk, bm25_topk_sql

from .oracle import assert_same

TEXTS = [
    "Київ місто Київ столиця",
    "Києва вулиці старі Києва",
    "Привіт світ привіт СВІТ",
    "日本語 テスト 日本語",
    "café naïve résumé café",
    "danke schön über alles",
    "mixed Київ café 日本語 words",
    "emoji 💥 run 💥💥 between words",
    "ЗСУ підрозділ ЗСУ напрямок",
    "числа 123 та 456 і ще 123",
] * 3  # repeats -> non-trivial df


@pytest.fixture(scope="module")
def uni(spark):
    rows = [
        (i, t, "uk", f"s{i % 2}", len(t)) for i, t in enumerate(TEXTS)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    return docs


@pytest.fixture(scope="module")
def uduck(uni):
    import duckdb

    con = duckdb.connect()
    pdf = uni.toPandas()
    con.register("documents", pdf)
    yield con
    con.close()


@pytest.mark.parametrize(
    "terms",
    [
        ["київ"],                      # exact Cyrillic
        ["києва", "світ"],             # case-ending variants
        ["café"],                      # combining accents
        ["日本語"],                     # CJK (single token between spaces)
        ["123"],                       # digits
        ["зсу", "напрямок"],
    ],
)
def test_unicode_bm25_rank_identity(spark, uni, uduck, terms):
    corpus = as_corpus(uni)
    got = bm25_topk(corpus, terms, k=10)
    want = uduck.execute(bm25_topk_sql(terms, k=10)).df()
    assert_same(got, want)


def test_unicode_wand_matches_relational(spark, uni):
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query.wand import wand_topk

    corpus = as_corpus(uni)
    idx = build_index(corpus, n_doc_parts=4)
    for terms in (["київ", "світ"], ["café", "123"]):
        want = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(corpus, terms, k=10).collect()
        ]
        got = [
            (r["doc_id"], r["score"])
            for r in wand_topk(idx, terms, k=10).collect()
        ]
        assert got == want, terms
