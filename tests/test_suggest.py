"""Completion + spelling suggesters vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import suggest

from .oracle import assert_same


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=8)
    for nm in ("doc_map", "term_dict", "postings", "stats"):
        idx[nm] = idx[nm].cache()
        idx[nm].count()
    return idx


@pytest.mark.parametrize("prefix", ["s", "sc", "me", "zzz"])
def test_suggest_complete_vs_oracle(spark, duck, sf_dir, index, prefix):
    got = suggest.suggest_complete(index, prefix, k=10)
    want = duck.execute(suggest.suggest_complete_sql(prefix, k=10)).df()
    assert_same(got, want)


def test_suggest_complete_order(index):
    """Most frequent completions first; all respect the prefix."""
    rows = suggest.suggest_complete(index, "s", k=10).collect()
    assert rows
    cfs = [r["cf"] for r in rows]
    assert cfs == sorted(cfs, reverse=True)
    assert all(r["term"].startswith("s") for r in rows)


@pytest.mark.parametrize("word", ["mergge", "sparc", "windoow", "qqqq"])
def test_suggest_spelling_vs_oracle(spark, duck, sf_dir, index, word):
    got = suggest.suggest_spelling(index, word, k=5)
    want = duck.execute(suggest.suggest_spelling_sql(word, k=5)).df()
    assert_same(got, want)


def test_suggest_spelling_finds_intended_term(index):
    for typo, fix in (("mergge", "merge"), ("sparc", "spark"), ("windoow", "window")):
        rows = suggest.suggest_spelling(index, typo, k=3).collect()
        assert rows and rows[0]["term"] == fix, (typo, rows)


def test_suggest_spelling_exact_word_is_best(index):
    rows = suggest.suggest_spelling(index, "merge", k=3).collect()
    assert rows[0]["term"] == "merge" and rows[0]["sim"] == 1.0


def test_completion_contexts_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.query import suggest as sug
    from .oracle import assert_same

    for lang in ["en", None]:
        got = sug.completion_contexts(
            load_corpus(spark, sf_dir), "site1", lang=lang, k=10
        )
        want = duck.execute(
            sug.completion_contexts_sql("site1", lang=lang, k=10)
        ).df()
        assert_same(got, want)


def test_completion_contexts_prefix_and_context(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.query import suggest as sug

    c = load_corpus(spark, sf_dir)
    rows = sug.completion_contexts(c, "site2", lang="en", k=50).collect()
    assert rows, "expected suggestions"
    assert all(r["suggestion"].startswith("site2") for r in rows)
    weights = [r["weight"] for r in rows]
    assert weights == sorted(weights, reverse=True)
