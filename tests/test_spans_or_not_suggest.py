"""span_or / span_not queries and the phrase suggester vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import spans
from telegram2elastic_spark.query import suggest as sg

from .oracle import assert_same


@pytest.fixture(scope="module")
def pindex(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=4, positions=True)


@pytest.mark.parametrize("terms", [["vector", "window"], ["the", "data", "zzzz"]])
def test_span_or_vs_oracle(spark, duck, sf_dir, pindex, terms):
    got = spans.span_or_topk(pindex, terms)
    want = duck.execute(spans.span_or_sql(terms)).df()
    assert_same(got, want)


def test_span_or_all_dead(pindex):
    assert spans.span_or_topk(pindex, ["zzzz", "qqqq"]).count() == 0


@pytest.mark.parametrize(
    "inc,exc,pre,post",
    [("merge", "batch", 1, 1), ("merge", "zzzz", 0, 0), ("the", "a", 2, 0)],
)
def test_span_not_vs_oracle(spark, duck, sf_dir, pindex, inc, exc, pre, post):
    got = spans.span_not_topk(pindex, inc, exc, pre=pre, post=post)
    want = duck.execute(spans.span_not_sql(inc, exc, pre=pre, post=post)).df()
    assert_same(got, want)


def test_span_not_excludes_hits(spark, sf_dir, pindex):
    """With a huge window, any doc containing the exclude term drops."""
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]
        for r in spans.span_not_topk(
            pindex, "merge", "batch", pre=10**6, post=10**6, k=10**4
        ).collect()
    }
    c = load_corpus(spark, sf_dir)
    from telegram2elastic_spark.functions.tokenizer import tokens

    both = {
        r["doc_id"]
        for r in c.filter(
            F.array_contains(tokens("text"), "batch")
        ).select("doc_id").collect()
    }
    assert not (got & both)
    assert got  # merge-only docs remain


@pytest.mark.parametrize(
    "q", [["mrge", "batch"], ["tne", "fast"], ["rw", "dta"], ["spark"]]
)
def test_phrase_suggest_vs_oracle(spark, duck, sf_dir, q):
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    bg = sg.bigram_dict(load_corpus(spark, sf_dir))
    got = sg.phrase_suggest(idx, bg, q)
    want = duck.execute(sg.phrase_suggest_sql(q)).df()
    assert_same(got, want)


def test_phrase_suggest_corrects_and_respects_exact_input(spark, sf_dir):
    """Noisy-channel contract: a clear misspelling corrects to the
    dictionary term; an exact input term stays on top of its position
    unless bigram evidence overrides — 'tne fast' -> 'the fast' keeps
    the exact 'fast' and corrects 'tne'."""
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    bg = sg.bigram_dict(load_corpus(spark, sf_dir))
    top = sg.phrase_suggest(idx, bg, ["tne", "fast"], k=1).first()
    assert top["suggestion"] == "the fast"
    top = sg.phrase_suggest(idx, bg, ["mrge", "batch"], k=1).first()
    assert top["suggestion"] == "merge batch"


# --- significant_text ---------------------------------------------------------


@pytest.mark.parametrize("q", [["spark", "merge"], ["vector"]])
def test_significant_text_vs_oracle(spark, duck, sf_dir, q):
    from telegram2elastic_spark.query import facets as fc

    got = fc.significant_text(load_corpus(spark, sf_dir), q)
    want = duck.execute(fc.significant_text_sql(q)).df()
    assert_same(got, want)


def test_significant_text_query_terms_rank_high(spark, sf_dir):
    """The sampled foreground is the query's own top hits, so the query
    terms themselves must surface with high JLH."""
    from telegram2elastic_spark.query import facets as fc

    rows = fc.significant_text(
        load_corpus(spark, sf_dir), ["spark", "merge"], k=5
    ).collect()
    top_terms = {r["term"] for r in rows}
    assert {"spark", "merge"} & top_terms


def test_span_or_band_inversion_roundtrip():
    """The emission band recovers member dfs by inverting the cached
    idfs (df = (n + .5 - .5r)/(r+1), r = e^idf - 1).  Pin the algebra:
    the round-trip is exact to float precision for any (n, df), and the
    resulting band bound is conservative (idf at the df upper bound is
    <= the true pseudo-idf for every admissible df_or)."""
    import numpy as np

    rng_ns = [10, 1000, 10**6, 10**9]
    for n in rng_ns:
        for df in [1, 2, n // 3 or 1, n // 2 or 1, max(n - 1, 1)]:
            idf = float(np.log1p((n - df + 0.5) / (df + 0.5)))
            r = np.expm1(idf)
            df_back = (n + 0.5 - 0.5 * r) / (r + 1.0)
            assert abs(df_back - df) < 1e-6 * max(df, 1)
    # conservativeness: for df_or in [1, df_ub], idf(df_or) >= idf(df_ub)
    n = 10**6
    dfs = [100, 5000]
    df_ub = min(n, sum(dfs))
    idf_lb = float(np.log1p((n - df_ub + 0.5) / (df_ub + 0.5)))
    for df_or in [1, 10, 100, 5000, df_ub]:
        idf_or = float(np.log1p((n - df_or + 0.5) / (df_or + 0.5)))
        assert idf_or >= idf_lb - 1e-12
