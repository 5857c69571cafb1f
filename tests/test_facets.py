"""ES aggregations alongside hits: grouping-sets facets + significant_terms."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import facets

from .oracle import assert_same


FACET_CASES = [
    {"q": "merge", "min_score": 10.0},
    {"q": None, "min_score": None},        # whole (non-spam) corpus
    {"q": "zzzznotaterm", "min_score": None},  # empty foreground
]


@pytest.mark.parametrize("kw", FACET_CASES)
def test_search_facets_vs_oracle(spark, duck, sf_dir, kw):
    corpus = load_corpus(spark, sf_dir)
    got = facets.search_facets(corpus, **kw)
    want = duck.execute(facets.search_facets_sql(**kw)).df()
    assert_same(got, want)


def test_search_facets_single_pass(spark, sf_dir):
    """All facet dimensions + grand total share one Expand + one shuffle —
    not one aggregation job per dimension."""
    corpus = load_corpus(spark, sf_dir)
    plan = (
        facets.search_facets(corpus, q="merge")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1
    assert "HashAggregate" in plan


def test_facet_totals_consistent(spark, sf_dir):
    """Grand total == sum of lang buckets == sum of source buckets."""
    corpus = load_corpus(spark, sf_dir)
    rows = facets.search_facets(corpus, q="merge").collect()
    total = [r["cnt"] for r in rows if r["lang"] is None and r["source"] is None]
    langs = sum(r["cnt"] for r in rows if r["lang"] is not None)
    sources = sum(r["cnt"] for r in rows if r["source"] is not None)
    assert len(total) == 1 and total[0] == langs == sources


@pytest.mark.parametrize("kw", [
    {"q": "merge", "min_score": 10.0, "k": 15},
    {"q": "spark", "min_score": None, "k": 20, "min_doc_count": 5},
])
def test_significant_terms_vs_oracle(spark, duck, sf_dir, kw):
    corpus = load_corpus(spark, sf_dir)
    got = facets.significant_terms(corpus, **kw)
    want = duck.execute(facets.significant_terms_sql(**kw)).df()
    assert_same(got, want)


def test_significant_terms_foreground_bias(spark, sf_dir):
    """The query term itself must rank as significant: every foreground
    doc contains it, so its fg% is maximal relative to bg%."""
    corpus = load_corpus(spark, sf_dir)
    rows = facets.significant_terms(corpus, q="merge", k=5).collect()
    assert rows[0]["term"] == "merge"
    assert all(r["jlh"] > 0 for r in rows)


def test_significant_terms_index_backed_matches(spark, duck, sf_dir):
    """Background stats from term_dict/stats == the corpus aggregation
    (df is the same quantity by construction), and both == the oracle."""
    from telegram2elastic_spark.index.build import build_index

    corpus = load_corpus(spark, sf_dir)
    idx = build_index(corpus, n_doc_parts=8)
    a = facets.significant_terms(corpus, q="merge", k=15).collect()
    b = facets.significant_terms(corpus, q="merge", k=15, index=idx).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    want = duck.execute(facets.significant_terms_sql(q="merge", k=15)).df()
    assert_same(
        facets.significant_terms(corpus, q="merge", k=15, index=idx), want
    )
