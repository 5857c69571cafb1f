"""ES nested query / nested aggregation vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import nested

from .oracle import assert_same


@pytest.mark.parametrize(
    "prefix,min_freq,max_first_pos",
    [("mer", 2, 60), ("ba", 3, 30), ("zzz", 1, 1000)],
)
def test_nested_query_vs_oracle(spark, duck, sf_dir, prefix, min_freq, max_first_pos):
    got = nested.nested_query_page(
        load_corpus(spark, sf_dir), prefix, min_freq, max_first_pos
    )
    want = duck.execute(
        nested.nested_query_page_sql(prefix, min_freq, max_first_pos)
    ).df()
    assert_same(got, want)


def test_nested_ties_conditions_to_one_element(spark):
    """The conjunction binds to a single element: doc A has ('merge',
    freq 3, late) and ('mercury', freq 1, early) — neither element alone
    satisfies (prefix 'mer', freq>=2, first_pos<=3), so A must NOT
    match, even though flattened fields would cross-match."""
    rows = [
        # mercury at pos 1 (freq 1), merge x3 late
        (1, "https://a.example/x", "en",
         "mercury pad pad merge pad merge pad merge"),
        # merge at pos 1 with freq 2 -> matches
        (2, "https://b.example/x", "en", "merge pad merge pad"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, lang string, text string"
    )
    got = {r["doc_id"] for r in
           nested.nested_query_page(df, "mer", 2, 3).collect()}
    assert got == {2}


def test_nested_terms_agg_vs_oracle(spark, duck, sf_dir):
    got = nested.nested_terms_agg(load_corpus(spark, sf_dir), "en", 10)
    want = duck.execute(nested.nested_terms_agg_sql("en", 10)).df()
    assert_same(got, want)


def test_nested_agg_counts_docs_once(spark, sf_dir):
    """n_docs counts distinct parents (one element per distinct term per
    doc), so n_docs <= corpus doc count for the filtered lang."""
    c = load_corpus(spark, sf_dir)
    n_en = c.filter("lang = 'en'").count()
    for r in nested.nested_terms_agg(c, "en", 10).collect():
        assert r["n_docs"] <= n_en
        assert r["max_freq"] <= r["total_freq"]
