"""frequent_item_sets (ES 8.4) — oracle parity, brute-force recompute,
closedness semantics, integer threshold."""

import itertools

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.functions.tokenizer import py_tokenize
from telegram2elastic_spark.query import facets
from tests.oracle import assert_same


def test_pairs_oracle_parity(spark, sf_dir, duck):
    df = facets.frequent_item_sets(load_corpus(spark, sf_dir), 20, 2, k=20)
    assert_same(df, duck.execute(facets.frequent_item_sets_sql(20, 2, k=20)).fetchdf())
    assert df.count() == 20


def test_triples_oracle_parity(spark, sf_dir, duck):
    df = facets.frequent_item_sets(load_corpus(spark, sf_dir), 20, 3, k=25)
    assert_same(df, duck.execute(facets.frequent_item_sets_sql(20, 3, k=25)).fetchdf())


def test_closed_oracle_parity(spark, sf_dir, duck):
    df = facets.frequent_item_sets(load_corpus(spark, sf_dir), 20, 3, k=25, closed=True)
    assert_same(
        df,
        duck.execute(
            facets.frequent_item_sets_sql(20, 3, k=25, closed=True)
        ).fetchdf(),
    )


def test_matches_bruteforce_python(spark, sf_dir):
    """Apriori restriction is lossless: the engine's frequent pairs equal
    a brute-force enumeration over ALL item pairs (no frequency
    pre-filter) in plain Python."""
    corpus = load_corpus(spark, sf_dir)
    docs = [set(py_tokenize(r.text)) for r in corpus.select("text").collect()]
    n = len(docs)
    thr = (20 * n + 99) // 100
    counts = {}
    for items in docs:
        for a, b in itertools.combinations(sorted(items), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    expected = sorted(
        ((f"{a} {b}", 2, s) for (a, b), s in counts.items() if s >= thr),
        key=lambda r: (-r[2], r[0]),
    )[:20]
    got = [
        (r.itemset, r.set_size, r.support)
        for r in facets.frequent_item_sets(corpus, 20, 2, k=20).collect()
    ]
    assert got == expected


def test_closedness_drops_subsumed_pair(spark):
    # a,b,c always co-occur (support 3) -> pair (a b) subsumed by the
    # triple; (a d) co-occurs 3 times with no equal-support triple -> kept.
    rows = [
        (0, "a b c d"), (1, "a b c d"), (2, "a b c d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' lang", "'x' source", "length(text) n_chars"
    )
    from telegram2elastic_spark.corpus import as_corpus

    out = facets.frequent_item_sets(as_corpus(docs), 100, 3, k=50, closed=True)
    sets = {(r.itemset, r.support) for r in out.collect()}
    # every pair is subsumed by an equal-support triple -> only triples
    assert all(len(s.split()) == 3 for s, _ in sets)
    assert ("a b c", 3) in sets
    # without closedness the pairs reappear
    out_all = facets.frequent_item_sets(as_corpus(docs), 100, 3, k=50)
    assert ("a b", 3) in {(r.itemset, r.support) for r in out_all.collect()}


def test_threshold_is_integer_ceil(spark):
    # 3 docs at 50% -> threshold ceil(1.5)=2: a pair in exactly 2 docs
    # is frequent, a pair in 1 is not.
    rows = [(0, "x y"), (1, "x y"), (2, "x z")]
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' lang", "'x' source", "length(text) n_chars"
    )
    from telegram2elastic_spark.corpus import as_corpus

    got = {
        (r.itemset, r.support)
        for r in facets.frequent_item_sets(as_corpus(docs), 50, 2, k=50).collect()
    }
    assert ("x y", 2) in got and all(s != "x z" for s, _ in got)


def test_arg_validation(spark, sf_dir):
    c = load_corpus(spark, sf_dir)
    with pytest.raises(ValueError):
        facets.frequent_item_sets(c, 20, 4)
    with pytest.raises(ValueError):
        facets.frequent_item_sets(c, 0, 2)
    with pytest.raises(ValueError):
        facets.frequent_item_sets_sql(101, 2)
