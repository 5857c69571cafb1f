"""ES terms_set (per-doc minimum_should_match_field) and Lucene
SynonymQuery (synonym groups as pseudo-terms)."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import termset as ts
from telegram2elastic_spark.query.wand import wand_topk

from .oracle import assert_same

TERMS = ["the", "data", "row", "merge"]
GROUPS = [["spark"], ["merge", "batch"]]


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=4)


def test_terms_set_vs_oracle(spark, duck, sf_dir, idx):
    got = ts.terms_set_topk(idx, TERMS, k=10)
    want = duck.execute(ts.terms_set_sql(TERMS, k=10)).df()
    assert_same(got, want)


def test_terms_set_constant_bar_equals_msm(spark, sf_dir, idx):
    """required_expr = constant m degenerates to bool minimum_should_match:
    identical rows to wand_topk(min_should_match=m)."""
    a = ts.terms_set_topk(idx, TERMS, k=10, required_expr="2").collect()
    b = wand_topk(idx, TERMS, k=10, min_should_match=2).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_terms_set_per_doc_bar_enforced(spark, duck, sf_dir, idx):
    """Every returned doc matches >= its own bar (recomputed via DuckDB)."""
    rows = ts.terms_set_topk(idx, TERMS, k=50).collect()
    tl = ", ".join(f"'{t}'" for t in TERMS)
    hits = dict(
        duck.execute(
            "SELECT doc_id, count(DISTINCT term) FROM ("
            "  SELECT doc_id, unnest(list_filter(regexp_split_to_array("
            "    lower(text), '[^a-z0-9]+'), t -> t <> '')) AS term"
            "  FROM documents) WHERE term IN (" + tl + ") GROUP BY doc_id"
        ).fetchall()
    )
    for r in rows:
        assert hits[r["doc_id"]] >= 1 + r["doc_id"] % 3


def test_synonym_vs_oracle(spark, duck, sf_dir, idx):
    got = ts.synonym_topk(idx, GROUPS, k=10)
    want = duck.execute(ts.synonym_topk_sql(GROUPS, k=10)).df()
    assert_same(got, want)


def test_synonym_singleton_groups_equal_wand(spark, sf_dir, idx):
    """All-singleton groups degenerate to the plain disjunctive BM25
    (tf sum over one member = tf, df max = df)."""
    a = ts.synonym_topk(idx, [["spark"], ["merge"]], k=10).collect()
    b = wand_topk(idx, ["spark", "merge"], k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_synonym_group_scores_leq_disjunctive(spark, sf_dir, idx):
    """Blending synonyms into one pseudo-term must not out-score the
    naive per-term sum for docs containing several members (idf of the
    max-df member is the smallest member idf; tf saturation is concave)."""
    syn = {r["doc_id"]: r["score"] for r in ts.synonym_topk(idx, [GROUPS[1]], k=200).collect()}
    naive = {r["doc_id"]: r["score"] for r in wand_topk(idx, GROUPS[1], k=200).collect()}
    both = set(syn) & set(naive)
    assert both
    assert all(syn[d] <= naive[d] + 1e-9 for d in both)


def test_dead_members_ignored(spark, sf_dir, idx):
    a = ts.synonym_topk(idx, [["spark", "zzznotaterm"], ["merge"]], k=10).collect()
    b = ts.synonym_topk(idx, [["spark"], ["merge"]], k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert ts.synonym_topk(idx, [["zzznotaterm"]], k=10).count() == 0
    assert ts.terms_set_topk(idx, ["zzznotaterm"], k=10).count() == 0
