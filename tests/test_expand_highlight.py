"""Prefix/wildcard multi-term rewrites + result highlighting vs DuckDB."""

import tempfile

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index, read_index, write_index
from telegram2elastic_spark.query import expand
from telegram2elastic_spark.query.highlight import (
    search_highlight,
    search_highlight_sql,
)
from telegram2elastic_spark.query.wand import wand_topk

from .oracle import assert_same


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=8)
    for nm in ("doc_map", "term_dict", "postings", "stats"):
        idx[nm] = idx[nm].cache()
        idx[nm].count()
    return idx


def test_wildcard_regex_translation():
    assert expand.wildcard_regex("sp*k") == "^sp.*k$"
    assert expand.wildcard_regex("s?an") == "^s.an$"
    assert expand.wildcard_regex("a.b") == "^a\\.b$"  # dot is literal


def test_expand_prefix_order_and_cap(index):
    all_s = expand.expand_prefix(index, "s", max_expansions=100)
    assert all_s == sorted(all_s)  # term-dictionary enum order
    assert all(t.startswith("s") for t in all_s)
    capped = expand.expand_prefix(index, "s", max_expansions=2)
    assert capped == all_s[:2]  # cap takes the FIRST N in term order


def test_prefix_topk_vs_oracle(spark, duck, sf_dir, index):
    got = expand.prefix_topk(index, "sc", k=10)
    want = duck.execute(expand.prefix_topk_sql("sc", k=10)).df()
    assert_same(got, want)


def test_prefix_topk_is_expanded_wand(spark, sf_dir, index):
    """The rewrite IS a plain disjunction over the expanded terms."""
    terms = expand.expand_prefix(index, "s")
    want = [
        (r["doc_id"], r["score"])
        for r in wand_topk(index, terms, k=10).collect()
    ]
    got = [
        (r["doc_id"], r["score"])
        for r in expand.prefix_topk(index, "s", k=10).collect()
    ]
    assert got == want


def test_wildcard_topk_vs_oracle(spark, duck, sf_dir, index):
    got = expand.wildcard_topk(index, "s?a*", k=10)
    want = duck.execute(expand.wildcard_topk_sql("s?a*", k=10)).df()
    assert_same(got, want)


def test_prefix_no_match(index):
    assert expand.prefix_topk(index, "zzzznope", k=10).count() == 0


def test_sorted_dict_written_and_pruned(spark, sf_dir, index):
    """write_index persists term_dict_sorted; a prefix filter on it pushes
    StringStartsWith into the parquet scan (row-group pruning on the
    sorted term column — the FST-walk analogue)."""
    d = tempfile.mkdtemp(prefix="pfxidx_")
    write_index(index, d)
    idx2 = read_index(spark, d)
    assert "term_dict_sorted" in idx2
    plan = (
        idx2["term_dict_sorted"]
        .filter(idx2["term_dict_sorted"].term.startswith("sc"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "StringStartsWith" in plan
    # and the rewrite over the on-disk index matches the in-memory one
    a = [(r["doc_id"], r["score"]) for r in expand.prefix_topk(idx2, "sc").collect()]
    b = [(r["doc_id"], r["score"]) for r in expand.prefix_topk(index, "sc").collect()]
    assert a == b


HIGHLIGHT_QUERIES = [
    ["spark", "merge"],
    ["the"],
    ["vector", "window", "batch"],
]


@pytest.mark.parametrize("terms", HIGHLIGHT_QUERIES)
def test_highlight_vs_oracle(spark, duck, sf_dir, terms):
    corpus = load_corpus(spark, sf_dir)
    got = search_highlight(corpus, terms, k=10)
    want = duck.execute(search_highlight_sql(terms, k=10)).df()
    assert_same(got, want)


def test_highlight_snippet_contract(spark, sf_dir):
    """Snippets wrap every in-window term occurrence and derive from the
    document's own text."""
    corpus = load_corpus(spark, sf_dir)
    rows = search_highlight(corpus, ["spark", "merge"], k=5).collect()
    assert rows
    texts = {
        r["doc_id"]: r["text"]
        for r in corpus.select("doc_id", "text")
        .filter(corpus.doc_id.isin([r["doc_id"] for r in rows]))
        .collect()
    }
    for r in rows:
        assert "<em>" in r["snippet"]
        stripped = r["snippet"].replace("<em>", "").replace("</em>", "")
        assert stripped in texts[r["doc_id"]]


def test_highlight_is_broadcast_topk_join(spark, sf_dir):
    """The text/snippet stage touches only the k-row hit list: broadcast
    join, no shuffle of the corpus for highlighting."""
    corpus = load_corpus(spark, sf_dir)
    plan = (
        search_highlight(corpus, ["spark"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_highlight_indexed_matches_relational(spark, duck, sf_dir, index):
    """Index-backed highlighting (WAND base ranking) == the relational
    base, snippets included — and == the DuckDB oracle."""
    corpus = load_corpus(spark, sf_dir)
    terms = ["spark", "merge"]
    rel = search_highlight(corpus, terms, k=10).collect()
    idxed = search_highlight(corpus, terms, k=10, index=index).collect()
    assert [tuple(r) for r in idxed] == [tuple(r) for r in rel]
    want = duck.execute(search_highlight_sql(terms, k=10)).df()
    assert_same(search_highlight(corpus, terms, k=10, index=index), want)


# ---------------------------------------------------------------------------
# ES fuzzy / regexp term queries


def test_expand_fuzzy_order_and_distance(index):
    terms = expand.expand_fuzzy(index, "mergge", fuzziness=2, prefix_length=1)
    assert terms  # 'merge' is 1 edit away
    assert terms[0] == "merge"  # closest first
    # every expansion shares the 1-char prefix and is within 2 edits
    assert all(t.startswith("m") for t in terms)


def test_fuzzy_term_topk_vs_oracle(spark, duck, sf_dir, index):
    want = duck.execute(expand.fuzzy_term_topk_sql("mergge", k=10)).df()
    assert_same(expand.fuzzy_term_topk(index, "mergge", k=10), want)


def test_regexp_topk_vs_oracle(spark, duck, sf_dir, index):
    want = duck.execute(expand.regexp_topk_sql("sc[ab].*", k=10)).df()
    assert_same(expand.regexp_topk(index, "sc[ab].*", k=10), want)


def test_regexp_expansion_is_full_match(index):
    # anchored: 'sc[ab].*' must not match terms lacking the sc[ab] head
    for t in expand.expand_regexp(index, "sc[ab].*"):
        assert t.startswith(("sca", "scb"))


def test_fuzzy_term_no_expansions_is_empty(index):
    assert expand.fuzzy_term_topk(index, "zzzzqqqq", k=5).count() == 0


@pytest.mark.parametrize(
    "terms", [["merge", "sc"], ["sc"], ["merge", "batch", "vec"], ["zzz", "qqqq"]]
)
def test_match_bool_prefix_vs_oracle(duck, index, terms):
    got = expand.match_bool_prefix_topk(index, terms)
    want = duck.execute(expand.match_bool_prefix_sql(terms)).df()
    assert_same(got, want)


def test_match_bool_prefix_is_union_wand(index):
    """The rewrite is exactly wand over full-terms U expansion."""
    exp = expand.expand_prefix(index, "sc", expand.DEFAULT_MAX_EXPANSIONS)
    direct = wand_topk(index, sorted({"merge", *exp}), k=10).collect()
    got = expand.match_bool_prefix_topk(index, ["merge", "sc"], k=10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in direct]


class TestHighlightFvh:
    def test_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.query.highlight import (
            highlight_fvh, highlight_fvh_sql,
        )

        corpus = load_corpus(spark, sf_dir)
        assert_same(
            highlight_fvh(corpus, ["spark", "merge"], k=10),
            duck.execute(highlight_fvh_sql(["spark", "merge"], k=10)).df(),
        )

    def test_indexed_matches_relational(self, spark, sf_dir):
        from telegram2elastic_spark.query.highlight import highlight_fvh

        corpus = load_corpus(spark, sf_dir)
        idx = build_index(corpus, n_doc_parts=4)
        rel = [tuple(r) for r in
               highlight_fvh(corpus, ["spark", "merge"], k=10).collect()]
        srv = [tuple(r) for r in
               highlight_fvh(corpus, ["spark", "merge"], k=10,
                             index=idx).collect()]
        assert srv == rel

    def test_fragment_contract(self, spark, sf_dir):
        from telegram2elastic_spark.query.highlight import highlight_fvh

        corpus = load_corpus(spark, sf_dir)
        rows = highlight_fvh(
            corpus, ["spark", "merge"], k=5, frag_size=10, num_frags=3
        ).collect()
        assert rows
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for d, frs in by_doc.items():
            # rank order == score desc within a doc; every fragment marks
            # at least one query term; <= num_frags fragments
            assert len(frs) <= 3
            assert [r["frag_rank"] for r in frs] == list(
                range(1, len(frs) + 1))
            scores = [r["frag_score"] for r in frs]
            assert scores == sorted(scores, reverse=True)
            for r in frs:
                assert "<em>" in r["fragment"]
                assert len(r["fragment"].split(" ")) <= 10
