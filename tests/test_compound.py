"""Compound (bool) queries: BM25 terms + exact phrase scored together."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import compound
from telegram2elastic_spark.query.bm25 import bm25_topk
from telegram2elastic_spark.query.phrase import phrase_topk
from telegram2elastic_spark.query.wand import wand_topk

from .oracle import assert_same


@pytest.fixture(scope="module")
def pindex(spark, sf_dir):
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4, positions=True)
    for nm in ("doc_map", "term_dict", "postings", "stats"):
        idx[nm] = idx[nm].cache()
        idx[nm].count()
    return idx


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_compound_matches_oracle(spark, duck, sf_dir, pindex):
    assert_same(
        compound.compound_topk(pindex, ["spark", "merge"], ["the", "fast"], k=10),
        duck.execute(
            compound.compound_topk_sql(["spark", "merge"], ["the", "fast"], k=10)
        ).df(),
    )


def test_compound_terms_only_equals_bm25(spark, sf_dir, pindex):
    """Empty phrase degenerates to plain disjunctive BM25."""
    got = _rows(compound.compound_topk(pindex, ["spark", "merge"], [], k=10))
    want = _rows(bm25_topk(load_corpus(spark, sf_dir), ["spark", "merge"], k=10))
    assert got == want


def test_compound_phrase_only_equals_phrase_topk(pindex):
    """Empty terms degenerates to the phrase pseudo-term ranking."""
    got = _rows(compound.compound_topk(pindex, [], ["the", "fast"], k=10))
    want = _rows(phrase_topk(pindex, ["the", "fast"], k=10))
    assert got == want


def test_compound_phrase_boosts_rank(pindex):
    """A doc containing the exact phrase must outscore the same doc's
    terms-only score (additive positive clause)."""
    both = {
        d: s
        for d, s in _rows(
            compound.compound_topk(pindex, ["spark"], ["the", "fast"], k=1000)
        )
    }
    terms_only = dict(_rows(wand_topk(pindex, ["spark"], k=1000)))
    phrase_docs = {d for d, _ in _rows(phrase_topk(pindex, ["the", "fast"], k=1000))}
    boosted = phrase_docs & set(terms_only)
    assert boosted
    for d in boosted:
        assert both[d] > terms_only[d]


def test_compound_with_doc_filter(pindex):
    got = _rows(
        compound.compound_topk(
            pindex, ["spark", "merge"], ["the", "fast"], k=10,
            doc_filter="lang = 'en'",
        )
    )
    assert got
    en = {r["doc_id"] for r in pindex["doc_map"].filter("lang = 'en'").collect()}
    assert all(d in en for d, _ in got)


def test_compound_doc_filter_keeps_global_idf(pindex):
    """ES filter-context contract: doc_filter restricts WHICH docs are
    scored but never changes idf — so every filtered hit must carry the
    exact score it has in the unfiltered ranking (phrase df_p included)."""
    full = dict(
        _rows(
            compound.compound_topk(pindex, ["spark", "merge"], ["the", "fast"], k=100_000)
        )
    )
    filt = _rows(
        compound.compound_topk(
            pindex, ["spark", "merge"], ["the", "fast"], k=100_000,
            doc_filter="lang = 'en'",
        )
    )
    assert filt
    for d, s in filt:
        assert s == full[d], f"doc {d}: filtered score {s} != global {full[d]}"


def test_compound_missing_phrase_term(pindex):
    """A phrase containing an unseen term can never match; terms still
    score (bool-should semantics)."""
    got = _rows(
        compound.compound_topk(pindex, ["spark"], ["zzznothere", "fast"], k=10)
    )
    want = _rows(wand_topk(pindex, ["spark"], k=10))
    assert got == want


def test_compound_kernel_emits_bounded_rows(spark, sf_dir, pindex):
    """The pruned kernel must emit O(k + phrase matches) rows per salt —
    never every term-matching doc (the Zipf-head term 'the' matches most
    of the corpus)."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.query.compound import _compound_group
    from telegram2elastic_spark.query.wand import _collect_idfs

    terms, phrase, k = ["the"], ["the", "fast"], 10
    idfs_all, avgdl = _collect_idfs(pindex, sorted(set(terms) | set(phrase)))
    idfs = {t: v for t, v in idfs_all.items() if t in terms}
    pdf = (
        pindex["postings"]
        .filter(F.col("term").isin(sorted(set(terms) | set(phrase))))
        .filter(F.col("salt") == 0)
        .toPandas()
    )
    out = _compound_group(pdf, idfs, float(avgdl), phrase, k)
    n_phrase = int((out["phrase_tf"] > 0).sum())
    n_matching = pindex["doc_map"].count() // 4  # docs in salt 0 (~all match 'the')
    # k + phrase matches + sentinel, NOT ~n_matching
    assert len(out) <= k + 2 * n_phrase + 1
    assert len(out) < n_matching / 2


def test_compound_topk_local_matches_distributed(pindex):
    from telegram2elastic_spark.query.compound import compound_topk_local

    cases = [
        (["spark", "merge"], ["the", "fast"], None),
        (["spark"], ["the", "fast"], None),
        ([], ["the", "fast"], None),
        (["spark", "merge"], [], None),
        (["spark"], ["zzznothere", "fast"], None),
        (["spark", "merge"], ["the", "fast"], "lang = 'en'"),
    ]
    for terms, phrase, flt in cases:
        want = [
            (r["doc_id"], r["score"])
            for r in compound.compound_topk(
                pindex, terms, phrase, k=10, doc_filter=flt
            ).collect()
        ]
        got = compound_topk_local(pindex, terms, phrase, k=10, doc_filter=flt)
        assert got == want, (terms, phrase, flt)


def test_compound_batch_matches_single(spark, sf_dir, pindex):
    """compound_topk_batch == per-query compound_topk, incl. slop,
    phrase-only, terms-only, and dead-phrase queries sharing the memo."""
    from telegram2elastic_spark.query.compound import compound_topk_batch

    queries = {
        0: (["spark", "merge"], ["the", "fast"]),
        1: (["spark"], ["merge", "batch"]),
        2: ([], ["the", "fast"]),
        3: (["spark", "merge"], []),
        4: (["spark"], ["zzznothere", "fast"]),
    }
    slops = {1: 1}
    batch = compound_topk_batch(pindex, queries, k=10, slop=slops).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["url"], r["score"])
        )
    for qid, (terms, ph) in queries.items():
        want = [
            (r["doc_id"], r["url"], r["score"])
            for r in compound.compound_topk(
                pindex, terms, ph, k=10, slop=slops.get(qid, 0)
            ).collect()
        ]
        assert by_q.get(qid, []) == want, qid


# ---------------------------------------------------------------------------
# query_string mini-language


def test_query_string_parse():
    from telegram2elastic_spark.query.querystring import parse_query_string

    p = parse_query_string('Spark sc* -Vector "Merge Batch"~2 data')
    assert p.terms == ["spark", "data"]
    assert p.prefixes == ["sc"]
    assert p.must_not == ["vector"]
    assert p.phrases == [(["merge", "batch"], 2)]


def test_query_string_rejects_out_of_subset():
    import pytest as _pytest

    from telegram2elastic_spark.query.querystring import parse_query_string

    for bad in ["title:spark", "a AND b", '-"negated phrase"', "-pre*"]:
        with _pytest.raises(ValueError):
            parse_query_string(bad)


def test_query_string_dispatch_matches_underlying(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query import querystring as qs
    from telegram2elastic_spark.query.expand import expand_prefix
    from telegram2elastic_spark.query.wand import wand_topk

    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    # prefix path == expand + wand
    a = [tuple(r) for r in qs.query_string_topk(idx, "merge sc*", k=10).collect()]
    terms = sorted(set(["merge"] + expand_prefix(idx, "sc")))
    b = [tuple(r) for r in wand_topk(idx, terms, k=10).collect()]
    assert a == b
    # must_not path == wand exclude
    c = [tuple(r) for r in qs.query_string_topk(idx, "the data -vector", k=10).collect()]
    d = [tuple(r) for r in wand_topk(
        idx, ["data", "the"], k=10, exclude_terms=["vector"]
    ).collect()]
    assert c == d


def test_query_string_local_matches_spark(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query import querystring as qs

    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4, positions=True)
    for q in ["spark merge -vector", 'spark "merge batch"~1', "merge sc*"]:
        want = [
            (r["doc_id"], r["score"])
            for r in qs.query_string_topk(idx, q, k=10).collect()
        ]
        got = [(t[0], t[-1]) for t in qs.query_string_topk_local(idx, q, k=10)]
        assert got == want, q


# simple_query_string (lenient)


def test_sqs_lenient_parse_never_raises():
    from telegram2elastic_spark.query.querystring import parse_simple_query_string

    # every construct that makes query_string raise degrades to text here
    p = parse_simple_query_string('field:term AND (the OR spark) +merge ~2')
    assert "field" in p.terms and "term" in p.terms
    assert "and" in p.terms and "or" in p.terms  # keywords become text
    assert "merge" in p.terms and not p.must_not and not p.phrases
    # unbalanced quote -> text
    p2 = parse_simple_query_string('"merge batch spark')
    assert p2.terms and not p2.phrases


def test_sqs_parse_supported_flags():
    from telegram2elastic_spark.query.querystring import parse_simple_query_string

    p = parse_simple_query_string('Spark sc* "Merge Batch"~2')
    assert p.terms == ["spark"]
    assert p.prefixes == ["sc"]
    assert p.phrases == [(["merge", "batch"], 2)]
    p2 = parse_simple_query_string('Spark sc* -Vector')
    assert p2.terms == ["spark"] and p2.must_not == ["vector"]


def test_sqs_degrades_negated_phrase_and_extra_phrases():
    from telegram2elastic_spark.query.querystring import parse_simple_query_string

    p = parse_simple_query_string('-"the fast" spark')
    assert p.must_not == ["the", "fast"] and not p.phrases
    p2 = parse_simple_query_string('"a b" "c d" spark')
    assert p2.phrases == [(["a", "b"], 0)]
    assert "c" in p2.terms and "d" in p2.terms
    # phrase + NOT -> phrase degrades to terms
    p3 = parse_simple_query_string('"merge batch" -vector')
    assert not p3.phrases and "merge" in p3.terms and p3.must_not == ["vector"]


def test_sqs_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query import querystring as qs
    from .oracle import assert_same

    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=8, positions=True)
    for q in ['spark merge -vector field:x', '"the fast"~1 table', 'AND (the']:
        got = qs.simple_query_string_topk(idx, q, k=10)
        want = duck.execute(qs.simple_query_string_sql(q, k=10)).df()
        assert_same(got, want)


def test_sqs_local_identity(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query import querystring as qs

    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=8, positions=True)
    for q in ["merge sc*", "the data -vector", '"merge batch" spark']:
        a = [
            (r["doc_id"], r["score"])
            for r in qs.simple_query_string_topk(idx, q, k=10).collect()
        ]
        b = [
            (t[0], t[-1])
            for t in qs.simple_query_string_topk_local(idx, q, k=10)
        ]
        assert a == b, q
