"""multi_match (most_fields) field-boosted BM25 vs DuckDB; compound slop."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import multifield as mf

from .oracle import assert_same


@pytest.fixture(scope="module")
def fidx(spark, sf_dir):
    fidx = mf.build_field_indexes(
        load_corpus(spark, sf_dir), {"text": "text", "url": "url"},
        n_doc_parts=8,
    )
    for idx in fidx.values():
        for nm in ("doc_map", "term_dict", "postings", "stats"):
            idx[nm] = idx[nm].cache()
            idx[nm].count()
    return fidx


WEIGHTS = {"text": 1.0, "url": 2.0}

MF_QUERIES = [
    ["spark", "page"],     # text-only + url-only term
    ["site7", "merge"],    # url host piece + text term
    ["example"],           # every url matches (df = N in url field)
    ["zzzznope"],          # no match anywhere
]


@pytest.mark.parametrize("terms", MF_QUERIES)
def test_multi_match_vs_oracle(spark, duck, sf_dir, fidx, terms):
    got = mf.multi_match_topk(fidx, WEIGHTS, terms, k=10)
    want = duck.execute(mf.multi_match_sql(terms, k=10)).df()
    assert_same(got, want)


def test_multi_match_single_field_reduces_to_wand(spark, sf_dir, fidx):
    """weight 0 on url == plain single-field BM25 on text."""
    from telegram2elastic_spark.query.wand import wand_topk

    terms = ["spark", "merge"]
    want = [
        (r["doc_id"], r["score"])
        for r in wand_topk(fidx["text"], terms, k=10).collect()
    ]
    got = [
        (r["doc_id"], r["score"])
        for r in mf.multi_match_topk(
            fidx, {"text": 1.0, "url": 0.0}, terms, k=10
        ).collect()
    ]
    assert got == want


def test_multi_match_boost_changes_rank(spark, sf_dir, fidx):
    """The url boost is live: with a url-only term, boosting url reorders
    or rescores relative to text-only weighting."""
    terms = ["site7", "merge"]
    w_hi = [
        (r["doc_id"], r["score"])
        for r in mf.multi_match_topk(
            fidx, {"text": 1.0, "url": 5.0}, terms, k=10
        ).collect()
    ]
    w_lo = [
        (r["doc_id"], r["score"])
        for r in mf.multi_match_topk(
            fidx, {"text": 1.0, "url": 0.0}, terms, k=10
        ).collect()
    ]
    assert w_hi != w_lo


def test_compound_slop_vs_oracle(spark, duck, sf_dir):
    """Compound bool query with a sloppy phrase clause — whole pipeline
    (terms + proximity boost) against the combined oracle."""
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query import compound

    idx = build_index(
        load_corpus(spark, sf_dir), n_doc_parts=8, positions=True
    )
    got = compound.compound_topk(
        idx, ["spark"], ["merge", "batch"], k=10, slop=1
    )
    want = duck.execute(
        compound.compound_topk_sql(["spark"], ["merge", "batch"], k=10, slop=1)
    ).df()
    assert_same(got, want)
    loc = compound.compound_topk_local(
        idx, ["spark"], ["merge", "batch"], k=10, slop=1
    )
    dist = [(r["doc_id"], r["score"]) for r in got.collect()]
    assert [(d, s) for d, s in loc] == dist


def test_dis_max_vs_oracle(spark, duck, sf_dir, fidx):
    got = mf.dis_max_topk(fidx, {"text": 1.0, "url": 2.0}, ["spark", "page"], k=10)
    want = duck.execute(mf.dis_max_sql(["spark", "page"], k=10)).df()
    assert_same(got, want)


def test_dis_max_le_multi_match_sum(spark, sf_dir, fidx):
    """best_fields max <= most_fields weighted sum per doc (sanity of the
    two combiners over the same per-field scores)."""
    w = {"text": 1.0, "url": 2.0}
    dm = {r["doc_id"]: r["score"]
          for r in mf.dis_max_topk(fidx, w, ["spark", "page"], k=50).collect()}
    mm = {r["doc_id"]: r["score"]
          for r in mf.multi_match_topk(fidx, w, ["spark", "page"], k=50).collect()}
    for d, s in dm.items():
        if d in mm:
            assert s <= mm[d] + 1e-6


class TestCombinedFields:
    @pytest.fixture(scope="class")
    def fidx(self, spark, sf_dir):
        return mf.build_field_indexes(
            load_corpus(spark, sf_dir), {"text": "text", "url": "url"},
            n_doc_parts=8,
        )

    @pytest.mark.parametrize(
        "terms",
        [["spark", "merge", "site12"], ["example"], ["the", "data"],
         ["zzznope"]],
    )
    def test_vs_oracle(self, spark, duck, fidx, terms):
        got = mf.combined_fields_topk(
            fidx, {"text": 1.0, "url": 2.0}, terms, k=10
        )
        want = duck.execute(
            mf.combined_fields_sql(terms, k=10)
        ).df()
        assert_same(got, want)

    def test_differs_from_most_fields(self, spark, fidx):
        """combined_fields saturates ONCE per term; most_fields saturates
        per field and sums scores — the rankings must be allowed to
        differ, and for the cross-field term they do (scores differ)."""
        terms = ["example", "spark"]
        cf = mf.combined_fields_topk(
            fidx, {"text": 1.0, "url": 2.0}, terms, k=10
        ).collect()
        mm = mf.multi_match_topk(
            fidx, {"text": 1.0, "url": 2.0}, terms, k=10
        ).collect()
        assert cf and mm
        assert [r["score"] for r in cf] != [r["score"] for r in mm]


class TestCrossFields:
    """multi_match type=cross_fields: blended-df term-centric dis-max."""

    @pytest.mark.parametrize(
        "terms,tb",
        [
            (["spark", "page"], 0.0),
            (["spark", "page"], 0.3),
            (["site7", "merge"], 0.5),
            (["example"], 0.0),    # df = N in the url field: blended idf
            (["zzzznope"], 0.0),   # no match anywhere
        ],
    )
    def test_vs_oracle(self, spark, duck, fidx, terms, tb):
        got = mf.cross_fields_topk(
            fidx, terms, k=10, tie_breaker=tb, weights=WEIGHTS
        )
        want = duck.execute(
            mf.cross_fields_sql(terms, k=10, tie_breaker=tb,
                                w_text=1.0, w_url=2.0)
        ).df()
        assert_same(got, want)

    def test_blended_df_demotes_cross_field_rare_term(self, spark):
        """A term RARE in text but in EVERY url ('example'): blended df
        is N, so the text occurrence is scored with the common-term idf
        — strictly below most_fields' per-field (rare) text idf.  This
        is cross_fields' defining behavior (BlendedTermQuery)."""
        from telegram2elastic_spark.corpus import as_corpus

        texts = ["example alpha beta"] + [
            f"word{i} alpha beta gamma" for i in range(1, 10)
        ]
        rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
        corpus = as_corpus(spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars int",
        ))
        fidx = mf.build_field_indexes(
            corpus, {"text": "text", "url": "url"}, n_doc_parts=2
        )
        xf = {r["doc_id"]: r["score"] for r in mf.cross_fields_topk(
            fidx, ["example"], k=10, weights=WEIGHTS
        ).collect()}
        mm = {r["doc_id"]: r["score"] for r in mf.multi_match_topk(
            fidx, WEIGHTS, ["example"], k=10
        ).collect()}
        # doc 0 matches in BOTH fields; its text leg is demoted
        assert 0 in xf and 0 in mm
        assert xf[0] < mm[0]

    def test_tie_breaker_monotone(self, spark, fidx):
        """Raising tie_breaker can only raise (or keep) a doc's score:
        it adds the non-best fields' contributions."""
        lo = {r["doc_id"]: r["score"] for r in mf.cross_fields_topk(
            fidx, ["spark", "page"], k=50, tie_breaker=0.0, weights=WEIGHTS
        ).collect()}
        hi = {r["doc_id"]: r["score"] for r in mf.cross_fields_topk(
            fidx, ["spark", "page"], k=50, tie_breaker=1.0, weights=WEIGHTS
        ).collect()}
        both = set(lo) & set(hi)
        assert both
        assert all(hi[d] >= lo[d] for d in both)

    def test_tb1_single_field_terms_match_most_fields(self, spark, fidx):
        """With tie_breaker=1 the per-term dis-max degenerates to a sum —
        cross_fields equals most_fields up to the df blend; for a term
        living in only ONE field the blend is that field's df, so scores
        coincide exactly."""
        # 'merge' appears in text only (never a url token)
        xf = mf.cross_fields_topk(
            fidx, ["merge"], k=10, tie_breaker=1.0, weights=WEIGHTS
        ).collect()
        mm = mf.multi_match_topk(fidx, WEIGHTS, ["merge"], k=10).collect()
        assert [(r["doc_id"], r["score"]) for r in xf] == [
            (r["doc_id"], r["score"]) for r in mm
        ]


def test_shared_scan_build_matches_per_field_build(spark, sf_dir):
    """r6 shared-scan build_field_indexes: every per-field table must be
    row-identical (as a set) to the former one-build_index-per-field
    path — doc_map, term_dict, postings blocks (byte columns included)
    and stats."""
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index

    corpus = load_corpus(spark, sf_dir)
    fields = {"text": "text", "url": "url"}
    new = mf.build_field_indexes(corpus, fields, n_doc_parts=4)
    from pyspark.sql import functions as F

    old = {
        name: build_index(corpus.withColumn("text", F.col(c)), n_doc_parts=4)
        for name, c in fields.items()
    }
    for name in fields:
        for tbl in ("doc_map", "term_dict", "postings", "stats"):
            a = sorted(map(tuple, new[name][tbl].collect()))
            b = sorted(map(tuple, old[name][tbl].collect()))
            assert a == b, f"{name}.{tbl} diverged"


def test_shared_scan_build_positions_matches(spark, sf_dir):
    """Positional variant: pos_bytes must survive the shared kernel."""
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index

    corpus = load_corpus(spark, sf_dir).limit(120)
    new = mf.build_field_indexes(
        corpus, {"text": "text"}, n_doc_parts=2, positions=True
    )
    old = build_index(corpus, n_doc_parts=2, positions=True)
    a = sorted(map(tuple, new["text"]["postings"].collect()))
    b = sorted(map(tuple, old["postings"].collect()))
    assert a == b
