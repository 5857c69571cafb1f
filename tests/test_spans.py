"""ES span queries: span_first and span_near(in_order=false)."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import spans
from telegram2elastic_spark.query.phrase import phrase_topk

from .oracle import assert_same


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=4, positions=True)


@pytest.mark.parametrize("end", [1, 12, 10_000])
def test_span_first_vs_oracle(spark, duck, sf_dir, idx, end):
    got = spans.span_first_topk(idx, "spark", end=end, k=10)
    want = duck.execute(spans.span_first_sql("spark", end=end, k=10)).df()
    assert_same(got, want)


def test_span_first_widening_end_monotone(spark, sf_dir, idx):
    """Doc sets grow monotonically with `end` (df_s check via row pool)."""
    small = {r["doc_id"] for r in spans.span_first_topk(idx, "merge", end=3, k=500).collect()}
    large = {r["doc_id"] for r in spans.span_first_topk(idx, "merge", end=50, k=500).collect()}
    assert small <= large


@pytest.mark.parametrize("terms,slop", [
    (["merge", "batch"], 0),
    (["merge", "batch"], 2),
    (["table", "scan", "merge"], 3),
])
def test_span_near_vs_oracle(spark, duck, sf_dir, idx, terms, slop):
    got = spans.span_near_topk(idx, terms, slop=slop, k=10)
    want = duck.execute(spans.span_near_sql(terms, slop=slop, k=10)).df()
    assert_same(got, want)


def test_span_near_superset_of_ordered_phrase(spark, sf_dir, idx):
    """Unordered window matching admits every ordered sloppy-phrase doc:
    an ordered match of width <= m + slop is an unordered co-occurrence.
    (Scores differ — tf definitions differ — compare doc sets.)"""
    ph = {r["doc_id"] for r in phrase_topk(idx, ["merge", "batch"], k=500, slop=2).collect()}
    sp = {r["doc_id"] for r in spans.span_near_topk(idx, ["merge", "batch"], slop=2, k=500).collect()}
    assert ph <= sp


def test_span_near_order_free(spark, sf_dir, idx):
    """in_order=false: member order must not change the result."""
    a = spans.span_near_topk(idx, ["merge", "batch"], slop=2, k=10).collect()
    b = spans.span_near_topk(idx, ["batch", "merge"], slop=2, k=10).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_span_dead_term_empty(spark, sf_dir, idx):
    assert spans.span_first_topk(idx, "zzznotaterm", end=10, k=10).count() == 0
    assert spans.span_near_topk(idx, ["merge", "zzznotaterm"], slop=1, k=10).count() == 0


# span_within / span_containing


class TestSpanEnclosure:
    def _idx(self, spark, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.index.build import build_index

        return build_index(
            load_corpus(spark, sf_dir), n_doc_parts=8, positions=True
        )

    def test_within_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.query import spans
        from .oracle import assert_same

        idx = self._idx(spark, sf_dir)
        got = spans.span_within_topk(idx, "fast", ["the", "merge"], slop=2, k=10)
        want = duck.execute(
            spans.span_within_sql("fast", ["the", "merge"], slop=2, k=10)
        ).df()
        assert_same(got, want)

    def test_containing_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.query import spans
        from .oracle import assert_same

        idx = self._idx(spark, sf_dir)
        got = spans.span_containing_topk(idx, "fast", ["the", "merge"], slop=2, k=10)
        want = duck.execute(
            spans.span_containing_sql("fast", ["the", "merge"], slop=2, k=10)
        ).df()
        assert_same(got, want)

    def test_enclosure_on_synthetic_doc(self, spark):
        """Hand-checked tfs: doc 'a x b a y b z a b' with big=(a,b) slop=1
        (w=3) and little=x/y: anchors for big at positions where both a
        and b occur within 3 tokens."""
        from telegram2elastic_spark.corpus import as_corpus
        from telegram2elastic_spark.index.build import build_index
        from telegram2elastic_spark.query import spans

        text = "aa xx bb aa yy bb zz aa bb"
        docs = spark.createDataFrame(
            [(0, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        idx = build_index(as_corpus(docs), n_doc_parts=2, positions=True)
        # tokens: aa(1) xx(2) bb(3) aa(4) yy(5) bb(6) zz(7) aa(8) bb(9)
        # big=(aa,bb) w=3: anchors p where aa and bb both in [p, p+3):
        #   p=1 (aa1,bb3), p=3? (bb3,aa4 in [3,6)) yes, p=4 (aa4,bb6),
        #   p=6? (bb6, aa8 in [6,9)) yes, p=8? aa8,bb9 yes, p=9? aa in [9,12)? no
        # little=xx at 2: enclosed by span [1,4)? p=1 <= 2 < 4 yes -> tf 1
        rows = spans.span_within_topk(idx, "xx", ["aa", "bb"], slop=1, k=5).collect()
        assert len(rows) == 1
        # containing: anchors enclosing xx(2): p=1 only (p<=2<p+3) -> tf 1
        rows_c = spans.span_containing_topk(idx, "xx", ["aa", "bb"], slop=1, k=5).collect()
        assert len(rows_c) == 1

    def test_missing_little_term_empty(self, spark, sf_dir):
        from telegram2elastic_spark.query import spans

        idx = self._idx(spark, sf_dir)
        assert (
            spans.span_within_topk(idx, "zzznotaterm", ["the"], k=5).count() == 0
        )


class TestSpanMulti:
    def test_prefix_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.index.build import build_index

        idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4,
                          positions=True)
        from .oracle import assert_same

        assert_same(
            spans.span_multi_topk(idx, prefix="mer", k=10),
            duck.execute(spans.span_multi_sql(prefix="mer", k=10)).df(),
        )

    def test_wildcard_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.index.build import build_index

        idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4,
                          positions=True)
        from .oracle import assert_same

        assert_same(
            spans.span_multi_topk(idx, wildcard="s?a*", k=10),
            duck.execute(spans.span_multi_sql(wildcard="s?a*", k=10)).df(),
        )

    def test_arg_validation_and_empty(self, spark, sf_dir):
        import pytest as _pytest

        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.index.build import build_index

        idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4,
                          positions=True)
        with _pytest.raises(ValueError):
            spans.span_multi_topk(idx)
        with _pytest.raises(ValueError):
            spans.span_multi_topk(idx, prefix="a", wildcard="b")
        assert spans.span_multi_topk(idx, prefix="zzqqxx").count() == 0

    def test_differs_from_scoring_boolean(self, spark, sf_dir):
        """span_multi scores ONE pseudo-term (union df); prefix_topk sums
        per-expansion idfs — on a multi-expansion prefix the score sets
        must differ while the match sets agree."""
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.index.build import build_index
        from telegram2elastic_spark.query.expand import prefix_topk

        idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4,
                          positions=True)
        sm = {r["doc_id"]: r["score"]
              for r in spans.span_multi_topk(idx, prefix="s", k=50).collect()}
        pb = {r["doc_id"]: r["score"]
              for r in prefix_topk(idx, "s", k=50).collect()}
        assert sm and pb
        common = set(sm) & set(pb)
        assert common and any(sm[d] != pb[d] for d in common)


class TestFieldMaskingSpan:
    @pytest.fixture(scope="class")
    def fidx(self, spark, sf_dir):
        from telegram2elastic_spark.query.multifield import build_field_indexes

        return build_field_indexes(
            load_corpus(spark, sf_dir),
            {"text": "text", "url": "url"},
            n_doc_parts=4, positions=True,
        )

    def test_vs_oracle(self, spark, duck, sf_dir, fidx):
        clauses = [("text", "fast"), ("url", "page")]
        assert_same(
            spans.field_masking_span_topk(fidx, clauses, slop=60, k=10),
            duck.execute(
                spans.field_masking_span_sql(clauses, slop=60, k=10)).df(),
        )

    def test_single_field_degrades_to_span_near(self, spark, sf_dir, fidx):
        """All clauses on one field == plain span_near on that index."""
        got = [tuple(r) for r in spans.field_masking_span_topk(
            fidx, [("text", "merge"), ("text", "batch")], slop=2, k=10
        ).collect()]
        want = [tuple(r) for r in spans.span_near_topk(
            fidx["text"], ["merge", "batch"], slop=2, k=10).collect()]
        assert got == want

    def test_validation_and_empty(self, spark, sf_dir, fidx):
        with pytest.raises(ValueError):
            spans.field_masking_span_topk(fidx, [])
        assert spans.field_masking_span_topk(
            fidx, [("text", "zzqqxx"), ("url", "page")], slop=60, k=10
        ).count() == 0
