"""Text analysis operators vs DuckDB oracles."""

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.functions import text_quality as tq

from .oracle import assert_same


def test_lang_id(spark, duck, sf_dir):
    assert_same(
        tq.lang_id(load_corpus(spark, sf_dir)),
        duck.execute(tq.lang_id_sql()).df(),
    )


def test_quality_scores(spark, duck, sf_dir):
    assert_same(
        tq.quality_scores(load_corpus(spark, sf_dir)),
        duck.execute(tq.quality_scores_sql()).df(),
    )


def test_token_counts(spark, duck, sf_dir):
    assert_same(
        tq.token_counts(load_corpus(spark, sf_dir)),
        duck.execute(tq.TOKEN_COUNTS_SQL).df(),
    )


def test_fingerprints(spark, duck, sf_dir):
    assert_same(
        tq.fingerprints(load_corpus(spark, sf_dir)),
        duck.execute(tq.fingerprints_sql()).df(),
    )


class TestWinnowing:
    def test_vs_oracle(self, spark, duck, sf_dir):
        assert_same(
            tq.winnowing_fingerprints(load_corpus(spark, sf_dir), k=3, w=4),
            duck.execute(tq.winnowing_fingerprints_sql(k=3, w=4)).df(),
        )

    def test_matches_independent_python(self, spark):
        # direct transcription of Schleimer et al. 2003 fig. 5 semantics:
        # window min, rightmost on ties, distinct (pos, hash)
        import hashlib
        import re

        from telegram2elastic_spark.corpus import as_corpus

        text = "a b a b a b c a b a b x y z a a a a a"
        k, w = 3, 4
        toks = [t for t in re.split(r"[^\w]+", text.lower()) if t]
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams
        ]
        want = set()
        starts = range(len(hs) - w + 1) if len(hs) >= w else [0]
        for t in starts:
            sl = hs[t:t + w]
            m = min(sl)
            rightmost = max(i for i, v in enumerate(sl) if v == m)
            want.add((t + rightmost + 1, m))  # 1-based pos

        corpus = as_corpus(
            spark.createDataFrame(
                [(0, text, "en", "s", len(text))],
                "doc_id long, text string, lang string, source string,"
                " n_chars int",
            )
        )
        got = {
            (r["pos"], r["fp"])
            for r in tq.winnowing_fingerprints(corpus, k=k, w=w).collect()
        }
        assert got == want

    def test_density_guarantee(self, spark, sf_dir):
        # winnowing guarantee: every w-window holds a selected gram, so
        # consecutive selected positions differ by at most w
        w = 4
        rows = tq.winnowing_fingerprints(
            load_corpus(spark, sf_dir).filter("doc_id < 40"), k=3, w=w
        ).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["pos"])
        assert by_doc
        for poss in by_doc.values():
            assert all(b - a <= w for a, b in zip(poss, poss[1:]))

    def test_short_docs(self, spark):
        # < k tokens -> no fingerprints; k..k+w-2 grams -> exactly the
        # rightmost-min of the single short window
        from telegram2elastic_spark.corpus import as_corpus

        corpus = as_corpus(
            spark.createDataFrame(
                [(0, "one two", "en", "s", 7),
                 (1, "one two three four", "en", "s", 18)],
                "doc_id long, text string, lang string, source string,"
                " n_chars int",
            )
        )
        rows = tq.winnowing_fingerprints(corpus, k=3, w=4).collect()
        assert {r["doc_id"] for r in rows} == {1}
        assert len(rows) == 1
