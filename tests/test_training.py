"""Training-data pipeline operators vs DuckDB oracles + behavior checks."""

from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import training as tr

from .oracle import assert_same


def test_train_val_split(spark, duck, sf_dir):
    got = tr.train_val_split(load_corpus(spark, sf_dir), val_per_mille=100)
    assert_same(got, duck.execute(tr.train_val_split_sql(100)).df())
    frac = got.filter("split = 'val'").count() / got.count()
    assert 0.02 < frac < 0.25  # ~10% by key-space, tolerant at small N
    # deterministic: a second run assigns identically
    again = tr.train_val_split(load_corpus(spark, sf_dir), val_per_mille=100)
    assert got.collect() == again.collect()


def test_decontaminate(spark, duck, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    bench = corpus.filter("doc_id % 97 = 0")
    got = tr.decontaminate(corpus, bench)
    assert_same(got, duck.execute(tr.decontaminate_sql("doc_id % 97 = 0")).df())
    flagged = {r["doc_id"] for r in got.filter("contaminated").collect()}
    # the benchmark docs themselves are flagged (trivially self-overlapping,
    # as long as they have >= 8 tokens)
    bench_ids = {
        r["doc_id"]
        for r in bench.filter(
            F.size(F.split(F.lower("text"), r"[^\p{L}\p{N}]+")) >= 8
        ).collect()
    }
    assert bench_ids <= flagged


def test_decontaminate_short_docs(spark):
    """Docs with < CONTAM_NGRAM tokens must yield zero shingles (not crash
    on element_at(toks, 0) nor emit spurious null-skipped shingles) and
    come back contaminated=False — matching the oracle's upper-exclusive
    range(1, ...) which emits none."""
    corpus = spark.createDataFrame(
        [
            (1, "one two three"),  # 3 tokens < 8
            (2, ""),  # empty
            (3, "a b c d e f g h i j k l a b c d e f g h i j k l"),
            (4, "exactly seven tokens here not eight ok"),  # 7 tokens
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(99, "a b c d e f g h zz")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["contaminated"]
        for r in tr.decontaminate(corpus, bench).collect()
    }
    assert got == {1: False, 2: False, 3: True, 4: False}


def test_redact_pii(spark, duck, sf_dir):
    got = tr.redact_pii(load_corpus(spark, sf_dir))
    assert_same(got, duck.execute(tr.redact_pii_sql()).df())
    rows = got.collect()
    for r in rows:
        assert r["n_email"] >= 1 and r["n_ipv4"] >= 1  # synthetic block
        assert "[EMAIL]" in r["clean_text"] and "[IPV4]" in r["clean_text"]
        assert "@mail" not in r["clean_text"]


def test_chunk_documents(spark, duck, sf_dir):
    got = tr.chunk_documents(load_corpus(spark, sf_dir), window=64, stride=48)
    assert_same(got, duck.execute(tr.chunk_documents_sql(64, 48)).df())
    rows = got.collect()
    assert all(r["chunk_tokens"] <= 64 for r in rows)
    # docs longer than one window produce overlapping multi-chunk output
    multi = [r for r in rows if r["chunk_id"] > 0]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    if multi:  # stride < window => consecutive chunks overlap by 16 tokens
        d = multi[0]["doc_id"]
        c0, c1 = sorted(by_doc[d], key=lambda r: r["chunk_id"])[:2]
        tail = c0["chunk_text"].split(" ")[48:]
        assert c1["chunk_text"].split(" ")[: len(tail)] == tail


def test_chunk_no_shuffle_plan(spark, sf_dir):
    """Chunking must stay a narrow map+explode — no Exchange before the
    generator."""
    df = tr.chunk_documents(load_corpus(spark, sf_dir))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    gen = plan.find("Generate")
    first_ex = plan.find("Exchange")
    assert gen != -1
    # the only exchange allowed is the final orderBy sort; it must appear
    # ABOVE the generator in the plan (earlier in the string)
    assert first_ex == -1 or first_ex < gen


class TestPackSequences:
    def test_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import training
        from .oracle import assert_same

        got = training.pack_sequences(load_corpus(spark, sf_dir), seq_len=64)
        want = duck.execute(training.pack_sequences_sql(seq_len=64)).df()
        assert_same(got, want)

    def test_bucket_size_invariant(self, spark, sf_dir):
        """The two-pass prefix sum must be bucket-size independent."""
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import training

        c = load_corpus(spark, sf_dir)
        a = training.pack_sequences(c, seq_len=64, bucket=1000).collect()
        b = training.pack_sequences(c, seq_len=64, bucket=7).collect()
        assert a == b

    def test_full_coverage_no_gaps(self, spark, sf_dir):
        """Every sequence except the last is exactly seq_len tokens, with
        contiguous non-overlapping spans; every doc's tokens all land."""
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import training
        from pyspark.sql import functions as F
        from telegram2elastic_spark.functions.tokenizer import tokens

        c = load_corpus(spark, sf_dir)
        rows = training.pack_sequences(c, seq_len=64).collect()
        by_seq = {}
        for r in rows:
            by_seq.setdefault(r["seq_id"], []).append(r)
        last = max(by_seq)
        for sid, rs in by_seq.items():
            rs.sort(key=lambda r: r["seq_pos"])
            total = sum(r["tok_end"] - r["tok_begin"] for r in rs)
            if sid != last:
                assert total == 64, f"seq {sid} holds {total} tokens"
            pos = 0
            for r in rs:
                assert r["seq_pos"] == pos, f"gap in seq {sid}"
                pos += r["tok_end"] - r["tok_begin"]
        # per-doc: spans tile [0, n_toks)
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r["doc_id"], []).append((r["tok_begin"], r["tok_end"]))
        n_toks = {
            r["doc_id"]: r["n"]
            for r in c.select("doc_id", F.size(tokens("text")).alias("n")).collect()
            if r["n"] > 0
        }
        assert set(per_doc) == set(n_toks)
        for d, spans in per_doc.items():
            spans.sort()
            assert spans[0][0] == 0 and spans[-1][1] == n_toks[d]
            for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                assert a1 == b0


class TestTopNgrams:
    def test_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import training
        from .oracle import assert_same

        got = training.top_ngrams(load_corpus(spark, sf_dir), n=3, k=20)
        want = duck.execute(training.top_ngrams_sql(n=3, k=20)).df()
        assert_same(got, want)

    def test_counts_on_known_doc(self, spark):
        from telegram2elastic_spark.corpus import as_corpus
        from telegram2elastic_spark.operators import training

        docs = spark.createDataFrame(
            [(0, "a b a b a b", "en", "s", 11), (1, "a b c", "en", "s", 5)],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        rows = {
            r["ngram"]: (r["total"], r["docs"])
            for r in training.top_ngrams(as_corpus(docs), n=2, k=10).collect()
        }
        assert rows["a b"] == (4, 2)   # 3x in doc0, 1x in doc1
        assert rows["b a"] == (2, 1)
        assert rows["b c"] == (1, 1)


class TestRepetitionMetrics:
    def test_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import training
        from .oracle import assert_same

        got = training.repetition_metrics(load_corpus(spark, sf_dir))
        want = duck.execute(training.repetition_metrics_sql()).df()
        assert_same(got, want)

    def test_hand_checked_coverage(self, spark):
        """'aa bb aa bb cc' top-2gram = 'aa bb' (2x, covers tokens 1-4 =
        8 chars of 10) -> 0.8; no 5-gram repeats -> dup 0.  Overlap case:
        'xx xx xx' top gram 'xx xx' occurs at 1,2 -> covers all 3 tokens
        (6/6 chars), NOT 4 windows' worth — pins the count-once rule."""
        from telegram2elastic_spark.corpus import as_corpus
        from telegram2elastic_spark.operators import training

        docs = spark.createDataFrame(
            [(0, "aa bb aa bb cc", "en", "s", 14), (1, "xx xx xx", "en", "s", 8)],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        rows = {
            r["doc_id"]: r
            for r in training.repetition_metrics(
                as_corpus(docs), top_n=2, dup_n=5
            ).collect()
        }
        assert rows[0]["top_frac"] == 0.8 and rows[0]["dup_frac"] == 0.0
        assert rows[1]["top_frac"] == 1.0

    def test_dup_coverage(self, spark):
        """A repeated 5-gram covers exactly its union of windows."""
        from telegram2elastic_spark.corpus import as_corpus
        from telegram2elastic_spark.operators import training

        # 'a b c d e' repeated twice + unique tail: dup 5-grams cover the
        # first 10 tokens (10 chars of 13 total single-char tokens + tail)
        text = "a b c d e a b c d e x y z"
        docs = spark.createDataFrame(
            [(0, text, "en", "s", len(text))],
            "doc_id long, text string, lang string, source string, n_chars int",
        )
        r = training.repetition_metrics(as_corpus(docs), top_n=2, dup_n=5).first()
        assert r["dup_frac"] == round(10 / 13, 5)


def test_pack_sequences_rejects_bad_params(spark, sf_dir):
    import pytest as _pt

    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.operators import training

    c = load_corpus(spark, sf_dir)
    with _pt.raises(ValueError):
        training.pack_sequences(c, seq_len=0)
    with _pt.raises(ValueError):
        training.pack_sequences(c, seq_len=64, bucket=0)


class TestDSIR:
    def test_weights_vs_oracle(self, spark, duck, sf_dir):
        got = tr.dsir_weights(load_corpus(spark, sf_dir), target_lang="fr")
        want = duck.execute(tr.dsir_weights_sql(target_lang="fr")).df()
        assert_same(got, want)

    def test_sample_vs_oracle(self, spark, duck, sf_dir):
        got = tr.dsir_sample(load_corpus(spark, sf_dir), target_lang="fr", k=50)
        want = duck.execute(tr.dsir_sample_sql(target_lang="fr", k=50)).df()
        assert_same(got, want)

    @staticmethod
    def _vocab_corpus(spark):
        # target ('fr') docs draw from one vocabulary, the rest from
        # another, with a handful of raw docs written in the target
        # vocabulary — exactly what DSIR exists to find.  (The driver
        # testdata's text is lang-independent by construction, so the
        # semantic properties are asserted on this corpus; oracle parity
        # runs on the driver table.)
        from telegram2elastic_spark.corpus import as_corpus

        rows = []
        for i in range(40):
            rows.append((i, "bonjour merci oui paris " * 5, "fr", "s", 100))
        for i in range(40, 200):
            txt = (
                "bonjour merci oui paris " * 5
                if i % 40 == 0
                else "hello thanks yes london " * 5
            )
            rows.append((i, txt, "en", "s", 100))
        return as_corpus(
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string,"
                " n_chars int",
            )
        )

    def test_weights_favor_target_vocab(self, spark):
        # raw docs WRITTEN IN the target vocabulary outscore the rest,
        # whatever their lang label — the estimator reads the text.
        corpus = self._vocab_corpus(spark)
        w = {r["doc_id"]: r["log_weight"]
             for r in tr.dsir_weights(corpus, target_lang="fr").collect()}
        target_like = [w[i] for i in range(40, 200) if i % 40 == 0]
        rest = [w[i] for i in range(40, 200) if i % 40 != 0]
        assert min(target_like) > max(rest)

    def test_sample_enriches_target(self, spark):
        # the DSIR sample is dominated by target-vocabulary docs even
        # though they are a minority of the raw pool.
        corpus = self._vocab_corpus(spark)
        picked = {
            r["doc_id"]
            for r in tr.dsir_sample(corpus, target_lang="fr", k=44).collect()
        }
        target_vocab = set(range(40)) | {i for i in range(40, 200) if i % 40 == 0}
        assert len(picked & target_vocab) == 44


class TestBPE:
    def test_pair_counts_vs_oracle(self, spark, duck, sf_dir):
        got = tr.bpe_pair_counts(load_corpus(spark, sf_dir), k=20)
        want = duck.execute(tr.bpe_pair_counts_sql(k=20)).df()
        assert_same(got, want)

    @staticmethod
    def _ref_bpe(word_counts, n_merges):
        # independent 12-line reference trainer (Sennrich et al. fig. 1
        # semantics): chars + </w>, greedy leftmost non-overlapping merge.
        vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items()}
        merges = []
        for _ in range(n_merges):
            pairs = {}
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pairs[(syms[i], syms[i + 1])] = (
                        pairs.get((syms[i], syms[i + 1]), 0) + c
                    )
            live = {p: c for p, c in pairs.items() if c > 1}
            if not live:
                break
            (a, b), c = min(live.items(), key=lambda kv: (-kv[1], kv[0]))
            merges.append((a, b, c))
            nv = {}
            for syms, cnt in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nv[tuple(out)] = nv.get(tuple(out), 0) + cnt
            vocab = nv
        return merges

    def test_train_matches_reference(self, spark):
        from telegram2elastic_spark.corpus import as_corpus

        words = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaa": 4}
        text = " ".join(w for w, c in sorted(words.items()) for _ in range(c))
        corpus = as_corpus(
            spark.createDataFrame(
                [(0, text, "en", "s", len(text))],
                "doc_id long, text string, lang string, source string,"
                " n_chars int",
            )
        )
        got = tr.bpe_train(corpus, n_merges=8)
        want = self._ref_bpe(words, 8)
        assert got == want
        # the 'aaa' word exercises greedy LEFTMOST overlap handling: once
        # ('a','a') merges, each 'aaa' contributes ('aa','a'), never
        # ('a','aa') — both engines must agree on that convention.
        assert ("a", "a", 8) in got


class TestBPEApply:
    def test_counts_match_reference_encoder(self, spark):
        from telegram2elastic_spark.corpus import as_corpus

        words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
        text = " ".join(w for w, c in sorted(words.items()) for _ in range(c))
        corpus = as_corpus(
            spark.createDataFrame(
                [(0, text, "en", "s", len(text)),
                 (1, "low lowest", "en", "s", 10)],
                "doc_id long, text string, lang string, source string,"
                " n_chars int",
            )
        )
        merges = tr.bpe_train(corpus, n_merges=6)

        def encode(word):
            syms = list(word) + ["</w>"]
            for a, b, _ in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
               for r in tr.bpe_apply(corpus, merges).collect()}
        doc0_words = [w for w, c in sorted(words.items()) for _ in range(c)]
        want0 = (len(doc0_words), sum(len(encode(w)) for w in doc0_words))
        want1 = (2, len(encode("low")) + len(encode("lowest")))
        assert got == {0: want0, 1: want1}

    def test_more_merges_never_increase_counts(self, spark, sf_dir):
        corpus = load_corpus(spark, sf_dir).filter("doc_id < 60")
        merges = tr.bpe_train(corpus, n_merges=6)
        a = {r["doc_id"]: r["n_bpe_tokens"]
             for r in tr.bpe_apply(corpus, merges[:2]).collect()}
        b = {r["doc_id"]: r["n_bpe_tokens"]
             for r in tr.bpe_apply(corpus, merges).collect()}
        assert set(a) == set(b)
        assert all(b[d] <= a[d] for d in a)


class TestBPERelational:
    def test_merges_vs_oracle(self, spark, duck, sf_dir):
        assert_same(
            tr.bpe_merges(load_corpus(spark, sf_dir), n_merges=6),
            duck.execute(tr.bpe_merges_sql(n_merges=6)).df(),
        )

    def test_token_counts_vs_oracle(self, spark, duck, sf_dir):
        assert_same(
            tr.bpe_token_counts(load_corpus(spark, sf_dir), n_merges=4),
            duck.execute(tr.bpe_token_counts_sql(n_merges=4)).df(),
        )

    def test_overlap_runs_agree_cross_engine(self, spark):
        # 'aaaaa' is the adversarial case for the SQL string-replace
        # rewrite: greedy leftmost gives [aa, aa, a] while a separator-
        # consuming replace would give [aa, a, aa].  The two-space
        # encoding must reproduce the Spark fold exactly.
        import duckdb
        import pandas as pd

        from telegram2elastic_spark.corpus import as_corpus

        rows = [
            (0, "aaaaa aaaa aaa bb ab", "en", "s", 20),
            (1, "aaaaa aaaaa ab bb bb", "en", "s", 20),
        ]
        docs = pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
        con = duckdb.connect()
        con.register("documents", docs)
        corpus = as_corpus(
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string,"
                " n_chars int",
            )
        )
        assert_same(
            tr.bpe_merges(corpus, n_merges=5),
            con.execute(tr.bpe_merges_sql(n_merges=5)).df(),
        )
        assert_same(
            tr.bpe_token_counts(corpus, n_merges=5),
            con.execute(tr.bpe_token_counts_sql(n_merges=5)).df(),
        )
        con.close()

    def test_early_break_when_no_pair_repeats(self, spark):
        # every pair unique -> bpe_train stops after the count>1 pool
        # dries up; the SQL LEFT JOIN pass-through must keep the word
        # table alive so token counts still come back for every doc.
        import duckdb
        import pandas as pd

        from telegram2elastic_spark.corpus import as_corpus

        rows = [(0, "abc def", "en", "s", 7)]
        con = duckdb.connect()
        con.register(
            "documents",
            pd.DataFrame(
                rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
            ),
        )
        corpus = as_corpus(
            spark.createDataFrame(
                rows,
                "doc_id long, text string, lang string, source string,"
                " n_chars int",
            )
        )
        assert_same(
            tr.bpe_merges(corpus, n_merges=3),
            con.execute(tr.bpe_merges_sql(n_merges=3)).df(),
        )
        got = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in tr.bpe_token_counts(corpus, n_merges=3).collect()
        }
        assert got == {0: 8}  # 3+1 symbols per word, no merges apply
        assert_same(
            tr.bpe_token_counts(corpus, n_merges=3),
            con.execute(tr.bpe_token_counts_sql(n_merges=3)).df(),
        )
        con.close()


class TestCcnetBuckets:
    def test_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.operators import training as tr

        assert_same(
            tr.ccnet_buckets(load_corpus(spark, sf_dir)),
            duck.execute(tr.ccnet_buckets_sql()).df(),
        )

    def test_tercile_semantics(self, spark, sf_dir):
        """The integer rank-third rule: per lang with n scored docs,
        |head| = n//3, |middle| = (2n)//3 - n//3, |tail| = n - (2n)//3
        (the 3*rn <= n / <= 2n cutoffs), and every scored doc lands in
        exactly one bucket."""
        from telegram2elastic_spark.operators import training as tr

        corpus = load_corpus(spark, sf_dir)
        got = {
            (r["lang"], r["bucket"]): r["cnt"]
            for r in tr.ccnet_buckets(corpus).collect()
        }
        ced, lm_cached = tr._lm_scored(corpus, "en")
        per_lang = {
            r["lang"]: r["count"] for r in ced.groupBy("lang").count().collect()
        }
        for f in lm_cached:
            f.unpersist()
        assert per_lang
        for lang, n in per_lang.items():
            head = n // 3
            middle = (2 * n) // 3 - head
            tail = n - (2 * n) // 3
            assert got.get((lang, "head"), 0) == head, lang
            assert got.get((lang, "middle"), 0) == middle, lang
            assert got.get((lang, "tail"), 0) == tail, lang
        assert sum(got.values()) == sum(per_lang.values())
