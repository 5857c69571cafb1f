"""Dedup operators vs DuckDB oracles."""

import pytest

from telegram2elastic_spark.corpus import load_corpus, load_embeddings
from telegram2elastic_spark.operators import dedup

from .oracle import assert_same


def test_exact_dup_groups(spark, duck, sf_dir):
    assert_same(
        dedup.exact_dup_groups(load_corpus(spark, sf_dir)),
        duck.execute(dedup.EXACT_DUP_SQL).df(),
    )


def test_dedup_keep_first(spark, duck, sf_dir):
    assert_same(
        dedup.dedup_keep_first(load_corpus(spark, sf_dir)),
        duck.execute(dedup.DEDUP_KEEP_FIRST_SQL).df(),
    )


def test_ngram_jaccard(spark, duck, sf_dir):
    assert_same(
        dedup.ngram_jaccard_pairs(load_corpus(spark, sf_dir), threshold=0.5),
        duck.execute(dedup.ngram_jaccard_sql(threshold=0.5)).df(),
    )


def test_minhash_signatures(spark, duck, sf_dir):
    assert_same(
        dedup.minhash_signatures(load_corpus(spark, sf_dir)),
        duck.execute(dedup.minhash_signatures_sql()).df(),
    )


def test_minhash_lsh_pairs(spark, duck, sf_dir):
    assert_same(
        dedup.minhash_lsh_pairs(load_corpus(spark, sf_dir)),
        duck.execute(dedup.minhash_lsh_pairs_sql()).df(),
    )


def test_simhash(spark, duck, sf_dir):
    assert_same(
        dedup.simhash(load_corpus(spark, sf_dir)),
        duck.execute(dedup.SIMHASH_SQL).df(),
    )


def test_simhash_near_pairs(spark, duck, sf_dir):
    assert_same(
        dedup.simhash_near_pairs(load_corpus(spark, sf_dir), max_hamming=3),
        duck.execute(dedup.simhash_near_pairs_sql(max_hamming=3)).df(),
    )


def test_embedding_near_pairs(spark, duck, sf_dir):
    assert_same(
        dedup.embedding_near_pairs(load_embeddings(spark, sf_dir), threshold=0.9),
        duck.execute(dedup.embedding_near_pairs_sql(threshold=0.9)).df(),
    )


def test_lsh_recall_vs_true_jaccard(spark, sf_dir):
    """LSH candidates must contain every truly-similar pair (recall check
    at jaccard >= 0.9 — with 4 bands x 2 rows, P(miss) = (1-j^2)^4 < 4%
    at j=0.9; the tiny corpus has few such pairs so this is stable).
    Uses the EXHAUSTIVE jaccard form as ground truth (the banded default
    draws candidates from LSH, so comparing it would be circular)."""
    corpus = load_corpus(spark, sf_dir)
    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs_exact(corpus, threshold=0.95).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(corpus).collect()
    }
    missed = true_pairs - cand
    assert len(missed) <= max(1, len(true_pairs) // 10), (
        f"LSH missed too many near-identical pairs: {missed}"
    )


def _pairs(df):
    return {tuple(r) for r in df.collect()}


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def test_banded_jaccard_matches_exact(spark, duck, sf_dir):
    """Banded default vs exhaustive twin: banded is a subset by
    construction; at this corpus the near-dup pairs are high-similarity so
    the two must be IDENTICAL (banding recall ~1 at j>=0.5 dups here)."""
    corpus = load_corpus(spark, sf_dir)
    banded = _pairs(dedup.ngram_jaccard_pairs(corpus, threshold=0.5))
    exact = _pairs(dedup.ngram_jaccard_pairs_exact(corpus, threshold=0.5))
    assert banded <= exact
    assert banded == exact, f"banding missed: {exact - banded}"


def test_simhash_pigeonhole_is_lossless(spark, sf_dir):
    """The chunk equi-join is mathematically complete: identical output to
    the exhaustive all-pairs form, for several hamming budgets."""
    corpus = load_corpus(spark, sf_dir)
    for h in (1, 3):
        assert _pairs(dedup.simhash_near_pairs(corpus, max_hamming=h)) == _pairs(
            dedup.simhash_near_pairs_exact(corpus, max_hamming=h)
        )


def test_embedding_bucketed_subset_of_exact(spark, sf_dir):
    """Bucketed pairs are exactly the exact pairs that share an LSH bucket
    (subset; equality when all near-dups collide — trivially true when the
    exact set is small/empty on the fixtures)."""
    emb = load_embeddings(spark, sf_dir)
    bucketed = _pairs(dedup.embedding_near_pairs(emb, threshold=0.9))
    exact = _pairs(dedup.embedding_near_pairs_exact(emb, threshold=0.9))
    assert bucketed <= exact
    # looser threshold => non-empty sets; verify the subset relation bites
    bucketed_lo = _pairs(dedup.embedding_near_pairs(emb, threshold=0.2))
    exact_lo = _pairs(dedup.embedding_near_pairs_exact(emb, threshold=0.2))
    assert len(bucketed_lo) > 0
    assert bucketed_lo <= exact_lo


def test_registered_pair_joins_have_no_cartesian(spark, sf_dir):
    """The three registered near-dup defaults must plan as equi-joins —
    no BroadcastNestedLoopJoin / CartesianProduct anywhere."""
    corpus = load_corpus(spark, sf_dir)
    emb = load_embeddings(spark, sf_dir)
    for df in [
        dedup.ngram_jaccard_pairs(corpus, threshold=0.5),
        dedup.simhash_near_pairs(corpus, max_hamming=3),
        dedup.embedding_near_pairs(emb, threshold=0.9),
    ]:
        plan = _plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


@pytest.mark.parametrize("n_hashes,bands", [(12, 3), (8, 8)])
def test_minhash_lsh_pairs_configurable(spark, duck, sf_dir, n_hashes, bands):
    """(n_hashes, bands) are recall knobs (r3 polish): non-default
    configs must stay oracle-identical, including single-row bands."""
    got = dedup.minhash_lsh_pairs(
        load_corpus(spark, sf_dir), n_hashes=n_hashes, bands=bands
    )
    want = duck.execute(
        dedup.minhash_lsh_pairs_sql(n_hashes=n_hashes, bands=bands)
    ).df()
    assert_same(got, want)


def test_minhash_bands_must_divide(spark, sf_dir):
    with pytest.raises(ValueError):
        dedup.minhash_lsh_pairs(load_corpus(spark, sf_dir), 8, 3)


class TestDedupComponents:
    def test_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import dedup
        from .oracle import assert_same

        got = dedup.dedup_components(load_corpus(spark, sf_dir))
        want = duck.execute(dedup.dedup_components_sql()).df()
        assert_same(got, want)

    def test_keep_min_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import dedup
        from .oracle import assert_same

        got = dedup.dedup_components_keep_min(load_corpus(spark, sf_dir))
        want = duck.execute(dedup.dedup_components_keep_min_sql()).df()
        assert_same(got, want)

    def test_transitive_closure_on_chain(self, spark):
        """A path graph a-b-c-d (never a clique) must collapse to one
        component — the case pairwise ops cannot express; exercises
        multi-round propagation."""
        from telegram2elastic_spark.operators import dedup
        from pyspark.sql import functions as F

        # synthetic corpus where LSH chains: build texts so consecutive
        # docs share shingles but distant ones don't
        base = ["alpha beta gamma delta", "beta gamma delta epsilon",
                "gamma delta epsilon zeta", "delta epsilon zeta eta"]
        rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(base)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars int"
        )
        from telegram2elastic_spark.corpus import as_corpus
        comp = dedup.dedup_components(as_corpus(docs), n_hashes=8, bands=8)
        got = {r["doc_id"]: r["component"] for r in comp.collect()}
        # every doc that appears must map to the min id of its component;
        # with bands=8 (r=1) consecutive docs certainly share a band hash
        edges = dedup.minhash_lsh_pairs(as_corpus(docs), n_hashes=8, bands=8).collect()
        if edges:  # chain reachability: all connected docs share label
            import itertools
            adj = {}
            for e in edges:
                adj.setdefault(e["doc_a"], set()).add(e["doc_b"])
                adj.setdefault(e["doc_b"], set()).add(e["doc_a"])
            # brute-force components
            seen, brute = set(), {}
            for v in sorted(adj):
                if v in seen:
                    continue
                stack, comp_ids = [v], []
                while stack:
                    u = stack.pop()
                    if u in seen:
                        continue
                    seen.add(u)
                    comp_ids.append(u)
                    stack.extend(adj[u] - seen)
                m = min(comp_ids)
                for u in comp_ids:
                    brute[u] = m
            assert got == brute

    def test_component_is_min_member(self, spark, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import dedup

        comp = dedup.dedup_components(load_corpus(spark, sf_dir)).collect()
        by_comp = {}
        for r in comp:
            by_comp.setdefault(r["component"], []).append(r["doc_id"])
        for c, members in by_comp.items():
            assert c == min(members)


class TestUrlCanonical:
    MESSY = [
        (1, "HTTPS://Example.COM:443/a/b/?utm_source=x&q=1#frag", "2022-01-01 00:00:00"),
        (2, "https://example.com/a/b?q=1", "2022-01-02 00:00:00"),
        (3, "http://Other.net:80/p/", "2022-01-01 05:00:00"),
        (4, "http://other.net/p", "2022-01-01 04:00:00"),
        (5, "https://example.com/a/b?q=2&utm_medium=y", "2022-01-03 00:00:00"),
        (6, "https://plain.org", "2022-01-01 00:00:00"),
    ]

    def test_canonical_expr_matches_duckdb(self, spark, duck):
        from telegram2elastic_spark.operators import dedup
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(d, u) for d, u, _ in self.MESSY], "doc_id long, url string"
        )
        got = {
            r["doc_id"]: r["c"]
            for r in df.select(
                "doc_id", dedup.canonical_url_col("url").alias("c")
            ).collect()
        }
        vals = ", ".join(f"({d}, '{u}')" for d, u, _ in self.MESSY)
        want = {
            d: c
            for d, c in duck.execute(
                f"""
                SELECT doc_id, {dedup.CANONICAL_URL_SQL.strip()} AS c
                FROM (SELECT doc_id, str_split(url, '#')[1] AS u
                      FROM (VALUES {vals}) AS t(doc_id, url))
                """
            ).fetchall()
        }
        assert got == want
        # semantic spot checks
        assert got[1] == "https://example.com/a/b?q=1"
        assert got[1] == got[2]
        assert got[3] == got[4] == "http://other.net/p"
        assert got[6] == "https://plain.org"

    def test_keep_latest_semantics(self, spark):
        from telegram2elastic_spark.operators import dedup
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(d, u, ts) for d, u, ts in self.MESSY],
            "doc_id long, url string, warc_ts string",
        ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
        rows = {
            r["canonical_url"]: r
            for r in dedup.dedup_url_canonical(df).collect()
        }
        # docs 1 and 2 share a canonical url; doc 2 is newer
        r = rows["https://example.com/a/b?q=1"]
        assert r["kept_doc_id"] == 2 and r["n_docs"] == 2
        r2 = rows["http://other.net/p"]
        assert r2["kept_doc_id"] == 3 and r2["n_docs"] == 2

    def test_vs_oracle_on_corpus(self, spark, duck, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import dedup
        from .oracle import assert_same

        got = dedup.dedup_url_canonical(load_corpus(spark, sf_dir))
        want = duck.execute(dedup.dedup_url_canonical_sql()).df()
        assert_same(got, want)


class TestExactSubstrings:
    """ExactSubstr dedup (Lee et al. 2021): sliding-window span removal."""

    def _mk(self, spark, texts):
        from telegram2elastic_spark.corpus import as_corpus

        rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
        return as_corpus(spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, "
            "n_chars int",
        ))

    def test_vs_oracle_on_corpus(self, spark, duck, sf_dir):
        assert_same(
            dedup.dedup_exact_substrings(load_corpus(spark, sf_dir)),
            duck.execute(dedup.dedup_exact_substrings_sql()).df(),
        )

    def test_catches_shifted_duplicate_blocks_miss(self, spark):
        """A duplicated passage at a DIFFERENT token offset: disjoint
        fixed blocks (dedup_blocks) see different block contents, the
        sliding windows still align on the shared span."""
        passage = "one two three four five six seven eight"
        texts = [
            passage + " tail0 tail1",
            "lead " + passage + " other",  # shifted by one token
        ]
        corpus = self._mk(spark, texts)
        got = {
            r["doc_id"]: r
            for r in dedup.dedup_exact_substrings(corpus, window=8).collect()
        }
        # doc 0 owns the passage (keep-first): nothing dropped
        assert got[0]["tokens_dropped"] == 0
        # doc 1 loses exactly the 8 passage tokens
        assert got[1]["tokens_dropped"] == 8
        assert got[1]["text_dedup"] == "lead other"
        # the disjoint-block pass misses the shifted copy entirely
        blocks = {
            r["doc_id"]: r["blocks_dropped"]
            for r in dedup.dedup_blocks(corpus, block=8).collect()
        }
        assert blocks[1] == 0

    def test_keep_first_within_doc(self, spark):
        """Within-doc repetition: the first occurrence survives."""
        span = "a b c d e"
        corpus = self._mk(spark, [span + " x " + span])
        (row,) = dedup.dedup_exact_substrings(corpus, window=5).collect()
        assert row["tokens_dropped"] == 5
        assert row["text_dedup"] == span + " x"

    def test_short_docs_survive_whole(self, spark):
        """Docs shorter than the window have no windows — kept whole even
        when identical (whole-doc dedup is dedup_keep_first's job)."""
        corpus = self._mk(spark, ["tiny doc", "tiny doc"])
        rows = dedup.dedup_exact_substrings(corpus, window=5).collect()
        assert all(r["tokens_dropped"] == 0 for r in rows)
        assert all(r["dup_windows"] == 0 for r in rows)

    def test_coverage_union_not_double_counted(self, spark):
        """Overlapping duplicated windows cover a span once: a 6-token
        duplicated run under window=5 drops 6 tokens, not 10."""
        run = "p q r s t u"
        corpus = self._mk(spark, [run + " filler1 filler2",
                                  run + " other1 other2"])
        got = {
            r["doc_id"]: r
            for r in dedup.dedup_exact_substrings(corpus, window=5).collect()
        }
        assert got[1]["dup_windows"] == 2  # two window alignments
        assert got[1]["tokens_dropped"] == 6  # union, not 2*5
