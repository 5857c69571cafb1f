"""Trigram fuzzy search (pg_trgm GIN analogue) vs DuckDB oracle."""

from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import fuzzy

from .oracle import assert_same


def test_fuzzy_matches_oracle(spark, duck, sf_dir):
    assert_same(
        fuzzy.fuzzy_topk(load_corpus(spark, sf_dir), "mergge batch", k=10),
        duck.execute(fuzzy.fuzzy_topk_sql("mergge batch", k=10)).df(),
    )


def test_fuzzy_is_typo_tolerant(spark, sf_dir):
    """A misspelled query must still surface documents containing the
    intended token (shared trigrams survive the typo)."""
    corpus = load_corpus(spark, sf_dir)
    hits = fuzzy.fuzzy_topk(corpus, "mergge", k=10).collect()
    assert hits and all(h["sim"] > 0 for h in hits)
    top_ids = [h["doc_id"] for h in hits[:5]]
    with_word = {
        r["doc_id"]
        for r in corpus.filter(F.lower("text").contains("merge"))
        .select("doc_id")
        .collect()
    }
    # most of the fuzzy top-5 really contain the intended word
    assert len([d for d in top_ids if d in with_word]) >= 3


def test_fuzzy_short_and_empty_query(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    assert fuzzy.fuzzy_topk(corpus, "ab", k=5).count() == 0  # < 3 chars
    assert fuzzy.fuzzy_topk(corpus, "", k=5).count() == 0


def test_fuzzy_plan_probes_not_cartesian(spark, sf_dir):
    """GIN shape: the trigram probe must be a pushed IN-filter before the
    aggregation — never a cartesian/nested-loop join."""
    df = fuzzy.fuzzy_topk(load_corpus(spark, sf_dir), "mergge", k=10)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fuzzy_indexed_matches_scan(spark, sf_dir, tmp_path):
    """Index-backed fuzzy path: identical results to the scan-time
    operator, with gbucket partition pruning + pushed trigram filter."""
    corpus = load_corpus(spark, sf_dir)
    d = str(tmp_path / "trgm")
    fuzzy.build_trigram_index(corpus, d)
    got = fuzzy.fuzzy_topk_indexed(spark, d, "mergge batch", k=10)
    want = fuzzy.fuzzy_topk(corpus, "mergge batch", k=10)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    grams = spark.read.parquet(f"{d}/grams").filter(
        F.col("gbucket").isin([0, 1])
    )
    plan = grams._sc._jvm.PythonSQLUtils.explainString(
        grams._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert "gbucket" in plan.split("PartitionFilters", 1)[1].split("\n")[0]


def test_fuzzy_local_probe_matches_indexed(spark, sf_dir, tmp_path):
    """Driver-local GIN probe (pyarrow bucket reads, no Spark job) must be
    rank-identical to the Spark indexed path; the per-bucket cache serves
    repeat queries without re-reading."""
    corpus = load_corpus(spark, sf_dir)
    d = str(tmp_path / "trgm_local")
    fuzzy.build_trigram_index(corpus, d)
    for q in ["mergge batch", "sparkk", "window scan"]:
        want = [
            (r["doc_id"], r["sim"])
            for r in fuzzy.fuzzy_topk_indexed(spark, d, q, k=10).collect()
        ]
        got = fuzzy.fuzzy_topk_local(d, q, k=10)
        assert got == want, q
    cache: dict = {}
    a = fuzzy.fuzzy_topk_local(d, "mergge batch", k=10, cache=cache)
    assert cache  # buckets were cached
    b = fuzzy.fuzzy_topk_local(d, "mergge batch", k=10, cache=cache)
    assert a == b == fuzzy.fuzzy_topk_local(d, "mergge batch", k=10)


def test_local_probe_sparse_id_space(spark, tmp_path):
    """doc_ids above the dense-path bound (2^26) must take the sort-based
    grouping and agree with the Spark probe."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.query import fuzzy as fz

    base = 1 << 27
    rows = [
        (base + i, f"https://s{i}.example/p/{i}", "merge batch window " * (i + 1))
        for i in range(12)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, url string, text string")
    gin = str(tmp_path / "gin")
    fz.build_trigram_index(corpus, gin)
    want = [
        (r["doc_id"], r["sim"])
        for r in fz.fuzzy_topk_indexed(spark, gin, "mergge batch", k=5).collect()
    ]
    got = fz.fuzzy_topk_local(gin, "mergge batch", k=5, cache={})
    assert got == want
