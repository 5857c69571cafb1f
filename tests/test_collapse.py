"""Field collapsing (one best hit per host) vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import collapse

from .oracle import assert_same


@pytest.mark.parametrize("terms", [["spark", "merge"], ["the"], ["zzzznope"]])
def test_collapse_vs_oracle(spark, duck, sf_dir, terms):
    corpus = load_corpus(spark, sf_dir)
    got = collapse.search_collapse(corpus, terms, k=10)
    want = duck.execute(collapse.search_collapse_sql(terms, k=10)).df()
    assert_same(got, want)


@pytest.mark.parametrize("terms", [["spark", "merge"], ["the"], ["zzzznope"]])
def test_collapse_indexed_vs_oracle(spark, duck, sf_dir, terms):
    """The serving default (index-backed, per-salt collapse) must be
    row-identical to the relational oracle."""
    corpus = load_corpus(spark, sf_dir)
    idx = build_index(corpus, n_doc_parts=8)
    got = collapse.search_collapse(corpus, terms, k=10, index=idx)
    want = duck.execute(collapse.search_collapse_sql(terms, k=10)).df()
    assert_same(got, want)


def test_collapse_indexed_matches_relational_large_k(spark, sf_dir):
    """Per-salt truncation to k collapsed rows is exact at any k (the
    ES per-shard collapse argument) — check well past the host count of a
    single salt so the truncation path is actually exercised."""
    corpus = load_corpus(spark, sf_dir)
    idx = build_index(corpus, n_doc_parts=8)
    rel = collapse.search_collapse(corpus, ["the"], k=30).collect()
    srv = collapse.search_collapse(corpus, ["the"], k=30, index=idx).collect()
    assert [tuple(r) for r in srv] == [tuple(r) for r in rel]


def test_collapse_indexed_no_corpus_tokenize(spark, sf_dir, tmp_path):
    """The index-backed query path must never re-tokenize the corpus: the
    serving plan scans postings + doc_map parquet only — no split()
    tokenizer, no explode, no corpus text column.  (Asserted on a disk
    index so the build lineage isn't part of the query plan, matching
    deployment.)"""
    from telegram2elastic_spark.index.build import read_index, write_index

    corpus = load_corpus(spark, sf_dir)
    out = str(tmp_path / "ix")
    write_index(build_index(corpus, n_doc_parts=8), out)
    idx = read_index(spark, out)
    df = collapse.search_collapse(corpus, ["the"], k=10, index=idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "split(" not in plan
    assert "explode" not in plan.lower()
    assert "text#" not in plan


def test_collapse_indexed_respects_tombstones(spark, sf_dir):
    """A tombstoned doc can neither represent its host nor appear at all."""
    corpus = load_corpus(spark, sf_dir)
    idx = build_index(corpus, n_doc_parts=8)
    base = collapse.search_collapse(corpus, ["the"], k=5, index=idx).collect()
    dead = int(base[0]["doc_id"])
    idx2 = build_index(corpus, n_doc_parts=8)
    idx2["_tombstones"] = [dead]
    after = collapse.search_collapse(
        corpus, ["the"], k=5, index=idx2
    ).collect()
    assert dead not in [r["doc_id"] for r in after]


def test_collapse_one_hit_per_host_and_is_best(spark, sf_dir):
    from telegram2elastic_spark.query.bm25 import bm25_scores

    corpus = load_corpus(spark, sf_dir)
    rows = collapse.search_collapse(corpus, ["the"], k=25).collect()
    hosts = [r["host"] for r in rows]
    assert len(hosts) == len(set(hosts))
    # each representative is its host's best-scoring match
    scored = (
        bm25_scores(corpus, ["the"])
        .withColumn("host", collapse.host_col())
        .collect()
    )
    by_host = {}
    for r in scored:
        cur = by_host.get(r["host"])
        cand = (-r["score"], r["doc_id"])
        if cur is None or cand < cur[0]:
            by_host[r["host"]] = (cand, r["doc_id"])
    for r in rows:
        assert r["doc_id"] == by_host[r["host"]][1], r["host"]


def test_collapse_plan_no_window(spark, sf_dir):
    """Per-key best is a hash aggregate (map-side combine), not a window
    sort over the full match set."""
    corpus = load_corpus(spark, sf_dir)
    plan = (
        collapse.search_collapse(corpus, ["the"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "TakeOrderedAndProject" in plan


def test_host_regex_handles_pathless_urls(spark):
    """A url with no path after the host must still extract the host
    (r3 ADVICE: the old pattern required a trailing slash)."""
    df = spark.createDataFrame(
        [("http://example.com",), ("http://example.com/a/b",)], ["url"]
    )
    got = [r[0] for r in df.select(collapse.host_col()).collect()]
    assert got == ["example.com", "example.com"]


def test_collapse_on_alternate_key(spark, duck, sf_dir):
    """ES collapses on any keyword field: key_expr='lang' must agree
    across the relational path, the index-backed path, and the oracle."""
    corpus = load_corpus(spark, sf_dir)
    rel = collapse.search_collapse(corpus, ["the"], k=5, key_expr="lang")
    want = duck.execute(
        collapse.search_collapse_sql(["the"], k=5, key_expr="lang")
    ).df()
    assert_same(rel, want)
    idx = build_index(corpus, n_doc_parts=8)
    srv = collapse.search_collapse(
        corpus, ["the"], k=5, index=idx, key_expr="lang"
    )
    assert_same(srv, want)


@pytest.mark.parametrize(
    "terms,inner", [(["spark", "merge"], 3), (["the"], 2), (["zzzznope"], 3)]
)
def test_collapse_inner_hits_vs_oracle(spark, duck, sf_dir, terms, inner):
    corpus = load_corpus(spark, sf_dir)
    got = collapse.collapse_inner_hits(corpus, terms, k=5, inner_size=inner)
    want = duck.execute(
        collapse.collapse_inner_hits_sql(terms, k=5, inner_size=inner)
    ).df()
    assert_same(got, want)


def test_inner_hits_rank1_is_collapse(spark, sf_dir):
    """hit_rank=1 rows are exactly the search_collapse representatives."""
    corpus = load_corpus(spark, sf_dir)
    reps = {
        (r["host"], r["doc_id"])
        for r in collapse.search_collapse(corpus, ["the"], k=5).collect()
    }
    inner = {
        (r["host"], r["doc_id"])
        for r in collapse.collapse_inner_hits(corpus, ["the"], k=5, inner_size=3)
        .filter("hit_rank = 1")
        .collect()
    }
    assert inner == reps


def test_inner_hits_group_order(spark, sf_dir):
    """Within a host, hit_rank follows (score desc, doc_id asc)."""
    rows = collapse.collapse_inner_hits(
        load_corpus(spark, sf_dir), ["the"], k=5, inner_size=3
    ).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    for host, hs in by_host.items():
        hs.sort(key=lambda r: r["hit_rank"])
        keys = [(-r["score"], r["doc_id"]) for r in hs]
        assert keys == sorted(keys), host


@pytest.mark.parametrize("terms", [["spark", "merge"], ["the"]])
def test_inner_hits_indexed_matches_relational(spark, sf_dir, terms):
    """Two-phase index-backed inner_hits == relational path (same rows,
    scores, ranks)."""
    from telegram2elastic_spark.index.build import build_index

    corpus = load_corpus(spark, sf_dir)
    idx = build_index(corpus, n_doc_parts=4)
    rel = sorted(
        tuple(r) for r in collapse.collapse_inner_hits(
            corpus, terms, k=5, inner_size=3
        ).collect()
    )
    srv = sorted(
        tuple(r) for r in collapse.collapse_inner_hits(
            corpus, terms, k=5, inner_size=3, index=idx
        ).collect()
    )
    assert srv == rel


def test_inner_hits_indexed_no_tokenize_in_plan(spark, sf_dir, tmp_path):
    """Serving plan reads the postings, never the corpus text."""
    from telegram2elastic_spark.index.build import (
        build_index, read_index, write_index,
    )

    corpus = load_corpus(spark, sf_dir)
    write_index(build_index(corpus, n_doc_parts=4), str(tmp_path / "idx"))
    idx = read_index(spark, str(tmp_path / "idx"))
    plan = collapse.collapse_inner_hits(
        corpus, ["spark"], k=5, inner_size=2, index=idx
    )._jdf.queryExecution().executedPlan().toString()
    assert "split" not in plan and "text#" not in plan
