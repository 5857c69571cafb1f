"""Field collapsing (one best hit per host) vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import collapse

from .oracle import assert_same


@pytest.mark.parametrize("terms", [["spark", "merge"], ["the"], ["zzzznope"]])
def test_collapse_vs_oracle(spark, duck, sf_dir, terms):
    corpus = load_corpus(spark, sf_dir)
    got = collapse.search_collapse(corpus, terms, k=10)
    want = duck.execute(collapse.search_collapse_sql(terms, k=10)).df()
    assert_same(got, want)


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
