"""Federated multi-index search + percentile_ranks vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.operators import aggregates as agg
from telegram2elastic_spark.query import federated as fed

from .oracle import assert_same


@pytest.mark.parametrize("terms", [["spark", "merge"], ["the"], ["zzznope"]])
def test_federated_vs_oracle(spark, duck, sf_dir, terms):
    got = fed.federated_topk(load_corpus(spark, sf_dir), terms, k=10)
    want = duck.execute(fed.federated_topk_sql(terms, k=10)).df()
    assert_same(got, want)


def test_federated_indexed_matches_relational(spark, sf_dir):
    """Per-physical-index WAND serving merges to the same ranking as the
    relational per-partition contract."""
    c = load_corpus(spark, sf_dir)
    langs = [r["lang"] for r in c.select("lang").distinct().collect()]
    indexes = {
        lang: build_index(c.filter(f"lang = '{lang}'"), n_doc_parts=2)
        for lang in sorted(langs)
    }
    got = fed.federated_topk_indexed(indexes, ["spark", "merge"], k=10)
    want = [
        (r["index_name"], r["doc_id"], r["score"])
        for r in fed.federated_topk(c, ["spark", "merge"], k=10).collect()
    ]
    assert got == want


def test_federated_scores_are_index_local(spark, sf_dir):
    """A term's idf differs between per-lang indexes: the same doc text
    can score differently under different index stats — check scores
    against a single-index ranking to prove stats are NOT global."""
    from telegram2elastic_spark.query.bm25 import bm25_topk

    c = load_corpus(spark, sf_dir)
    fed_rows = fed.federated_topk(c, ["the"], k=30).collect()
    single = {
        r["doc_id"]: r["score"] for r in bm25_topk(c, ["the"], k=10**4).collect()
    }
    diffs = [
        r for r in fed_rows
        if r["doc_id"] in single and abs(single[r["doc_id"]] - r["score"]) > 1e-9
    ]
    assert diffs, "per-index stats should shift at least one score"


def test_percentile_ranks_vs_oracle(spark, duck, sf_dir):
    got = agg.agg_percentile_ranks(load_corpus(spark, sf_dir))
    want = duck.execute(agg.agg_percentile_ranks_sql()).df()
    assert_same(got, want)


def test_percentile_ranks_monotone(spark, sf_dir):
    rows = agg.agg_percentile_ranks(
        load_corpus(spark, sf_dir), values=(500, 1500, 3000)
    ).collect()
    for r in rows:
        assert 0 <= r["rank_500"] <= r["rank_1500"] <= r["rank_3000"] <= 100


class TestFederatedDFS:
    def test_vs_oracle(self, spark, duck, sf_dir):
        got = fed.federated_topk_dfs(load_corpus(spark, sf_dir),
                                     ["spark", "merge"], k=10)
        want = duck.execute(
            fed.federated_topk_dfs_sql(["spark", "merge"], k=10)
        ).df()
        assert_same(got, want)

    def test_indexed_matches_relational(self, spark, sf_dir):
        """DFS pre-phase (driver-merged stats) + per-index WAND under
        stats_override merges to the relational DFS ranking exactly."""
        c = load_corpus(spark, sf_dir)
        langs = [r["lang"] for r in c.select("lang").distinct().collect()]
        indexes = {
            lang: build_index(c.filter(f"lang = '{lang}'"), n_doc_parts=2)
            for lang in sorted(langs)
        }
        got = fed.federated_topk_dfs_indexed(indexes, ["spark", "merge"], k=10)
        want = [
            (r["index_name"], r["doc_id"], r["score"])
            for r in fed.federated_topk_dfs(c, ["spark", "merge"], k=10).collect()
        ]
        assert got == want

    def test_dfs_scores_match_single_index(self, spark, sf_dir):
        """dfs_query_then_fetch's whole point: scores equal the ranking of
        ONE logical index over the union — i.e. plain global BM25."""
        from telegram2elastic_spark.query.bm25 import bm25_topk

        c = load_corpus(spark, sf_dir)
        fed_rows = fed.federated_topk_dfs(c, ["the"], k=30).collect()
        single = {
            r["doc_id"]: r["score"]
            for r in bm25_topk(c, ["the"], k=10**4).collect()
        }
        for r in fed_rows:
            assert abs(single[r["doc_id"]] - r["score"]) < 1e-9


class TestIndicesBoost:
    def test_vs_oracle(self, spark, duck, sf_dir):
        boosts = {"fr": 2.5, "en": 0.5}
        got = fed.federated_topk(load_corpus(spark, sf_dir),
                                 ["spark", "merge"], k=10,
                                 indices_boost=boosts)
        want = duck.execute(
            fed.federated_topk_sql(["spark", "merge"], k=10,
                                   indices_boost=boosts)
        ).df()
        assert_same(got, want)

    def test_boost_promotes_index(self, spark, sf_dir):
        """A big enough boost pulls the boosted index's docs to the head."""
        c = load_corpus(spark, sf_dir)
        rows = fed.federated_topk(c, ["the"], k=5,
                                  indices_boost={"zh": 100.0}).collect()
        assert all(r["index_name"] == "idx_zh" for r in rows)

    def test_indexed_matches_relational_with_boost(self, spark, sf_dir):
        c = load_corpus(spark, sf_dir)
        langs = [r["lang"] for r in c.select("lang").distinct().collect()]
        indexes = {
            lang: build_index(c.filter(f"lang = '{lang}'"), n_doc_parts=2)
            for lang in sorted(langs)
        }
        boosts = {"fr": 2.5, "en": 0.5}
        got = fed.federated_topk_indexed(indexes, ["spark", "merge"], k=10,
                                         indices_boost=boosts)
        want = [
            (r["index_name"], r["doc_id"], r["score"])
            for r in fed.federated_topk(c, ["spark", "merge"], k=10,
                                        indices_boost=boosts).collect()
        ]
        assert got == want
