"""SemDedup: cluster-local semantic near-dup pruning vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_embeddings
from telegram2elastic_spark.operators import similarity as sim

from .oracle import assert_same


@pytest.mark.parametrize("eps", [0.999, 0.9])
def test_semdedup_vs_oracle(spark, duck, sf_dir, eps):
    got = sim.semdedup(load_embeddings(spark, sf_dir), k=8, iters=2, eps=eps)
    want = duck.execute(sim.semdedup_sql(k=8, iters=2, eps=eps)).df()
    assert_same(got, want)


def test_semdedup_keeps_everything_at_high_eps(spark, sf_dir):
    """eps just above the max intra-cluster cosine keeps all vectors."""
    out = sim.semdedup(load_embeddings(spark, sf_dir), k=8, iters=2, eps=1.000001)
    assert out.filter("NOT kept").count() == 0


def test_semdedup_pairwise_rule(spark, sf_dir):
    """At eps low enough that everything in a cluster collides, exactly
    the centroid-FARTHEST member of each cluster survives (keep-outliers
    rule collapses to one per cluster)."""
    e = load_embeddings(spark, sf_dir)
    out = sim.semdedup(e, k=8, iters=2, eps=-1.0)
    kept = out.filter("kept").groupBy("cid").count().collect()
    assert all(r["count"] == 1 for r in kept)
