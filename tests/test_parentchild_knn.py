"""has_child / has_parent join queries and filtered kNN vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus, load_embeddings
from telegram2elastic_spark.operators import similarity as sim
from telegram2elastic_spark.query import parentchild as pc

from .oracle import assert_same


@pytest.mark.parametrize("mode", ["sum", "max", "avg"])
def test_has_child_vs_oracle(spark, duck, sf_dir, mode):
    got = pc.has_child_topk(load_corpus(spark, sf_dir), ["spark", "merge"],
                            k=10, score_mode=mode)
    want = duck.execute(
        pc.has_child_topk_sql(["spark", "merge"], k=10, score_mode=mode)
    ).df()
    assert_same(got, want)


def test_has_child_min_children(spark, duck, sf_dir):
    got = pc.has_child_topk(load_corpus(spark, sf_dir), ["the"],
                            k=10, min_children=2)
    want = duck.execute(
        pc.has_child_topk_sql(["the"], k=10, min_children=2)
    ).df()
    assert_same(got, want)


def test_has_parent_vs_oracle(spark, duck, sf_dir):
    got = pc.has_parent_page(load_corpus(spark, sf_dir))
    want = duck.execute(pc.has_parent_page_sql()).df()
    assert len(got.take(1)) == 1, "threshold must admit rows at every sf"
    assert_same(got, want)


@pytest.mark.parametrize("label,nprobe", [(3, 4), (0, 2), (7, 32)])
def test_knn_filtered_vs_oracle(spark, duck, sf_dir, label, nprobe):
    got = sim.knn_filtered_topk(
        load_embeddings(spark, sf_dir), label=label, nprobe=nprobe
    )
    want = duck.execute(
        sim.knn_filtered_topk_sql(label=label, nprobe=nprobe)
    ).df()
    assert_same(got, want)


def test_knn_filter_is_prefilter(spark, sf_dir):
    """Pre-filter semantics: every hit carries the filter label, and with
    nprobe = all lists the result equals brute-force cosine over the
    label subset."""
    from pyspark.sql import functions as F

    emb = load_embeddings(spark, sf_dir)
    hits = sim.knn_filtered_topk(emb, label=3, nprobe=10**9).collect()
    labels = {
        r["label"]
        for r in emb.join(
            spark.createDataFrame(
                [(h["vec_id"],) for h in hits], "vec_id long"
            ),
            "vec_id",
        ).collect()
    }
    assert labels == {3}
    brute = (
        sim.cosine_topk(emb.filter((F.col("label") == 3) | (F.col("vec_id") == 0)))
        .collect()
    )
    assert [(r["vec_id"], r["cosine"]) for r in hits] == [
        (r["vec_id"], r["cosine"]) for r in brute
    ]
