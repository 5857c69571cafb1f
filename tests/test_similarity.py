"""ANN / similarity search vs DuckDB oracles + recall sanity."""

from telegram2elastic_spark.corpus import load_embeddings
from telegram2elastic_spark.operators import similarity as sim

from .oracle import assert_same


def test_cosine_topk(spark, duck, sf_dir):
    assert_same(
        sim.cosine_topk(load_embeddings(spark, sf_dir), query_vec_id=0, k=10),
        duck.execute(sim.cosine_topk_sql(query_vec_id=0, k=10)).df(),
    )


def test_lsh_buckets(spark, duck, sf_dir):
    assert_same(
        sim.lsh_buckets(load_embeddings(spark, sf_dir)),
        duck.execute(sim.lsh_buckets_sql()).df(),
    )


def test_ann_topk(spark, duck, sf_dir):
    assert_same(
        sim.ann_topk(load_embeddings(spark, sf_dir), query_vec_id=7, k=5),
        duck.execute(sim.ann_topk_sql(query_vec_id=7, k=5)).df(),
    )


def test_ann_subset_of_corpus_and_ordered(spark, sf_dir):
    emb = load_embeddings(spark, sf_dir)
    exact = sim.cosine_topk(emb, query_vec_id=3, k=20).collect()
    approx = sim.ann_topk(emb, query_vec_id=3, k=20).collect()
    exact_ids = [r["vec_id"] for r in exact]
    # every ANN hit is a real vector with correctly computed cosine
    exact_map = {r["vec_id"]: r["cosine"] for r in exact}
    for r in approx:
        if r["vec_id"] in exact_map:
            assert abs(r["cosine"] - exact_map[r["vec_id"]]) < 1e-9
    # buckets shrink the candidate set
    assert len(approx) <= len(exact_ids)
