"""BM25 hard-negative mining (DPR recipe): parity, exclusions, plan."""

import pytest
import pyspark.sql.functions as F

from telegram2elastic_spark.corpus import as_corpus, load_corpus
from telegram2elastic_spark.operators import training as tr


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_corpus(spark, sf_dir)


def test_parity(spark, corpus, duck):
    got = tr.mine_hard_negatives(corpus, [3, 7, 42], k=5).toPandas()
    want = duck.execute(
        tr.mine_hard_negatives_sql([3, 7, 42], k=5)
    ).fetchdf()
    assert got.values.tolist() == want.values.tolist()
    assert list(got.columns) == ["query_doc_id", "neg_doc_id", "rank",
                                 "score"]


def test_self_never_a_negative(corpus):
    rows = tr.mine_hard_negatives(corpus, [3, 7], k=10).collect()
    assert all(r.neg_doc_id != r.query_doc_id for r in rows)


def test_exact_dup_excluded(spark, sf_dir):
    # clone doc 3's text onto a fresh doc_id: the clone is the top BM25
    # hit for doc 3 by construction, but an exact duplicate is a false
    # negative and must be excluded
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clone = (
        docs.filter(F.col("doc_id") == 3)
        .withColumn("doc_id", F.lit(900001))
    )
    corpus = as_corpus(docs.unionByName(clone))
    rows = tr.mine_hard_negatives(corpus, [3], k=10).collect()
    assert rows, "mining returned nothing"
    assert all(r.neg_doc_id != 900001 for r in rows)


def test_ranks_dense_per_query(corpus):
    rows = tr.mine_hard_negatives(corpus, [3, 42], k=4).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_doc_id, []).append(r.rank)
    for q, ranks in by_q.items():
        assert ranks == list(range(1, len(ranks) + 1))


def test_args():
    with pytest.raises(ValueError):
        tr.mine_hard_negatives(None, [])
    with pytest.raises(ValueError):
        tr.mine_hard_negatives(None, [1], k=0)
    with pytest.raises(ValueError):
        tr.mine_hard_negatives_sql([])


def test_profile_join_broadcast(corpus):
    plan = (
        tr.mine_hard_negatives(corpus, [3, 7], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
