"""ES 8.14+ retriever trees — composition-layer parity vs the DuckDB
oracle, identity with the dedicated single-op engines, and the error
contract."""

import pytest

from telegram2elastic_spark.corpus import load_corpus, load_embeddings
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import retriever as R

from .oracle import assert_same


@pytest.fixture(scope="module")
def ctx(spark, sf_dir):
    return {
        "index": build_index(
            load_corpus(spark, sf_dir), n_doc_parts=8, positions=True
        ),
        "embeddings": load_embeddings(spark, sf_dir),
    }


def _check(ctx, duck, body):
    assert_same(
        R.retriever_search(ctx, body),
        duck.execute(R.retriever_sql(body)).df(),
    )


BODIES = [
    # leaf passthroughs
    {"retriever": {"standard": {"query": {"match": {"text": "spark merge"}}}},
     "size": 10},
    {"retriever": {"knn": {"query_vec_id": 0, "k": 10}}, "size": 10},
    # two- and three-leg RRF
    {"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"text": "spark merge"}}}},
        {"knn": {"query_vec_id": 0, "k": 20}},
    ], "rank_window_size": 20, "rank_constant": 60}}, "size": 10},
    {"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {"match": {"text": "spark merge"}}}},
        {"knn": {"query_vec_id": 0, "k": 20}},
        {"standard": {"query": {"bool": {
            "must": [{"match": {"text": "the data row"}}],
            "must_not": [{"match": {"text": "vector"}}],
        }}}},
    ], "rank_window_size": 20, "rank_constant": 10}}, "size": 10},
    # weighted linear with minmax normalization
    {"retriever": {"linear": {"retrievers": [
        {"retriever": {"standard": {"query": {
            "match": {"text": "the data row"},
        }}}, "weight": 0.7},
        {"retriever": {"knn": {"query_vec_id": 3, "k": 20}}, "weight": 0.3},
    ], "rank_window_size": 20}}, "size": 10},
    # reranker over a nested fusion (phrase leg exercises positions)
    {"retriever": {"text_similarity_reranker": {
        "retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"text": "spark merge"}}}},
            {"standard": {"query": {"match_phrase": {"text": "merge batch"}}}},
        ], "rank_window_size": 20}},
        "rank_window_size": 15, "query_vec_id": 2,
    }}, "size": 8},
    # reranker with a min_score bar
    {"retriever": {"text_similarity_reranker": {
        "retriever": {"standard": {"query": {"match": {"text": "spark merge"}}}},
        "rank_window_size": 15, "query_vec_id": 2, "min_score": 0.02,
    }}, "size": 8},
    # pinned above a hybrid
    {"retriever": {"pinned": {"ids": [7, 42], "retriever": {
        "linear": {"retrievers": [
            {"retriever": {"standard": {"query": {
                "match": {"text": "spark merge"},
            }}}, "weight": 0.7},
            {"retriever": {"knn": {"query_vec_id": 0, "k": 20}},
             "weight": 0.3},
        ], "rank_window_size": 20},
    }}}, "size": 12},
    # rule retriever (ES 8.15): applying pin rule + non-applying rule +
    # exclude rule that also covers a pinned id (exclusion wins)
    {"retriever": {"rule": {
        "match_criteria": {"user_segment": "power", "query_age_days": 3},
        "ruleset": [
            {"criteria": [{"type": "exact", "metadata": "user_segment",
                           "values": ["power"]}],
             "type": "pinned", "ids": [11, 5]},
            {"criteria": [{"type": "prefix", "metadata": "user_segment",
                           "values": ["admin"]}],
             "type": "pinned", "ids": [77]},
            {"criteria": [{"type": "lte", "metadata": "query_age_days",
                           "values": [7]}],
             "type": "exclude", "ids": [5, 23]},
        ],
        "retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"text": "spark merge"}}}},
            {"standard": {"query": {"match": {"text": "the data"}}}},
        ], "rank_window_size": 20, "rank_constant": 60}},
    }}, "size": 10},
]


@pytest.mark.parametrize("i", range(len(BODIES)))
def test_parity(ctx, duck, i):
    _check(ctx, duck, BODIES[i])


def test_rrf_identity_with_dedicated_hybrid(spark, ctx, sf_dir):
    """A two-leg rrf tree reproduces rrf_hybrid_topk's fused ranking
    (same windows, same rank constant)."""
    from telegram2elastic_spark.query.hybrid import rrf_hybrid_topk

    tree = R.retriever_search(ctx, {
        "retriever": {"rrf": {"retrievers": [
            {"standard": {"query": {"match": {"text": "spark merge"}}}},
            {"knn": {"query_vec_id": 0, "k": 20}},
        ], "rank_window_size": 20, "rank_constant": 60}},
        "size": 10,
    }).collect()
    flat = rrf_hybrid_topk(
        load_corpus(spark, sf_dir), load_embeddings(spark, sf_dir),
        ["spark", "merge"], query_vec_id=0, k=10, window=20,
    ).collect()
    assert [r.doc_id for r in tree] == [r.doc_id for r in flat]
    for t, f in zip(tree, flat):
        assert abs(t.score - f.rrf_score) < 1e-5


def test_pinned_docs_rank_first_in_order(ctx):
    rows = R.retriever_search(ctx, {
        "retriever": {"pinned": {"ids": [42, 7], "retriever": {
            "standard": {"query": {"match": {"text": "spark merge"}}},
        }}},
        "size": 10,
    }).collect()
    assert [r.doc_id for r in rows[:2]] == [42, 7]
    assert all(r.score < R.PIN_BASE - 10 for r in rows[2:])


def test_linear_constant_leg_maps_to_one(ctx, spark):
    """A leg whose window scores are all equal contributes weight * 1.0
    (the ES minmax constant-leg rule) — pinned via an ids query leaf."""
    rows = R.retriever_search(ctx, {
        "retriever": {"linear": {"retrievers": [
            {"retriever": {"standard": {"query": {
                "ids": {"values": [3, 5, 9]},
            }}}, "weight": 0.5},
        ], "rank_window_size": 10}},
        "size": 5,
    }).collect()
    assert sorted(r.doc_id for r in rows) == [3, 5, 9]
    assert all(abs(r.score - 0.5) < 1e-9 for r in rows)


def test_rule_retriever_pin_order_and_exclusion_wins(ctx):
    body = BODIES[-1]
    rows = R.retriever_search(ctx, body).collect()
    ids = [r.doc_id for r in rows]
    assert ids[0] == 11  # the applying rule's pin leads
    assert 5 not in ids  # pinned AND excluded -> excluded
    assert 23 not in ids  # excluded organic id
    # the non-applying rule's pin gets no special treatment: if 77
    # appears at all it carries an organic score, never a pin score
    assert all(
        r.score < R.PIN_BASE - 10 for r in rows if r.doc_id == 77
    )


def test_local_twin_identity(ctx, sf_dir, tmp_path):
    """retriever_search_local reproduces every Spark-path tree verbatim —
    write the index to disk first (the serving deployment shape)."""
    from telegram2elastic_spark.index.build import read_index, write_index

    d = str(tmp_path / "idx")
    write_index(ctx["index"], d)
    idx = read_index(ctx["index"]["doc_map"].sparkSession, d)
    emb = f"{sf_dir}/embeddings.parquet"
    for body in BODIES:
        spark_rows = [
            (r.doc_id, r.score)
            for r in R.retriever_search(ctx, body).collect()
        ]
        local_rows = R.retriever_search_local(idx, body, emb_path=emb)
        assert local_rows == spark_rows, body


def test_errors():
    with pytest.raises(ValueError):
        R.retriever_sql({"retriever": {"nope": {}}})
    with pytest.raises(ValueError):
        R.retriever_search({}, {"retriever": {"a": 1, "b": 2}})
    with pytest.raises(ValueError):
        R.retriever_search({}, {"retriever": {"standard": {}}, "from": 5})


RESCORER_BODY = {
    "retriever": {"rescorer": {
        "retriever": {"standard": {"query": {
            "match": {"text": "spark merge"}}}},
        "rescore": {"window_size": 20, "query": {
            "rescore_query": {"match": {"text": "batch vector"}},
            "query_weight": 0.7, "rescore_query_weight": 1.5}},
    }},
    "size": 8,
}


class TestRescorer:
    """ES 8.18 rescorer retriever node."""

    def test_vs_oracle(self, ctx, duck):
        _check(ctx, duck, RESCORER_BODY)

    def test_nested_under_rrf_vs_oracle(self, ctx, duck):
        body = {"retriever": {"rrf": {"retrievers": [
            RESCORER_BODY["retriever"],
            {"standard": {"query": {"match": {"text": "table scan"}}}},
        ], "rank_window_size": 15}}, "size": 10}
        _check(ctx, duck, body)

    def test_weights_recover_child_when_rescore_weight_zero(self, ctx):
        """rqw=0 and qw=1 must reproduce the child ranking exactly."""
        body = {"retriever": {"rescorer": {
            "retriever": {"standard": {"query": {
                "match": {"text": "spark merge"}}}},
            "rescore": {"window_size": 10, "query": {
                "rescore_query": {"match": {"text": "batch"}},
                "query_weight": 1.0, "rescore_query_weight": 0.0}},
        }}, "size": 10}
        got = [(r.doc_id, round(r.score, 6))
               for r in R.retriever_search(ctx, body).collect()]
        child = [(r.doc_id, round(r.score, 6))
                 for r in R.execute_retriever(
                     ctx, {"standard": {"query": {
                         "match": {"text": "spark merge"}}}}, k=10
                 ).collect()]
        assert got == child

    def test_local_twin(self, ctx, sf_dir, tmp_path):
        from telegram2elastic_spark.index.build import read_index, write_index

        d = str(tmp_path / "idx")
        write_index(ctx["index"], d)
        idx = read_index(ctx["index"]["doc_map"].sparkSession, d)
        spark_rows = [
            (r.doc_id, r.score)
            for r in R.retriever_search(ctx, RESCORER_BODY).collect()
        ]
        assert R.retriever_search_local(idx, RESCORER_BODY) == spark_rows

    def test_rejects_non_terms_rescore_query(self, ctx):
        body = {"retriever": {"rescorer": {
            "retriever": {"standard": {"query": {
                "match": {"text": "spark"}}}},
            "rescore": {"window_size": 5, "query": {
                "rescore_query": {"match_phrase": {"text": "the fast"}}}},
        }}, "size": 5}
        with pytest.raises(ValueError, match="terms rescore"):
            R.retriever_search(ctx, body)
