"""_explain score breakdown + percolator (reverse search) vs DuckDB."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import explain, percolate

from .oracle import assert_same


@pytest.mark.parametrize("terms,doc_id", [
    (["spark", "merge", "the"], 135),
    (["vector"], 7),
    (["zzzznotaterm"], 7),          # no matching terms -> empty
    (["spark"], -1),                # missing doc -> empty
])
def test_explain_vs_oracle(spark, duck, sf_dir, terms, doc_id):
    corpus = load_corpus(spark, sf_dir)
    got = explain.explain_score(corpus, terms, doc_id)
    want = duck.execute(explain.explain_score_sql(terms, doc_id)).df()
    assert_same(got, want)


def test_explain_sums_to_bm25_score(spark, sf_dir):
    """The per-term weights sum to the retrieval score of the same doc
    (the whole point of _explain)."""
    from telegram2elastic_spark.query.bm25 import bm25_topk

    corpus = load_corpus(spark, sf_dir)
    terms = ["spark", "merge"]
    top = bm25_topk(corpus, terms, k=1).collect()[0]
    rows = explain.explain_score(corpus, terms, top["doc_id"]).collect()
    assert round(sum(r["weight"] for r in rows), 4) == round(top["score"], 4)


SPECS = [
    (1, ["spark", "merge"], 2),
    (2, ["vector"], 1),
    (3, ["the", "data", "row"], 3),
    (4, ["zzzznotaterm"], 1),        # never fires
    (5, ["batch", "batch", "scan"], 2),  # duplicate term in spec
]


def test_percolate_vs_oracle(spark, duck, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    q = percolate.stored_queries(spark, SPECS)
    got = percolate.percolate(corpus, q)
    want = duck.execute(percolate.percolate_sql(SPECS)).df()
    assert_same(got, want)


def test_percolate_matches_forward_search(spark, sf_dir):
    """Percolation agrees with the forward path: docs matching stored
    query 1 == conjunctive bm25 matches for its terms."""
    from telegram2elastic_spark.query.bm25 import bm25_topk

    corpus = load_corpus(spark, sf_dir)
    q = percolate.stored_queries(spark, SPECS)
    perc = {
        r["doc_id"]
        for r in percolate.percolate(corpus, q).collect()
        if r["query_id"] == 1
    }
    fwd = {
        r["doc_id"]
        for r in bm25_topk(
            corpus, ["spark", "merge"], k=10**6, conjunctive=True
        ).collect()
    }
    assert perc == fwd


def test_percolate_query_index_is_broadcast(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    q = percolate.stored_queries(spark, SPECS)
    plan = (
        percolate.percolate(corpus, q)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_stream_percolate_matches_batch(spark, sf_dir, tmp_path):
    """Streaming percolation over micro-batches == batch percolation of
    the whole corpus (per-doc independence), with epoch-keyed idempotent
    output."""
    corpus = load_corpus(spark, sf_dir)
    src = str(tmp_path / "stream_src")
    corpus.repartition(4).write.parquet(src)
    q = percolate.stored_queries(spark, SPECS)
    out = str(tmp_path / "alerts")
    percolate.stream_percolate_availablenow(
        spark, src, q, out, str(tmp_path / "ckpt"), max_files_per_trigger=2
    )
    import glob

    epochs = glob.glob(f"{out}/epoch=*")
    assert len(epochs) >= 2  # really micro-batched
    got = {
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in spark.read.parquet(*epochs).collect()
    }
    want = {
        (r["doc_id"], r["query_id"], r["n_matched"])
        for r in percolate.percolate(corpus, q).collect()
    }
    assert got == want


def test_percolate_shuffle_fallback_matches_broadcast(spark, sf_dir):
    """Above the broadcast threshold the join falls back to a shuffle
    join on term (a million-alert store must not OOM a forced broadcast);
    results are identical and the plan really drops the broadcast."""
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.query import percolate as pc

    corpus = load_corpus(spark, sf_dir)
    queries = pc.stored_queries(
        spark, [(1, ["spark", "merge"], 2), (2, ["vector"], 1)]
    )
    want = pc.percolate(corpus, queries).collect()
    # Catalyst may still auto-broadcast a tiny un-hinted side (the right
    # adaptive behavior); disable auto-broadcast to observe the fallback
    # an over-threshold alert store would take.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fallback = pc.percolate(corpus, queries, broadcast_threshold=0)
        plan = fallback._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert fallback.collect() == want
        # the default path keeps the explicit hint even with
        # auto-broadcast off: the alert index is broadcast by DESIGN
        hinted = pc.percolate(corpus, queries)
        hplan = hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in hplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestMatchedQueries:
    NAMED = {"has_merge": ["merge"], "vecs": ["vector", "window"],
             "nope": ["zzzznope"]}

    def test_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.index.build import build_index
        from telegram2elastic_spark.query import explain as ex

        idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
        from .oracle import assert_same

        assert_same(
            ex.matched_queries_topk(idx, ["spark", "merge"], self.NAMED,
                                    k=10),
            duck.execute(ex.matched_queries_sql(
                ["spark", "merge"], self.NAMED, k=10)).df(),
        )

    def test_semantics(self, spark, sf_dir):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.index.build import build_index
        from telegram2elastic_spark.query import explain as ex
        from telegram2elastic_spark.query.wand import wand_topk

        from pyspark.sql import functions as F

        corpus = load_corpus(spark, sf_dir)
        idx = build_index(corpus, n_doc_parts=4)
        rows = ex.matched_queries_topk(
            idx, ["spark", "merge"], self.NAMED, k=10).collect()
        base = [(r["doc_id"], r["score"])
                for r in wand_topk(idx, ["spark", "merge"], k=10).collect()]
        # ranking untouched by the names
        assert [(r["doc_id"], r["score"]) for r in rows] == base
        # names verified against the raw text
        texts = {r["doc_id"]: r["text"]
                 for r in corpus.filter(
                     F.col("doc_id").isin([r["doc_id"] for r in rows])
                 ).select("doc_id", "text").collect()}
        from telegram2elastic_spark.functions.tokenizer import py_tokenize

        for r in rows:
            tks = set(py_tokenize(texts[r["doc_id"]]))
            want = []
            if "merge" in tks:
                want.append("has_merge")
            if {"vector", "window"} & tks:
                want.append("vecs")
            assert r["matched_queries"] == ",".join(sorted(want))


class TestPercolatePhrase:
    SPECS = [
        (1, ["merge", "batch"]),
        (2, ["batch", "merge"]),
        (3, ["spark"]),
        (4, ["merge", "zzzznosuchterm"]),
    ]

    def test_vs_oracle(self, spark, duck, sf_dir):
        from .oracle import assert_same
        from telegram2elastic_spark.query import percolate as P

        assert_same(
            P.percolate_phrase(
                load_corpus(spark, sf_dir),
                P.stored_phrase_queries(spark, self.SPECS),
            ),
            duck.execute(P.percolate_phrase_sql(self.SPECS)).df(),
        )

    def test_order_sensitive_and_subset_of_terms(self, spark, sf_dir):
        """Phrase hits are a subset of the all-terms percolate hits, and
        'merge batch' vs 'batch merge' fire on different doc sets."""
        from telegram2elastic_spark.query import percolate as P

        docs = load_corpus(spark, sf_dir)
        ph = P.percolate_phrase(
            docs, P.stored_phrase_queries(spark, self.SPECS)
        ).toPandas()
        terms = P.percolate(
            docs, P.stored_queries(spark, [(1, ["merge", "batch"], 2)])
        ).toPandas()
        hits1 = set(ph[ph.query_id == 1]["doc_id"])
        hits2 = set(ph[ph.query_id == 2]["doc_id"])
        both = set(terms["doc_id"])
        assert hits1 and hits1 <= both
        assert hits2 and hits2 <= both
        assert hits1 != hits2
        # dead-term alert: candidate phase must already kill it
        assert (ph.query_id == 4).sum() == 0

    def test_adjacency_not_just_cooccurrence(self, spark):
        """A doc containing both terms NON-adjacently is a candidate but
        must fail the verify phase."""
        from telegram2elastic_spark.query import percolate as P

        spark_df = spark.createDataFrame(
            [
                (1, "merge batch now", "u1"),
                (2, "merge the batch", "u2"),
                (3, "batch then merge", "u3"),
            ],
            "doc_id long, text string, url string",
        )
        out = P.percolate_phrase(
            spark_df, P.stored_phrase_queries(spark, [(1, ["merge", "batch"])])
        ).toPandas()
        assert out["doc_id"].tolist() == [1]
