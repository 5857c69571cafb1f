"""Executor-side document filters (r2): doc_filter / tombstone ids must
reach the scoring kernels per-salt via cogroup, never as driver-collected
closures; plus the upsert crash-atomicity contract and mixed-positional
merge safety."""

import numpy as np
import pandas as pd
import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import wand as W
from telegram2elastic_spark.query.bm25 import bm25_topk


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_corpus(spark, sf_dir)


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, n_doc_parts=4)


def test_doc_filter_uses_cogroup_not_driver_collect(index, corpus, monkeypatch):
    """wand_topk(doc_filter=...) must (a) never call the local-path
    _allowed_ids materializer and (b) show the cogroup operator in the
    plan — the allowed-id set flows per-salt on executors."""
    def boom(*a, **k):
        raise AssertionError("distributed path used driver-side _allowed_ids")

    monkeypatch.setattr(W, "_allowed_ids", boom)
    df = W.wand_topk(index, ["the", "data", "row"], k=10, doc_filter="lang = 'en'")
    plan = _plan(df, "simple")
    assert "FlatMapCoGroupsInPandas" in plan
    got = [(r["doc_id"], r["score"]) for r in df.collect()]
    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(
            corpus, ["the", "data", "row"], k=10, lang="en", global_stats=True
        ).collect()
    ]
    assert got == want


def test_no_cogroup_without_filters(index):
    """The unfiltered path must keep the plain per-salt applyInPandas
    (no pointless cogroup stage)."""
    df = W.wand_topk(index, ["spark", "merge"], k=10)
    plan = _plan(df, "simple")
    assert "FlatMapCoGroupsInPandas" not in plan
    assert "FlatMapGroupsInPandas" in plan


def test_filters_df_salts_match_posting_salts(index):
    """Filter rows must land on the salt that holds the doc's postings."""
    filt = W._filters_df(index, "lang = 'en'")
    bad = filt.filter(
        W.F.pmod(W.F.col("doc_id"), W.F.lit(4)).cast("int") != W.F.col("salt")
    ).count()
    assert bad == 0


def test_upsert_crash_before_manifest_commit_is_invisible(spark, sf_dir, tmp_path):
    """Kill the job between segment+tombstone write and the manifest commit:
    the batch must be fully invisible (no tombstones, old docs still live)
    and the replayed upsert must commit cleanly."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.streaming.ingest import IncrementalIndexer

    corpus = load_corpus(spark, sf_dir).filter("doc_id < 60")
    ix = IncrementalIndexer(spark, str(tmp_path / "ix"), n_doc_parts=4)
    ix.ingest_batch(corpus, "b0")

    edited = corpus.filter("doc_id % 10 = 0").withColumn(
        "text", F.concat(F.col("text"), F.lit(" edited-sentinel"))
    )

    real_commit = ix._commit_manifest

    def crash(entries):
        raise RuntimeError("simulated crash before manifest commit")

    ix._commit_manifest = crash
    with pytest.raises(RuntimeError, match="simulated crash"):
        ix.upsert_batch(edited, "b1")
    ix._commit_manifest = real_commit

    # nothing committed: no tombstones visible, batch replayable
    assert "b1" not in ix.committed_batches()
    assert ix.tombstones() == []
    n_before = ix.as_index()["doc_map"].count()
    assert n_before == 60

    e = ix.upsert_batch(edited, "b1")
    assert e["n_tombstones"] == 6
    idx = ix.as_index()
    assert idx["doc_map"].count() == 60  # edits replace, never duplicate
    assert sorted(ix.tombstones()) == [0, 10, 20, 30, 40, 50]


def test_merge_group_mixed_positions_drops_positions():
    """_merge_group on mixed positional/non-positional blocks must drop
    positions for the whole group (with a warning) instead of emitting
    shifted-position corruption."""
    from telegram2elastic_spark.index.codec import (
        decode_positions,
        encode_blocks,
        varbyte_decode,
    )
    from telegram2elastic_spark.streaming.ingest import _merge_group

    with_pos = encode_blocks(
        np.array([1, 5]), np.array([2, 1]), 128,
        doc_lens=np.array([10, 12]),
        positions=[np.array([0, 3]), np.array([7])],
    )
    without_pos = encode_blocks(
        np.array([2, 8]), np.array([1, 1]), 128, doc_lens=np.array([9, 11])
    )
    rows = []
    for b in [*with_pos, *without_pos]:
        rows.append({"term": "t", "salt": 0, **b})
    pdf = pd.DataFrame(rows)
    with pytest.warns(UserWarning, match="mixed positional"):
        out = _merge_group(pdf)
    ids = varbyte_decode(bytes(out["doc_gaps"].iloc[0]))
    assert np.cumsum(ids).tolist() == [1, 2, 5, 8]
    tfs = varbyte_decode(bytes(out["tf_bytes"].iloc[0]))
    pos = decode_positions(bytes(out["pos_bytes"].iloc[0]) or b"", tfs)
    assert all(p.size == 0 for p in pos)  # positions dropped, not shifted


def test_phrase_requires_positional_index(index):
    """phrase_topk over a positions=False index must fail fast, not return
    silently-empty results."""
    from telegram2elastic_spark.query.phrase import phrase_topk

    with pytest.raises(Exception, match="positional index"):
        phrase_topk(index, ["the", "fast"], k=5).collect()


def test_tombstoned_docs_never_surface_in_wand_or_phrase(spark, sf_dir, tmp_path):
    """End-to-end upsert: pre-edit top-1 doc must drop out of wand results
    (its id is tombstoned) and its replacement generation appears."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.streaming.ingest import IncrementalIndexer

    corpus = load_corpus(spark, sf_dir).filter("doc_id < 80")
    ix = IncrementalIndexer(spark, str(tmp_path / "ix2"), n_doc_parts=4)
    ix.ingest_batch(corpus, "b0")
    top1 = W.wand_topk(ix.as_index(), ["spark", "merge"], k=1).collect()[0]

    edited = corpus.filter(F.col("doc_id") == top1["doc_id"]).withColumn(
        "text", F.lit("totally unrelated replacement content")
    )
    ix.upsert_batch(edited, "b1")
    idx = ix.as_index()
    hits = W.wand_topk(idx, ["spark", "merge"], k=10).collect()
    assert all(h["doc_id"] != top1["doc_id"] for h in hits)
    # and the batch path agrees with the single path under tombstones
    batch = W.wand_topk_batch(idx, {0: ["spark", "merge"]}, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in batch] == [
        (r["doc_id"], r["score"]) for r in hits
    ]


def test_doc_termvectors_pushes_doc_id(spark, sf_dir):
    """_termvectors must tokenize one document: the doc_id equality
    reaches the parquet scan as a pushed filter."""
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.operators import aggregates as agg

    corpus = load_corpus(spark, sf_dir)
    plan = agg.doc_termvectors(corpus, 7)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PushedFilters" in plan
    assert "EqualTo(doc_id,7)" in plan
