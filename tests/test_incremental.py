"""Incremental ingest: segment append, idempotent replay, kill-and-resume,
sorted-merge compaction == single-shot build, streaming ingest."""

import glob
import os

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query.bm25 import bm25_topk
from telegram2elastic_spark.query.wand import wand_topk
from telegram2elastic_spark.streaming.ingest import (
    IncrementalIndexer,
    merge_segments,
    stream_ingest_availablenow,
)


def _topk(index, terms=("the", "data"), k=10):
    return [
        (r["doc_id"], r["score"]) for r in wand_topk(index, list(terms), k=k).collect()
    ]


@pytest.fixture()
def corpus(spark, sf_dir):
    return load_corpus(spark, sf_dir)


def test_ingest_all_days_matches_full_build(spark, corpus, tmp_path):
    ix = IncrementalIndexer(spark, str(tmp_path / "ix"), n_doc_parts=4)
    entries = ix.ingest_by_day(corpus, fmt='yyyy-MM-dd HH')
    assert len(entries) >= 2  # corpus spans multiple days
    assert sum(e["n_docs"] for e in entries) == corpus.count()

    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(corpus, ["the", "data"], k=10).collect()
    ]
    assert _topk(ix.as_index()) == want

    # per-partition lineage counters exist and cover all salts
    lineage = ix.lineage()
    assert lineage.count() > 0
    assert set(r["salt"] for r in lineage.collect()) <= set(range(4))


def test_replay_and_overlap_idempotent(spark, corpus, tmp_path):
    ix = IncrementalIndexer(spark, str(tmp_path / "ix"), n_doc_parts=4)
    ix.ingest_by_day(corpus, fmt='yyyy-MM-dd HH')
    n_seg = len(ix.manifest())
    # replay the same days: checkpoint no-ops
    assert ix.ingest_by_day(corpus, fmt='yyyy-MM-dd HH') == []
    assert len(ix.manifest()) == n_seg
    # overlapping window (whole corpus again, new batch id): the url
    # anti-join drops every doc -> empty segment, same query results
    before = _topk(ix.as_index())
    e = ix.ingest_batch(corpus, "overlap_window")
    assert e["n_docs"] == 0
    assert _topk(ix.as_index()) == before


def test_kill_and_resume(spark, corpus, tmp_path):
    base = str(tmp_path / "ix")
    days = sorted(
        r["day"]
        for r in corpus.selectExpr("date_format(warc_ts, 'yyyy-MM-dd HH') day")
        .distinct()
        .collect()
    )
    assert len(days) >= 3
    # "crash" after the first two batches
    ix1 = IncrementalIndexer(spark, base, n_doc_parts=4)
    ix1.ingest_by_day(corpus, days=days[:2], fmt='yyyy-MM-dd HH')
    # resume with a fresh indexer over the same checkpoint dir
    ix2 = IncrementalIndexer(spark, base, n_doc_parts=4)
    resumed = ix2.ingest_by_day(corpus, fmt='yyyy-MM-dd HH')
    assert [e["batch_id"] for e in resumed] == [f"day={d}" for d in days[2:]]

    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(corpus, ["the", "data"], k=10).collect()
    ]
    assert _topk(ix2.as_index()) == want


def test_merge_equals_full_build(spark, corpus, tmp_path):
    ix = IncrementalIndexer(spark, str(tmp_path / "ix"), n_doc_parts=4)
    ix.ingest_by_day(corpus, fmt='yyyy-MM-dd HH')
    merged = merge_segments(ix)

    full = build_index(corpus, n_doc_parts=4)
    key = ["term", "salt", "block_id"]
    got = {
        tuple(r[k] for k in key): (r["doc_gaps"], r["tf_bytes"], r["block_max_tf"])
        for r in merged["postings"].collect()
    }
    want = {
        tuple(r[k] for k in key): (r["doc_gaps"], r["tf_bytes"], r["block_max_tf"])
        for r in full["postings"].collect()
    }
    assert got == want  # byte-identical compaction


def test_structured_streaming_ingest(spark, corpus, tmp_path):
    cpath = str(tmp_path / "corpus")
    corpus.repartition(4).write.parquet(cpath)
    ix = IncrementalIndexer(spark, str(tmp_path / "ix"), n_doc_parts=4)
    stream_ingest_availablenow(spark, cpath, ix, str(tmp_path / "ckpt"))
    assert len(ix.manifest()) >= 1
    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(corpus, ["the", "data"], k=10).collect()
    ]
    assert _topk(ix.as_index()) == want
    # offsets recorded in the streaming checkpoint (catch_up analogue)
    assert glob.glob(os.path.join(str(tmp_path / "ckpt"), "offsets", "*"))


def test_upsert_edited_docs(spark, corpus, tmp_path):
    """Edit path: changed text for existing urls -> old version invisible,
    new version searchable; after merge, rank-identical to a fresh build
    over the updated corpus."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.corpus import as_corpus

    ix = IncrementalIndexer(spark, str(tmp_path / "ix"), n_doc_parts=4)
    ix.ingest_batch(corpus, "initial")

    # edit 20 docs: replace their text with a marker phrase
    edited_raw = (
        corpus.filter("doc_id % 25 = 0")
        .withColumn("text", F.lit("freshedit marker content only"))
        .withColumn(
            "html",
            F.concat(
                F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")
            ).cast("binary"),
        )
    )
    e = ix.upsert_batch(edited_raw, "edit_batch")
    assert e["n_tombstones"] == corpus.filter("doc_id % 25 = 0").count()

    idx = ix.as_index()
    # new content findable
    hits = wand_topk(idx, ["freshedit"], k=50).collect()
    assert len(hits) == e["n_tombstones"]
    # edited docs no longer appear under their old content; corpus words
    # they used to contain return only live versions
    old_hits = {r["doc_id"] for r in wand_topk(idx, ["the"], k=10_000).collect()}
    tomb = set(ix.tombstones())
    assert not (old_hits & tomb)

    # unchanged re-delivery is a no-op (idempotent)
    before = len(ix.manifest())
    e2 = ix.upsert_batch(corpus.filter("doc_id % 25 = 1"), "redeliver")
    assert e2["n_docs"] == 0
    assert len(ix.manifest()) == before + 1

    # after compaction: exact match with a fresh build over updated corpus
    merged = merge_segments(ix)
    updated_docs = corpus.filter("doc_id % 25 != 0").unionByName(
        edited_raw.withColumn(
            "doc_id", F.col("doc_id") + IncrementalIndexer.GEN_STRIDE
        )
    )
    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk(
            updated_docs, ["the", "data"], k=10
        ).collect()
    ]
    got = _topk(merged, ("the", "data"))
    assert got == want


def test_upsert_redeliver_after_edit_is_noop(spark, corpus, tmp_path):
    """At-least-once redelivery of the CURRENT text of an already-edited
    url must be a no-op: the sha comparison has to run against the latest
    LIVE generation, not the tombstoned gen-0 row (whose sha differs and
    would re-add gen0+GEN_STRIDE — colliding with the live gen-1 id)."""
    from pyspark.sql import functions as F

    ix = IncrementalIndexer(spark, str(tmp_path / "ix"), n_doc_parts=4)
    ix.ingest_batch(corpus, "initial")
    edited = (
        corpus.filter("doc_id % 25 = 0")
        .withColumn("text", F.lit("freshedit marker content only"))
    )
    e1 = ix.upsert_batch(edited, "edit1")
    assert e1["n_tombstones"] > 0
    live_before = sorted(
        r["doc_id"] for r in ix.as_index()["doc_map"].collect()
    )
    # redeliver the same edited batch under a NEW batch_id (at-least-once
    # delivery, not the batch-id dedup path)
    e2 = ix.upsert_batch(edited, "edit1_redelivered")
    assert e2["n_docs"] == 0 and not e2.get("n_tombstones")
    live_after = sorted(
        r["doc_id"] for r in ix.as_index()["doc_map"].collect()
    )
    assert live_after == live_before  # no duplicate/new generations
    assert len(live_after) == len(set(live_after))
    # scores unaffected: exactly one generation contributes per url
    hits = wand_topk(ix.as_index(), ["freshedit"], k=1000).collect()
    assert len(hits) == e1["n_tombstones"]


def test_streaming_upsert_edited_docs(spark, corpus, tmp_path):
    """Streaming MessageEdited path: a later file re-delivering edited urls
    is discovered by the file source's checkpoint and routed through
    upsert_batch — old generations tombstoned, new ones searchable."""
    from pyspark.sql import functions as F

    cpath = str(tmp_path / "scorpus")
    ckpt = str(tmp_path / "sckpt")
    corpus.coalesce(1).write.parquet(cpath)
    ix = IncrementalIndexer(spark, str(tmp_path / "six"), n_doc_parts=4)
    stream_ingest_availablenow(spark, cpath, ix, ckpt, upsert=True)
    n0 = ix.as_index()["doc_map"].count()
    assert n0 == corpus.count()

    # second delivery: a new file in the SAME dir with edited text for a
    # few urls; the checkpoint ensures only the new file is processed
    edited = corpus.filter("doc_id % 11 = 0").withColumn(
        "text", F.concat(F.col("text"), F.lit(" streamed edit token"))
    )
    edited.coalesce(1).write.mode("append").parquet(cpath)
    stream_ingest_availablenow(spark, cpath, ix, ckpt, upsert=True)

    n_edits = edited.count()
    assert len(ix.tombstones()) == n_edits
    idx = ix.as_index()
    assert idx["doc_map"].count() == n0  # replaced, not duplicated
    live = {r["doc_id"] for r in idx["doc_map"].collect()}
    for r in edited.select("doc_id").collect():
        assert r["doc_id"] not in live
        assert r["doc_id"] + IncrementalIndexer.GEN_STRIDE in live


def test_segment_doc_stores_serve_point_reads(spark, corpus, tmp_path):
    """doc_store=True: every segment writes a stored-fields store; the
    multi-dir driver-local fetch serves docs from any segment, and
    as_index exposes the store list so local highlight/mlt work over the
    segmented view."""
    from telegram2elastic_spark.query.docstore import fetch_docs_local

    ix = IncrementalIndexer(
        spark, str(tmp_path / "ix"), n_doc_parts=4, doc_store=True
    )
    ix.ingest_batch(corpus.filter("doc_id % 2 = 0"), "even")
    ix.ingest_batch(corpus.filter("doc_id % 2 = 1"), "odd")
    dirs = ix.doc_store_dirs()
    assert len(dirs) == 2
    rows = fetch_docs_local(dirs, [0, 1, 7])  # ids span both segments
    want = {
        r["doc_id"]: r["text"]
        for r in corpus.filter("doc_id in (0, 1, 7)").collect()
    }
    assert {d: r["text"] for d, r in rows.items()} == want
    assert ix.as_index().get("_doc_store_dir") == dirs


def test_compaction_carries_doc_store_and_drops_tombstoned(
    spark, corpus, tmp_path
):
    """Compaction rewrites the union of input stores into the new segment
    (absorbed dirs get vacuumed), minus tombstoned generations; point
    reads keep working and serve the EDITED text."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.query.docstore import fetch_docs_local
    from telegram2elastic_spark.streaming.ingest import IncrementalIndexer

    ix = IncrementalIndexer(
        spark, str(tmp_path / "ix"), n_doc_parts=4, doc_store=True
    )
    ix.ingest_batch(corpus, "initial")
    edited_raw = (
        corpus.filter("doc_id % 25 = 0")
        .withColumn("text", F.lit("freshedit marker content only"))
        .withColumn(
            "html",
            F.concat(
                F.lit("<html><body><p>"), F.col("text"),
                F.lit("</p></body></html>"),
            ).cast("binary"),
        )
    )
    ix.upsert_batch(edited_raw, "edit")
    seg_ids = [e["segment_id"] for e in ix.manifest()]
    ix.compact(seg_ids)
    ix.vacuum()
    dirs = ix.doc_store_dirs()
    assert len(dirs) == 1  # one compacted segment, store carried forward
    live = {r["doc_id"] for r in ix.as_index()["doc_map"].select("doc_id").collect()}
    # the edited doc's live generation serves the NEW text
    gen = next(d for d in live if d >= IncrementalIndexer.GEN_STRIDE)
    rows = fetch_docs_local(dirs, [gen, 0])
    assert rows[gen]["text"] == "freshedit marker content only"
    # doc 0's original generation was tombstoned -> physically dropped
    assert 0 not in rows
