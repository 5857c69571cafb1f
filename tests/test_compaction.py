"""Segment-count stress + size-tiered auto-compaction (Lucene
TieredMergePolicy shape): many micro-batches must stay rank-identical
through physical compaction, with bounded postings fan-out, idempotent
replay, and correct tombstone carry-forward."""

import pytest
from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query.wand import wand_topk
from telegram2elastic_spark.streaming.ingest import IncrementalIndexer

N_BATCHES = 24
BATCH = 20  # docs per micro-batch


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


@pytest.fixture(scope="module")
def stressed(spark, sf_dir, tmp_path_factory):
    corpus = load_corpus(spark, sf_dir).filter(
        F.col("doc_id") < N_BATCHES * BATCH
    ).cache()
    ix = IncrementalIndexer(
        spark, str(tmp_path_factory.mktemp("stress")), n_doc_parts=4
    )
    for i in range(N_BATCHES):
        lo, hi = i * BATCH, (i + 1) * BATCH
        ix.ingest_batch(
            corpus.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)),
            batch_id=f"b{i}",
        )
    return ix, corpus


def test_stress_many_segments_then_tiered_compaction(stressed):
    ix, corpus = stressed
    assert len(ix.manifest()) == N_BATCHES
    before = _rows(wand_topk(ix.as_index(), ["spark", "merge"], k=10))

    entries = ix.maybe_compact(max_per_tier=3, tier_factor=4)
    assert entries, "policy must trigger on 24 same-tier segments"
    n_after = len(ix.manifest())
    # bounded fan-out: far fewer segment dirs than micro-batches
    assert n_after <= 6, ix.manifest()
    after = _rows(wand_topk(ix.as_index(), ["spark", "merge"], k=10))
    assert after == before

    # total doc count preserved, no duplicates
    assert ix.as_index()["doc_map"].count() == corpus.count()
    # policy is stable: a second pass does nothing
    assert ix.maybe_compact(max_per_tier=3, tier_factor=4) == []


def test_compaction_keeps_replay_idempotent(stressed):
    ix, corpus = stressed
    # every original batch id is still covered after its segment was merged
    covered = ix.committed_batches()
    assert {f"b{i}" for i in range(N_BATCHES)} <= covered
    n_before = ix.as_index()["doc_map"].count()
    assert ix.ingest_batch(corpus.limit(5), "b0") is None  # replay no-op
    assert ix.as_index()["doc_map"].count() == n_before


@pytest.mark.quick  # the auto-pick would land on the 50s stress fixture
def test_compaction_resolves_tombstones_and_exact_stats(spark, sf_dir, tmp_path):
    """Upsert -> stale df window -> full compaction must physically drop
    tombstoned postings and restore EXACT (df, cf) — equal to a one-shot
    rebuild over the edited corpus."""
    corpus = load_corpus(spark, sf_dir).filter("doc_id < 100")
    ix = IncrementalIndexer(spark, str(tmp_path / "tix"), n_doc_parts=4)
    ix.ingest_batch(corpus.filter("doc_id < 50"), "b0")
    ix.ingest_batch(corpus.filter("doc_id >= 50"), "b1")
    edited = corpus.filter("doc_id % 9 = 0").withColumn(
        "text", F.concat(F.col("text"), F.lit(" fresh edit words"))
    )
    ix.upsert_batch(edited, "b2")
    assert ix.tombstones()  # stale window open

    entry = ix.compact([e["segment_id"] for e in ix.manifest()])
    assert entry is not None
    assert len(ix.manifest()) == 1
    assert ix.tombstones() == []  # physically resolved

    # exact parity with a one-shot build over the edited corpus
    edited_corpus = corpus.filter("doc_id % 9 != 0").unionByName(
        edited.withColumn(
            "doc_id", F.col("doc_id") + IncrementalIndexer.GEN_STRIDE
        )
    )
    want = build_index(edited_corpus, n_doc_parts=4)
    got = ix.as_index()
    td_got = {
        (r["term"], r["df"], r["cf"]) for r in got["term_dict"].collect()
    }
    td_want = {
        (r["term"], r["df"], r["cf"]) for r in want["term_dict"].collect()
    }
    assert td_got == td_want
    assert _rows(wand_topk(got, ["spark", "merge"], k=10)) == _rows(
        wand_topk(want, ["spark", "merge"], k=10)
    )


def test_partial_compaction_carries_tombstones_forward(spark, sf_dir, tmp_path):
    """Compacting segments that HOLD a tombstone but not the segment the
    tombstone points into must keep the delete visible (carry-forward)."""
    corpus = load_corpus(spark, sf_dir).filter("doc_id < 100")
    ix = IncrementalIndexer(spark, str(tmp_path / "cix"), n_doc_parts=4)
    ix.ingest_batch(corpus.filter("doc_id < 50"), "b0")     # seg 0
    ix.ingest_batch(corpus.filter("doc_id >= 50"), "b1")    # seg 1
    edited = corpus.filter("doc_id = 10").withColumn(
        "text", F.lit("rewritten content")
    )
    ix.upsert_batch(edited, "b2")                           # seg 2, tomb {10}

    # merge seg1+seg2 (doc 10 lives in seg0, outside the set)
    entry = ix.compact([1, 2])
    assert entry is not None and entry.get("n_tombstones") == 1
    idx = ix.as_index()
    assert idx["doc_map"].filter("doc_id = 10").count() == 0
    live = {r["doc_id"] for r in idx["doc_map"].collect()}
    assert 10 + IncrementalIndexer.GEN_STRIDE in live
    # full compaction afterwards resolves it
    ix.compact([e["segment_id"] for e in ix.manifest()])
    assert ix.tombstones() == []
    assert ix.as_index()["doc_map"].filter("doc_id = 10").count() == 0


def test_snapshot_isolation_and_time_travel(spark, sf_dir, tmp_path):
    """Iceberg-style read isolation: a pre-compaction as_index() snapshot
    (or a pinned manifest version) keeps answering identically after
    compaction, because absorbed dirs are reclaimed only by vacuum()."""
    corpus = load_corpus(spark, sf_dir).filter("doc_id < 100")
    ix = IncrementalIndexer(spark, str(tmp_path / "vix"), n_doc_parts=4)
    ix.ingest_batch(corpus.filter("doc_id < 50"), "b0")    # version 0
    ix.ingest_batch(corpus.filter("doc_id >= 50"), "b1")   # version 1

    snap = ix.as_index()  # live pre-compaction view
    before = _rows(wand_topk(snap, ["spark", "merge"], k=10))

    ix.compact([e["segment_id"] for e in ix.manifest()])   # version 2
    assert len(ix.manifest()) == 1
    # the old snapshot still works (absorbed dirs not deleted)
    assert _rows(wand_topk(snap, ["the"], k=5))  # further queries fine
    # time travel to the pinned pre-compaction version
    tt = ix.as_index(version=1)
    assert _rows(wand_topk(tt, ["spark", "merge"], k=10)) == before
    # and the compacted current view agrees
    assert _rows(wand_topk(ix.as_index(), ["spark", "merge"], k=10)) == before

    # vacuum reclaims: old seg dirs + old version files go away
    deleted = ix.vacuum(retain_versions=1)
    assert len(deleted) == 2, deleted
    assert ix.versions() == [2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not found"):
        ix.manifest(version=1)
    # current view unaffected by vacuum
    assert _rows(wand_topk(ix.as_index(), ["spark", "merge"], k=10)) == before


def test_fsck_detects_corruption(spark, sf_dir, tmp_path):
    """Per-partition lineage + counters are load-bearing: fsck validates
    the on-disk index against them and pinpoints damage."""
    import shutil

    corpus = load_corpus(spark, sf_dir).filter("doc_id < 60")
    ix = IncrementalIndexer(spark, str(tmp_path / "fix"), n_doc_parts=4)
    ix.ingest_batch(corpus.filter("doc_id < 30"), "b0")
    ix.ingest_batch(corpus.filter("doc_id >= 30"), "b1")
    assert ix.fsck() == []  # healthy

    # wound 1: drop a whole table of seg 1
    shutil.rmtree(tmp_path / "fix" / "seg_000001" / "term_dict")
    # wound 2: delete a posting parquet part-file of seg 0 (lineage catches)
    import glob as _glob
    import os as _os

    parts = _glob.glob(str(tmp_path / "fix" / "seg_000000" / "postings" / "part-*"))
    _os.unlink(parts[0])

    problems = ix.fsck()
    assert any("seg 1: table term_dict missing" in p for p in problems), problems
    assert any(p.startswith("seg 0:") for p in problems), problems


def test_concurrent_reader_during_compaction(spark, sf_dir, tmp_path):
    """Snapshot isolation under REAL concurrency: a reader pinned to a
    pre-compaction manifest version keeps getting identical results while
    compact() runs in another thread (Spark local supports concurrent
    jobs), and the post-swap latest index is rank-identical too."""
    import threading

    corpus = load_corpus(spark, sf_dir)
    ix = IncrementalIndexer(spark, str(tmp_path / "cix"), n_doc_parts=4)
    for i in range(4):
        ix.ingest_batch(corpus.filter(F.col("doc_id") % 4 == i), f"b{i}")
    pinned_v = ix.versions()[-1]
    seg_ids = [e["segment_id"] for e in ix.manifest()]

    def q(idx):
        return [
            (r["doc_id"], r["score"])
            for r in wand_topk(idx, ["the", "data"], k=10).collect()
        ]

    want = q(ix.as_index(version=pinned_v))
    results: list = []
    errors: list = []
    done = threading.Event()

    def reader():
        while not done.is_set():
            try:
                results.append(q(ix.as_index(version=pinned_v)))
            except Exception as exc:  # pragma: no cover - failure path
                errors.append(exc)
                return

    t = threading.Thread(target=reader)
    t.start()
    try:
        entry = ix.compact(seg_ids)
    finally:
        done.set()
        t.join(timeout=120)
    assert entry is not None
    assert not errors, errors
    assert results, "reader thread never completed a query"
    assert all(r == want for r in results)
    # pinned snapshot still readable AFTER the swap (absorbed dirs remain
    # until vacuum), and the compacted latest is rank-identical
    assert q(ix.as_index(version=pinned_v)) == want
    assert q(ix.as_index()) == want
    assert len(ix.manifest()) == 1


class TestPointInTime:
    """ES _pit: paged search_after consistency under concurrent writes."""

    def test_paged_consistency_across_upserts(self, spark, sf_dir, tmp_path):
        from telegram2elastic_spark.streaming.ingest import open_pit

        corpus = load_corpus(spark, sf_dir).filter("doc_id < 120")
        ix = IncrementalIndexer(spark, str(tmp_path / "pit1"), n_doc_parts=4)
        ix.ingest_batch(corpus, "b0")

        pit = open_pit(ix)
        page1 = _rows(pit.search(["spark", "merge"], k=5))
        assert page1

        # concurrent write: edit SOME of the matching docs (text change ->
        # tombstone + new generation), landing AFTER the PIT was opened
        edited_ids = [d for d, _ in page1[:2]]
        edits = corpus.filter(
            F.col("doc_id").isin(edited_ids)
        ).withColumn("text", F.lit("nothing relevant anymore"))
        ix.upsert_batch(edits, "edit1")

        # page 2 through the PIT: the world is still the open-time one —
        # identical to paging a never-written index
        cur = (page1[-1][1], page1[-1][0])
        page2 = _rows(pit.search(["spark", "merge"], k=5, after=cur))
        frozen = ix.as_index(version=pit.version)
        want = _rows(wand_topk(frozen, ["spark", "merge"], k=10))
        assert page1 + page2 == want

        # the LIVE index disagrees (edits visible): PIT was load-bearing
        live = _rows(wand_topk(ix.as_index(), ["spark", "merge"], k=10))
        assert live != want
        assert all(d not in {r[0] for r in live} for d in edited_ids)

    def test_expiry_and_close(self, spark, sf_dir, tmp_path):
        from telegram2elastic_spark.streaming.ingest import open_pit

        corpus = load_corpus(spark, sf_dir).filter("doc_id < 60")
        ix = IncrementalIndexer(spark, str(tmp_path / "pit2"), n_doc_parts=4)
        ix.ingest_batch(corpus.filter("doc_id < 30"), "b0")
        pit = open_pit(ix)
        assert pit.pit_id == "pit_v0"

        # keep_alive expiry: later commits + vacuum reclaim the snapshot
        ix.ingest_batch(corpus.filter("doc_id >= 30"), "b1")
        ix.compact([e["segment_id"] for e in ix.manifest()])
        ix.vacuum(retain_versions=1)
        with pytest.raises(ValueError, match="not found"):
            pit.search(["the"], k=3).collect()

        # close() invalidates explicitly
        pit2 = open_pit(ix)
        pit2.close()
        with pytest.raises(ValueError, match="closed"):
            pit2.search(["the"], k=3)

    def test_open_requires_commit(self, spark, tmp_path):
        from telegram2elastic_spark.streaming.ingest import open_pit

        ix = IncrementalIndexer(spark, str(tmp_path / "pit3"), n_doc_parts=4)
        with pytest.raises(ValueError, match="no committed snapshot"):
            open_pit(ix)


class TestSnapshotRestore:
    """ES _snapshot/_restore over the segmented index."""

    def test_roundtrip_rank_identity(self, spark, sf_dir, tmp_path):
        from telegram2elastic_spark.index.snapshot import (
            restore_index, snapshot_index,
        )

        corpus = load_corpus(spark, sf_dir).filter("doc_id < 120")
        ix = IncrementalIndexer(spark, str(tmp_path / "src"), n_doc_parts=4)
        ix.ingest_batch(corpus.filter("doc_id < 60"), "b0")
        ix.ingest_batch(corpus.filter("doc_id >= 60"), "b1")
        want = _rows(wand_topk(ix.as_index(), ["spark", "merge"], k=10))

        info = snapshot_index(ix, str(tmp_path / "snap"))
        assert info["n_segments"] == 2

        # writes landing AFTER the snapshot must not leak into the restore
        ix.ingest_batch(
            corpus.limit(5).withColumn("text", F.lit("spark merge " * 30))
            .withColumn("url", F.concat(F.lit("https://late/"), "doc_id")),
            "late",
        )

        rx = restore_index(spark, str(tmp_path / "snap"),
                           str(tmp_path / "restored"))
        assert rx.n_doc_parts == 4
        got = _rows(wand_topk(rx.as_index(), ["spark", "merge"], k=10))
        assert got == want
        # the restored index is independently writable
        rx.ingest_batch(
            corpus.limit(3).withColumn("url",
                                       F.concat(F.lit("https://new/"),
                                                "doc_id")),
            "post-restore",
        )
        assert len(rx.manifest()) == 3

    def test_guards(self, spark, sf_dir, tmp_path):
        from telegram2elastic_spark.index.snapshot import (
            restore_index, snapshot_index,
        )

        empty = IncrementalIndexer(spark, str(tmp_path / "e"), n_doc_parts=4)
        with pytest.raises(ValueError, match="nothing committed"):
            snapshot_index(empty, str(tmp_path / "esnap"))
        with pytest.raises(ValueError, match="torn snapshot|no manifest"):
            restore_index(spark, str(tmp_path / "nowhere"),
                          str(tmp_path / "t1"))
        # non-empty restore target refused
        corpus = load_corpus(spark, sf_dir).filter("doc_id < 30")
        ix = IncrementalIndexer(spark, str(tmp_path / "s2"), n_doc_parts=4)
        ix.ingest_batch(corpus, "b0")
        snapshot_index(ix, str(tmp_path / "snap2"))
        tgt = tmp_path / "t2"
        tgt.mkdir()
        (tgt / "junk").write_text("x")
        with pytest.raises(ValueError, match="not empty"):
            restore_index(spark, str(tmp_path / "snap2"), str(tgt))
