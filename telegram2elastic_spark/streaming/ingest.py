"""Micro-batch incremental indexing: segments, manifest checkpoint, resume.

Mirrors the reference's realtime-append semantics:
  * micro-batches <- periodic_import's sliding re-import window
    (telegram2elastic.py:537-560); overlapping windows are idempotent here
    via an anti-join on url against the already-indexed doc_map — the
    analogue of ES upsert-by-id (output/elasticsearch.py:33) and the poc's
    message_exists dedup (poc/src/core/telegram_client.py:162-178, F5).
  * each committed micro-batch is a **segment** (own doc_map / term_dict /
    postings / stats parquet dirs) — the per-day ES indices analogue
    (output/elasticsearch.py:10), keyed by batch instead of day.
  * a JSON **manifest** is the checkpoint: a segment exists iff its row is
    in the manifest, and the manifest is replaced atomically (tmp+rename),
    so a crash between segment write and manifest commit leaves only an
    orphan directory that the deterministic re-build simply overwrites —
    kill-and-resume reprocesses exactly the uncommitted batches
    (north_rule "resumable from checkpoint").
  * per-partition lineage + counters: every segment stores per-salt doc /
    posting-block counts (lineage parquet), the distributed analogue of the
    reference's archive counters (telegram_client.py:392-396).
  * merge_segments compacts via a sorted merge per (term, salt): per-segment
    runs are already doc_id-sorted and doc-disjoint, so the merge is a
    vectorized merge of sorted runs, re-blocked and re-encoded
    (north_star "sorted-merge segment-merge step").

Query across segments needs no merge: segments have disjoint doc sets, so
posting cursors from different segments are just extra partial postings and
global stats (N, avgdl, df) are recomputed from the unions — wand.wand_topk
consumes the combined view unchanged.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.build import DEFAULT_DOC_PARTS, POSTINGS_SCHEMA, build_index
from ..index.codec import BLOCK_SIZE, decode_block, encode_blocks


class IncrementalIndexer:
    """Segment-per-micro-batch index at `base_dir`."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        n_doc_parts: int = DEFAULT_DOC_PARTS,
        positions: bool = False,
        doc_store: bool = False,
    ):
        """`positions=True` builds every segment with positional postings
        (codec pos_bytes), enabling phrase queries over the combined
        segmented view and across upserts/compactions (the sorted-merge
        kernel preserves positions when all inputs carry them).
        `doc_store=True` additionally writes each segment's stored-fields
        store (index/build.py:write_doc_store) inside the segment dir
        before the manifest commit, so driver-local point reads
        (query/docstore.py) serve realtime-ingested docs too — stores
        become visible atomically with their postings."""
        self.spark = spark
        self.base_dir = base_dir
        self.n_doc_parts = n_doc_parts
        self.positions = positions
        self.doc_store = doc_store
        os.makedirs(base_dir, exist_ok=True)

    # --- manifest (the checkpoint; versioned, Iceberg-snapshot style) ---
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.base_dir, "manifest.json")

    def _version_path(self, v: int) -> str:
        return os.path.join(self.base_dir, f"manifest.v{v:06d}.json")

    def versions(self) -> list[int]:
        """Committed manifest snapshot versions (ascending) still on disk."""
        import re

        out = []
        for name in os.listdir(self.base_dir):
            m = re.fullmatch(r"manifest\.v(\d{6})\.json", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def manifest(self, version: int | None = None) -> list[dict]:
        """Current manifest, or a historical snapshot (time travel) when
        `version` names a retained snapshot (see versions()/vacuum())."""
        path = (
            self._manifest_path if version is None else self._version_path(version)
        )
        if not os.path.exists(path):
            if version is not None:
                raise ValueError(
                    f"manifest version {version} not found "
                    f"(retained: {self.versions()})"
                )
            return []
        with open(path) as f:
            return json.load(f)

    def _commit_manifest(self, entries: list[dict]) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.base_dir, suffix=".manifest")
        with os.fdopen(fd, "w") as f:
            json.dump(entries, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic commit point
        # snapshot AFTER the commit (a crash here just loses the historical
        # copy, never the truth); versions enable time travel + safe vacuum
        vs = self.versions()
        next_v = (vs[-1] + 1) if vs else 0
        import shutil

        shutil.copyfile(self._manifest_path, self._version_path(next_v))

    def committed_batches(self) -> set[str]:
        """Batch ids covered by committed segments — compacted segments
        carry the batch_ids of everything they absorbed, so replay of an
        already-ingested (then compacted) batch stays a no-op."""
        out = set()
        for e in self.manifest():
            out.add(e["batch_id"])
            out.update(e.get("batch_ids", []))
        return out

    def _next_seg_id(self) -> int:
        m = self.manifest()
        return 1 + max((e["segment_id"] for e in m), default=-1)

    # --- ingest ---------------------------------------------------------
    def _seg_dir(self, segment_id: int) -> str:
        return os.path.join(self.base_dir, f"seg_{segment_id:06d}")

    def ingest_batch(self, batch_corpus: DataFrame, batch_id: str) -> dict | None:
        """Index one micro-batch into a new segment; idempotent on batch_id
        and on url (re-delivered docs are dropped by the anti-join)."""
        if batch_id in self.committed_batches():
            return None  # checkpoint says done — replay is a no-op
        existing = self.doc_map_union()
        if existing is not None:
            # MERGE ... WHEN NOT MATCHED semantics keyed on url (K1/F5):
            # left anti join against the indexed doc_map.
            batch_corpus = batch_corpus.join(
                existing.select("url"), "url", "left_anti"
            )
        return self._write_segment(batch_corpus, batch_id)

    def _write_segment(
        self,
        batch_corpus: DataFrame,
        batch_id: str,
        tombstones: DataFrame | None = None,
    ) -> dict:
        """Write one segment's tables (+ optional tombstones) and THEN commit
        the manifest — the manifest replace is the single atomic commit
        point, so a crash at any earlier step leaves only an orphan segment
        dir that replay overwrites; there is no window where a batch is
        committed with its tombstones missing."""
        seg_id = self._next_seg_id()
        seg_dir = self._seg_dir(seg_id)
        idx = build_index(
            batch_corpus,
            n_doc_parts=self.n_doc_parts,
            positions=self.positions,
        )
        # text_sha lets upsert_batch detect edited docs without re-reading
        # the indexed text (content addressing, s3_client.py:120-127)
        idx["doc_map"] = idx["doc_map"].join(
            batch_corpus.select(
                "doc_id", F.sha2(F.col("text"), 256).alias("text_sha")
            ),
            "doc_id",
        )
        # The segment's tables are independent jobs over the persisted
        # build frames — submit them concurrently (guide §2.6, same shape
        # as index.build.write_index) instead of 6+ sequential actions
        # per micro-batch; lineage/counters chain INSIDE their branch so
        # they read their table only after it is written.  Shared cached
        # frames are materialized once up front so concurrent branches
        # never duplicate the tokenize/tf compute.
        from concurrent.futures import ThreadPoolExecutor

        # materialize only the frame two branches share (tf feeds the
        # term_dict AND postings writes); dm/td each have a single
        # consumer branch here, so their persisted frames materialize
        # lazily inside that branch with no duplicate-compute risk —
        # two fewer Spark actions per micro-batch
        tf = idx.get("_tf")
        if tf is not None:
            tf.count()

        def _w_postings():
            idx["postings"].write.mode("overwrite").parquet(
                f"{seg_dir}/postings"
            )
            # per-partition lineage + counters (north_rule)
            (
                self.spark.read.parquet(f"{seg_dir}/postings")
                .groupBy("salt")
                .agg(
                    F.count(F.lit(1)).alias("n_blocks"),
                    F.sum("n_docs").alias("n_postings"),
                )
                .withColumn("segment_id", F.lit(seg_id))
                .write.mode("overwrite")
                .parquet(f"{seg_dir}/lineage")
            )

        def _w_doc_map():
            idx["doc_map"].write.mode("overwrite").parquet(
                f"{seg_dir}/doc_map"
            )
            return (
                self.spark.read.parquet(f"{seg_dir}/doc_map")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.min(F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("min_ts"),
                    F.max(F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("max_ts"),
                )
                .first()
            )

        def _w_term_dict():
            idx["term_dict"].write.mode("overwrite").parquet(
                f"{seg_dir}/term_dict"
            )

        def _w_doc_store():
            # stored fields for driver-local point reads; inside the
            # segment dir so the store commits atomically with the
            # postings (segment row groups are small — a batch's docs)
            from ..index.build import write_doc_store

            write_doc_store(
                batch_corpus, seg_dir, n_files=min(8, self.n_doc_parts)
            )

        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [
                pool.submit(_w_postings),
                pool.submit(_w_term_dict),
            ]
            if self.doc_store:
                futs.append(pool.submit(_w_doc_store))
            f_dm = pool.submit(_w_doc_map)
            counters = f_dm.result()
            for f in futs:
                f.result()  # any failure aborts BEFORE the manifest commit
        # the build frames were persisted by build_index for the fan-out
        # above; release them or a long-lived streaming indexer leaks
        # three cached frames per micro-batch
        for df in idx.get("_cached", []):
            df.unpersist()
        entry = {
            "segment_id": seg_id,
            "batch_id": batch_id,
            "n_docs": counters["n_docs"],
            "min_ts": counters["min_ts"],
            "max_ts": counters["max_ts"],
            "status": "committed",
        }
        if tombstones is not None:
            # written INSIDE the segment dir before the manifest commit —
            # tombstones and postings become visible atomically together
            tombstones.write.mode("overwrite").parquet(f"{seg_dir}/tombstones")
            n_tomb = self.spark.read.parquet(f"{seg_dir}/tombstones").count()
            if n_tomb:
                entry["n_tombstones"] = n_tomb
        self._commit_manifest([*self.manifest(), entry])
        return entry

    GEN_STRIDE = 1 << 40  # internal doc-id generation offset for edits

    def upsert_batch(self, batch_corpus: DataFrame, batch_id: str) -> dict | None:
        """Edited-document upsert (MessageEdited path, telegram2elastic.py
        :530-533; ES upsert-by-id elasticsearch.py:33): docs whose url is
        already indexed but whose text changed get a NEW internal doc_id
        (old_id + GEN_STRIDE) in a fresh segment, and the old internal id is
        tombstoned.  Lucene-style semantics: postings of tombstoned ids are
        filtered at query time and physically dropped at the next
        merge_segments compaction; term df stays slightly stale until merge
        (exactly Lucene's deleted-docs-count-toward-df behavior), while
        N/avgdl are exact (as_index excludes tombstoned doc_map rows).
        Unchanged urls are dropped (idempotent re-delivery); brand-new urls
        are appended normally."""
        if batch_id in self.committed_batches():
            return None
        existing = self.doc_map_union()
        if existing is None:
            return self.ingest_batch(batch_corpus, batch_id)
        # Compare against the latest LIVE generation only: after an edit the
        # gen-0 doc_map row is tombstoned but still physically present until
        # compaction; matching it would re-add gen0+GEN_STRIDE on redelivery
        # of unchanged text — colliding with the live gen-1 id and breaking
        # the segments-hold-disjoint-doc-sets invariant.
        tomb = self.tombstones_df()
        if tomb is not None:
            existing = existing.join(tomb, "doc_id", "left_anti")
        prev = existing.select(
            F.col("url").alias("e_url"),
            F.col("doc_id").alias("old_doc_id"),
            F.col("text_sha").alias("e_sha"),
        )
        joined = batch_corpus.withColumn(
            "new_sha", F.sha2(F.col("text"), 256)
        ).join(prev, F.col("url") == F.col("e_url"), "left")
        fresh = joined.filter(F.col("e_url").isNull()).drop(
            "e_url", "old_doc_id", "e_sha", "new_sha"
        )
        edited = joined.filter(
            F.col("e_url").isNotNull() & (F.col("new_sha") != F.col("e_sha"))
        )
        # tombstone ids stay a DataFrame end-to-end (no driver collect);
        # _write_segment persists them inside the segment dir before the
        # atomic manifest commit
        tomb_df = edited.select(F.col("old_doc_id").alias("doc_id"))
        re_added = edited.withColumn(
            "doc_id", F.col("old_doc_id") + F.lit(self.GEN_STRIDE)
        ).drop("e_url", "old_doc_id", "e_sha", "new_sha")
        return self._write_segment(
            fresh.unionByName(re_added), batch_id, tombstones=tomb_df
        )

    def _tombstone_dirs(self, version: int | None = None) -> list[str]:
        return [
            p
            for e in self.manifest(version)
            if e.get("n_tombstones")
            for p in [os.path.join(self._seg_dir(e["segment_id"]), "tombstones")]
            if os.path.exists(p)
        ]

    def tombstones_df(self, version: int | None = None) -> DataFrame | None:
        """All tombstoned internal doc ids as a DataFrame (executor-side);
        None when no committed segment carries tombstones (manifest
        metadata check — no Spark job)."""
        dirs = self._tombstone_dirs(version)
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs).select("doc_id")

    def tombstones(self) -> list[int]:
        """Driver-side list form (tests / small-scale inspection)."""
        df = self.tombstones_df()
        return [] if df is None else [r["doc_id"] for r in df.collect()]

    def ingest_by_day(
        self,
        corpus: DataFrame,
        days: list[str] | None = None,
        fmt: str = "yyyy-MM-dd",
    ) -> list[dict]:
        """Batch the corpus by time window of warc_ts — the reference's
        daily-index partitioning (fmt controls granularity; tests use
        hourly since the small corpus spans hours, production uses days) —
        and ingest each window as one micro-batch, skipping windows
        already committed (resume path)."""
        if days is None:
            days = [
                r["day"]
                for r in corpus.select(F.date_format("warc_ts", fmt).alias("day"))
                .distinct()
                .orderBy("day")
                .collect()
            ]
        out = []
        for day in days:
            e = self.ingest_batch(
                corpus.filter(F.date_format("warc_ts", fmt) == day),
                batch_id=f"day={day}",
            )
            if e:
                out.append(e)
        return out

    # --- physical compaction (Lucene-style tiered merges) -----------------
    def compact(self, segment_ids: list[int]) -> dict | None:
        """Physically merge the given committed segments into ONE new
        segment: sorted-merge of posting runs per (term, salt), tombstoned
        postings dropped, exact (df, cf) recomputed, doc_maps unioned minus
        tombstones.  The new manifest (chosen rows replaced by one entry)
        is committed atomically; absorbed dirs are deleted only afterwards,
        so a crash at any point leaves only invisible orphan dirs.

        The new entry carries the absorbed batch_ids (replay of an
        already-compacted batch stays a no-op) and carries forward any
        tombstones that target docs OUTSIDE the compacted set (still-live
        generations elsewhere)."""
        segment_ids = sorted(set(segment_ids))
        m = self.manifest()
        chosen = [e for e in m if e["segment_id"] in segment_ids]
        if len(chosen) < 2:
            return None
        dirs = [self._seg_dir(e["segment_id"]) for e in chosen]
        post = self.spark.read.parquet(*[f"{d}/postings" for d in dirs])
        dm = self.spark.read.parquet(*[f"{d}/doc_map" for d in dirs])
        # any committed tombstone (from ANY segment) may target these docs
        tomb_df = self.tombstones_df()

        new_id = self._next_seg_id()
        seg_dir = self._seg_dir(new_id)
        _merged_postings(post, tomb_df, self.n_doc_parts).write.mode(
            "overwrite"
        ).parquet(f"{seg_dir}/postings")
        written = self.spark.read.parquet(f"{seg_dir}/postings")
        if tomb_df is not None:
            dm = dm.join(tomb_df, "doc_id", "left_anti")
            td = _exact_term_dict(written)
        else:
            td = (
                self.spark.read.parquet(*[f"{d}/term_dict" for d in dirs])
                .groupBy("term")
                .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
            )
        # After the postings merge, the remaining segment tables are
        # independent jobs (td/lineage read the already-written postings;
        # dm/doc_store read the absorbed dirs) — overlap them like
        # _write_segment; any failure aborts before the manifest commit.
        from concurrent.futures import ThreadPoolExecutor

        def _w_doc_map():
            dm.write.mode("overwrite").parquet(f"{seg_dir}/doc_map")
            return (
                self.spark.read.parquet(f"{seg_dir}/doc_map")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.min(F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("min_ts"),
                    F.max(F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")).alias("max_ts"),
                )
                .first()
            )

        def _w_term_dict():
            td.write.mode("overwrite").parquet(f"{seg_dir}/term_dict")

        def _w_doc_store():
            # carry stored fields into the compacted segment (absorbed
            # dirs are vacuumed later): union of input stores minus
            # tombstoned generations, rewritten in the sorted layout
            store_dirs = [
                f"{d}/doc_store" for d in dirs
                if os.path.exists(f"{d}/doc_store")
            ]
            if not store_dirs:
                return
            from ..index.build import write_doc_store

            store = self.spark.read.parquet(*store_dirs)
            if tomb_df is not None:
                store = store.join(tomb_df, "doc_id", "left_anti")
            write_doc_store(
                store, seg_dir, n_files=min(8, self.n_doc_parts)
            )

        def _w_lineage():
            (
                written.groupBy("salt")
                .agg(
                    F.count(F.lit(1)).alias("n_blocks"),
                    F.sum("n_docs").alias("n_postings"),
                )
                .withColumn("segment_id", F.lit(new_id))
                .write.mode("overwrite")
                .parquet(f"{seg_dir}/lineage")
            )

        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [
                pool.submit(_w_term_dict),
                pool.submit(_w_doc_store),
                pool.submit(_w_lineage),
            ]
            counters = pool.submit(_w_doc_map).result()
            for f in futs:
                f.result()
        absorbed = sorted(
            {e["batch_id"] for e in chosen}
            | {b for e in chosen for b in e.get("batch_ids", [])}
        )
        entry = {
            "segment_id": new_id,
            "batch_id": f"compact={new_id}",
            "batch_ids": absorbed,
            "n_docs": counters["n_docs"],
            "min_ts": counters["min_ts"],
            "max_ts": counters["max_ts"],
            "status": "committed",
        }
        # carry forward tombstones still pointing at docs outside this set
        own_tombs = [
            f"{d}/tombstones"
            for d, e in zip(dirs, chosen)
            if e.get("n_tombstones") and os.path.exists(f"{d}/tombstones")
        ]
        if own_tombs:
            inside = self.spark.read.parquet(
                *[f"{d}/doc_map" for d in dirs]
            ).select("doc_id")
            remaining = (
                self.spark.read.parquet(*own_tombs)
                .select("doc_id")
                .join(inside, "doc_id", "left_anti")
            )
            remaining.write.mode("overwrite").parquet(f"{seg_dir}/tombstones")
            n_tomb = self.spark.read.parquet(f"{seg_dir}/tombstones").count()
            if n_tomb:
                entry["n_tombstones"] = n_tomb
        new_manifest = [
            e for e in m if e["segment_id"] not in segment_ids
        ] + [entry]
        self._commit_manifest(new_manifest)  # atomic swap point
        # Absorbed dirs are NOT deleted here: readers holding a pre-compact
        # as_index() snapshot (or a pinned manifest version) keep working —
        # Lucene/Iceberg snapshot isolation.  vacuum() reclaims them once
        # old snapshots are released.
        return entry

    def vacuum(self, retain_versions: int = 1) -> list[str]:
        """Garbage-collect segment dirs referenced by NO retained manifest
        snapshot, keeping the latest `retain_versions` versions (plus the
        current manifest, always).  Returns the deleted dirs.  Run when
        readers of older snapshots are known to be done — the Iceberg
        expire_snapshots analogue."""
        import re
        import shutil

        retain_versions = max(1, int(retain_versions))
        vs = self.versions()
        keep_versions = vs[-retain_versions:]
        live: set[int] = {e["segment_id"] for e in self.manifest()}
        for v in keep_versions:
            live |= {e["segment_id"] for e in self.manifest(v)}
        deleted = []
        for name in os.listdir(self.base_dir):
            m = re.fullmatch(r"seg_(\d{6})", name)
            if m and int(m.group(1)) not in live:
                path = os.path.join(self.base_dir, name)
                shutil.rmtree(path, ignore_errors=True)
                deleted.append(path)
        for v in vs[:-retain_versions]:
            os.unlink(self._version_path(v))
        return deleted

    def maybe_compact(
        self, max_per_tier: int = 8, tier_factor: int = 10
    ) -> list[dict]:
        """Size-tiered auto-compaction (Lucene TieredMergePolicy shape):
        bucket segments by floor(log_tier_factor(n_docs)); whenever a tier
        holds more than max_per_tier segments, merge that tier into one
        segment (usually promoting it a tier up).  Repeats until stable, so
        steady-state segment count stays O(max_per_tier * n_tiers) and the
        per-query postings fan-out is bounded no matter how many
        micro-batches were ingested."""
        import math

        out = []
        while True:
            tiers: dict[int, list[int]] = {}
            for e in self.manifest():
                t = int(math.log(max(e["n_docs"], 1), tier_factor))
                tiers.setdefault(t, []).append(e["segment_id"])
            todo = [ids for ids in tiers.values() if len(ids) > max_per_tier]
            if not todo:
                return out
            entry = self.compact(todo[0])
            if entry is None:  # defensive: nothing mergeable
                return out
            out.append(entry)

    # --- combined view ---------------------------------------------------
    def _read_all(self, name: str, version: int | None = None) -> DataFrame | None:
        dirs = [
            f"{self._seg_dir(e['segment_id'])}/{name}"
            for e in self.manifest(version)
        ]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def doc_map_union(self) -> DataFrame | None:
        return self._read_all("doc_map")

    def doc_store_dirs(self, version: int | None = None) -> list[str]:
        """Committed segments' stored-fields dirs (segments written with
        doc_store=True) — pass to query.docstore.fetch_docs_local for
        driver-local point reads over the whole segmented index.
        Tombstoned ids are never requested by callers (they fetch ids from
        ranked results over the live doc space); compaction drops their
        rows physically."""
        return [
            d
            for e in self.manifest(version)
            if os.path.exists(
                d := f"{self._seg_dir(e['segment_id'])}/doc_store"
            )
        ]

    def as_index(self, version: int | None = None) -> dict:
        """Combined index view over all committed segments — consumable by
        query.wand.wand_topk unchanged (disjoint doc spaces; per-segment
        posting runs act as partial postings).

        `version` pins a historical manifest snapshot (time travel): the
        returned view keeps working through later commits/compactions until
        vacuum() reclaims the snapshot's segment dirs — Iceberg read
        isolation semantics.

        Tombstoned (edited-away) internal doc ids are excluded from doc_map
        (exact N/avgdl) via an anti-join (executor-side — AQE broadcasts the
        small delete-set or shuffles at scale, never through the driver);
        the query kernels receive the delete-set per-salt via cogroup
        (query.wand._filters_df); postings are physically dropped at
        merge_segments.
        """
        tomb_df = self.tombstones_df(version)
        dm = self._read_all("doc_map", version)
        if tomb_df is not None:
            dm = dm.join(tomb_df, "doc_id", "left_anti")
        postings = self._read_all("postings", version)
        td = (
            self._read_all("term_dict", version)
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        )
        stats = dm.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
            F.sum("doc_len").alias("total_tokens"),
        )
        out = {
            "doc_map": dm,
            "term_dict": td,
            "postings": postings,
            "stats": stats,
            "_n_doc_parts": self.n_doc_parts,
            "_tombstones_df": tomb_df,
        }
        stores = self.doc_store_dirs(version)
        if stores:
            # driver-local point reads (query/docstore.py) work over the
            # segmented view exactly like over a single written index
            out["_doc_store_dir"] = stores
        return out

    def lineage(self) -> DataFrame | None:
        return self._read_all("lineage")

    def fsck(self) -> list[str]:
        """Integrity check of the on-disk index against the manifest and
        the per-segment lineage/counters the build recorded (this is what
        the north_rule's 'per-partition lineage + counters' exist FOR):

          * every committed segment dir + required tables present;
          * per-segment doc count == manifest n_docs (+ n_tombstones rows
            in the tombstone table when claimed);
          * per-salt posting-block counts == the lineage table written at
            build time (detects lost/truncated posting partitions).

        Returns a list of human-readable problems (empty = healthy)."""
        problems: list[str] = []
        for e in self.manifest():
            seg = e["segment_id"]
            d = self._seg_dir(seg)
            if not os.path.isdir(d):
                problems.append(f"seg {seg}: directory missing ({d})")
                continue
            for table in ("doc_map", "term_dict", "postings", "lineage"):
                if not os.path.isdir(os.path.join(d, table)):
                    problems.append(f"seg {seg}: table {table} missing")
            if problems and problems[-1].startswith(f"seg {seg}:"):
                if any(
                    p.startswith(f"seg {seg}: table") for p in problems
                ):
                    continue  # skip content checks on a broken layout
            try:
                n_docs = self.spark.read.parquet(f"{d}/doc_map").count()
                if n_docs != e["n_docs"]:
                    problems.append(
                        f"seg {seg}: doc_map has {n_docs} rows, "
                        f"manifest says {e['n_docs']}"
                    )
                if e.get("n_tombstones"):
                    nt = self.spark.read.parquet(f"{d}/tombstones").count()
                    if nt != e["n_tombstones"]:
                        problems.append(
                            f"seg {seg}: tombstones has {nt} rows, "
                            f"manifest says {e['n_tombstones']}"
                        )
                recorded = {
                    r["salt"]: (r["n_blocks"], r["n_postings"])
                    for r in self.spark.read.parquet(f"{d}/lineage").collect()
                }
                actual = {
                    r["salt"]: (r["n_blocks"], r["n_postings"])
                    for r in self.spark.read.parquet(f"{d}/postings")
                    .groupBy("salt")
                    .agg(
                        F.count(F.lit(1)).alias("n_blocks"),
                        F.sum("n_docs").alias("n_postings"),
                    )
                    .collect()
                }
                if recorded != actual:
                    bad = {
                        s
                        for s in set(recorded) | set(actual)
                        if recorded.get(s) != actual.get(s)
                    }
                    problems.append(
                        f"seg {seg}: posting lineage mismatch on salts "
                        f"{sorted(bad)}"
                    )
            except Exception as exc:  # unreadable parquet = corruption
                problems.append(f"seg {seg}: unreadable table ({exc})")
        return problems


def _empty_postings_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "term": pd.Series([], dtype="object"),
            "salt": pd.Series([], dtype="int32"),
            "block_id": pd.Series([], dtype="int32"),
            "n_docs": pd.Series([], dtype="int32"),
            "first_doc_id": pd.Series([], dtype="int64"),
            "last_doc_id": pd.Series([], dtype="int64"),
            "doc_gaps": pd.Series([], dtype="object"),
            "tf_bytes": pd.Series([], dtype="object"),
            "dl_bytes": pd.Series([], dtype="object"),
            "pos_bytes": pd.Series([], dtype="object"),
            "block_max_tf": pd.Series([], dtype="int32"),
        }
    )


def _merge_group(pdf: pd.DataFrame, tombstones: np.ndarray | None = None) -> pd.DataFrame:
    """Sorted-merge kernel: all posting blocks of one (term, salt) across
    segments -> decode runs -> drop tombstoned ids -> merge (runs are
    sorted + doc-disjoint) -> re-encode fresh blocks (norms travel with
    the postings).

    Positions: encode_positions/decode_positions recover posting boundaries
    from tf, so a tf>0 posting with zero stored positions would silently
    shift every later posting's positions.  Mixed inputs (some blocks
    positional, some not) therefore DROP positions for the whole merged
    group with a warning — phrase queries then fail fast on the merged
    index instead of returning corrupted matches."""
    import warnings

    from ..index.codec import decode_positions, varbyte_decode

    ids_runs, tf_runs, dl_runs, pos_runs = [], [], [], []
    n_with_pos = n_blocks = 0
    for gaps, tfb, dlb, posb in zip(
        pdf["doc_gaps"], pdf["tf_bytes"], pdf["dl_bytes"], pdf["pos_bytes"]
    ):
        i, t = decode_block(bytes(gaps), bytes(tfb))
        ids_runs.append(i)
        tf_runs.append(t)
        dl_runs.append(varbyte_decode(bytes(dlb)))
        n_blocks += 1
        pb = bytes(posb) if posb is not None else b""
        if pb:
            n_with_pos += 1
            pos_runs.extend(decode_positions(pb, t))
        else:
            pos_runs.extend([np.array([], dtype=np.uint64)] * i.size)
    has_pos = n_with_pos == n_blocks and n_blocks > 0
    if 0 < n_with_pos < n_blocks:
        warnings.warn(
            f"merge of term={pdf['term'].iloc[0]!r}: mixed positional/"
            "non-positional blocks — dropping positions for the merged group",
            stacklevel=2,
        )
    ids = np.concatenate(ids_runs)
    tfs = np.concatenate(tf_runs)
    dls = np.concatenate(dl_runs)
    if tombstones is not None and tombstones.size:
        keep = ~np.isin(ids.astype(np.int64), tombstones)
        if not keep.all():
            pos_runs = [p for p, k in zip(pos_runs, keep) if k]
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
        if ids.size == 0:
            return _empty_postings_pdf()
    order = np.argsort(ids, kind="mergesort")  # merge of sorted runs
    pos_lists = [pos_runs[i] for i in order] if has_pos else None
    ids, tfs, dls = ids[order], tfs[order], dls[order]
    term = pdf["term"].iloc[0]
    salt = int(pdf["salt"].iloc[0])
    return pd.DataFrame(
        [
            {
                "term": term,
                "salt": salt,
                "block_id": b["block_id"],
                "n_docs": b["n_docs"],
                "first_doc_id": b["first_doc_id"],
                "last_doc_id": b["last_doc_id"],
                "doc_gaps": b["doc_gaps"],
                "tf_bytes": b["tf_bytes"],
                "dl_bytes": b["dl_bytes"],
                "pos_bytes": b["pos_bytes"],
                "block_max_tf": b["block_max_tf"],
            }
            for b in encode_blocks(
                ids, tfs, BLOCK_SIZE, doc_lens=dls, positions=pos_lists
            )
        ]
    )


def merge_segments(indexer: IncrementalIndexer) -> dict:
    """Compact all committed segments into one logical index: sorted-merge
    of posting runs per (term, salt), physical drop of tombstoned postings,
    and exact term_dict recomputation (df/cf become exact again after the
    stale-until-merge window of upserts).

    Returns the merged in-memory index dict; equals a single-shot
    build_index over the (current) full corpus (tested).

    Tombstones are delivered to the merge kernels per-salt via cogroup
    (a tombstoned doc's postings live only in salt = pmod(doc_id, P)), so
    the delete-set never passes through the driver.  Without tombstones the
    merge groups on (term, salt) — full parallelism; with tombstones it
    cogroups on salt and iterates terms inside the kernel (parallelism = P,
    which production sizes to O(cluster cores))."""
    combined = indexer.as_index()
    tomb_df = combined.get("_tombstones_df")
    merged_postings = _merged_postings(
        combined["postings"], tomb_df, indexer.n_doc_parts
    )
    if tomb_df is not None:
        combined = {**combined, "term_dict": _exact_term_dict(merged_postings)}
    return {**combined, "postings": merged_postings, "_tombstones_df": None}


def _merged_postings(
    postings: DataFrame, tomb_df: DataFrame | None, n_doc_parts: int
) -> DataFrame:
    """Sorted-merge + tombstone-drop of posting blocks (shared by the
    logical merge_segments view and physical compaction)."""
    if tomb_df is None:
        return postings.groupBy("term", "salt").applyInPandas(
            lambda pdf: _merge_group(pdf), POSTINGS_SCHEMA
        )
    salted_tomb = tomb_df.withColumn(
        "salt", F.pmod(F.col("doc_id"), F.lit(n_doc_parts)).cast("int")
    )

    def cokernel(post_pdf: pd.DataFrame, tomb_pdf: pd.DataFrame) -> pd.DataFrame:
        tomb = np.sort(tomb_pdf["doc_id"].to_numpy(np.int64))
        outs = [
            _merge_group(g, tombstones=tomb)
            for _, g in post_pdf.groupby("term", sort=False)
        ]
        outs = [o for o in outs if len(o)]
        return pd.concat(outs, ignore_index=True) if outs else _empty_postings_pdf()

    return (
        postings.groupBy("salt")
        .cogroup(salted_tomb.groupBy("salt"))
        .applyInPandas(cokernel, POSTINGS_SCHEMA)
    )


def _exact_term_dict(merged_postings: DataFrame) -> DataFrame:
    """Exact (df, cf) recomputed from physically-compacted postings —
    closes the Lucene stale-df window after upserts."""

    def stats_kernel(batches):
        from ..index.codec import varbyte_decode as vd

        for pdf in batches:
            cfs = [int(vd(bytes(b)).sum()) for b in pdf["tf_bytes"]]
            yield pd.DataFrame(
                {"term": pdf["term"], "df_p": pdf["n_docs"], "cf_p": cfs}
            )

    return (
        merged_postings.mapInPandas(
            stats_kernel, "term string, df_p long, cf_p long"
        )
        .groupBy("term")
        .agg(F.sum("df_p").alias("df"), F.sum("cf_p").alias("cf"))
    )


def stream_ingest_availablenow(
    spark: SparkSession,
    corpus_path: str,
    indexer: IncrementalIndexer,
    checkpoint_dir: str,
    upsert: bool = False,
    auto_compact: bool = False,
) -> None:
    """Structured Streaming ingest (S3/S4/S5): file-source readStream over
    the corpus directory, Trigger.AvailableNow micro-batches, foreachBatch
    -> segment append.  Spark's checkpoint tracks source offsets (which
    files were consumed, catch_up analogue telegram2elastic.py:535); the
    manifest makes the sink side idempotent, giving end-to-end exactly-once
    segment commits.

    `upsert=True` routes each micro-batch through upsert_batch instead —
    the MessageEdited streaming path (telegram2elastic.py:530-533): a
    re-delivered url with changed text tombstones the old generation.
    `auto_compact=True` runs the size-tiered merge policy after the
    stream drains (steady-state segment count stays bounded no matter how
    many micro-batches arrived; readers of older snapshots are unaffected
    until vacuum())."""
    schema = spark.read.parquet(corpus_path).schema

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        write = indexer.upsert_batch if upsert else indexer.ingest_batch
        write(batch_df, batch_id=f"stream_epoch={epoch_id}")

    q = (
        spark.readStream.schema(schema)
        .parquet(corpus_path)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if auto_compact:
        indexer.maybe_compact()


class PointInTime:
    """ES point-in-time (`POST /index/_pit`): a search context pinned to
    the index state at open time, so paged search_after scans stay
    CONSISTENT while writes keep landing — no page ever sees a doc the
    previous page's world didn't have, and cursors never skip or repeat
    under concurrent upserts.

    Implementation: a PIT is a pinned manifest snapshot version (the
    Iceberg read-isolation machinery as_index(version=) already
    provides), plus the cached index view.  ES's keep_alive maps to
    vacuum(retain_versions=N): a PIT stays valid until its snapshot is
    vacuumed, at which point searches raise — the expired-PIT error.
    Open/search/close are all driver-side metadata; no corpus work."""

    def __init__(self, indexer: "IncrementalIndexer"):
        versions = indexer.versions()
        if not versions:
            raise ValueError("no committed snapshot to pin (ingest first)")
        self.indexer = indexer
        self.version = versions[-1]
        self.pit_id = f"pit_v{self.version}"
        self._index: dict | None = None
        self._closed = False

    @property
    def index(self) -> dict:
        if self._closed:
            raise ValueError(f"{self.pit_id} is closed")
        if self._index is None:
            # raises ValueError("... not found") once vacuum() reclaimed
            # the pinned snapshot — the ES expired-keep_alive error
            self._index = self.indexer.as_index(version=self.version)
        return self._index

    def search(
        self,
        terms: list[str],
        k: int = 10,
        after: tuple[float, int] | None = None,
        **kwargs,
    ):
        """wand_topk against the pinned snapshot; `after` is the
        (score, doc_id) search_after cursor — the ES PIT pagination
        idiom (pit + search_after + sort)."""
        from ..query.wand import wand_topk

        return wand_topk(self.index, terms, k=k, after=after, **kwargs)

    def close(self) -> None:
        """Release the context (DELETE /_pit).  Snapshot reclamation
        stays vacuum()'s job — closing a PIT never deletes data."""
        self._closed = True
        self._index = None


def open_pit(indexer: "IncrementalIndexer") -> PointInTime:
    """ES `POST /index/_pit?keep_alive=...` — pin the latest committed
    snapshot and return the search context."""
    return PointInTime(indexer)
