"""ES `_snapshot` / `_restore` for the segmented index.

A snapshot captures one commit point: the manifest plus exactly the
segment directories it references (tombstone sets live inside segment
dirs, so they ride along).  Like ES/Lucene snapshots, segments are
immutable after commit — the copy is consistent WITHOUT pausing ingest,
because a concurrent writer only ever adds new segment dirs and swings
the manifest; the snapshot's manifest never references them.

Restore materializes the snapshot as a FRESH index root (new version
history starting at the restored commit), leaving the source untouched —
ES restore-into-a-new-index semantics.  Queries over the restored index
are byte-identical to the source at snapshot time (rank-identity
tested)."""

from __future__ import annotations

import json
import os
import shutil

from ..streaming.ingest import IncrementalIndexer


def snapshot_index(indexer: IncrementalIndexer, dest_dir: str) -> dict:
    """Copy the CURRENT commit point to `dest_dir`; returns the snapshot
    info dict ({"segments": [...], "n_segments": n})."""
    manifest = indexer.manifest()
    if not manifest:
        raise ValueError("nothing committed to snapshot (ingest first)")
    os.makedirs(dest_dir, exist_ok=True)
    seg_ids = [e["segment_id"] for e in manifest]
    for sid in seg_ids:
        src = indexer._seg_dir(sid)
        dst = os.path.join(dest_dir, os.path.basename(src))
        if os.path.exists(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
    # the manifest is written LAST — a torn snapshot (crash mid-copy) has
    # no manifest and is detectably incomplete, mirroring the index's own
    # atomic-commit convention.  The salt layout travels with it: restore
    # MUST reopen with the same n_doc_parts or every query kernel would
    # misroute salts.
    meta = {
        "manifest": manifest,
        "n_doc_parts": indexer.n_doc_parts,
        "positions": indexer.positions,
        "doc_store": indexer.doc_store,
    }
    with open(os.path.join(dest_dir, "manifest.json"), "w") as f:
        json.dump(meta, f)
    return {"segments": seg_ids, "n_segments": len(seg_ids)}


def restore_index(
    spark, snapshot_dir: str, target_dir: str
) -> IncrementalIndexer:
    """Materialize a snapshot as a fresh index root and open it (layout
    parameters travel inside the snapshot)."""
    man_path = os.path.join(snapshot_dir, "manifest.json")
    if not os.path.exists(man_path):
        raise ValueError(f"no manifest in {snapshot_dir} (torn snapshot?)")
    with open(man_path) as f:
        meta = json.load(f)
    manifest = meta["manifest"]
    os.makedirs(target_dir, exist_ok=True)
    if os.listdir(target_dir):
        raise ValueError(f"restore target {target_dir} is not empty")
    for e in manifest:
        name = f"seg_{e['segment_id']:06d}"
        shutil.copytree(
            os.path.join(snapshot_dir, name), os.path.join(target_dir, name)
        )
    with open(os.path.join(target_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    return IncrementalIndexer(
        spark,
        target_dir,
        n_doc_parts=int(meta["n_doc_parts"]),
        positions=bool(meta.get("positions", False)),
        doc_store=bool(meta.get("doc_store", False)),
    )
