"""ES `_disk_usage` + `_stats` for the on-disk index layout.

ES's analyze-disk-usage API reports how much of an index each field and
structure costs (inverted index, doc values, stored fields); `_stats`
reports doc counts / store size / segment counts.  This engine's
analogues over the write_index layout:

  disk_usage(root)  — per-table bytes + file counts, postings broken
                      down per term_bucket partition (the layout's
                      partition-pruning unit, so the report doubles as
                      a bucket-skew check), doc_store/positions when
                      present.
  index_stats(root) — doc count, vocabulary size, total postings
                      blocks, store bytes, avgdl — the _stats/_count
                      card a monitoring stack scrapes.

Pure driver-side filesystem + parquet-footer work (pyarrow metadata
reads, no Spark jobs): this is coordinator metadata in ES too.
"""

from __future__ import annotations

import json
import os


def _tree_bytes(path: str) -> tuple[int, int]:
    total, files = 0, 0
    for dirpath, _dirs, names in os.walk(path):
        for n in names:
            if n.startswith(("_", ".")):
                continue
            total += os.path.getsize(os.path.join(dirpath, n))
            files += 1
    return total, files


def disk_usage(root: str) -> dict:
    """Per-structure byte/file breakdown, ES `_disk_usage` shape."""
    out: dict = {"index": root, "tables": {}, "total_bytes": 0}
    for name in sorted(os.listdir(root)):
        p = os.path.join(root, name)
        if name == "meta.json":
            out["tables"][name] = {"bytes": os.path.getsize(p), "files": 1}
            out["total_bytes"] += os.path.getsize(p)
            continue
        if not os.path.isdir(p):
            continue
        b, f = _tree_bytes(p)
        entry: dict = {"bytes": b, "files": f}
        if name == "postings":
            buckets = {}
            for d in sorted(os.listdir(p)):
                if d.startswith("term_bucket="):
                    bb, _ = _tree_bytes(os.path.join(p, d))
                    buckets[int(d.split("=", 1)[1])] = bb
            if buckets:
                vals = sorted(buckets.values())
                entry["n_buckets"] = len(buckets)
                entry["bucket_bytes_max"] = vals[-1]
                entry["bucket_bytes_p50"] = vals[len(vals) // 2]
                # partition skew: a hot bucket slows every query routed
                # to it; max/median is the one number to watch
                entry["bucket_skew"] = round(
                    vals[-1] / max(1, vals[len(vals) // 2]), 2
                )
        out["tables"][name] = entry
        out["total_bytes"] += b
    return out


def index_stats(root: str) -> dict:
    """The `_stats` card: docs, vocabulary, blocks, bytes, avgdl.
    Footer-only parquet reads (row counts come from metadata, no data
    pages are touched)."""
    import pyarrow.dataset as ds

    def _rows(path: str) -> int:
        if not os.path.isdir(path):
            return 0
        total = 0
        for frag in ds.dataset(path, format="parquet").get_fragments():
            total += frag.metadata.num_rows
        return total

    meta = {}
    mp = os.path.join(root, "meta.json")
    if os.path.exists(mp):
        with open(mp) as f:
            meta = json.load(f)
    stats_row = {}
    sp = os.path.join(root, "stats")
    if os.path.isdir(sp):
        tbl = ds.dataset(sp, format="parquet").to_table()
        if tbl.num_rows:
            stats_row = {
                k: tbl[k][0].as_py() for k in tbl.column_names
            }
    total_bytes, _ = _tree_bytes(root)
    return {
        "index": root,
        "n_docs": _rows(os.path.join(root, "doc_map")),
        "vocabulary": _rows(os.path.join(root, "term_dict")),
        "posting_blocks": _rows(os.path.join(root, "postings")),
        "store_bytes": total_bytes,
        "avgdl": stats_row.get("avgdl"),
        "n_doc_parts": meta.get("n_doc_parts"),
        "positions": bool(meta.get("positions", False)),
    }


def cat_indices(root: str) -> list[dict]:
    """ES `_cat/indices` over an aliases root (index/aliases.py layout):
    one row per generation dir — docs, vocabulary, store bytes, write
    flag — plus alias membership.  Same footer-only cost as
    index_stats."""
    alias_state: dict = {"aliases": {}}
    ap = os.path.join(root, "aliases.json")
    if os.path.exists(ap):
        with open(ap) as f:
            alias_state = json.load(f)
    write_targets = {
        a["write_index"] for a in alias_state.get("aliases", {}).values()
        if a.get("write_index")
    }
    rows = []
    for name in sorted(os.listdir(root)):
        p = os.path.join(root, name)
        if not os.path.isdir(p) or not os.path.exists(
            os.path.join(p, "meta.json")
        ):
            continue
        st = index_stats(p)
        rows.append(
            {
                "index": name,
                "docs": st["n_docs"],
                "vocabulary": st["vocabulary"],
                "store_bytes": st["store_bytes"],
                "is_write_index": name in write_targets,
            }
        )
    return rows
