"""Driver-local doc-store point reads (the ES `_source` GET).

The index's stored-fields companion (index/build.py:write_doc_store) is
parquet sorted by doc_id with small row groups; fetching k documents is a
pyarrow filtered read that prunes to the row groups actually holding the
requested ids — no Spark job, the same serving trick as the sorted
trigram GIN buckets (query/fuzzy.py:fuzzy_topk_local).  This is the
driver-as-query-node analogue of the reference serving documents from ES
`_source` (output/elasticsearch.py doc body) instead of re-reading
Telegram.

Scale shape: a production query node holds the store on local disk (or
object storage with range reads); each GET touches O(row_group) bytes,
independent of corpus size, because the sort on doc_id turns the isin
filter into a handful of row-group ranges.
"""

from __future__ import annotations

from ..index.build import DOC_STORE_COLS


def fetch_docs_local(
    store_dir: str | list[str],
    doc_ids,
    cache: dict | None = None,
    ds_cache: dict | None = None,
    cols: list[str] | None = None,
) -> dict[int, dict]:
    """{doc_id: {url, lang, warc_ts, text}} for the requested ids.

    `store_dir` is one store or a list of per-segment stores
    (IncrementalIndexer.doc_store_dirs — segments hold disjoint live doc
    ids, so the union dataset needs no precedence rule).  `cache`
    (typically the index dict's "_doc_cache") keeps previously fetched
    rows hot across a query stream; a cold id costs one filtered pyarrow
    read shared by all cold ids in the call.  `ds_cache` keeps the
    opened pyarrow dataset (file listing + parquet footers) — a query
    node holds the store open; dropping the row cache must not re-list
    the store.  Ids absent from the store are simply absent from the
    result (caller's miss policy).

    `cols` prunes the parquet read to the named stored fields (plus
    doc_id) — attribute-only consumers (rescore wants url+warc_ts for a
    100-doc window) must not pay the text column's decompression.
    Cached rows may therefore be PARTIAL: a hit requires every wanted
    column, and fetched columns merge into the cached row so different
    column sets share one cache.
    """
    import pyarrow.dataset as ds

    want = [c for c in (cols if cols is not None else DOC_STORE_COLS)
            if c != "doc_id"]
    ids = sorted({int(d) for d in doc_ids})
    out: dict[int, dict] = {}
    missing = []
    for d in ids:
        hit = None if cache is None else cache.get(d)
        if hit is not None and all(c in hit for c in want):
            out[d] = hit
        else:
            missing.append(d)
    if not missing:
        return out
    # the dataset object is cached per store path — rebuilding it per
    # call costs more than the pruned read itself once the store has
    # many files/row groups
    ds_key = (
        tuple(store_dir) if isinstance(store_dir, (list, tuple)) else store_dir
    )
    src = None if ds_cache is None else ds_cache.get(ds_key)
    if src is None:
        if isinstance(store_dir, (list, tuple)):
            src = ds.dataset(
                [ds.dataset(d, format="parquet") for d in store_dir]
            )
        else:
            src = ds.dataset(store_dir, format="parquet")
        if ds_cache is not None:
            ds_cache[ds_key] = src
    # Row-group-index GET: the doc_id sort means each file's row-group
    # (min, max) stats — read ONCE and cached next to the dataset — map
    # every id to its row group by binary search; the read is then a
    # direct read_row_groups with NO filter expression at all.  The
    # previous OR-of-equalities pushdown was linear in |ids| inside the
    # scan (~5 ms/id: a 100-doc rescore window paid ~0.9 s); this is
    # linear in row groups TOUCHED (<= |ids|), each one a 128 KiB read.
    # Falls back to the expression filter when stats are unavailable.
    tbl = None
    if ds_cache is not None:
        idx_key = ("_rgidx", ds_key)
        rgidx = ds_cache.get(idx_key)
        if rgidx is None:
            rgidx = _row_group_index(src)
            ds_cache[idx_key] = rgidx
        if rgidx is not None:
            tbl = _read_by_row_groups(rgidx, missing, ["doc_id", *want])
    if tbl is None:
        # no ds_cache (one-shot call) or statistics missing: expression
        # pushdown.  OR-of-equalities, not isin — pyarrow simplifies
        # ==/range predicates against row-group statistics but does NOT
        # prune on set-membership; very large id lists degrade to isin
        # (at that size the scan is batch-shaped anyway).
        if len(missing) <= 512:
            import functools
            import operator

            flt = functools.reduce(
                operator.or_, [ds.field("doc_id") == i for i in missing]
            )
        else:
            flt = ds.field("doc_id").isin(missing)
        tbl = src.to_table(columns=["doc_id", *want], filter=flt)
    elif tbl.num_rows:
        # row-group read over-fetches the group's other rows; keep the
        # requested ids only (vectorized membership on the small table)
        import pyarrow.compute as pc

        tbl = tbl.filter(pc.field("doc_id").isin(missing))
    for row in tbl.to_pylist():
        d = int(row.pop("doc_id"))
        if cache is not None:
            merged = cache.setdefault(d, {})
            merged.update(row)
            out[d] = merged
        else:
            out[d] = row
    if cache is not None:
        # bound the hot row cache (ADVICE r5, low): FIFO-evict past the
        # cap; evicted docs are one pruned point read away
        from .local import DOC_CACHE_MAX_ENTRIES

        while len(cache) > DOC_CACHE_MAX_ENTRIES:
            cache.pop(next(iter(cache)))
    return out


def _row_group_index(src):
    """[(path, rg_ordinal, min_doc_id, max_doc_id)] sorted by min, one
    entry per row group across the dataset's parquet fragments; None when
    any row group lacks doc_id statistics (caller falls back to the
    expression filter).  Built once per opened store (cached in
    ds_cache) — the driver-resident analogue of the parquet footer a
    warm query node holds anyway."""
    import pyarrow.parquet as pq

    entries = []
    try:
        for frag in src.get_fragments():
            md = pq.ParquetFile(frag.path).metadata
            if md.num_row_groups == 0:
                continue
            try:
                col = next(
                    i for i in range(md.num_columns)
                    if md.row_group(0).column(i).path_in_schema == "doc_id"
                )
            except StopIteration:
                return None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col).statistics
                if st is None or not st.has_min_max:
                    return None
                entries.append((frag.path, rg, int(st.min), int(st.max)))
    except Exception:
        return None
    by_file: dict[str, list] = {}
    for path, rg, lo, hi in entries:
        by_file.setdefault(path, []).append((lo, hi, rg))
    for lst in by_file.values():
        lst.sort()
    return by_file


def _read_by_row_groups(rgidx, ids, columns):
    """Concatenated table of exactly the row groups whose [min, max]
    ranges contain any requested id (over-fetching the groups' other
    rows — the caller filters).  Within a file the doc_id-sorted write
    makes row-group ranges sorted and disjoint, so each (file, id) probe
    is ONE binary search; files (per-segment stores hold disjoint live
    ids, but ranges may interleave) are probed independently."""
    import bisect

    import pyarrow as pa
    import pyarrow.parquet as pq

    hit: dict[str, set] = {}
    for path, lst in rgidx.items():
        mins = [e[0] for e in lst]
        for d in ids:
            i = bisect.bisect_right(mins, d) - 1
            if i >= 0:
                lo, hi, rg = lst[i]
                if lo <= d <= hi:
                    hit.setdefault(path, set()).add(rg)
    if not hit:
        return pa.table(
            {c: [] for c in columns}
        )
    parts = [
        pq.ParquetFile(path).read_row_groups(
            sorted(rgs), columns=list(columns)
        )
        for path, rgs in sorted(hit.items())
    ]
    return pa.concat_tables(parts)


def resolve_doc_store(index: dict, doc_store: str | None) -> str | None:
    """Explicit path wins; else the store discovered by read_index."""
    return doc_store if doc_store is not None else index.get("_doc_store_dir")


def write_time_sorted_store(corpus, out_dir: str, n_files: int = 8) -> str:
    """ES index-sorting analogue (`index.sort.field: warc_ts desc`): a
    second stored layout ordered newest-first, so "latest N documents"
    terminates after the first row group(s) instead of sorting the
    corpus.  Range-partitioned descending on (warc_ts, doc_id): file 0
    holds the newest documents, and within a file row groups are
    time-ordered — a top-N scan touches O(N) rows at any corpus size.
    Returns the store path."""
    from pyspark.sql import functions as F

    from ..index.build import DOC_STORE_COLS

    path = f"{out_dir}/doc_store_by_time"
    (
        corpus.select(*DOC_STORE_COLS)
        .repartitionByRange(n_files, F.desc("warc_ts"), F.asc("doc_id"))
        .sortWithinPartitions(F.desc("warc_ts"), F.asc("doc_id"))
        .write.mode("overwrite")
        .option("parquet.block.size", 128 << 10)
        .parquet(path)
    )
    return path


def scan_recent_local(
    store_dir: str, k: int = 25, _stats: dict | None = None
) -> list[tuple]:
    """[(doc_id, url, warc_ts)] newest-first — the early-terminated scan
    over the time-sorted store: fragments are read in partition order
    (file 0 = newest) and reading STOPS once k rows are in hand, so the
    cost is O(k), not O(corpus).  Spark files are named part-NNNNN in
    range-partition order, which IS the time order here."""
    import pyarrow.dataset as ds
    import pyarrow.parquet as pq

    files = sorted(ds.dataset(store_dir, format="parquet").files)
    rows: list[dict] = []
    for f in files:
        pf = pq.ParquetFile(f)
        for rg in range(pf.metadata.num_row_groups):
            tbl = pf.read_row_group(rg, columns=["doc_id", "url", "warc_ts"])
            rows.extend(tbl.to_pylist())
            if len(rows) >= k:
                break
        if len(rows) >= k:
            break
    if _stats is not None:
        _stats["rows_scanned"] = len(rows)
    rows.sort(key=lambda r: (r["warc_ts"], -r["doc_id"]), reverse=True)
    return [(r["doc_id"], r["url"], r["warc_ts"]) for r in rows[: int(k)]]


def mget_local(
    store_dir: str | list[str],
    ids,
    cache: dict | None = None,
    ds_cache: dict | None = None,
) -> list[tuple]:
    """ES `_mget` served driver-locally from the doc store: row-group
    point reads (fetch_docs_local's (min,max) doc_id row-group index —
    no Spark job), with the ES found:false envelope for absent ids.
    Returns [(doc_id, found, url, lang, n_chars)] in id order —
    identical rows to the Spark `meta.mget_page` pair (n_chars is the
    stored text's length; the corpus invariant n_chars == len(text) is
    oracle-checked)."""
    uniq = sorted({int(i) for i in ids})
    if not uniq:
        raise ValueError("mget needs a non-empty id list")
    rows = fetch_docs_local(
        store_dir, uniq, cache=cache, ds_cache=ds_cache,
        cols=["doc_id", "url", "lang", "text"],
    )
    out = []
    for i in uniq:
        r = rows.get(i)
        if r is None:
            out.append((i, False, None, None, None))
        else:
            out.append((i, True, r["url"], r["lang"], len(r["text"])))
    return out
