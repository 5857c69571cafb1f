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
    """
    import pyarrow.dataset as ds

    ids = sorted({int(d) for d in doc_ids})
    out: dict[int, dict] = {}
    missing = []
    for d in ids:
        hit = None if cache is None else cache.get(d)
        if hit is not None:
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
    # OR-of-equalities, not isin: pyarrow simplifies ==/range predicates
    # against row-group statistics (measured ~10x fewer bytes touched on
    # the sorted store), but does NOT prune on set-membership
    # expressions.  Very large id lists degrade to isin — at that size
    # the scan is batch-shaped anyway.
    if len(missing) <= 512:
        import functools
        import operator

        flt = functools.reduce(
            operator.or_, [ds.field("doc_id") == i for i in missing]
        )
    else:
        flt = ds.field("doc_id").isin(missing)
    tbl = src.to_table(columns=DOC_STORE_COLS, filter=flt)
    for row in tbl.to_pylist():
        d = int(row.pop("doc_id"))
        out[d] = row
        if cache is not None:
            cache[d] = row
    return out


def resolve_doc_store(index: dict, doc_store: str | None) -> str | None:
    """Explicit path wins; else the store discovered by read_index."""
    return doc_store if doc_store is not None else index.get("_doc_store_dir")
