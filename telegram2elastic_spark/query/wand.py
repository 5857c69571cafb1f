"""Top-k BM25 over the compressed posting index with block-max pruning.

Distributed shape: the index is document-partitioned (build.py — salt =
pmod(doc_id, P) for every term), so each salt holds a disjoint doc subset and
per-salt top-k is complete.  Query = filter postings to the query terms
(parquet pushdown + term_bucket partition pruning when read from disk) ->
groupBy(salt).applyInPandas kernel (numpy over Arrow batches) -> union of P
local top-ks -> global orderBy/limit merge (the "partial-posting merge" of
north_star).  BM25 norms (doc lengths) are denormalized into each block at
build time (dl_bytes), so the query side touches *only* the query terms'
posting blocks — no doc_map join, no per-query shuffle of corpus-sized state.

Pruning kernel: a TAAT MaxScore variant of the block-max WAND family.
Terms are processed in descending score-upper-bound order; once the summed
upper bound of the remaining terms falls below the running threshold θ
(k-th best accumulated score), no *new* document can enter the top-k, so
later terms only update existing accumulators and skip every block whose
[first_doc_id, last_doc_id] range or block-max bound cannot matter.  Exact
same top-k as the relational scorer (tested rank-identical); pivot-based
DAAT WAND is a drop-in later refinement of the same kernel.

Upper bounds: ub(t) = idf_t * (k1+1) * mtf / (mtf + k1*(1-b)) — the dl->0
limit of the BM25 weight, monotone in tf, so block_max_tf gives a valid
per-block bound (block-max metadata from codec.encode_blocks).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.codec import decode_many, delta_decode, varbyte_decode
from .bm25 import B, K1, ROUND_GUARD, SCORE_DECIMALS


def _bm25_w(tf: np.ndarray, dl: np.ndarray, avgdl: float, idf: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _term_ub(idf: float, max_tf: int) -> float:
    mtf = float(max_tf)
    return idf * mtf * (K1 + 1.0) / (mtf + K1 * (1.0 - B))


_EMPTY = pd.DataFrame(
    {"doc_id": pd.Series([], dtype="int64"), "score": pd.Series([], dtype="float64")}
)


def _score_salt_group(
    post: pd.DataFrame,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    tombstones: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
    require_all: int = 0,
    raw_scores: bool = False,
    weights: dict[str, float] | None = None,
    avgdls: dict[str, float] | None = None,
    after: tuple[float, int] | None = None,
) -> pd.DataFrame:
    """Kernel: one salt partition's posting blocks -> local top-k.
    `tombstones`: sorted int64 ids of deleted/edited-away docs (filtered
    post-decode, pre-scoring — Lucene's live-docs check).
    `allowed`: optional sorted int64 ids a document-level filter admits
    (ES filter-context: restricts scored docs, never changes idf); at real
    scale this is a broadcast bitmap, here a sorted array + searchsorted.
    `raw_scores`: emit unrounded BM25 sums (selection/order still uses the
    rounded key so truncation agrees with the global rounded merge) — for
    callers that combine the sums with other clauses before rounding once
    (compound queries).
    `weights` / `avgdls` (optional, keyed like idfs): per-term score
    multiplier and length-norm denominator — the multi_match most_fields
    path scores several field indexes in one kernel by keying terms as
    field+term; every upper bound scales by the weight, so MaxScore
    pruning stays exact across fields.
    `after`: ES search_after cursor (rounded_score, doc_id) — only docs
    STRICTLY after the cursor in (score desc, doc_id asc) order are
    selectable.  Cursor docs may rank below the unfiltered top-k, so
    candidate-generation pruning is disabled (full accumulation, like
    require_all); the cursor mask applies to the rounded scores right
    before selection so it agrees with the global rounded merge."""
    if post.empty:
        return _EMPTY.copy()

    # per-term block tables, ordered by descending term upper bound
    terms = []
    for term, g in post.groupby("term", sort=False):
        g = g.sort_values("block_id")
        idf = idfs[term]
        wgt = weights.get(term, 1.0) if weights else 1.0
        av = avgdls[term] if avgdls else avgdl
        ub = wgt * _term_ub(idf, int(g["block_max_tf"].max()))
        terms.append((ub, term, (idf, wgt, av), g))
    terms.sort(key=lambda x: -x[0])
    ubs = np.array([t[0] for t in terms])
    rem_ub = np.concatenate([np.cumsum(ubs[::-1])[::-1], [0.0]])  # rem_ub[j] = sum ubs[j:]

    acc_ids = np.array([], dtype=np.int64)
    acc_scores = np.array([], dtype=np.float64)
    acc_hits = np.array([], dtype=np.int64)

    for j, (ub, term, (idf, wgt, av), g) in enumerate(terms):
        theta = (
            np.partition(acc_scores, -k)[-k] if acc_scores.size >= k else -np.inf
        )
        # conjunctive mode: every term list must be fully decoded (any doc
        # missed in one term can never be reported), so pruning that skips
        # candidate generation is disabled; theta pruning still applies to
        # the final selection.  theta is an unrounded raw score while the
        # final order rounds to SCORE_DECIMALS — subtract ROUND_GUARD so a
        # doc that would round equal to the k-th (and win the doc_id tie)
        # is never pruned.
        allow_new = (
            (rem_ub[j] >= theta - ROUND_GUARD)
            or bool(require_all)
            or after is not None
        )
        firsts = g["first_doc_id"].to_numpy(dtype=np.int64)
        lasts = g["last_doc_id"].to_numpy(dtype=np.int64)
        if allow_new:
            keep = np.ones(len(g), dtype=bool)
        else:
            if acc_ids.size == 0:
                break
            # block-max skipping: keep only blocks that overlap an existing
            # accumulator (range check via searchsorted) and whose bound can
            # still lift an accumulated doc into the top-k.
            mtf = g["block_max_tf"].to_numpy(dtype=np.float64)
            bubs = wgt * idf * mtf * (K1 + 1.0) / (mtf + K1 * (1.0 - B))
            lo = np.searchsorted(acc_ids, firsts, side="left")
            hi = np.searchsorted(acc_ids, lasts, side="right")
            overlaps = hi > lo
            acc_max = acc_scores.max() if acc_scores.size else 0.0
            keep = overlaps & (bubs + acc_max + rem_ub[j + 1] >= theta - ROUND_GUARD)
        if not keep.any():
            continue
        kept = g.loc[keep]
        ids, tfs, dls = decode_many(
            [bytes(x) for x in kept["doc_gaps"]],
            [bytes(x) for x in kept["tf_bytes"]],
            [bytes(x) for x in kept["dl_bytes"]],
            kept["n_docs"].to_numpy(),
        )
        ids = ids.astype(np.int64)
        tfs = tfs.astype(np.float64)
        dls = dls.astype(np.float64)
        if tombstones is not None and tombstones.size:
            live = ~np.isin(ids, tombstones)
            ids, tfs, dls = ids[live], tfs[live], dls[live]
            if ids.size == 0:
                continue
        if allowed is not None:
            pos = np.searchsorted(allowed, ids)
            pos[pos >= allowed.size] = 0
            ok = allowed[pos] == ids if allowed.size else np.zeros(ids.shape, bool)
            ids, tfs, dls = ids[ok], tfs[ok], dls[ok]
            if ids.size == 0:
                continue
        if not allow_new:
            mask = np.isin(ids, acc_ids, assume_unique=False)
            if not mask.any():
                continue
            ids, tfs, dls = ids[mask], tfs[mask], dls[mask]
        w = wgt * _bm25_w(tfs, dls, av, idf)
        # merge into accumulators (sorted union)
        all_ids = np.concatenate([acc_ids, ids])
        all_sc = np.concatenate([acc_scores, w])
        all_h = np.concatenate([acc_hits, np.ones(ids.size, dtype=np.int64)])
        order = np.argsort(all_ids, kind="stable")
        all_ids, all_sc, all_h = all_ids[order], all_sc[order], all_h[order]
        uniq, starts = np.unique(all_ids, return_index=True)
        sums = np.add.reduceat(all_sc, starts)
        hits = np.add.reduceat(all_h, starts)
        acc_ids, acc_scores, acc_hits = uniq, sums, hits

    if require_all:
        keep = acc_hits >= require_all
        acc_ids, acc_scores = acc_ids[keep], acc_scores[keep]
    if acc_ids.size == 0:
        return _EMPTY.copy()
    # Round BEFORE local top-k selection so partition-local truncation uses
    # the same (rounded score, doc_id) order as the global merge — otherwise
    # a float-noise "tie" could drop the wrong doc at the partition boundary.
    rounded = np.round(acc_scores, SCORE_DECIMALS)
    if after is not None:
        a_score, a_doc = float(after[0]), int(after[1])
        keep = (rounded < a_score) | (
            (rounded == a_score) & (acc_ids > a_doc)
        )
        acc_ids, acc_scores, rounded = (
            acc_ids[keep], acc_scores[keep], rounded[keep]
        )
        if acc_ids.size == 0:
            return _EMPTY.copy()
    top = min(k, acc_ids.size)
    order = np.lexsort((acc_ids, -rounded))[:top]
    out_scores = acc_scores if raw_scores else rounded
    return pd.DataFrame({"doc_id": acc_ids[order], "score": out_scores[order]})


def _decode_ids_only(g: pd.DataFrame) -> np.ndarray:
    """Excluded-term blocks -> sorted unique doc ids.  Only the doc_gaps
    column is decoded — tf/dl/positions stay compressed, because must_not
    needs membership, never weights."""
    ids = [
        delta_decode(varbyte_decode(bytes(b))).astype(np.int64)
        for b in g["doc_gaps"]
    ]
    if not ids:
        return np.array([], dtype=np.int64)
    return np.unique(np.concatenate(ids))


def _apply_exclusions(
    pdf: pd.DataFrame, exclude: list[str], tomb: np.ndarray | None
) -> tuple[pd.DataFrame, np.ndarray | None]:
    """Split the must_not terms' blocks out of a salt's postings and fold
    their doc ids into the tombstone mask (ES bool `must_not` is filter
    context: excluded docs are never scored, global stats never change —
    same contract as doc_filter, wand_topk docstring).  Postings are
    doc-partitioned, so a salt's excluded-term blocks cover exactly the
    salt's docs — the exclusion set never crosses the kernel boundary."""
    mask = pdf["term"].isin(exclude)
    if not mask.any():
        return pdf, tomb
    ex_ids = _decode_ids_only(pdf.loc[mask])
    pdf = pdf.loc[~mask]
    if tomb is not None and tomb.size:
        ex_ids = np.union1d(tomb, ex_ids)
    return pdf, ex_ids


def _postings_for_terms(index: dict, terms: list[str]) -> DataFrame:
    """Scan only the query terms' postings.

    Two pruning layers when the index was read from the partitioned disk
    layout: (1) partition pruning — term_bucket values for the query terms
    are computed driver-side (pure-Python XXH64, bit-identical to the
    layout's xxhash64 — zero Spark jobs) and applied as literal predicates
    on the partition column, so only <= |q| of the 64 bucket directories
    are listed/read; (2) parquet row-group pruning via the pushed
    `term IN (...)` filter.  In-memory indexes just get the term
    filter."""
    post = _bucketed(index, index["postings"], terms)
    return post.filter(F.col("term").isin(terms))


def _n_parts(index: dict) -> int:
    from ..index.build import DEFAULT_DOC_PARTS

    return int(index.get("_n_doc_parts", DEFAULT_DOC_PARTS))


def _tomb_df(index: dict) -> DataFrame | None:
    """Tombstoned internal doc ids as a DataFrame (never collected for the
    distributed paths; see _filters_df)."""
    df = index.get("_tombstones_df")
    if df is not None:
        return df
    tomb = index.get("_tombstones") or []
    if not tomb:
        return None
    spark = index["doc_map"].sparkSession
    return spark.createDataFrame([(int(t),) for t in tomb], "doc_id long")


def _tomb_array(index: dict) -> np.ndarray:
    """Sorted tombstone ids materialized in-process — ONLY for the
    query-node-local paths (wand_topk_local / bmw_topk_local), where the
    node deliberately holds hot index state in memory; the distributed
    paths ship tombstones per-salt via cogroup instead (_filters_df)."""
    if "_tomb_arr" not in index:
        tomb = index.get("_tombstones")
        if tomb is None:
            df = index.get("_tombstones_df")
            tomb = [r["doc_id"] for r in df.collect()] if df is not None else []
        index["_tomb_arr"] = np.array(sorted(tomb), dtype=np.int64)
    return index["_tomb_arr"]


def _allowed_ids(index: dict, doc_filter: str | None) -> np.ndarray | None:
    """Document-filter -> sorted allowed-id array.  LOCAL-PATH ONLY: this
    materializes the admitted ids in-process for the query-node paths; the
    distributed kernels receive filter ids per-salt via _filters_df (no
    driver collect).  doc_filter is a SQL predicate over doc_map columns
    (doc_id, url, lang, warc_ts, doc_len), e.g. "lang = 'en'"."""
    if doc_filter is None:
        return None
    ids = [
        r["doc_id"]
        for r in index["doc_map"].filter(doc_filter).select("doc_id").collect()
    ]
    return np.array(sorted(ids), dtype=np.int64)


def _filters_df(index: dict, doc_filter: str | None) -> DataFrame | None:
    """Document-level filters as per-salt rows (doc_id, kind, salt), shipped
    to the scoring kernels by cogrouping on salt — never through the driver.

    kind 't' = tombstoned (excluded); 'a' = admitted by doc_filter (ES
    filter-context, poc/src/api/routes/search.py:87-103).  Every doc's
    postings live in exactly salt = pmod(doc_id, P) (document-partitioned
    layout), so shuffling the filter ids by that same salt co-locates them
    with the posting blocks they govern.  At 10^12 scale this is a narrow
    shuffle of the filtered id column (distributed), replacing the r1
    driver-side collect of corpus-sized id sets."""
    parts = []
    tomb = _tomb_df(index)
    if tomb is not None:
        parts.append(tomb.select("doc_id", F.lit("t").alias("kind")))
    if doc_filter is not None:
        parts.append(
            index["doc_map"]
            .filter(doc_filter)
            .select("doc_id", F.lit("a").alias("kind"))
        )
    if not parts:
        return None
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "salt", F.pmod(F.col("doc_id"), F.lit(_n_parts(index))).cast("int")
    )


def _split_filters(
    filt: pd.DataFrame, has_allow: bool
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """Cogrouped filter rows -> (tombstones, allowed) sorted id arrays.
    `has_allow` distinguishes "no doc_filter requested" (allowed=None,
    everything scored) from "filter admits nothing in this salt"
    (allowed=empty, nothing scored)."""
    tomb = np.sort(filt.loc[filt["kind"] == "t", "doc_id"].to_numpy(np.int64))
    allowed = None
    if has_allow:
        allowed = np.sort(
            filt.loc[filt["kind"] == "a", "doc_id"].to_numpy(np.int64)
        )
    return (tomb if tomb.size else None), allowed


def _salt_scored(
    post: DataFrame,
    filt: DataFrame | None,
    has_allow: bool,
    kernel,
    out_schema: str,
) -> DataFrame:
    """Run a per-salt scoring kernel, cogrouping in the per-salt filter ids
    when any document-level filter exists.  kernel(post_pdf, tomb, allowed)
    -> pdf matching out_schema."""
    if filt is None:
        return post.groupBy("salt").applyInPandas(
            lambda pdf: kernel(pdf, None, None), out_schema
        )

    def cokernel(post_pdf: pd.DataFrame, filt_pdf: pd.DataFrame) -> pd.DataFrame:
        tomb, allowed = _split_filters(filt_pdf, has_allow)
        return kernel(post_pdf, tomb, allowed)

    return (
        post.groupBy("salt")
        .cogroup(filt.groupBy("salt"))
        .applyInPandas(cokernel, out_schema)
    )


def wand_topk(
    index: dict,
    terms: list[str],
    k: int = 10,
    doc_filter: str | None = None,
    conjunctive: bool = False,
    algo: str = "maxscore",
    min_should_match: int = 0,
    exclude_terms: list[str] | None = None,
    after: tuple[float, int] | None = None,
    stats_override: tuple[dict, float] | None = None,
) -> DataFrame:
    """Top-k (doc_id, url, score) from the compressed index.

    `stats_override=(idfs, avgdl)` scores with EXTERNAL statistics
    instead of this index's own — the dfs_query_then_fetch seam: the
    federated coordinator merges df/N/avgdl across indexes driver-side
    and every shard then ranks against the same global idf.  MaxScore
    upper bounds derive from whatever idfs are in force, so pruning
    stays exact under an override.

    Driver-side: collect idf inputs for the |q| query terms (tiny — a
    broadcast in closure form) and global stats; executors only ever see
    the query terms' posting blocks.  `doc_filter` applies a document-level
    predicate pre-scoring with ES filter-context semantics (global stats) —
    rank-identical to bm25_topk(..., global_stats=True).  Filter/tombstone
    ids reach the kernels per-salt via cogroup (executor-side), never as a
    driver-collected closure.

    ES bool-query knobs:
      * `min_should_match=m` — a doc must match >= m distinct query terms
        ("minimum_should_match"); `conjunctive` is the m = |terms| sugar.
        Matching-term counts require full accumulation, so candidate-
        generation pruning is disabled (like conjunctive); theta pruning
        still bounds the final selection.
      * `exclude_terms` — bool `must_not`: docs containing ANY excluded
        term are dropped pre-scoring, in filter context (idf/avgdl/N stay
        global).  Exclusion ids are decoded from the excluded terms' own
        posting blocks inside each salt kernel (ids only — tf/dl stay
        compressed) and never leave the executor.

    `algo`: "maxscore" (default, vectorized TAAT block-max family) or
    "bmw" (classical pivot DAAT block-max WAND cursors, query/bmw.py) —
    both rank-exact, same distributed shape (per-salt kernel + k-way
    merge); bmw implements only the plain disjunctive top-k.
    """
    if algo not in ("maxscore", "bmw"):
        raise ValueError(f"unknown algo {algo!r}")
    if algo == "bmw" and (
        conjunctive or min_should_match or exclude_terms or after
    ):
        raise ValueError(
            "algo='bmw' implements the plain disjunctive top-k only"
        )
    if conjunctive and min_should_match:
        raise ValueError(
            "conjunctive IS min_should_match=len(terms); pass only one"
        )
    exclude = sorted(set(exclude_terms or []))
    spark = index["doc_map"].sparkSession
    if stats_override is not None:
        ext_idfs, avgdl = stats_override
        # restrict to the query's terms, drop zero-hit entries (None)
        idfs = {
            t: float(v)
            for t, v in ext_idfs.items()
            if t in set(terms) and v is not None
        }
    else:
        idfs, avgdl = _collect_idfs(index, terms)
    empty = spark.createDataFrame([], "doc_id long, url string, score double")
    n_terms = len(set(terms))
    require_all = n_terms if conjunctive else int(min_should_match)
    if not idfs or require_all > len(idfs):
        return empty  # too few terms exist for any doc to reach the bar

    post = _postings_for_terms(index, sorted(set(idfs) | set(exclude)))
    filt = _filters_df(index, doc_filter)

    if algo == "bmw":
        from .bmw import bmw_salt_kernel

        def kernel(pdf, tomb, allowed):
            return bmw_salt_kernel(
                pdf, idfs, float(avgdl), k, tombstones=tomb, allowed=allowed
            )
    else:

        def kernel(pdf, tomb, allowed):
            if exclude:
                pdf, tomb = _apply_exclusions(pdf, exclude, tomb)
            return _score_salt_group(
                pdf, idfs, float(avgdl), k, tombstones=tomb, allowed=allowed,
                require_all=require_all, after=after,
            )

    local = _salt_scored(
        post, filt, doc_filter is not None, kernel, "doc_id long, score double"
    )
    topk = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    # url lookup: broadcast the k-row top-k side so doc_map is scanned
    # map-side (never shuffled per query — doc_map is corpus-sized).
    return (
        index["doc_map"]
        .select("doc_id", "url")
        .join(F.broadcast(topk), "doc_id", "inner")
        .select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def _bucketed(index: dict, df: DataFrame, terms: list[str]) -> DataFrame:
    """Add term_bucket literal predicates (partition pruning) when the
    table carries the partition column — used for both postings and
    term_dict scans so a |q|-term lookup touches <= |q| of the 64 bucket
    dirs."""
    if "term_bucket" not in df.columns:
        return df
    from ..functions.xxhash import term_bucket
    from ..index.build import N_TERM_BUCKETS

    # pmod(xxhash64(term), N) computed driver-side (bit-identical pure-
    # Python XXH64) — no Spark job just to hash a cold query's terms
    buckets = sorted({term_bucket(t, N_TERM_BUCKETS) for t in terms})
    return df.filter(F.col("term_bucket").isin(buckets))


def _index_stats(index: dict) -> tuple[int, float]:
    """Per-index memoized (n_docs, avgdl) — one tiny metadata fetch per
    index handle, shared by every query path.  A written index's 1-row
    stats table is read driver-side (pyarrow) instead of through a Spark
    action — same parquet values either way."""
    if "_stats" not in index:
        row = None
        sdir = index.get("_stats_dir")
        if sdir and os.path.isdir(sdir):
            try:
                import pyarrow.dataset as ds

                t = ds.dataset(sdir, format="parquet").to_table(
                    columns=["n_docs", "avgdl"]
                )
                if t.num_rows:
                    row = (t["n_docs"][0].as_py(), t["avgdl"][0].as_py())
            except Exception:
                row = None
        if row is None:
            row = index["stats"].select("n_docs", "avgdl").first()
        n, avgdl = row
        # empty corpus: avgdl is NULL; any positive value works (no postings)
        index["_stats"] = (int(n or 0), float(avgdl) if avgdl else 1.0)
    return index["_stats"]


def _pyarrow_term_dict(index: dict, terms: list[str]):
    """Bucket-pruned driver-local (term, df) lookup from the written
    term_dict table — the _pyarrow_blocks seam applied to the vocabulary
    (a |q|-row metadata fetch should not cost a Spark action).  Returns
    None when no readable directory backs the handle; the caller falls
    back to the Spark scan.  Identical values: same files, same bucket
    pruning, same `term IN (...)` filter."""
    tdir = index.get("_term_dict_dir")
    if not tdir:
        return None
    try:
        import pyarrow.dataset as ds

        src = index.get("_td_ds")
        if src is None:
            if not os.path.isdir(tdir):
                return None
            src = ds.dataset(tdir, format="parquet", partitioning="hive")
            index["_td_ds"] = src
        from ..functions.xxhash import term_bucket
        from ..index.build import N_TERM_BUCKETS

        buckets = sorted({term_bucket(t, N_TERM_BUCKETS) for t in terms})
        filt = ds.field("term_bucket").isin(buckets) & ds.field("term").isin(
            terms
        )
        return src.to_table(columns=["term", "df"], filter=filt).to_pandas()
    except Exception:
        return None


def _local_idfs(index: dict, terms: list[str]) -> tuple[dict, float]:
    """idf per query term for the query-node-local paths WITHOUT a
    term_dict scan: df is derivable from the fetched posting blocks —
    sum(block n_docs) over every salt (and, for multi-segment views,
    every segment) equals term_dict's df, because the blocks partition
    exactly the (term, doc) pairs term_dict counts and neither side is
    tombstone-adjusted (as_index sums per-segment df the same way).  One
    pruned postings fetch therefore warms BOTH the block cache and the
    idf cache: a cold query costs one Spark job, not two (guide §1 —
    measured, the second job was ~half of cold-query latency).  Values
    land in the same _idf_cache the distributed paths use, and are
    bit-equal to the term_dict route (same integer df, same formula)."""
    n, avgdl = _index_stats(index)
    cache = index.setdefault("_idf_cache", {})
    missing = sorted({t for t in terms if t not in cache})
    if missing:
        _local_blocks(index, missing, [])
        blocks = index["_local_post_cache"]
        for t in missing:
            g = blocks.get(t)
            if g is None:
                cache[t] = None
            else:
                df = int(g["n_docs"].sum())
                cache[t] = float(
                    np.log(1.0 + (n - df + 0.5) / (df + 0.5))
                )
    idfs = {t: cache[t] for t in terms if cache.get(t) is not None}
    return idfs, avgdl


def _collect_idfs(index: dict, terms: list[str]) -> tuple[dict, float]:
    """Per-index memoized global stats + per-term idf lookups (bucket-pruned
    when term_dict is the partitioned on-disk layout).

    On a fresh index handle the (n_docs, avgdl) row rides along the
    term_dict lookup as a crossJoin with the 1-row stats table — one
    Spark action instead of two for a cold index (guide §1: per-action
    overhead dominates these driver-side metadata fetches)."""
    cache = index.setdefault("_idf_cache", {})
    missing = [t for t in terms if t not in cache]
    if missing:
        # written-index fast path: (term, df) and the 1-row stats are
        # driver-local parquet reads (no Spark action at all on a cold
        # handle) — same files and filters as the Spark route below, so
        # the cached idfs are bit-equal either way
        rows_pd = _pyarrow_term_dict(index, missing)
        if rows_pd is not None:
            n, _ = _index_stats(index)
            for term, df in zip(rows_pd["term"], rows_pd["df"]):
                cache[term] = float(
                    np.log(1.0 + (n - int(df) + 0.5) / (int(df) + 0.5))
                )
            for t in missing:
                cache.setdefault(t, None)  # zero-hit terms
            missing = []
    if missing and "_stats" not in index:
        rows = (
            _bucketed(index, index["term_dict"], missing)
            .filter(F.col("term").isin(missing))
            .select("term", "df")
            .crossJoin(index["stats"].select("n_docs", "avgdl"))
            .collect()
        )
        if rows:
            n0, a0 = rows[0]["n_docs"], rows[0]["avgdl"]
            index["_stats"] = (int(n0 or 0), float(a0) if a0 else 1.0)
            n, _ = index["_stats"]
            for r in rows:
                cache[r["term"]] = float(
                    np.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
                )
            for t in missing:
                cache.setdefault(t, None)  # zero-hit terms
            missing = []
        # rows empty => none of the terms exist; fall through to the
        # memoized stats fetch so avgdl/n are still resolved once
    n, avgdl = _index_stats(index)
    if missing:
        for r in (
            _bucketed(index, index["term_dict"], missing)
            .filter(F.col("term").isin(missing))
            .select("term", "df")
            .collect()
        ):
            cache[r["term"]] = float(
                np.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
            )
        for t in missing:
            cache.setdefault(t, None)  # zero-hit terms
    idfs = {t: cache[t] for t in terms if cache.get(t) is not None}
    return idfs, avgdl


#: upper bound on per-salt top-k rows merged driver-side by
#: wand_topk_batch (n_salts x live queries x k); above it the reduce
#: stays a distributed window — a scale guard, not a tuning knob.
_DRIVER_MERGE_MAX_ROWS = 262_144

#: size guard for the driver-local url fill (_pyarrow_doc_urls): the
#: doc_map table is unsorted, so the k-row isin filter still reads the
#: whole (doc_id, url) projection — fine for a serving node's local
#: index, unacceptable for a cluster-scale doc_map, which keeps the
#: broadcast-join route.
_DOC_MAP_LOCAL_MAX_BYTES = 2 << 30


def _pyarrow_doc_urls(index: dict, doc_ids) -> pd.DataFrame | None:
    """(doc_id, url) for the requested ids, read driver-side from the
    written doc_map — replaces the per-batch broadcast-join job against
    the corpus-sized doc_map with a ~10 ms local read when the reduce is
    already driver-side (wand_topk_batch's k-row merge).  Same parquet
    rows as the join route, inner-join semantics preserved by the
    caller's merge.  None -> caller keeps the Spark join (no readable
    dir, table swapped, or doc_map above the size guard)."""
    dmdir = index.get("_doc_map_dir")
    if not dmdir:
        return None
    try:
        import pyarrow.dataset as ds

        src = index.get("_dm_ds")
        if src is None:
            if not os.path.isdir(dmdir):
                return None
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(dmdir)
                for f in fs
            )
            if size > _DOC_MAP_LOCAL_MAX_BYTES:
                index["_doc_map_dir"] = None  # don't re-stat every call
                return None
            src = ds.dataset(dmdir, format="parquet")
            index["_dm_ds"] = src
        ids = sorted({int(d) for d in doc_ids})
        return src.to_table(
            columns=["doc_id", "url"], filter=ds.field("doc_id").isin(ids)
        ).to_pandas()
    except Exception:
        return None


def wand_topk_batch(
    index: dict,
    queries: dict[int, list[str]],
    k: int = 10,
    doc_filter: str | dict[int, str] | None = None,
    min_should_match: dict[int, int] | int | None = None,
    exclude_terms: dict[int, list[str]] | None = None,
    after: dict[int, tuple[float, int]] | None = None,
) -> DataFrame:
    """Answer a whole query batch in ONE Spark job (the server pattern:
    per-query Spark-job overhead is ~2 s in local mode, ~100x the kernel
    compute, so the query set is executed as a single applyInPandas stage
    and a single per-query top-k window).

    `doc_filter` is ES-msearch filter context: one shared predicate
    (str), or a per-query-id dict — each query scored only over the docs
    its own predicate admits, global stats untouched.  Distinct
    predicates are DEDUPLICATED (two queries sharing "lang = 'en'" ship
    one admitted-id set), and every set reaches the kernels per-salt via
    cogroup like the single-query path — never a driver collect.
    `min_should_match` (int = same bar for every query, or per-query-id
    dict) and `exclude_terms` (per-query-id dict) carry wand_topk's bool
    knobs into the batch: hit counts fall out of the shared per-term
    decode cache, and a query's excluded terms reuse the same cache for
    membership — excluded-term blocks are decoded at most once per salt
    even when several queries exclude them.  `after` (per-query-id
    (score, doc_id) cursor dict) pages each query independently —
    wand_topk's search_after contract, applied per query at reduce time.

    Returns (query_id, doc_id, url, score), top-k per query, ordered.
    """
    spark = index["doc_map"].sparkSession
    # normalize filters -> dedup'd predicate table + query->fid map
    if doc_filter is None:
        preds: dict[int, str] = {}
        fid_of: dict[int, int] = {}
    elif isinstance(doc_filter, str):
        preds = {0: doc_filter}
        fid_of = {qid: 0 for qid in queries}
    else:
        uniq: dict[str, int] = {}
        fid_of = {}
        for qid, p in doc_filter.items():
            if p is None:
                continue
            uniq.setdefault(p, len(uniq))
            fid_of[qid] = uniq[p]
        preds = {fid: p for p, fid in uniq.items()}
    if min_should_match is None:
        msm: dict[int, int] = {}
    elif isinstance(min_should_match, int):
        msm = {qid: int(min_should_match) for qid in queries}
    else:
        msm = {qid: int(m) for qid, m in min_should_match.items()}
    excl = {
        qid: sorted(set(ts)) for qid, ts in (exclude_terms or {}).items()
    }
    cursors = dict(after or {})
    all_terms = sorted({t for ts in queries.values() for t in ts})
    idfs, avgdl = _collect_idfs(index, all_terms)
    live = {qid: [t for t in ts if t in idfs] for qid, ts in queries.items()}
    # a query whose msm bar exceeds its live terms can never match
    live = {
        qid: ts for qid, ts in live.items()
        if ts and msm.get(qid, 0) <= len(set(ts))
    }
    empty = spark.createDataFrame(
        [], "query_id int, doc_id long, url string, score double"
    )
    if not live:
        return empty

    scan_excl = sorted({t for qid in live for t in excl.get(qid, [])})
    post = _postings_for_terms(
        index,
        sorted({t for ts in live.values() for t in ts} | set(scan_excl)),
    )
    # filter rows: kind 't' = tombstone, 'a<fid>' = admitted by predicate
    # fid — one labeled id set per DISTINCT predicate
    filt_parts = []
    tomb_df = _tomb_df(index)
    if tomb_df is not None:
        filt_parts.append(tomb_df.select("doc_id", F.lit("t").alias("kind")))
    for fid, p in preds.items():
        filt_parts.append(
            index["doc_map"].filter(p)
            .select("doc_id", F.lit(f"a{fid}").alias("kind"))
        )
    filt = None
    if filt_parts:
        filt = filt_parts[0]
        for fp in filt_parts[1:]:
            filt = filt.unionByName(fp)
        filt = filt.withColumn(
            "salt", F.pmod(F.col("doc_id"), F.lit(_n_parts(index))).cast("int")
        )

    def kernel(pdf: pd.DataFrame, side: pd.DataFrame | None) -> pd.DataFrame:
        if side is not None:
            tomb = np.sort(
                side.loc[side["kind"] == "t", "doc_id"].to_numpy(np.int64)
            )
            tomb = tomb if tomb.size else None
            allowed_by_fid = {
                int(kd[1:]): np.sort(g["doc_id"].to_numpy(np.int64))
                for kd, g in side.groupby("kind", sort=False)
                if kd != "t"
            }
        else:
            tomb = None
            allowed_by_fid = {}
        # Queries in a batch share Zipf-head terms ("the", "data", ...);
        # decode each term's blocks ONCE per salt and cache the per-doc
        # BM25 contributions — each query then reduces cached arrays.
        # Full accumulation (no WAND skip) is rank-identical: pruning only
        # ever drops provably-sub-top-k docs, and here decode cost is
        # already amortized across the batch.
        by_term = {t: g for t, g in pdf.groupby("term", sort=False)}
        cache: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        excl_cache: dict[str, np.ndarray] = {}

        def excl_member_ids(t: str) -> np.ndarray:
            # must_not needs MEMBERSHIP only: decode doc_gaps alone (tf/dl
            # stay compressed) and never touch idfs — an excluded term is
            # usually not a query term, so it has no idf entry at all.
            # Tombstone/allowed masks are irrelevant here: removing an
            # already-removed id is a no-op.
            if t not in excl_cache:
                g = by_term.get(t)
                excl_cache[t] = (
                    _decode_ids_only(g)
                    if g is not None
                    else np.array([], dtype=np.int64)
                )
            return excl_cache[t]

        def term_contrib(t: str) -> tuple[np.ndarray, np.ndarray] | None:
            if t in cache:
                return cache[t]
            g = by_term.get(t)
            if g is None:
                return None
            g = g.sort_values("block_id")
            ids, tfs, dls = decode_many(
                [bytes(x) for x in g["doc_gaps"]],
                [bytes(x) for x in g["tf_bytes"]],
                [bytes(x) for x in g["dl_bytes"]],
                g["n_docs"].to_numpy(),
            )
            ids = ids.astype(np.int64)
            if tomb is not None and tomb.size:
                live_m = ~np.isin(ids, tomb)
                ids = ids[live_m]
                tfs, dls = tfs[live_m], dls[live_m]
            # per-query doc_filters are applied at reduce time, NOT here —
            # the decode cache must stay filter-agnostic to be shared
            w = _bm25_w(
                tfs.astype(np.float64), dls.astype(np.float64), avgdl, idfs[t]
            )
            cache[t] = (ids, w)
            return cache[t]

        outs = []
        for qid, ts in live.items():
            arrs = [a for a in (term_contrib(t) for t in ts) if a is not None]
            if not arrs or not any(a[0].size for a in arrs):
                continue
            all_ids = np.concatenate([a[0] for a in arrs])
            all_w = np.concatenate([a[1] for a in arrs])
            fid = fid_of.get(qid)
            if fid is not None:
                allowed = allowed_by_fid.get(
                    fid, np.array([], dtype=np.int64)
                )
                if allowed.size == 0:
                    continue  # this query's filter admits nothing here
                pos = np.searchsorted(allowed, all_ids)
                pos[pos >= allowed.size] = 0
                ok = allowed[pos] == all_ids
                if not ok.any():
                    continue
                all_ids, all_w = all_ids[ok], all_w[ok]
            order = np.argsort(all_ids, kind="stable")
            all_ids, all_w = all_ids[order], all_w[order]
            uniq, starts = np.unique(all_ids, return_index=True)
            sums = np.round(np.add.reduceat(all_w, starts), SCORE_DECIMALS)
            if msm.get(qid, 0) > 1:
                # hit count per doc = run length of each unique id (every
                # term contributes one posting per doc)
                hits = np.diff(np.append(starts, all_ids.size))
                keep = hits >= msm[qid]
                uniq, sums = uniq[keep], sums[keep]
            ex = excl.get(qid)
            if ex:
                ex_arrs = [
                    a for a in (excl_member_ids(t) for t in ex) if a.size
                ]
                if ex_arrs:
                    ex_ids = np.unique(np.concatenate(ex_arrs))
                    keep = ~np.isin(uniq, ex_ids)
                    uniq, sums = uniq[keep], sums[keep]
            cur = cursors.get(qid)
            if cur is not None:
                # search_after: only docs strictly past this query's
                # cursor (sums are already rounded, matching the global
                # order — same contract as _score_salt_group(after=))
                a_s, a_d = float(cur[0]), int(cur[1])
                keep = (sums < a_s) | ((sums == a_s) & (uniq > a_d))
                uniq, sums = uniq[keep], sums[keep]
            if uniq.size == 0:
                continue
            top = min(k, uniq.size)
            sel = np.lexsort((uniq, -sums))[:top]
            outs.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(top, qid, dtype=np.int32),
                        "doc_id": uniq[sel],
                        "score": sums[sel],
                    }
                )
            )
        if not outs:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int32"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    out_schema = "query_id int, doc_id long, score double"
    if filt is None:
        local = post.groupBy("salt").applyInPandas(
            lambda p: kernel(p, None), out_schema
        )
    else:
        local = (
            post.groupBy("salt")
            .cogroup(filt.groupBy("salt"))
            .applyInPandas(lambda p, s: kernel(p, s), out_schema)
        )
    # Reduce: k-way merge of the per-salt top-ks.  `local` is k-row
    # bounded (<= n_salts * k rows per query), so for serving-sized
    # batches the merge is done driver-side in one pass — the query-node
    # reduce, same k-row-collect class as wand_topk_local — which drops
    # the window shuffle + separate broadcast job from the plan (2 fewer
    # stages per batch).  Above _DRIVER_MERGE_MAX_ROWS (huge fan-out x
    # thousand-query batches on a big cluster) the distributed window
    # reduce is kept — identical results either way.
    if _n_parts(index) * len(live) * k <= _DRIVER_MERGE_MAX_ROWS:
        rows = local.toPandas()
        if rows.empty:
            return empty
        rows = rows.sort_values(
            ["query_id", "score", "doc_id"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = rows.groupby("query_id", sort=False).head(k)
        # url fill: the reduce is already driver-side and k-row bounded,
        # so on a written index the (doc_id, url) lookup is a driver-
        # local parquet read too — the whole result becomes a LOCAL
        # relation and the per-batch broadcast-join job over the
        # corpus-sized doc_map disappears (measured ~0.22 s of the
        # 1.5 s cold batch).  Same rows: same parquet, inner-merge ==
        # inner-join, same (query_id, score desc, doc_id) final order.
        urls = _pyarrow_doc_urls(index, top["doc_id"].unique())
        if urls is not None:
            out = top.merge(urls, on="doc_id", how="inner").sort_values(
                ["query_id", "score", "doc_id"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            return spark.createDataFrame(
                out[["query_id", "doc_id", "url", "score"]],
                "query_id int, doc_id long, url string, score double",
            )
        topk = spark.createDataFrame(
            top, "query_id int, doc_id long, score double"
        )
    else:
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        topk = (
            local.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
    return (
        index["doc_map"]
        .select("doc_id", "url")
        .join(F.broadcast(topk), "doc_id", "inner")
        .select("query_id", "doc_id", "url", "score")
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )


_LOCAL_FETCH_COLS = [
    "term", "block_id", "n_docs", "first_doc_id", "last_doc_id",
    "doc_gaps", "tf_bytes", "dl_bytes", "block_max_tf",
]


def _pyarrow_blocks(index: dict, terms: list[str]) -> pd.DataFrame | None:
    """Bucket-pruned driver-local read of the written postings table —
    the query-node serving pattern query/docstore.py and fuzzy.py already
    use.  Returns None when the index has no on-disk postings dir this
    process can read (in-memory build, multi-segment view, remote URI);
    the caller then falls back to the Spark fetch.

    Identical rows to the Spark route: both read the same parquet files
    under {_postings_dir}, prune to the query terms' term_bucket
    partitions with the same driver-side XXH64, and filter term IN (...).
    Only the fetch ENGINE changes — measured 8 cold queries 1.3 s -> 0.47 s
    (jobs/probe_wandlocal.py, rank-identity asserted), because a cold
    term no longer pays a whole Spark job for a few MB of blocks.  The
    opened dataset (file listing + parquet footers) is memoized on the
    handle, like docstore's ds_cache."""
    pdir = index.get("_postings_dir")
    if not pdir:
        return None
    try:
        import pyarrow.dataset as ds

        src = index.get("_post_ds")
        if src is None:
            if not os.path.isdir(pdir):
                return None
            src = ds.dataset(pdir, format="parquet", partitioning="hive")
            index["_post_ds"] = src
        from ..functions.xxhash import term_bucket
        from ..index.build import N_TERM_BUCKETS

        buckets = sorted({term_bucket(t, N_TERM_BUCKETS) for t in terms})
        filt = ds.field("term_bucket").isin(buckets) & ds.field("term").isin(
            terms
        )
        return src.to_table(columns=_LOCAL_FETCH_COLS, filter=filt).to_pandas()
    except Exception:
        return None


def _local_blocks(
    index: dict, scan_terms: list[str], want_terms: list[str]
) -> pd.DataFrame | None:
    """Hot-shard cache: posting blocks are fetched per term once and kept
    driver-side (what a query node keeps in memory); repeated terms across
    the query stream skip Spark entirely.  Fetches `scan_terms` into the
    cache, returns the concatenated blocks of `want_terms` (None if none
    have postings).

    Cold fetch engine: a written single-segment index (read_index sets
    _postings_dir) is read driver-side via pyarrow — same files, same
    bucket pruning, no Spark job (see _pyarrow_blocks).  Every other
    handle (in-memory build, as_index multi-segment union, resized
    postings) takes the pruned Spark fetch.  Consumers are fetch-order
    agnostic: each one either re-sorts by block_id per term (unique
    within a segment) or re-sorts decoded ids, so the two engines are
    interchangeable row-set-wise (probe asserts rank identity)."""
    cache = index.setdefault("_local_post_cache", {})
    missing = [t for t in scan_terms if t not in cache]
    if missing:
        fetched = _pyarrow_blocks(index, missing)
        if fetched is None:
            fetched = (
                _postings_for_terms(index, missing)
                .select(*_LOCAL_FETCH_COLS)
                .toPandas()
            )
        for t, g in fetched.groupby("term", sort=False):
            cache[t] = g
        for t in missing:
            cache.setdefault(t, None)
    parts = [cache[t] for t in want_terms if cache.get(t) is not None]
    if not parts:
        return None
    return pd.concat(parts, ignore_index=True)


#: cap on total decoded postings kept resident by the local query node
#: (ids+tf+dl ≈ 24 B/posting → 50M ≈ 1.2 GB, the order of a Lucene
#: node's hot page cache).  FIFO eviction; encoded blocks stay in
#: _local_post_cache so an evicted term re-decodes without a Spark job.
_LOCAL_DECODE_CAP = 50_000_000


def _term_arrays(index: dict, term: str) -> tuple | None:
    """Decoded, doc_id-sorted (ids, tfs, dls) for one term's full posting
    list, kept resident on the index handle — the in-memory hot-postings
    a warm query node holds (the decode analogue of _local_blocks' block
    cache).  Repeated queries over the same term skip both Spark and the
    varbyte decode.  None if the term has no postings."""
    cache = index.setdefault("_local_decoded", {})
    if term in cache:
        return cache[term]
    g = _local_blocks(index, [term], [term])
    if g is None:
        cache[term] = None
        return None
    ids, tfs, dls = decode_many(
        [bytes(x) for x in g["doc_gaps"]],
        [bytes(x) for x in g["tf_bytes"]],
        [bytes(x) for x in g["dl_bytes"]],
        g["n_docs"].to_numpy(),
    )
    order = np.argsort(ids, kind="stable")
    entry = (
        ids[order].astype(np.int64),
        tfs[order].astype(np.float64),
        dls[order].astype(np.float64),
    )
    index["_local_decoded_n"] = index.get("_local_decoded_n", 0) + ids.size
    cache[term] = entry
    while index["_local_decoded_n"] > _LOCAL_DECODE_CAP and len(cache) > 1:
        old_t = next(iter(cache))
        if old_t == term:
            break
        old = cache.pop(old_t)
        if old is not None:
            index["_local_decoded_n"] -= old[0].size
    return entry


def wand_topk_local(
    index: dict,
    terms: list[str],
    k: int = 10,
    doc_filter: str | None = None,
    conjunctive: bool = False,
    min_should_match: int = 0,
    exclude_terms: list[str] | None = None,
    after: tuple[float, int] | None = None,
    stats_override: tuple[dict, float] | None = None,
) -> list[tuple]:
    """Low-latency single-query path: the driver acts as the query node.

    One Spark action warms any cold terms' posting blocks (partition-
    pruned, a few MB even for Zipf-head terms at bench scale); decoded
    postings stay resident per term (_term_arrays), so a warm query is a
    single vectorized merge over in-memory arrays — no Spark, no varbyte
    decode, no per-term accumulator re-sort.  Full accumulation (not
    MaxScore candidate pruning): with the decode amortized away, one
    argsort+reduceat over the query terms' postings is cheaper and
    trivially exact.  At true 10^12 scale a query node would hold the hot
    term shards exactly like this; the executor path
    (wand_topk/wand_topk_batch) remains the fan-out for fat queries.
    `min_should_match` / `exclude_terms` follow wand_topk's contract.

    Returns [(doc_id, score), ...] rank-identical to wand_topk.
    """
    exclude = sorted(set(exclude_terms or []))
    # prefetch every cold term's blocks (query + must_not) in ONE pruned
    # Spark job; for the default stats path _local_idfs then derives the
    # idfs from the cached blocks, so a cold query pays exactly one
    # Spark action (the r5 shape was two: term_dict scan + block fetch)
    blocks = index.setdefault("_local_post_cache", {})
    prefetch = [
        t for t in sorted(set(terms) | set(exclude)) if t not in blocks
    ]
    if prefetch:
        _local_blocks(index, prefetch, [])
    if stats_override is not None:
        # external statistics (dfs federation / sparse_vector weights) —
        # same contract as wand_topk's stats_override
        ext_idfs, avgdl = stats_override
        idfs = {
            t: float(v)
            for t, v in ext_idfs.items()
            if t in set(terms) and v is not None
        }
    else:
        idfs, avgdl = _local_idfs(index, terms)
    n_terms = len(set(terms))
    require_all = n_terms if conjunctive else int(min_should_match)
    if not idfs or require_all > len(idfs):
        return []
    tomb = _tomb_array(index)
    if exclude:
        ex_parts = [
            a[0] for a in (_term_arrays(index, t) for t in exclude)
            if a is not None
        ]
        if ex_parts:
            ex_ids = np.unique(np.concatenate(ex_parts))
            tomb = np.union1d(tomb, ex_ids) if tomb.size else ex_ids
    allowed = _allowed_ids(index, doc_filter)
    parts_ids, parts_w = [], []
    for t in sorted(idfs):
        arr = _term_arrays(index, t)
        if arr is None:
            continue
        ids, tfs, dls = arr
        parts_ids.append(ids)
        parts_w.append(_bm25_w(tfs, dls, avgdl, idfs[t]))
    if not parts_ids:
        return []
    all_ids = np.concatenate(parts_ids)
    all_w = np.concatenate(parts_w)
    lo, hi = int(all_ids.min()), int(all_ids.max())
    span = hi - lo + 1
    if span <= max(8_000_000, 4 * all_ids.size):
        # Dense accumulators over the node's doc-id window — the Lucene
        # shape (scoring runs per segment over a dense segment-local
        # docID space, so the accumulator is bounded by segment size,
        # never corpus size).  O(postings) with no sort.
        off = all_ids - lo
        sums_d = np.bincount(off, weights=all_w, minlength=span)
        hits_d = np.bincount(off, minlength=span)
        nz = np.flatnonzero(hits_d)
        uniq = nz + lo
        sums = sums_d[nz]
        hits = hits_d[nz]
    else:
        order = np.argsort(all_ids, kind="stable")
        all_ids, all_w = all_ids[order], all_w[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], all_ids[1:] != all_ids[:-1]))
        )
        uniq = all_ids[bounds]
        sums = np.add.reduceat(all_w, bounds)
        hits = np.diff(np.append(bounds, all_ids.size))
    keep = np.ones(uniq.size, dtype=bool)
    if tomb is not None and tomb.size:
        keep &= ~np.isin(uniq, tomb)
    if allowed is not None:
        if allowed.size:
            pos = np.searchsorted(allowed, uniq)
            pos[pos >= allowed.size] = 0
            keep &= allowed[pos] == uniq
        else:
            keep &= False
    if require_all:
        keep &= hits >= require_all
    uniq, sums = uniq[keep], sums[keep]
    if uniq.size == 0:
        return []
    rounded = np.round(sums, SCORE_DECIMALS)
    if after is not None:
        a_score, a_doc = float(after[0]), int(after[1])
        m = (rounded < a_score) | ((rounded == a_score) & (uniq > a_doc))
        uniq, rounded = uniq[m], rounded[m]
        if uniq.size == 0:
            return []
    if uniq.size > 4096 and k < uniq.size:
        # prune to the rounded top-k band (ties kept) before the lexsort
        thresh = np.partition(rounded, rounded.size - k)[rounded.size - k]
        m = rounded >= thresh
        uniq, rounded = uniq[m], rounded[m]
    top = np.lexsort((uniq, -rounded))[: min(k, uniq.size)]
    res = pd.DataFrame({"doc_id": uniq[top], "score": rounded[top]})
    return list(res.itertuples(index=False, name=None))
