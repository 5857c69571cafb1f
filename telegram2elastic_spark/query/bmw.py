"""Pivot-based DAAT Block-Max WAND — the textbook algorithm, cursor form.

Two scorers implement the north_star "posting-list intersection with
block-max WAND pruning":

  * query/wand._score_salt_group — the production kernel: TAAT
    MaxScore-family with block-max skipping, fully numpy-vectorized
    (per-doc Python loops are 100-1000x slower than batch numpy at this
    granularity, so the vectorized family member is the hot path);
  * this module — the classical document-at-a-time pivot algorithm
    (Broder et al. WAND + Ding/Suel block-max extension): term cursors,
    pivot selection on cumulative upper bounds, block-level skip using
    per-block max-tf bounds, and deep-pointer advance past dead blocks.

Both produce identical top-k (tested against each other and the relational
oracle).  The cursor form is the reference implementation / spec; it also
serves small-k point lookups where its O(skipped) behavior wins.

Exactness with the engine's deterministic tie-break (round to 5 decimals,
then doc_id asc): pruning uses theta - 1.1e-5 so a document whose raw score
rounds equal to the current k-th score can never be skipped before the
final (rounded score, doc_id) sort.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd

from ..index.codec import decode_block, varbyte_decode
from .bm25 import B, K1, ROUND_GUARD, SCORE_DECIMALS
from .wand import _collect_idfs, _postings_for_terms, _term_ub, _tomb_array

_ROUND_GUARD = ROUND_GUARD
_INF = np.iinfo(np.int64).max


class _Cursor:
    """Posting cursor over one term's sorted blocks (lazy decode)."""

    __slots__ = (
        "idf", "firsts", "lasts", "bubs", "gaps", "tfb", "dlb",
        "bi", "ids", "tfs", "dls", "pos", "doc", "_stats",
    )

    def __init__(self, g: pd.DataFrame, idf: float, stats: dict | None = None):
        # cursors need a doc-sorted block stream: first_doc_id order IS doc
        # order whenever block ranges don't overlap (callers validate; see
        # _ranges_monotone) — this also covers multi-salt local runs where
        # block_id restarts per salt.
        g = g.sort_values("first_doc_id")
        self._stats = stats
        self.idf = idf
        self.firsts = g["first_doc_id"].to_numpy(dtype=np.int64)
        self.lasts = g["last_doc_id"].to_numpy(dtype=np.int64)
        mtf = g["block_max_tf"].to_numpy(dtype=np.float64)
        self.bubs = idf * mtf * (K1 + 1.0) / (mtf + K1 * (1.0 - B))
        self.gaps = list(g["doc_gaps"])
        self.tfb = list(g["tf_bytes"])
        self.dlb = list(g["dl_bytes"])
        self.bi = -1
        self.ids = self.tfs = self.dls = None
        self.pos = 0
        self.doc = -1
        self._load_block(0)

    def _load_block(self, bi: int) -> None:
        """Move the block pointer on METADATA ONLY (Ding-Suel deep
        pointer): doc becomes the block's first_doc_id; the block body is
        decoded lazily on first in-block access (_ensure) — dead-zone jumps
        over pruned blocks therefore never decode them."""
        if bi >= len(self.gaps):
            self.doc = _INF
            return
        self.bi = bi
        self.ids = None  # lazy
        self.pos = 0
        self.doc = int(self.firsts[bi])

    def _ensure(self) -> None:
        if self.ids is not None:
            return
        if self._stats is not None:
            self._stats["blocks_decoded"] = self._stats.get("blocks_decoded", 0) + 1
        ids, tfs = decode_block(bytes(self.gaps[self.bi]), bytes(self.tfb[self.bi]))
        self.ids = ids.astype(np.int64)
        self.tfs = tfs.astype(np.float64)
        self.dls = varbyte_decode(bytes(self.dlb[self.bi])).astype(np.float64)
        # pos/doc were set from metadata (pos=0, doc=first_doc_id) or by an
        # in-block seek that already decoded; both stay consistent.

    def block_ub(self) -> float:
        return float(self.bubs[self.bi]) if self.doc != _INF else 0.0

    def block_last(self) -> int:
        return int(self.lasts[self.bi]) if self.doc != _INF else _INF

    def next(self) -> None:
        if self.doc == _INF:
            return
        self._ensure()
        self.pos += 1
        if self.pos < self.ids.size:
            self.doc = int(self.ids[self.pos])
        else:
            self._load_block(self.bi + 1)

    def seek(self, target: int) -> None:
        """Advance to the first doc >= target (block skip + in-block)."""
        if self.doc >= target:
            return
        bi = int(np.searchsorted(self.lasts, target, side="left"))
        if bi >= len(self.gaps):
            self.doc = _INF
            return
        if bi != self.bi:
            self._load_block(bi)
            if self.doc >= target:
                return  # landed on block metadata; no decode needed
        self._ensure()
        self.pos = int(np.searchsorted(self.ids, target, side="left"))
        if self.pos < self.ids.size:
            self.doc = int(self.ids[self.pos])
        else:
            self._load_block(self.bi + 1)

    def weight(self, avgdl: float) -> float:
        self._ensure()
        tf = self.tfs[self.pos]
        dl = self.dls[self.pos]
        return (
            self.idf * tf * (K1 + 1.0)
            / (tf + K1 * (1.0 - B + B * dl / avgdl))
        )


def bmw_topk_blocks(
    post: pd.DataFrame,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    tombstones: frozenset | None = None,
    allowed: frozenset | None = None,
    stats: dict | None = None,
) -> list[tuple[int, float]]:
    """Classical BMW over one doc-sorted set of posting blocks.

    `allowed`: optional admitted-doc set (ES filter-context) — a pivot not
    in it is skipped exactly like a tombstoned doc (never scored, never
    occupies a heap slot).  `stats`: optional dict accumulating
    blocks_decoded / blocks_total (pruning-effectiveness telemetry).

    Returns [(doc_id, rounded_score)] sorted by (score desc, doc_id asc).
    """
    cursors = [
        _Cursor(g, idfs[t], stats=stats)
        for t, g in post.groupby("term", sort=False)
    ]
    if stats is not None:
        stats["blocks_total"] = stats.get("blocks_total", 0) + len(post)
    term_ubs = [float(c.bubs.max()) for c in cursors]
    # Min-heap keyed by the FINAL order (rounded score, -doc_id): admission
    # and eviction then agree exactly with the (rounded score desc, doc_id
    # asc) ranking — a raw score just below the heap minimum that rounds
    # equal and wins the doc_id tie is admitted, never dropped.
    heap: list[tuple[float, int]] = []  # (rounded score, -doc_id) min-heap

    def theta() -> float:
        # heap[0][0] is rounded; raw-score pruning bounds must keep any doc
        # whose raw score could round up to it — hence the guard.
        return heap[0][0] - _ROUND_GUARD if len(heap) >= k else -math.inf

    while True:
        live = [c for c in cursors if c.doc != _INF]
        if not live:
            break
        live.sort(key=lambda c: c.doc)
        # pivot: smallest prefix whose summed term UBs could beat theta
        acc = 0.0
        pivot_i = None
        for i, c in enumerate(live):
            acc += term_ubs[cursors.index(c)]
            if acc > theta():
                pivot_i = i
                break
        if pivot_i is None:
            break  # even all terms together cannot beat theta
        pivot_doc = live[pivot_i].doc

        if live[0].doc == pivot_doc:
            # block-max check: refine the bound with current-block maxima
            block_bound = sum(
                c.block_ub() for c in live if c.doc <= pivot_doc
            )
            if block_bound > theta():
                if (tombstones and pivot_doc in tombstones) or (
                    allowed is not None and pivot_doc not in allowed
                ):
                    for c in live:
                        if c.doc == pivot_doc:
                            c.next()
                    continue
                score = 0.0
                for c in live:
                    if c.doc == pivot_doc:
                        score += c.weight(avgdl)
                for c in live:
                    if c.doc == pivot_doc:
                        c.next()
                cand = (round(score, SCORE_DECIMALS), -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, cand)
                elif cand > heap[0]:
                    heapq.heapreplace(heap, cand)
            else:
                # dead zone: every doc in [pivot_doc, d'] is bounded by the
                # current blocks of the pivot-prefix cursors, PROVIDED no
                # non-prefix cursor starts before d' (Ding-Suel cap) — jump
                # the prefix cursors past the shallowest of those bounds.
                prefix = [c for c in live if c.doc <= pivot_doc]
                nxt = min(c.block_last() for c in prefix) + 1
                rest = [c.doc for c in live if c.doc > pivot_doc]
                if rest:
                    nxt = min(nxt, min(rest))
                if nxt <= pivot_doc:
                    # a lagging cursor's block ends before the pivot —
                    # advance it to the pivot instead of block-skipping
                    prefix[0].seek(pivot_doc)
                else:
                    for c in prefix:
                        c.seek(nxt)
        else:
            # advance one preceding cursor up to the pivot
            live[0].seek(pivot_doc)

    out = [(-nd, s) for s, nd in heap]  # scores already rounded
    out.sort(key=lambda x: (-x[1], x[0]))
    return out


def _ranges_monotone(post: pd.DataFrame) -> bool:
    """True iff every term's blocks have non-overlapping doc ranges when
    sorted by first_doc_id — the cursor-stream invariant.  Holds for any
    single build; multi-segment groups may interleave ranges."""
    for _, g in post.groupby("term", sort=False):
        gs = g.sort_values("first_doc_id")
        firsts = gs["first_doc_id"].to_numpy()
        lasts = gs["last_doc_id"].to_numpy()
        if firsts.size > 1 and (firsts[1:] <= lasts[:-1]).any():
            return False
    return True


def bmw_salt_kernel(
    post: pd.DataFrame,
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    tombstones=None,
    allowed=None,
) -> pd.DataFrame:
    """Executor-side pivot DAAT BMW over one salt group -> local top-k pdf
    (same contract as wand._score_salt_group, so wand_topk can swap kernels).

    When a multi-segment group interleaves block ranges (cursor invariant
    broken), falls back to the vectorized TAAT kernel for that group —
    identical results either way (both rank-exact)."""
    from .wand import _EMPTY, _score_salt_group

    if post.empty:
        return _EMPTY.copy()
    if not _ranges_monotone(post):
        return _score_salt_group(
            post, idfs, avgdl, k, tombstones=tombstones, allowed=allowed
        )
    tomb_set = (
        frozenset(np.asarray(tombstones).tolist())
        if tombstones is not None and len(tombstones)
        else None
    )
    allow_set = (
        frozenset(np.asarray(allowed).tolist()) if allowed is not None else None
    )
    res = bmw_topk_blocks(
        post, idfs, avgdl, k, tombstones=tomb_set, allowed=allow_set
    )
    if not res:
        return _EMPTY.copy()
    ids, scores = zip(*res)
    return pd.DataFrame(
        {
            "doc_id": np.array(ids, dtype=np.int64),
            "score": np.array(scores, dtype=np.float64),
        }
    )


def bmw_topk_local(index: dict, terms: list[str], k: int = 10) -> list[tuple]:
    """Driver-local BMW over the whole index.

    The doc-partitioned layout stores blocks per (term, salt); cursors need
    one doc-sorted sequence per term, so BMW runs per salt and the partial
    top-ks merge — exactly the distributed plan, executed serially.
    """
    idfs, avgdl = _collect_idfs(index, terms)
    if not idfs:
        return []
    pdf = (
        _postings_for_terms(index, list(idfs))
        .select(
            "term", "salt", "block_id", "n_docs", "first_doc_id",
            "last_doc_id", "doc_gaps", "tf_bytes", "dl_bytes", "block_max_tf",
        )
        .toPandas()
    )
    tomb = frozenset(_tomb_array(index).tolist())
    results: list[tuple[int, float]] = []
    for _, g in pdf.groupby("salt", sort=False):
        results.extend(bmw_topk_blocks(g, idfs, avgdl, k, tombstones=tomb))
    results.sort(key=lambda x: (-x[1], x[0]))
    return results[:k]
