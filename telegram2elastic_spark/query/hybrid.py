"""Hybrid retrieval — ES 8.x `retriever` API: RRF and linear fusion.

Elasticsearch's hybrid search fuses a lexical (BM25) ranked list with a
semantic (knn) ranked list.  The reference serves search through ES
(poc/src/api/routes/search.py — ranked retrieval delegated to the ES
query DSL); in ES 8.14+ the same endpoint accepts
``retriever: {rrf: {retrievers: [standard, knn], rank_window_size,
rank_constant}}`` and ``retriever: {linear: ...}`` — this module owns
those fusers over the engine's own BM25 path and the exact cosine knn
path.

Scale shape: each leg is an independent top-``window`` retrieval (the
verified WAND / IVF paths at scale; here the oracle-paired relational
legs), so fusion sees at most ``2 * window`` rows — driver-trivial.  The
fuse itself is a full outer join of two k-row lists plus one ordered
limit: no corpus-sized work after the legs.  Ranks are assigned over the
already-truncated windows (bounded single-partition Window, same
deliberate pattern as query/search.py pagination).

Determinism: both legs break ties by doc_id asc before ranks are
assigned; RRF contributions 1/(c+r) are summed as a fixed two-term
expression (no aggregation-order float noise) and rounded to 6 decimals
before the final order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.similarity import cosine_topk, cosine_topk_sql
from .bm25 import bm25_topk, bm25_topk_sql

RRF_DECIMALS = 6


def _ranked(leg: DataFrame, order_col: str, rank_alias: str) -> DataFrame:
    # leg is already truncated to `window` rows — the lit(0) partition is
    # a bounded, deliberate single-partition window (see query/search.py).
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.desc(order_col), F.asc("doc_id")
    )
    return leg.select("doc_id", F.row_number().over(w).alias(rank_alias))



def _lex_leg(
    corpus: DataFrame | None, terms: list[str], window: int,
    index: dict | None,
) -> DataFrame:
    """Lexical top-window: index-backed WAND when an index is given (the
    serving shape — rank-identical to relational BM25 by the engine's
    core invariant), relational BM25 otherwise (the oracle shape)."""
    if index is not None:
        from .wand import wand_topk

        return wand_topk(index, terms, k=window).select("doc_id", "score")
    return bm25_topk(corpus, terms, k=window)


def rrf_hybrid_topk(
    corpus: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    window: int = 20,
    rank_const: int = 60,
    index: dict | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion of the BM25 leg and the exact-cosine knn
    leg: score(d) = sum over legs containing d of 1 / (rank_const +
    rank_leg(d)), over each leg's top-`window`.

    Returns (doc_id, lex_rank, sem_rank, rrf_score) ordered by
    rrf_score desc, doc_id asc, limit k.  Absent-leg ranks are NULL
    (ES reports the per-retriever rank only when the doc appeared in
    that window).
    """
    lex = _ranked(_lex_leg(corpus, terms, window, index), "score", "lex_rank")
    sem = _ranked(
        cosine_topk(embeddings, query_vec_id=query_vec_id, k=window).select(
            F.col("vec_id").alias("doc_id"), "cosine"
        ),
        "cosine",
        "sem_rank",
    )
    c = float(rank_const)
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "sem_rank",
        F.round(
            F.coalesce(1.0 / (F.lit(c) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(c) + F.col("sem_rank")), F.lit(0.0)),
            RRF_DECIMALS,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(k)


def rrf_hybrid_sql(
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    window: int = 20,
    rank_const: int = 60,
) -> str:
    c = float(rank_const)
    return f"""
WITH lexq AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS lex_rank
  FROM ({bm25_topk_sql(terms, k=window).strip()}) l
),
semq AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cosine DESC, vec_id ASC) AS sem_rank
  FROM ({cosine_topk_sql(query_vec_id=query_vec_id, k=window).strip()}) s
)
SELECT COALESCE(lexq.doc_id, semq.doc_id) AS doc_id,
       lex_rank, sem_rank,
       round(COALESCE(1.0 / ({c} + lex_rank), 0.0)
             + COALESCE(1.0 / ({c} + sem_rank), 0.0), {RRF_DECIMALS})
           AS rrf_score
FROM lexq FULL OUTER JOIN semq ON lexq.doc_id = semq.doc_id
ORDER BY rrf_score DESC, doc_id ASC
LIMIT {k}
"""


def linear_hybrid_topk(
    corpus: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    window: int = 20,
    w_lex: float = 0.7,
    w_sem: float = 0.3,
    index: dict | None = None,
) -> DataFrame:
    """ES `linear` retriever with the `minmax` normalizer: each leg's
    scores are scaled to [0, 1] over its own top-`window` (max -> 1,
    min -> 0; a constant leg maps to 1.0 as ES does when max == min),
    then combined as w_lex * lex + w_sem * sem with absent legs
    contributing 0.

    Returns (doc_id, fused_score) ordered desc, doc_id asc, limit k.
    """

    def norm(leg: DataFrame, col: str, alias: str) -> DataFrame:
        b = Window.partitionBy(F.lit(0))  # bounded: <= window rows
        mx, mn = F.max(col).over(b), F.min(col).over(b)
        return leg.select(
            "doc_id",
            F.when(mx == mn, F.lit(1.0))
            .otherwise((F.col(col) - mn) / (mx - mn))
            .alias(alias),
        )

    lex = norm(_lex_leg(corpus, terms, window, index), "score", "lex_n")
    sem = norm(
        cosine_topk(embeddings, query_vec_id=query_vec_id, k=window).select(
            F.col("vec_id").alias("doc_id"), "cosine"
        ),
        "cosine",
        "sem_n",
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.lit(float(w_lex)) * F.coalesce("lex_n", F.lit(0.0))
            + F.lit(float(w_sem)) * F.coalesce("sem_n", F.lit(0.0)),
            RRF_DECIMALS,
        ).alias("fused_score"),
    )
    return fused.orderBy(F.desc("fused_score"), F.asc("doc_id")).limit(k)


def linear_hybrid_sql(
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    window: int = 20,
    w_lex: float = 0.7,
    w_sem: float = 0.3,
) -> str:
    return f"""
WITH lexq AS (
  SELECT doc_id,
         CASE WHEN max(score) OVER () = min(score) OVER () THEN 1.0
              ELSE (score - min(score) OVER ())
                   / (max(score) OVER () - min(score) OVER ()) END AS lex_n
  FROM ({bm25_topk_sql(terms, k=window).strip()}) l
),
semq AS (
  SELECT vec_id AS doc_id,
         CASE WHEN max(cosine) OVER () = min(cosine) OVER () THEN 1.0
              ELSE (cosine - min(cosine) OVER ())
                   / (max(cosine) OVER () - min(cosine) OVER ()) END AS sem_n
  FROM ({cosine_topk_sql(query_vec_id=query_vec_id, k=window).strip()}) s
)
SELECT COALESCE(lexq.doc_id, semq.doc_id) AS doc_id,
       round({float(w_lex)} * COALESCE(lex_n, 0.0)
             + {float(w_sem)} * COALESCE(sem_n, 0.0), {RRF_DECIMALS})
           AS fused_score
FROM lexq FULL OUTER JOIN semq ON lexq.doc_id = semq.doc_id
ORDER BY fused_score DESC, doc_id ASC
LIMIT {k}
"""


# --- driver-local serving twin -------------------------------------------------

def _emb_matrix(index: dict, emb_path: str):
    """(vec_ids int64[], M float64[N, dim]) — the embedding shard a query
    node holds resident (pyarrow read, cached on the index dict)."""
    import numpy as np

    cache = index.setdefault("_emb_cache", {})
    if emb_path not in cache:
        import pyarrow.dataset as ds

        tbl = ds.dataset(emb_path, format="parquet").to_table(
            columns=["vec_id", "embedding"]
        )
        ids = tbl["vec_id"].to_numpy().astype(np.int64)
        M = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
        order = np.argsort(ids)
        cache[emb_path] = (ids[order], M[order])
    return cache[emb_path]


def _fold_dot(a, b) -> float:
    """Sequential left-fold sum, matching F.aggregate's fold order so the
    5-decimal rounding is bit-identical to the relational leg."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _cosine_leg_local(
    index: dict, emb_path: str, query_vec_id: int, window: int
) -> list[tuple[int, float]]:
    import numpy as np

    ids, M = _emb_matrix(index, emb_path)
    qi = np.searchsorted(ids, int(query_vec_id))
    if qi >= ids.size or ids[qi] != int(query_vec_id):
        return []
    qv = M[qi]
    # vectorized preselect, then exact left-fold recompute of the
    # candidates so rounding ties resolve exactly like the Spark leg
    denom = np.sqrt((M * M).sum(axis=1)) * np.sqrt((qv * qv).sum())
    approx = (M @ qv) / np.where(denom == 0, 1.0, denom)
    approx[qi] = -np.inf
    n_pre = min(ids.size, 4 * window + 10)
    pre = np.argpartition(-approx, n_pre - 1)[:n_pre]
    exact = []
    qnorm = _fold_dot(qv, qv) ** 0.5
    for i in pre:
        if i == qi:
            continue
        c = round(
            _fold_dot(M[i], qv) / ((_fold_dot(M[i], M[i]) ** 0.5) * qnorm), 5
        )
        exact.append((int(ids[i]), float(c)))
    exact.sort(key=lambda t: (-t[1], t[0]))
    return exact[:window]


def rrf_hybrid_local(
    index: dict,
    emb_path: str,
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    window: int = 20,
    rank_const: int = 60,
) -> list[tuple]:
    """Serving twin of rrf_hybrid_topk: the lexical leg is
    wand_topk_local (rank-identical to the relational BM25 leg by the
    engine's core invariant), the knn leg is an in-process exact cosine
    over the resident embedding shard, fusion is pure Python over
    2*window rows.  Returns [(doc_id, lex_rank, sem_rank, rrf_score)]."""
    from .wand import wand_topk_local

    lex = wand_topk_local(index, terms, k=window)
    sem = _cosine_leg_local(index, emb_path, query_vec_id, window)
    c = float(rank_const)
    fused: dict[int, list] = {}
    for r, (doc_id, _s) in enumerate(lex, start=1):
        fused.setdefault(int(doc_id), [None, None])[0] = r
    for r, (doc_id, _s) in enumerate(sem, start=1):
        fused.setdefault(int(doc_id), [None, None])[1] = r
    out = []
    for doc_id, (lr, sr) in fused.items():
        score = round(
            (1.0 / (c + lr) if lr else 0.0) + (1.0 / (c + sr) if sr else 0.0),
            RRF_DECIMALS,
        )
        out.append((doc_id, lr, sr, score))
    out.sort(key=lambda t: (-t[3], t[0]))
    return out[:k]


# --- ES 8.15 text_similarity_reranker retriever --------------------------------

def text_similarity_reranker_topk(
    corpus: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    rank_window_size: int = 30,
    min_score: float | None = None,
    index: dict | None = None,
) -> DataFrame:
    """ES 8.15 `text_similarity_reranker` retriever: a first-stage
    retriever's top-`rank_window_size` is re-scored by a semantic
    similarity model and the final ranking uses ONLY the model score
    (ES replaces _score with the rerank relevance).

    The model here is the engine's deterministic semantic scorer —
    exact cosine between the document vector and the query vector
    (`query_vec_id`), the same contract the knn leg uses; a real
    cross-encoder would ride the enrichment iterator-UDF seam
    (operators/enrichment.py) with this exact plan shape.

    Scale shape: the first stage is the verified top-window retrieval;
    rerank work is a `rank_window_size`-row broadcast join against the
    vector store plus one narrow cosine map — nothing corpus-sized
    after the first stage.  `min_score` drops hits the model scores
    below the bar (ES contract), applied AFTER rescoring.
    """
    window = _lex_leg(
        corpus, terms, rank_window_size, index
    ).select("doc_id")
    e = embeddings.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    q = F.broadcast(
        embeddings.filter(F.col("vec_id") == int(query_vec_id)).select(
            F.col("embedding").cast("array<double>").alias("qv")
        )
    )
    from ..operators.similarity import _dot

    scored = (
        F.broadcast(window)
        .join(e, "doc_id")
        .crossJoin(q)
        .select(
            "doc_id",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (
                    F.sqrt(_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                ),
                5,
            ).alias("rerank_score"),
        )
    )
    if min_score is not None:
        scored = scored.filter(F.col("rerank_score") >= float(min_score))
    return scored.orderBy(
        F.desc("rerank_score"), F.asc("doc_id")
    ).limit(int(k))


def text_similarity_reranker_sql(
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    rank_window_size: int = 30,
    min_score: float | None = None,
) -> str:
    pred = (
        f"AND round(list_dot_product(e.v, q.qv) / (sqrt(list_dot_product(e.v, e.v))"
        f" * sqrt(list_dot_product(q.qv, q.qv))), 5) >= {float(min_score)!r}"
        if min_score is not None
        else ""
    )
    return f"""
WITH win AS (
  SELECT doc_id FROM ({bm25_topk_sql(terms, k=rank_window_size).strip()}) l
),
e AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = {int(query_vec_id)})
SELECT e.doc_id,
       round(list_dot_product(e.v, q.qv)
             / (sqrt(list_dot_product(e.v, e.v))
                * sqrt(list_dot_product(q.qv, q.qv))), 5) AS rerank_score
FROM win JOIN e ON win.doc_id = e.doc_id CROSS JOIN q
WHERE 1 = 1 {pred}
ORDER BY rerank_score DESC, e.doc_id ASC
LIMIT {int(k)}
"""


def text_similarity_reranker_local(
    index: dict,
    emb_path: str,
    terms: list[str],
    query_vec_id: int = 0,
    k: int = 10,
    rank_window_size: int = 30,
    min_score: float | None = None,
) -> list[tuple]:
    """Serving twin of text_similarity_reranker_topk: first stage is
    wand_topk_local (rank-identical to the relational BM25 window);
    the rerank is `rank_window_size` exact left-fold cosines over the
    resident embedding shard — bit-identical to the Spark engine's
    F.aggregate fold + round(5).  [(doc_id, rerank_score)]."""
    import numpy as np

    from .wand import wand_topk_local

    ids, M = _emb_matrix(index, emb_path)
    qi = np.searchsorted(ids, int(query_vec_id))
    if qi >= ids.size or ids[qi] != int(query_vec_id):
        return []
    import math

    qv = M[qi]
    qq = math.sqrt(_fold_dot(qv, qv))
    out = []
    for doc_id, _s in wand_topk_local(index, terms, k=rank_window_size):
        di = np.searchsorted(ids, int(doc_id))
        if di >= ids.size or ids[di] != int(doc_id):
            continue  # doc has no vector — same drop as the inner join
        v = M[di]
        score = round(
            _fold_dot(v, qv) / (math.sqrt(_fold_dot(v, v)) * qq), 5
        )
        if min_score is not None and score < float(min_score):
            continue
        out.append((int(doc_id), score))
    out.sort(key=lambda t: (-t[1], t[0]))
    return out[:k]


def rank_vectors_maxsim_local(
    index: dict,
    emb_path: str,
    query_group: int = 0,
    group_size: int = 5,
    k: int = 10,
) -> list[tuple]:
    """Serving twin of similarity.rank_vectors_maxsim_topk: one matmul
    over the resident shard preselects candidate doc groups, then the
    top window is re-scored with the engine's exact algebra (left-fold
    dot rounded to 6, per-slot max, fixed-order sum rounded to 5) so
    rounding ties resolve identically.  [(doc_group, maxsim)]."""
    import numpy as np

    gsz = int(group_size)
    ids, M = _emb_matrix(index, emb_path)
    groups = ids // gsz
    qmask = groups == int(query_group)
    if not qmask.any():
        return []
    Q = M[qmask]
    qslots = (ids[qmask] % gsz).astype(int)
    dmask = ~qmask
    D, gids = M[dmask], groups[dmask]
    # ids sorted -> gids sorted; per-group, per-query-vector max via reduceat
    uniq, starts = np.unique(gids, return_index=True)
    S = np.round(D @ Q.T, 6)
    maxes = np.empty((uniq.size, Q.shape[0]))
    for j in range(Q.shape[0]):
        maxes[:, j] = np.maximum.reduceat(S[:, j], starts)
    total = np.zeros(uniq.size)
    for slot in range(gsz):
        cols = np.flatnonzero(qslots == slot)
        if cols.size:
            total = total + maxes[:, cols[0]]
    total = np.round(total, 5)
    n_pre = min(uniq.size, 4 * int(k) + 10)
    pre = np.argsort(-total, kind="stable")[:n_pre]
    # exact re-score of the preselected groups with the fold algebra
    exact = []
    ends = np.concatenate([starts[1:], [gids.size]])
    for gi in pre:
        rows = D[starts[gi]:ends[gi]]
        tot = 0.0
        for slot in range(gsz):
            cols = np.flatnonzero(qslots == slot)
            if not cols.size:
                continue
            qv = Q[cols[0]]
            best = max(round(_fold_dot(v, qv), 6) for v in rows)
            tot = tot + best
        exact.append((int(uniq[gi]), round(tot, 5)))
    exact.sort(key=lambda t: (-t[1], t[0]))
    return exact[:k]



# ---------------------------------------------------------------------------
# Quantized-kNN local twins (serve_node `knnq`): the query node holds the
# COMPRESSED code table resident (1-16 bytes/vector) and touches the float
# matrix only for the k * oversample rescore window — the same memory story
# that makes int8/bit quantization the ES default at large index sizes.
# ---------------------------------------------------------------------------

_POP16 = None  # lazy 16-bit popcount table (numpy < 2.0 has no bitwise_count)


def _popcount64(a):
    import numpy as np

    global _POP16
    if _POP16 is None:
        _POP16 = np.array(
            [bin(i).count("1") for i in range(1 << 16)], dtype=np.uint8
        )
    a = a.astype(np.uint64)
    return (
        _POP16[(a & np.uint64(0xFFFF)).astype(np.int64)]
        + _POP16[((a >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)]
        + _POP16[((a >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)]
        + _POP16[((a >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)]
    ).astype(np.int64)


def _quant_tables(index: dict, emb_path: str):
    """Per-store quantization tables, computed once and cached next to the
    float matrix: int8 codes + their row sums + (lo, corr), and the two
    packed 32-bit sign-bit words.  All integer, all derived exactly like
    the Spark/DuckDB engines (floor(x + 0.5) == HALF_UP for x >= 0)."""
    import numpy as np

    cache = index.setdefault("_quant_cache", {})
    if emb_path not in cache:
        ids, M = _emb_matrix(index, emb_path)
        lo, hi = float(M.min()), float(M.max())
        scale = 127.0 / (hi - lo)
        codes = np.floor((M - lo) * scale + 0.5).astype(np.int64)
        sums = codes.sum(axis=1)
        bits = (M > 0).astype(np.uint64)
        pw = np.uint64(1) << np.arange(32, dtype=np.uint64)
        half = M.shape[1] // 2
        blo = (bits[:, :half] * pw[:half]).sum(axis=1).astype(np.uint64)
        bhi = (bits[:, half:] * pw[: M.shape[1] - half]).sum(axis=1).astype(
            np.uint64
        )
        cache[emb_path] = (codes, sums, lo * scale, blo, bhi)
    return cache[emb_path]


def _rescore_window(ids, M, qi, order_idx, k: int, metric: str):
    """Exact re-score of a candidate window with the fold algebra, matching
    the Spark path's round-5 + vec_id tie-break."""
    qv = M[qi]
    exact = []
    if metric == "cosine":
        qnorm = _fold_dot(qv, qv) ** 0.5
        for i in order_idx:
            c = round(
                _fold_dot(M[i], qv) / ((_fold_dot(M[i], M[i]) ** 0.5) * qnorm),
                5,
            )
            exact.append((int(ids[i]), float(c)))
    else:  # dot
        for i in order_idx:
            exact.append((int(ids[i]), float(round(_fold_dot(M[i], qv), 5))))
    exact.sort(key=lambda t: (-t[1], t[0]))
    return exact[:k]


def knn_int8_local(
    index: dict, emb_path: str, query_vec_id: int, k: int = 10,
    oversample: int = 3,
) -> list[tuple[int, float]]:
    """Driver-local twin of similarity.knn_int8_topk: integer code dot +
    Lucene corrective offset rank the window, exact float dot rescores.
    Returns [(vec_id, dot)] — identical to the Spark path."""
    import numpy as np

    ids, M = _emb_matrix(index, emb_path)
    qi = np.searchsorted(ids, int(query_vec_id))
    if qi >= ids.size or ids[qi] != int(query_vec_id):
        return []
    codes, sums, corr, _, _ = _quant_tables(index, emb_path)
    qkey = (codes @ codes[qi]).astype(np.float64) + corr * sums.astype(
        np.float64
    )
    window = min(int(k) * int(oversample), ids.size - 1)
    # order by (qkey desc, vec_id asc), excluding the query row
    sel = np.lexsort((ids, -qkey))
    sel = sel[sel != qi][:window]
    return _rescore_window(ids, M, qi, sel, int(k), "dot")


def knn_bit_local(
    index: dict, emb_path: str, query_vec_id: int, k: int = 10,
    oversample: int = 5,
) -> list[tuple[int, float]]:
    """Driver-local twin of similarity.knn_bit_topk: hamming distance on
    the packed sign bits ranks the window, exact cosine rescores.
    Returns [(vec_id, cosine)] — identical to the Spark path."""
    import numpy as np

    ids, M = _emb_matrix(index, emb_path)
    qi = np.searchsorted(ids, int(query_vec_id))
    if qi >= ids.size or ids[qi] != int(query_vec_id):
        return []
    _, _, _, blo, bhi = _quant_tables(index, emb_path)
    ham = _popcount64(np.bitwise_xor(blo, blo[qi])) + _popcount64(
        np.bitwise_xor(bhi, bhi[qi])
    )
    window = min(int(k) * int(oversample), ids.size - 1)
    sel = np.lexsort((ids, ham))
    sel = sel[sel != qi][:window]
    return _rescore_window(ids, M, qi, sel, int(k), "cosine")
