"""ES 8.15 `semantic_text` field + `semantic` query.

ES attaches an inference endpoint to a `semantic_text` field: documents
are embedded at index time, the `semantic` query embeds the query string
with the SAME endpoint and ranks by vector similarity.  The sandbox has
no model services, so the inference endpoint here is the deterministic
HASHING-TRICK text embedder (feature hashing, Weinberger et al. 2009):

    bucket(t) = H64(t) mod dim          (md5-derived, engine-shared)
    sign(t)   = +1 if H64('s:' || t) is even else -1
    v[b]      = sum over doc tokens t with bucket(t) == b of sign(t)

Every coordinate is an INTEGER token-count combination — the only float
work is the final cosine (sqrt of integer sums, one rounded division),
so Spark, DuckDB and the Python query-side embedder produce identical
bits.  A real model rides the enrichment iterator-UDF seam with this
exact plan shape.

Scale shape: doc embeddings are ONE tokenize + (doc, bucket) hash agg;
the query vector is |q| driver-side hashes broadcast as a dim-row
table; the dot product is a broadcast join + per-doc sum and the norms
come from the same (doc, bucket) aggregate — no corpus self-join, no
UDF.  TakeOrdered top-k.

Reference analogue: ranked retrieval delegated to ES
(output/elasticsearch.py); semantic_text is ES's managed-embedding
serving of the same corpus.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE, py_tokenize, tokens
from ..operators.dedup import H64_SQL, h64

SEM_DIM = 64


def _py_h64(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def embed_query(text: str, dim: int = SEM_DIM) -> dict[int, int]:
    """Driver-side twin of the doc embedder: {bucket: signed count} for
    the query string (same tokenizer, same hashes)."""
    vec: dict[int, int] = {}
    for t in py_tokenize(text):
        b = _py_h64(t) % dim
        s = 1 if _py_h64("s:" + t) % 2 == 0 else -1
        vec[b] = vec.get(b, 0) + s
    return {b: v for b, v in vec.items() if v != 0}


def doc_embeddings(corpus: DataFrame, dim: int = SEM_DIM) -> DataFrame:
    """(doc_id, bucket, val) sparse doc embeddings — the semantic_text
    index-time inference output (only non-zero coordinates stored, the
    natural layout for a sparse-friendly ANN build)."""
    sign = F.when(
        h64(F.concat(F.lit("s:"), F.col("tok"))) % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    # aggregate tf per (doc, tok) BEFORE hashing: the two md5 calls run
    # once per distinct (doc, token) pair instead of once per token
    # OCCURRENCE (semantic_sec 7.2 -> ~1s at 200k docs; v[b] is a sum of
    # integer sign*tf terms either way, so values are unchanged)
    tf = (
        corpus.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return (
        tf.select(
            "doc_id",
            F.pmod(h64(F.col("tok")), F.lit(int(dim))).alias("bucket"),
            (sign * F.col("tf")).alias("s"),
        )
        .groupBy("doc_id", "bucket")
        .agg(F.sum("s").alias("val"))
        .filter(F.col("val") != 0)
    )


def semantic_topk(
    corpus: DataFrame, query: str, k: int = 10, dim: int = SEM_DIM,
    store: DataFrame | None = None,
) -> DataFrame:
    """ES `semantic` query: cosine between the query's and each doc's
    hashing-trick embeddings.  Returns (doc_id, cosine) desc, doc_id
    asc, limit k; zero-norm docs and zero-overlap docs drop out (ES
    returns no hit without similarity evidence).

    `store` is the semantic_text INDEX — a precomputed (doc_id, bucket,
    val) sparse table (doc_embeddings once at ingest, exactly how ES
    embeds at index time).  With it, the per-query plan is a broadcast
    join + one hash agg over the store; the corpus is never re-tokenized
    at query time (the 100×-scale serving shape — plan-tested)."""
    qv = embed_query(query, dim)
    base = store if store is not None else corpus
    if not qv:
        return base.sparkSession.createDataFrame(
            [], "doc_id bigint, cosine double"
        )
    spark = base.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame(
            [(b, v) for b, v in sorted(qv.items())], "bucket int, qval long"
        )
    )
    emb = store if store is not None else doc_embeddings(corpus, dim)
    # ONE pass: a left broadcast join + a single per-doc aggregate yields
    # dot, norm and the overlap flag together — the dots/norms two-branch
    # form recomputed the whole embedding subtree twice (no common
    # subtree reuse across the join).  `has` preserves the inner-join
    # semantics: only docs sharing >= 1 bucket with the query are hits.
    agged = (
        emb.join(qdf, "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("val") * F.coalesce("qval", F.lit(0))).alias("dot"),
            F.sum(F.col("val") * F.col("val")).alias("nn"),
            F.max(
                F.when(F.col("qval").isNotNull(), 1).otherwise(0)
            ).alias("has"),
        )
        .filter(F.col("has") == 1)
    )
    qnorm = float(sum(v * v for v in qv.values())) ** 0.5
    return (
        agged
        .select(
            "doc_id",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("nn").cast("double")) * F.lit(qnorm)),
                5,
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(int(k))
    )


def semantic_topk_sql(query: str, k: int = 10, dim: int = SEM_DIM) -> str:
    qv = embed_query(query, dim)
    if not qv:
        return "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS DOUBLE) AS cosine WHERE FALSE"
    qrows = ", ".join(f"({b}, {v})" for b, v in sorted(qv.items()))
    qnorm = float(sum(v * v for v in qv.values())) ** 0.5
    hb = H64_SQL.format(x="tok")
    hs = H64_SQL.format(x="'s:' || tok")
    return f"""
WITH {CORPUS_CTE.strip()},
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS tok
  FROM corpus
),
emb AS (
  SELECT doc_id, ({hb}) % {int(dim)} AS bucket,
         sum(CASE WHEN ({hs}) % 2 = 0 THEN 1 ELSE -1 END) AS val
  FROM toks GROUP BY doc_id, bucket
  HAVING sum(CASE WHEN ({hs}) % 2 = 0 THEN 1 ELSE -1 END) != 0
),
q(bucket, qval) AS (VALUES {qrows}),
dots AS (
  SELECT emb.doc_id, sum(emb.val * q.qval) AS dot
  FROM emb JOIN q ON emb.bucket = q.bucket
  GROUP BY emb.doc_id
),
norms AS (SELECT doc_id, sum(val * val) AS nn FROM emb GROUP BY doc_id)
SELECT dots.doc_id,
       round(dots.dot / (sqrt(CAST(norms.nn AS DOUBLE)) * {qnorm!r}), 5)
           AS cosine
FROM dots JOIN norms ON dots.doc_id = norms.doc_id
ORDER BY cosine DESC, dots.doc_id ASC
LIMIT {int(k)}
"""


# --- serving: sparse semantic store + driver-local probe ----------------------

def write_semantic_store(
    corpus: DataFrame, out_dir: str, dim: int = SEM_DIM
) -> None:
    """Persist the semantic_text inference output for query-node serving:
      <out>/buckets/   (bucket, doc_id, val) sorted by (bucket, doc_id),
                       small row groups -> a query reads ONLY its |q|
                       buckets via parquet row-group pruning
      <out>/norms/     (doc_id, nn) — per-doc squared norm, one small
                       resident table
    """
    # two output tables read the same embedding table — persist so the
    # tokenize+hash+agg runs once, not once per write
    emb = doc_embeddings(corpus, dim).persist()
    try:
        # materialize once, then the two independent table writes overlap
        # (guide §2.6 — same fan-out as index.build.write_index)
        emb.count()
        from concurrent.futures import ThreadPoolExecutor

        def _w_buckets():
            (
                # range partitioning on bucket parallelizes the sorted
                # write (the single-partition sort was the build
                # bottleneck) while keeping every bucket's rows inside
                # exactly ONE file — equal keys never split across range
                # partitions, so per-file row-group stats prune a probe
                # exactly as before; the probe argsorts after the pruned
                # read and never relies on cross-file order
                emb.repartitionByRange(16, "bucket")
                .sortWithinPartitions("bucket", "doc_id")
                .write.mode("overwrite")
                .option("parquet.block.size", 128 * 1024)
                .parquet(f"{out_dir}/buckets")
            )

        def _w_norms():
            (
                emb.groupBy("doc_id")
                .agg(F.sum(F.col("val") * F.col("val")).alias("nn"))
                .repartition(1)
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .parquet(f"{out_dir}/norms")
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(_w_buckets), pool.submit(_w_norms)]:
                f.result()
    finally:
        emb.unpersist()


def _bucket_pages(
    bucket_dir: str, buckets, cache: dict, key_col: str = "doc_id"
) -> dict:
    """{bucket: (keys int64[], vals float64[])} — per-bucket page cache
    over the sorted bucket store (the fuzzy trigram-GIN pattern): a cold
    bucket costs one row-group-pruned pyarrow read shared by all cold
    buckets in the call; a warm query is pure array lookups.  The cache
    grows to at most the resident store — exactly what a warm semantic
    query node holds (dim bounds the page count)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    missing = [b for b in buckets if ("page", b) not in cache]
    if missing:
        dset = cache.get("_bucket_ds")
        if dset is None:
            dset = ds.dataset(bucket_dir, format="parquet")
            cache["_bucket_ds"] = dset
        tbl = dset.to_table(filter=pc.field("bucket").isin(missing))
        bks = tbl["bucket"].to_numpy()
        keys = tbl[key_col].to_numpy().astype(np.int64)
        vals = tbl["val"].to_numpy().astype(np.float64)
        order = np.argsort(bks, kind="stable")
        bks, keys, vals = bks[order], keys[order], vals[order]
        for b in missing:
            lo = np.searchsorted(bks, b, side="left")
            hi = np.searchsorted(bks, b, side="right")
            cache[("page", b)] = (keys[lo:hi], vals[lo:hi])
    return {b: cache[("page", b)] for b in buckets}


def _topk_by_score(ids, scores, k: int, extra=None):
    """Top-k rows by (score desc, id asc) without sorting the full
    candidate set: an np.partition threshold cut first (ties kept — the
    survivor set is >= k rows, == k absent score ties), then one lexsort
    over the survivors only.  Returns (ids, scores[, extra]) arrays of
    <= k rows."""
    import numpy as np

    n = len(ids)
    if k > 0 and n > 4 * k:
        thresh = np.partition(scores, n - k)[n - k]
        mask = scores >= thresh
        ids, scores = ids[mask], scores[mask]
        if extra is not None:
            extra = extra[mask]
    order = np.lexsort((ids, -scores))[: max(k, 0)]
    if extra is None:
        return ids[order], scores[order]
    return ids[order], scores[order], extra[order]


def semantic_topk_local(
    store_dir: str,
    query: str,
    k: int = 10,
    dim: int = SEM_DIM,
    cache: dict | None = None,
) -> list[tuple]:
    """Query-node twin of semantic_topk: the query embeds driver-side,
    ONLY the query's buckets are read (per-bucket page cache over the
    sorted store — warm queries never touch parquet), dots accumulate in
    numpy, norms are a resident table read once.  [(doc_id, cosine)],
    rank-identical to the Spark path."""
    import numpy as np
    import pyarrow.dataset as ds

    qv = embed_query(query, dim)
    if not qv:
        return []
    cache = cache if cache is not None else {}
    if "norms" not in cache:
        tbl = ds.dataset(f"{store_dir}/norms", format="parquet").to_table()
        nid = tbl["doc_id"].to_numpy().astype(np.int64)
        nn = tbl["nn"].to_numpy().astype(np.float64)
        order = np.argsort(nid)
        cache["norms"] = (nid[order], nn[order])
    nid, nn = cache["norms"]
    pages = _bucket_pages(
        f"{store_dir}/buckets", sorted(qv), cache, key_col="doc_id"
    )
    qarr = np.zeros(int(dim))
    for b, v in qv.items():
        qarr[b] = float(v)
    dids = np.concatenate([pages[b][0] for b in sorted(qv)])
    contrib = np.concatenate(
        [pages[b][1] * qarr[b] for b in sorted(qv)]
    )
    # dot per doc: sort-group on doc_id (pages are sorted within bucket,
    # not across) — one argsort over the probed rows; group boundaries by
    # diff (np.unique would pay a SECOND sort of the same array)
    order = np.argsort(dids, kind="stable")
    dids, contrib = dids[order], contrib[order]
    if not len(dids):
        return []
    starts = np.flatnonzero(np.r_[True, np.diff(dids) != 0])
    uniq = dids[starts]
    dots = np.add.reduceat(contrib, starts)
    qnorm = float(sum(v * v for v in qv.values())) ** 0.5
    pos = np.searchsorted(nid, uniq)
    cos = np.round(dots / (np.sqrt(nn[pos]) * qnorm), 5)
    bd, bc = _topk_by_score(uniq, cos, int(k))
    return [(int(d), float(c)) for d, c in zip(bd, bc)]


# --- ES 8.15 semantic_text chunking: per-chunk embeddings, max-sim serving ----

CHUNK_WINDOW = 32
CHUNK_STRIDE = 24


def chunk_embeddings(
    corpus: DataFrame,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    dim: int = SEM_DIM,
) -> DataFrame:
    """(doc_id, chunk_id, bucket, val) — the semantic_text CHUNKED
    inference output.  ES 8.15 splits long semantic_text values into
    overlapping word windows and embeds each chunk separately (long docs
    would otherwise dilute into one mean-pooled vector); chunk i covers
    tokens [i*stride, i*stride + window), the last window may be short,
    and a doc with <= window tokens is exactly one chunk.

    Plan: ONE tokenize (array materialized — the tokenize-once
    contract), chunk explode bounded by ceil(len/stride) per doc, then
    the same (doc, chunk, token)-keyed integer hash aggregates as
    doc_embeddings.  All shuffle keys carry doc_id — fully parallel at
    10^12 docs; chunking never sees another doc's rows."""
    w, s = int(window), int(stride)
    tokd = corpus.select("doc_id", tokens("text").alias("toks"))
    n = F.size("toks")
    nch = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.greatest(F.ceil((n - w) / F.lit(float(s))), F.lit(0))
    )
    # guarded: sequence(0, -1) in Spark is a DESCENDING [0, -1], not empty,
    # so zero-token docs must map to an explicit empty chunk array
    seq = F.when(
        nch > 0, F.sequence(F.lit(0), nch.cast("int") - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    # chunk structs are built ARRAY-SIDE before the explode: carrying the
    # full token array through a Generate duplicates it once per chunk
    # row (measured 3x on the 200k-doc explode); slicing inside the
    # transform touches the materialized `toks` attribute only
    ch_arr = F.transform(
        seq,
        lambda c: F.struct(
            c.alias("chunk_id"),
            F.slice(F.col("toks"), c * s + 1, w).alias("ctoks"),
        ),
    )
    chunks = tokd.select("doc_id", F.explode(ch_arr).alias("ch")).select(
        "doc_id",
        F.col("ch.chunk_id").alias("chunk_id"),
        F.col("ch.ctoks").alias("ctoks"),
    )
    tf = (
        chunks.select(
            "doc_id", "chunk_id", F.explode("ctoks").alias("tok")
        )
        .groupBy("doc_id", "chunk_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    sign = F.when(
        h64(F.concat(F.lit("s:"), F.col("tok"))) % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        tf.select(
            "doc_id",
            "chunk_id",
            F.pmod(h64(F.col("tok")), F.lit(int(dim))).alias("bucket"),
            (sign * F.col("tf")).alias("s"),
        )
        .groupBy("doc_id", "chunk_id", "bucket")
        .agg(F.sum("s").alias("val"))
        .filter(F.col("val") != 0)
    )


def semantic_chunked_topk(
    corpus: DataFrame,
    query: str,
    k: int = 10,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    dim: int = SEM_DIM,
    store: DataFrame | None = None,
) -> DataFrame:
    """ES `semantic` query over a CHUNKED semantic_text field: every
    chunk is scored by cosine against the query embedding and a doc
    ranks by its BEST chunk (ES stores chunk vectors as nested
    dense_vectors and takes the max inner-hit score).  Returns (doc_id,
    chunk_id, cosine): the winning chunk per doc, cosine desc, doc_id
    asc, limit k; within a doc, equal-cosine chunks resolve to the
    lowest chunk_id.  Chunks sharing no bucket with the query drop out
    (no similarity evidence), exactly as in semantic_topk.

    `store` is the index-time chunk-embedding table (chunk_embeddings
    run once at ingest — how ES embeds on write).  With it the per-query
    plan is a broadcast |q|-bucket join + two bounded hash aggregates
    over the store; the corpus is never re-tokenized at query time."""
    spark = corpus.sparkSession
    qv = embed_query(query, dim)
    if not qv:
        return spark.createDataFrame(
            [], "doc_id bigint, chunk_id int, cosine double"
        )
    qdf = F.broadcast(
        spark.createDataFrame(
            [(b, v) for b, v in sorted(qv.items())], "bucket int, qval long"
        )
    )
    emb = (
        store
        if store is not None
        else chunk_embeddings(corpus, window, stride, dim)
    )
    qnorm = float(sum(v * v for v in qv.values())) ** 0.5
    per_chunk = (
        emb.join(qdf, "bucket", "left")
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.sum(F.col("val") * F.coalesce("qval", F.lit(0))).alias("dot"),
            F.sum(F.col("val") * F.col("val")).alias("nn"),
            F.max(
                F.when(F.col("qval").isNotNull(), 1).otherwise(0)
            ).alias("has"),
        )
        .filter(F.col("has") == 1)
        .select(
            "doc_id",
            "chunk_id",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("nn").cast("double")) * F.lit(qnorm)),
                5,
            ).alias("cosine"),
        )
    )
    best = (
        per_chunk.groupBy("doc_id")
        .agg(
            F.max_by(
                F.struct("chunk_id", "cosine"),
                F.struct(F.col("cosine"), -F.col("chunk_id")),
            ).alias("top")
        )
        .select(
            "doc_id",
            F.col("top.chunk_id").alias("chunk_id"),
            F.col("top.cosine").alias("cosine"),
        )
    )
    return best.orderBy(F.desc("cosine"), F.asc("doc_id")).limit(int(k))


def semantic_chunked_topk_sql(
    query: str,
    k: int = 10,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    dim: int = SEM_DIM,
) -> str:
    qv = embed_query(query, dim)
    if not qv:
        return (
            "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS INT) AS "
            "chunk_id, CAST(NULL AS DOUBLE) AS cosine WHERE FALSE"
        )
    w, s = int(window), int(stride)
    qrows = ", ".join(f"({b}, {v})" for b, v in sorted(qv.items()))
    qnorm = float(sum(v * v for v in qv.values())) ** 0.5
    hb = H64_SQL.format(x="tok")
    hs = H64_SQL.format(x="'s:' || tok")
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
chn AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) <= 0 THEN 0
              ELSE 1 + greatest(CAST(ceil((len(toks) - {w}) / {float(s)!r})
                                     AS INT), 0) END AS nch
  FROM tokd
),
chunks AS (
  SELECT doc_id, CAST(u.ci AS INT) AS chunk_id,
         list_slice(toks, u.ci * {s} + 1, u.ci * {s} + {w}) AS ctoks
  FROM chn, unnest(generate_series(0, nch - 1)) AS u(ci)
  WHERE nch > 0
),
ctok AS (
  SELECT doc_id, chunk_id, unnest(ctoks) AS tok FROM chunks
),
emb AS (
  SELECT doc_id, chunk_id, ({hb}) % {int(dim)} AS bucket,
         sum(CASE WHEN ({hs}) % 2 = 0 THEN 1 ELSE -1 END) AS val
  FROM ctok GROUP BY doc_id, chunk_id, bucket
  HAVING sum(CASE WHEN ({hs}) % 2 = 0 THEN 1 ELSE -1 END) != 0
),
q(bucket, qval) AS (VALUES {qrows}),
dots AS (
  SELECT emb.doc_id, emb.chunk_id, sum(emb.val * q.qval) AS dot
  FROM emb JOIN q ON emb.bucket = q.bucket
  GROUP BY emb.doc_id, emb.chunk_id
),
norms AS (
  SELECT doc_id, chunk_id, sum(val * val) AS nn
  FROM emb GROUP BY doc_id, chunk_id
),
per_chunk AS (
  SELECT dots.doc_id, dots.chunk_id,
         round(dots.dot / (sqrt(CAST(norms.nn AS DOUBLE)) * {qnorm!r}), 5)
             AS cosine
  FROM dots JOIN norms
    ON dots.doc_id = norms.doc_id AND dots.chunk_id = norms.chunk_id
),
best AS (
  SELECT doc_id, chunk_id, cosine,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY cosine DESC, chunk_id ASC
         ) AS rn
  FROM per_chunk
)
SELECT doc_id, chunk_id, cosine
FROM best WHERE rn = 1
ORDER BY cosine DESC, doc_id ASC
LIMIT {int(k)}
"""


def write_semantic_chunk_store(
    corpus: DataFrame,
    out_dir: str,
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
    dim: int = SEM_DIM,
) -> None:
    """Chunked twin of write_semantic_store:
      <out>/buckets/  (bucket, doc_id, chunk_id, val) sorted by
                      (bucket, doc_id, chunk_id) — a query reads ONLY its
                      |q| buckets via parquet row-group pruning
      <out>/norms/    (doc_id, chunk_id, nn) — per-CHUNK squared norm
    """
    emb = chunk_embeddings(corpus, window, stride, dim).persist()
    try:
        # materialize once; both table writes then overlap (guide §2.6)
        emb.count()
        from concurrent.futures import ThreadPoolExecutor

        def _w_buckets():
            (
                # see write_semantic_store: range partitioning keeps each
                # bucket whole per file and parallelizes the sorted write
                emb.repartitionByRange(16, "bucket")
                .sortWithinPartitions("bucket", "doc_id", "chunk_id")
                .write.mode("overwrite")
                .option("parquet.block.size", 128 * 1024)
                .parquet(f"{out_dir}/buckets")
            )

        def _w_norms():
            (
                emb.groupBy("doc_id", "chunk_id")
                .agg(F.sum(F.col("val") * F.col("val")).alias("nn"))
                .repartition(1)
                .sortWithinPartitions("doc_id", "chunk_id")
                .write.mode("overwrite")
                .parquet(f"{out_dir}/norms")
            )

        with ThreadPoolExecutor(max_workers=2) as pool:
            for f in [pool.submit(_w_buckets), pool.submit(_w_norms)]:
                f.result()
    finally:
        emb.unpersist()


def _chunk_bucket_pages(bucket_dir: str, buckets, cache: dict) -> dict:
    """Per-bucket pages for the CHUNK store: keys pack doc_id << 32 |
    chunk_id (see semantic_chunked_topk_local); same cold-read/warm-hit
    contract as _bucket_pages."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    missing = [b for b in buckets if ("page", b) not in cache]
    if missing:
        dset = cache.get("_bucket_ds")
        if dset is None:
            dset = ds.dataset(bucket_dir, format="parquet")
            cache["_bucket_ds"] = dset
        tbl = dset.to_table(filter=pc.field("bucket").isin(missing))
        bks = tbl["bucket"].to_numpy()
        keys = (
            tbl["doc_id"].to_numpy().astype(np.int64) << 32
        ) | tbl["chunk_id"].to_numpy().astype(np.int64)
        vals = tbl["val"].to_numpy().astype(np.float64)
        order = np.argsort(bks, kind="stable")
        bks, keys, vals = bks[order], keys[order], vals[order]
        for b in missing:
            lo = np.searchsorted(bks, b, side="left")
            hi = np.searchsorted(bks, b, side="right")
            cache[("page", b)] = (keys[lo:hi], vals[lo:hi])
    return {b: cache[("page", b)] for b in buckets}


def semantic_chunked_topk_local(
    store_dir: str,
    query: str,
    k: int = 10,
    dim: int = SEM_DIM,
    cache: dict | None = None,
) -> list[tuple]:
    """Query-node twin of semantic_chunked_topk over a
    write_semantic_chunk_store dir: bucket-pruned pyarrow reads, numpy
    per-chunk dots, per-doc best chunk.  [(doc_id, chunk_id, cosine)],
    rank-identical to the Spark path.  Chunk keys pack as
    doc_id * 2^32 + chunk_id (documented limit: internal doc ids below
    2^31 on the serving node — the store writer's dense-id contract)."""
    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.dataset as ds

    qv = embed_query(query, dim)
    if not qv:
        return []
    cache = cache if cache is not None else {}
    if "norms" not in cache:
        tbl = ds.dataset(f"{store_dir}/norms", format="parquet").to_table()
        key = (
            tbl["doc_id"].to_numpy().astype(np.int64) << 32
        ) | tbl["chunk_id"].to_numpy().astype(np.int64)
        nn = tbl["nn"].to_numpy().astype(np.float64)
        order = np.argsort(key)
        cache["norms"] = (key[order], nn[order])
    nkey, nn = cache["norms"]
    pages = _chunk_bucket_pages(f"{store_dir}/buckets", sorted(qv), cache)
    qarr = np.zeros(int(dim))
    for b, v in qv.items():
        qarr[b] = float(v)
    keys = np.concatenate([pages[b][0] for b in sorted(qv)])
    contrib = np.concatenate(
        [pages[b][1] * qarr[b] for b in sorted(qv)]
    )
    order = np.argsort(keys, kind="stable")
    keys, contrib = keys[order], contrib[order]
    if not len(keys):
        return []
    starts = np.flatnonzero(np.r_[True, np.diff(keys) != 0])
    uniq = keys[starts]
    dots = np.add.reduceat(contrib, starts)
    qnorm = float(sum(v * v for v in qv.values())) ** 0.5
    pos = np.searchsorted(nkey, uniq)
    cos = np.round(dots / (np.sqrt(nn[pos]) * qnorm), 5)
    docs = (uniq >> 32).astype(np.int64)
    chunks = (uniq & 0xFFFFFFFF).astype(np.int64)
    # per-doc best chunk, fully vectorized: lexsort by (doc asc, cos
    # desc, chunk asc), then the first row per doc is its best (the old
    # Python sorted() over every matching chunk dominated the warm
    # probe at 200k docs)
    order = np.lexsort((chunks, -cos, docs))
    docs, chunks, cos = docs[order], chunks[order], cos[order]
    first = np.flatnonzero(np.r_[True, np.diff(docs) != 0])
    bdocs, bchunks, bcos = docs[first], chunks[first], cos[first]
    td, tc, extra = _topk_by_score(bdocs, bcos, int(k), extra=bchunks)
    return [
        (int(d), int(c), float(s)) for d, c, s in zip(td, extra, tc)
    ]
