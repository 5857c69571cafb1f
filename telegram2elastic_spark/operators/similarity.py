"""Similarity search over the embedding column (array<float>).

Two paths, same predicate:
  * brute-force cosine top-k — the exact baseline; JVM-side zip_with/
    aggregate (no Python in the hot path), one global top-k.
  * LSH-bucketed ANN — the scale path: 8 deterministic random-hyperplane
    sign bits -> bucket id; candidates = same-bucket vectors only, so the
    pair space shrinks from O(N) per query to O(N / 2^8), then exact cosine
    re-rank inside the bucket.

Determinism across engines: hyperplane component p(j, d) is derived from
md5 (H64(j || '_' || d) % 2001 - 1000) / 1000 — no RNG, so the DuckDB
oracle builds the very same hyperplanes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import H64_SQL, h64

N_PLANES = 8
EMB_DIM = 64


def _plane_val(j: int, d: F.Column) -> F.Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1]."""
    return (
        (h64(F.concat(F.lit(f"{j}_"), d.cast("string"))) % 2001).cast("double")
        - 1000.0
    ) / 1000.0


def _plane_val_sql(j: int, d: str) -> str:
    hx = "'" + str(j) + "_' || CAST(" + d + " AS VARCHAR)"
    h = H64_SQL.format(x=hx)
    return f"(CAST(({h}) % 2001 AS DOUBLE) - 1000.0) / 1000.0"


def _dot(x: F.Column, y: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda a, z: a + z
    )


def cosine_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Exact brute-force cosine top-k neighbors of one corpus vector.

    The query vector is broadcast (1-row cross join); scoring is a single
    narrow map over all vectors — embarrassingly parallel, no shuffle until
    the final top-k (TakeOrdered, no full sort)."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv")
    )
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_vec_id)
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (
                    F.sqrt(_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                ),
                5,
            ),
        )
        .select("vec_id", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id})
SELECT vec_id,
       round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             5) AS cosine
FROM e, q
WHERE vec_id != {query_vec_id}
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


def lsh_buckets(embeddings: DataFrame) -> DataFrame:
    """Random-hyperplane LSH bucket per vector: bit j = (v . plane_j) > 0.

    Relational formulation (posexplode + groupBy) so the oracle is exact;
    the mapInPandas/numpy variant computes the same buckets batch-wise at
    scale (see multimodal.py for the pattern)."""
    comps = embeddings.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("d0", "x"),
    ).withColumn("d", F.col("d0") + 1)
    dots = None
    aggs = []
    for j in range(N_PLANES):
        aggs.append(
            F.sum(F.col("x") * _plane_val(j, F.col("d"))).alias(f"dot_{j}")
        )
    dots = comps.groupBy("vec_id").agg(*aggs)
    bucket = None
    for j in range(N_PLANES):
        bit = F.when(F.col(f"dot_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return dots.select(
        "vec_id", bucket.cast("int").alias("bucket")
    ).orderBy("vec_id")


def lsh_buckets_sql() -> str:
    dot_cols = ",\n       ".join(
        f"sum(x * ({_plane_val_sql(j, 'd')})) AS dot_{j}" for j in range(N_PLANES)
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN dot_{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(N_PLANES)
    )
    return f"""
WITH comps AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) AS d,
         unnest(CAST(embedding AS DOUBLE[])) AS x
  FROM embeddings
),
dots AS (
  SELECT vec_id,
       {dot_cols}
  FROM comps GROUP BY vec_id
)
SELECT vec_id, CAST({bucket_expr} AS INTEGER) AS bucket
FROM dots ORDER BY vec_id
"""


def ann_topk(embeddings: DataFrame, query_vec_id: int = 0, k: int = 10) -> DataFrame:
    """ANN: exact cosine re-rank restricted to the query's LSH bucket.
    At 100 TB the bucket join is the point — each query touches ~N/256 of
    the corpus; buckets are broadcastable per query batch."""
    b = lsh_buckets(embeddings)
    qb = b.filter(F.col("vec_id") == query_vec_id).select(
        F.col("bucket").alias("qbucket")
    )
    cand_ids = (
        b.crossJoin(F.broadcast(qb))
        .filter((F.col("bucket") == F.col("qbucket")))
        .select("vec_id")
    )
    e = embeddings.join(cand_ids, "vec_id")
    return cosine_topk(e, query_vec_id=query_vec_id, k=k)


def ann_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    return f"""
WITH buckets AS ({lsh_buckets_sql().strip()}),
qb AS (SELECT bucket FROM buckets WHERE vec_id = {query_vec_id}),
cand AS (
  SELECT b.vec_id FROM buckets b, qb WHERE b.bucket = qb.bucket
),
e AS (
  SELECT e0.vec_id, CAST(e0.embedding AS DOUBLE[]) AS v
  FROM embeddings e0 JOIN cand USING (vec_id)
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id})
SELECT vec_id,
       round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             5) AS cosine
FROM e, q
WHERE vec_id != {query_vec_id}
ORDER BY cosine DESC, vec_id ASC
LIMIT {k}
"""


# --- IVF (inverted-file) ANN ----------------------------------------------------

IVF_CENTROID_MOD = 32  # deterministic coarse centroids: vec_id % MOD == 0


def _l2sq(x: F.Column, y: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: (p - q) * (p - q)),
        F.lit(0.0),
        lambda a, z: a + z,
    )


def _centroids(embeddings: DataFrame) -> DataFrame:
    """Deterministic coarse quantizer: every MOD-th vector is a centroid.
    (A trained k-means quantizer plugs in here as a mapInPandas/Lloyd's
    loop; the IVF *structure* — assignment lists + nprobe search — is what
    this operator owns, and a deterministic quantizer keeps the DuckDB
    oracle exact.)"""
    return embeddings.filter(
        F.col("vec_id") % IVF_CENTROID_MOD == 0
    ).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cv"),
    )


def ivf_assign(
    embeddings: DataFrame, centroids: DataFrame | None = None
) -> DataFrame:
    """IVF inverted lists: each vector assigned to its nearest centroid
    (L2; deterministic tie-break on rounded distance then cid).  The
    centroid table is broadcast — assignment is one map-side pass; the
    per-vector argmin is `min_by` over a struct key (map-side partial
    aggregation, no Window sort over the N×C distance rows — the N×C
    expansion collapses to N inside each scan partition before any
    shuffle, which is what survives at 10^12 vectors)."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    d = (
        e.crossJoin(F.broadcast(centroids if centroids is not None
                                else _centroids(embeddings)))
        .withColumn("dist", F.round(_l2sq(F.col("v"), F.col("cv")), 5))
    )
    best = F.min_by(F.struct("dist", "cid"), F.struct("dist", "cid"))
    return (
        d.groupBy("vec_id")
        .agg(best.alias("b"))
        .select("vec_id", F.col("b.cid").alias("cid"),
                F.col("b.dist").alias("dist"))
        .orderBy("vec_id")
    )


def ivf_assign_sql() -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {IVF_CENTROID_MOD} = 0
),
d AS (
  SELECT e.vec_id, c.cid,
         round(list_distance(e.v, c.cv) * list_distance(e.v, c.cv), 5)
             AS dist
  FROM e CROSS JOIN cents c
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
  FROM d
)
SELECT vec_id, cid, dist FROM ranked WHERE rn = 1 ORDER BY vec_id
"""


KMEANS_DECIMALS = 5


def kmeans_centroids(
    embeddings: DataFrame, k: int = 8, iters: int = 3
) -> DataFrame:
    """Trained coarse quantizer: Lloyd's k-means feeding the same IVF
    structure as `_centroids`.  Deterministic end to end: seeds are the k
    lowest vec_ids (no RNG), every distance and every updated mean is
    rounded to KMEANS_DECIMALS so both engines walk the identical centroid
    trajectory.

    Distributed shape per iteration: broadcast the k×dim centroid table,
    `min_by` argmin assignment (map-side combine), then the elementwise
    mean via posexplode -> groupBy(cid, pos) — N×dim rows but partial
    aggregation collapses them inside each scan partition; only k×dim
    aggregated rows shuffle.  k and dim are small (quantizer, not model),
    so the driver-side collect per iteration is k×dim floats."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = (
        e.orderBy("vec_id").limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    for _ in range(iters):
        assign = (
            e.crossJoin(F.broadcast(cents))
            .withColumn("dist", F.round(_l2sq(F.col("v"), F.col("cv")),
                                        KMEANS_DECIMALS))
            .groupBy("vec_id", "v")
            .agg(F.min_by(F.struct("dist", "cid"),
                          F.struct("dist", "cid")).alias("b"))
            .select(F.col("b.cid").alias("cid"), "v")
        )
        means = (
            assign.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg("x"), KMEANS_DECIMALS).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        # centroids are k×dim — materialize driver-side so the next
        # iteration broadcasts a literal table instead of growing one
        # unbounded lineage chain
        rows = means.collect()
        cents = embeddings.sparkSession.createDataFrame(
            [(r["cid"], r["cv"]) for r in rows],
            "cid long, cv array<double>",
        )
    return cents


def kmeans_assign(
    embeddings: DataFrame, k: int = 8, iters: int = 3
) -> DataFrame:
    """IVF assignment over the TRAINED quantizer (kmeans_centroids) —
    same min_by plan as ivf_assign, different centroid table."""
    return ivf_assign(embeddings, centroids=kmeans_centroids(embeddings, k, iters))


def _kmeans_sql_ctes(k: int, iters: int) -> str:
    """Unrolled Lloyd's iterations as plain CTEs (the loop is fixed-depth,
    so the oracle is exact — same seeds, same rounding)."""
    out = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"""c0 AS (
  SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {k}
)""",
    ]
    for i in range(iters):
        out.append(f"""d{i} AS (
  SELECT e.vec_id, e.v, c.cid,
         round(list_distance(e.v, c.cv) * list_distance(e.v, c.cv),
               {KMEANS_DECIMALS}) AS dist
  FROM e CROSS JOIN c{i} c
),
a{i} AS (
  SELECT vec_id, v, cid FROM (
    SELECT vec_id, v, cid, row_number() OVER (
        PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM d{i}
  ) WHERE rn = 1
),
m{i} AS (
  SELECT cid, pos, round(avg(x), {KMEANS_DECIMALS}) AS m
  FROM (SELECT cid, unnest(v) AS x,
               unnest(range(1, len(v) + 1)) AS pos
        FROM a{i})
  GROUP BY cid, pos
),
c{i + 1} AS (
  SELECT cid, list(m ORDER BY pos) AS cv FROM m{i} GROUP BY cid
)""")
    return ",\n".join(out)


def kmeans_assign_sql(k: int = 8, iters: int = 3) -> str:
    return f"""
WITH {_kmeans_sql_ctes(k, iters)},
d AS (
  SELECT e.vec_id, c.cid,
         round(list_distance(e.v, c.cv) * list_distance(e.v, c.cv), 5)
             AS dist
  FROM e CROSS JOIN c{iters} c
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
  FROM d
)
SELECT vec_id, cid, dist FROM ranked WHERE rn = 1 ORDER BY vec_id
"""


def ivf_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10, nprobe: int = 2
) -> DataFrame:
    """IVF search: probe the query's `nprobe` nearest inverted lists, then
    exact cosine re-rank inside them.  Candidates ~ nprobe/C of the corpus;
    the probe-list filter is a broadcast semi-join (the nprobe cids are a
    tiny literal-sized set), so at 10^12 vectors the scan never touches
    non-probed lists."""
    from pyspark.sql import Window

    assign = ivf_assign(embeddings)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv")
    )
    probe = (
        _centroids(embeddings)
        .crossJoin(F.broadcast(q))
        .withColumn("dist", F.round(_l2sq(F.col("qv"), F.col("cv")), 5))
        .orderBy(F.asc("dist"), F.asc("cid"))
        .limit(nprobe)
        .select("cid")
    )
    cand = assign.join(F.broadcast(probe), "cid").select("vec_id")
    return cosine_topk(
        embeddings.join(cand, "vec_id").unionByName(
            embeddings.filter(F.col("vec_id") == query_vec_id)
        ).distinct(),
        query_vec_id=query_vec_id,
        k=k,
    )


def ivf_topk_sql(query_vec_id: int = 0, k: int = 10, nprobe: int = 2) -> str:
    return f"""
WITH assign AS ({ivf_assign_sql().strip()}),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {IVF_CENTROID_MOD} = 0
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT cid FROM cents, q
  ORDER BY round(list_distance(cv, qv) * list_distance(cv, qv), 5) ASC,
           cid ASC
  LIMIT {nprobe}
),
cand AS (SELECT vec_id FROM assign WHERE cid IN (SELECT cid FROM probe))
SELECT e.vec_id,
       round(list_dot_product(e.v, q.qv)
             / (sqrt(list_dot_product(e.v, e.v))
                * sqrt(list_dot_product(q.qv, q.qv))), 5) AS cosine
FROM e JOIN cand USING (vec_id), q
WHERE e.vec_id != {query_vec_id}
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {k}
"""


def cluster_stats(embeddings: DataFrame) -> DataFrame:
    """A4 analogue (EventCluster rollups, poc/src/core/models.py:331-337):
    per-LSH-bucket cluster statistics — member count, average label score,
    and the sorted member-id list (the reference's message_ids array,
    emitted as a comma-joined string so the oracle hash is scalar)."""
    b = lsh_buckets(embeddings)
    joined = embeddings.select("vec_id", "label").join(b, "vec_id")
    return (
        joined.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.round(F.avg("label"), 5).alias("avg_label"),
            F.array_join(
                F.array_sort(F.collect_list(F.col("vec_id").cast("string"))),
                ",",
            ).alias("member_ids"),
        )
        .orderBy("bucket")
    )


def cluster_stats_sql() -> str:
    return f"""
WITH buckets AS ({lsh_buckets_sql().strip()})
SELECT b.bucket,
       count(*) AS n_members,
       round(avg(e.label), 5) AS avg_label,
       array_to_string(list_sort(list(CAST(e.vec_id AS VARCHAR))), ',')
           AS member_ids
FROM embeddings e JOIN buckets b ON e.vec_id = b.vec_id
GROUP BY b.bucket ORDER BY b.bucket
"""


# ---------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN scoring.

PQ_M = 16       # subspaces (64-dim corpus -> 4-dim subvectors)
PQ_KSUB = 16    # centroids per subspace codebook
PQ_ITERS = 2    # Lloyd's iterations per codebook
PQ_UNITS = 100_000  # squared-distance fixed-point scale (5 decimals)


def _pq_subs(embeddings: DataFrame, m: int, dim: int) -> DataFrame:
    """(vec_id, sub, sv): each vector split into m contiguous subvectors —
    a narrow map (slice), no shuffle."""
    ds = dim // m
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    parts = [
        e.select(
            "vec_id",
            F.lit(j).alias("sub"),
            F.slice("v", j * ds + 1, ds).alias("sv"),
        )
        for j in range(m)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pq_codebooks(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
) -> DataFrame:
    """(sub, cid, cv): one trained k-means codebook per subspace — the PQ
    codebook table (<= m*ksub rows; FAISS's `pq.centroids`).  Same
    deterministic Lloyd's trajectory as kmeans_centroids per subspace
    (seeds = ksub lowest vec_ids' subvectors, every distance/mean
    rounded), but ALL m subspaces train in the same jobs: the centroid
    table is keyed (sub, cid), assignment is one broadcast join + min_by
    per (vec_id, sub), means one groupBy (sub, cid, pos) — one Spark job
    per iteration instead of m.  State is m*ksub*(dim/m) = dim*ksub
    doubles — driver-size, broadcast to every encode/score pass.  (A
    subspace cluster left empty by an iteration drops out, exactly like
    the unrolled SQL oracle.)"""
    subs = _pq_subs(embeddings, m, dim)
    seed_ids = [
        r["vec_id"]
        for r in embeddings.select("vec_id")
        .orderBy("vec_id")
        .limit(int(ksub))
        .collect()
    ]
    cents = subs.filter(F.col("vec_id").isin(seed_ids)).select(
        "sub", F.col("vec_id").alias("cid"), F.col("sv").alias("cv")
    )
    spark = embeddings.sparkSession
    for _ in range(iters):
        assign = (
            subs.join(F.broadcast(cents), "sub")
            .withColumn(
                "dist",
                F.round(_l2sq(F.col("sv"), F.col("cv")), KMEANS_DECIMALS),
            )
            .groupBy("vec_id", "sub")
            .agg(
                F.min_by(
                    F.struct("dist", "cid", "sv"), F.struct("dist", "cid")
                ).alias("b")
            )
            .select("sub", F.col("b.cid").alias("cid"), F.col("b.sv").alias("sv"))
        )
        means = (
            assign.select("sub", "cid", F.posexplode("sv").alias("pos", "x"))
            .groupBy("sub", "cid", "pos")
            .agg(F.round(F.avg("x"), KMEANS_DECIMALS).alias("m"))
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        # centroid state is m*ksub*(dim/m) doubles — materialize driver-
        # side so the next iteration broadcasts a literal table instead
        # of growing one unbounded lineage chain (same trick as
        # kmeans_centroids)
        rows = means.collect()
        cents = spark.createDataFrame(
            [(r["sub"], r["cid"], r["cv"]) for r in rows],
            "sub int, cid long, cv array<double>",
        )
    return cents


def pq_codes(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """(vec_id, sub, cid, units): PQ encoding — each subvector mapped to
    its nearest codebook centroid (squared L2 in integer units: exact,
    no float accumulation).  One broadcast join against the m*ksub
    codebook + a min_by partial aggregate per (vec_id, sub): the same
    map-side argmin shape as ivf_assign, m rows per vector, and at 10^12
    vectors the codes table (m bytes/vector at ksub<=256) is the
    compressed index ADC scans instead of raw embeddings."""
    subs = _pq_subs(embeddings, m, dim)
    cb = (
        codebooks
        if codebooks is not None
        else pq_codebooks(embeddings, m, ksub, iters, dim)
    )
    d = subs.join(F.broadcast(cb), "sub").withColumn(
        "units",
        F.round(_l2sq(F.col("sv"), F.col("cv")) * PQ_UNITS).cast("bigint"),
    )
    best = F.min_by(F.struct("units", "cid"), F.struct("units", "cid"))
    return (
        d.groupBy("vec_id", "sub")
        .agg(best.alias("b"))
        .select(
            "vec_id", "sub",
            F.col("b.cid").alias("cid"),
            F.col("b.units").alias("units"),
        )
    )


def pq_encode(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
) -> DataFrame:
    """(vec_id, codes): the per-vector PQ code word as a comma-joined
    string (sub order), scalar-hashable by the driver gate."""
    return (
        pq_codes(embeddings, m, ksub, iters, dim)
        .groupBy("vec_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "cid"))),
                    lambda s: s["cid"].cast("string"),
                ),
                ",",
            ).alias("codes")
        )
        .orderBy("vec_id")
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Asymmetric distance computation: approximate L2 of every corpus
    vector to the query = sum over subspaces of the query-to-centroid
    distance for the vector's code.  The m*ksub lookup table is built
    from the broadcast query subvectors; scoring joins the codes table to
    the broadcast table on (sub, cid) and sums INTEGER units per vec_id —
    a map-side partial sum (no float order-of-addition nondeterminism),
    then TakeOrdered k.  The corpus-sized input is the codes table, never
    raw embeddings: at scale this is the FAISS IVFADC inner loop as a
    broadcast-join + partial agg."""
    cb = pq_codebooks(embeddings, m, ksub, iters, dim)
    codes = pq_codes(embeddings, m, ksub, iters, dim, codebooks=cb)
    qsubs = _pq_subs(
        embeddings.filter(F.col("vec_id") == int(query_vec_id)), m, dim
    ).select("sub", F.col("sv").alias("qv"))
    table = cb.join(F.broadcast(qsubs), "sub").select(
        "sub", "cid",
        F.round(_l2sq(F.col("qv"), F.col("cv")) * PQ_UNITS)
        .cast("bigint").alias("qunits"),
    )
    return (
        codes.join(F.broadcast(table), ["sub", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("qunits").alias("u"))
        .filter(F.col("vec_id") != int(query_vec_id))
        .select(
            "vec_id",
            F.round(F.col("u") / float(PQ_UNITS), 5).alias("adc_dist"),
        )
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(int(k))
    )


def _pq_sql_ctes(m: int, ksub: int, iters: int, dim: int) -> str:
    """Per-subspace unrolled Lloyd's CTEs + the sliced-subvector views.
    Mirrors _kmeans_sql_ctes with a `s{j}` prefix and a list-slice source."""
    ds = dim // m
    out = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"
    ]
    slices = " UNION ALL ".join(
        f"SELECT vec_id, {j} AS sub, v[{j * ds + 1}:{(j + 1) * ds}] AS sv FROM e"
        for j in range(m)
    )
    out.append(f"subs AS ({slices})")
    for j in range(m):
        p = f"s{j}"
        out.append(f"""{p}c0 AS (
  SELECT vec_id AS cid, v[{j * ds + 1}:{(j + 1) * ds}] AS cv
  FROM e ORDER BY vec_id LIMIT {ksub}
)""")
        for i in range(iters):
            out.append(f"""{p}d{i} AS (
  SELECT s.vec_id, s.sv, c.cid,
         round(list_distance(s.sv, c.cv) * list_distance(s.sv, c.cv),
               {KMEANS_DECIMALS}) AS dist
  FROM subs s CROSS JOIN {p}c{i} c WHERE s.sub = {j}
),
{p}a{i} AS (
  SELECT vec_id, sv, cid FROM (
    SELECT vec_id, sv, cid, row_number() OVER (
        PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM {p}d{i}
  ) WHERE rn = 1
),
{p}m{i} AS (
  SELECT cid, pos, round(avg(x), {KMEANS_DECIMALS}) AS m
  FROM (SELECT cid, unnest(sv) AS x,
               unnest(range(1, len(sv) + 1)) AS pos
        FROM {p}a{i})
  GROUP BY cid, pos
),
{p}c{i + 1} AS (
  SELECT cid, list(m ORDER BY pos) AS cv FROM {p}m{i} GROUP BY cid
)""")
    cb = " UNION ALL ".join(
        f"SELECT {j} AS sub, cid, cv FROM s{j}c{iters}" for j in range(m)
    )
    out.append(f"cb AS ({cb})")
    out.append(f"""codes AS (
  SELECT vec_id, sub, cid, units FROM (
    SELECT s.vec_id, s.sub, c.cid,
           CAST(round(list_distance(s.sv, c.cv) * list_distance(s.sv, c.cv)
                      * {PQ_UNITS}) AS BIGINT) AS units,
           row_number() OVER (
               PARTITION BY s.vec_id, s.sub
               ORDER BY CAST(round(list_distance(s.sv, c.cv)
                             * list_distance(s.sv, c.cv)
                             * {PQ_UNITS}) AS BIGINT) ASC, c.cid ASC) AS rn
    FROM subs s JOIN cb c USING (sub)
  ) WHERE rn = 1
)""")
    return ",\n".join(out)


def pq_encode_sql(
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
) -> str:
    return f"""
WITH {_pq_sql_ctes(m, ksub, iters, dim)}
SELECT vec_id,
       array_to_string(list(CAST(cid AS VARCHAR) ORDER BY sub), ',') AS codes
FROM codes GROUP BY vec_id ORDER BY vec_id
"""


def pq_adc_topk_sql(
    query_vec_id: int = 0,
    k: int = 10,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
) -> str:
    return f"""
WITH {_pq_sql_ctes(m, ksub, iters, dim)},
qtab AS (
  SELECT c.sub, c.cid,
         CAST(round(list_distance(s.sv, c.cv) * list_distance(s.sv, c.cv)
                    * {PQ_UNITS}) AS BIGINT) AS qunits
  FROM cb c JOIN subs s USING (sub)
  WHERE s.vec_id = {query_vec_id}
)
SELECT c.vec_id,
       round(SUM(t.qunits) / {PQ_UNITS}.0, 5) AS adc_dist
FROM codes c JOIN qtab t USING (sub, cid)
WHERE c.vec_id != {query_vec_id}
GROUP BY c.vec_id
ORDER BY adc_dist ASC, c.vec_id ASC
LIMIT {k}
"""


def ivfpq_index(
    embeddings: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """(coarse_cid, vec_id, sub, cid, units): the IVF-PQ index — PQ codes
    tagged with their coarse inverted list.  The vec_id join happens ONCE
    at build time; written `partitionBy(coarse_cid)`, a query's nprobe
    restriction becomes partition pruning on the scan, so query-time work
    is probed-lists-only with no shuffle before the score aggregate (the
    FAISS IVFADC storage layout)."""
    codes = pq_codes(embeddings, m, ksub, iters, dim, codebooks=codebooks)
    assign = ivf_assign(embeddings).select(
        "vec_id", F.col("cid").alias("coarse_cid")
    )
    return codes.join(assign, "vec_id").select(
        "coarse_cid", "vec_id", "sub", "cid", "units"
    )


def ivfpq_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
) -> DataFrame:
    """IVF-PQ search: probe the query's `nprobe` nearest coarse lists,
    ADC-score only their members from the codes index.  Candidates ~
    nprobe/C of the corpus; the probe set is a broadcast literal-sized
    filter (partition pruning once the index is written partitioned by
    coarse_cid), scoring is the integer-unit broadcast-lookup + partial
    sum from pq_adc_topk — compressed-domain end to end: raw embeddings
    are touched only for the m-row query slice."""
    cb = pq_codebooks(embeddings, m, ksub, iters, dim)
    index = ivfpq_index(embeddings, m, ksub, iters, dim, codebooks=cb)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == int(query_vec_id)).select(
        F.col("v").alias("qv")
    )
    probe = (
        _centroids(embeddings)
        .crossJoin(F.broadcast(q))
        .withColumn("dist", F.round(_l2sq(F.col("qv"), F.col("cv")), 5))
        .orderBy(F.asc("dist"), F.asc("cid"))
        .limit(int(nprobe))
        .select(F.col("cid").alias("coarse_cid"))
    )
    qsubs = _pq_subs(
        embeddings.filter(F.col("vec_id") == int(query_vec_id)), m, dim
    ).select("sub", F.col("sv").alias("qv"))
    table = cb.join(F.broadcast(qsubs), "sub").select(
        "sub", "cid",
        F.round(_l2sq(F.col("qv"), F.col("cv")) * PQ_UNITS)
        .cast("bigint").alias("qunits"),
    )
    return (
        index.join(F.broadcast(probe), "coarse_cid")
        .join(F.broadcast(table), ["sub", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("qunits").alias("u"))
        .filter(F.col("vec_id") != int(query_vec_id))
        .select(
            "vec_id",
            F.round(F.col("u") / float(PQ_UNITS), 5).alias("adc_dist"),
        )
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(int(k))
    )


def ivfpq_topk_sql(
    query_vec_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
) -> str:
    return f"""
WITH {_pq_sql_ctes(m, ksub, iters, dim)},
cents AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {IVF_CENTROID_MOD} = 0
),
ivfd AS (
  SELECT e.vec_id, c.cid,
         round(list_distance(e.v, c.cv) * list_distance(e.v, c.cv), 5)
             AS dist
  FROM e CROSS JOIN cents c
),
ivfassign AS (
  SELECT vec_id, cid AS coarse_cid FROM (
    SELECT vec_id, cid, row_number() OVER (
        PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM ivfd
  ) WHERE rn = 1
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT cid AS coarse_cid FROM cents, q
  ORDER BY round(list_distance(cv, qv) * list_distance(cv, qv), 5) ASC,
           cid ASC
  LIMIT {nprobe}
),
qtab AS (
  SELECT c.sub, c.cid,
         CAST(round(list_distance(s.sv, c.cv) * list_distance(s.sv, c.cv)
                    * {PQ_UNITS}) AS BIGINT) AS qunits
  FROM cb c JOIN subs s USING (sub)
  WHERE s.vec_id = {query_vec_id}
)
SELECT c.vec_id,
       round(SUM(t.qunits) / {PQ_UNITS}.0, 5) AS adc_dist
FROM codes c
JOIN ivfassign a USING (vec_id)
JOIN probe p USING (coarse_cid)
JOIN qtab t USING (sub, cid)
WHERE c.vec_id != {query_vec_id}
GROUP BY c.vec_id
ORDER BY adc_dist ASC, c.vec_id ASC
LIMIT {k}
"""


def ivfpq_refine_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
    oversample: int = 4,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
) -> DataFrame:
    """IVF-PQ with EXACT RESCORING (FAISS IndexRefine / ES 8.15 quantized
    kNN "oversample + rescore"): the compressed-domain ADC pass retrieves
    k * oversample candidates, then ONLY those rows' raw embeddings are
    read for an exact distance re-rank to the final top-k.  The accuracy
    cost of PQ is paid back with an O(k * oversample)-row exact pass —
    raw vectors never leave their partitions (the candidate set is a
    broadcast literal-sized join), so the 100 TB plan is the ADC scan
    plus one pruned point-lookup stage.

    Returns (vec_id, dist) by exact L2^2, rounded 5, vec_id tiebreak."""
    cand = ivfpq_topk(
        embeddings, query_vec_id, k=int(k) * int(oversample),
        nprobe=nprobe, m=m, ksub=ksub, iters=iters, dim=dim,
    ).select("vec_id")
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == int(query_vec_id)).select(
        F.col("v").alias("qv")
    )
    return (
        e.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", F.round(_l2sq(F.col("v"), F.col("qv")), 5).alias("dist")
        )
        .orderBy(F.asc("dist"), F.asc("vec_id"))
        .limit(int(k))
    )


def ivfpq_refine_topk_sql(
    query_vec_id: int = 0,
    k: int = 10,
    nprobe: int = 2,
    oversample: int = 4,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = PQ_ITERS,
    dim: int = EMB_DIM,
) -> str:
    inner = ivfpq_topk_sql(
        query_vec_id, int(k) * int(oversample), nprobe, m, ksub, iters, dim
    ).strip()
    return f"""
WITH cand AS ({inner}),
ee AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
qq AS (SELECT v AS qv FROM ee WHERE vec_id = {int(query_vec_id)})
SELECT ee.vec_id,
       round(list_distance(ee.v, qq.qv) * list_distance(ee.v, qq.qv), 5)
           AS dist
FROM ee JOIN cand USING (vec_id) CROSS JOIN qq
ORDER BY dist ASC, ee.vec_id ASC
LIMIT {int(k)}
"""


def knn_filtered_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    label: int = 3,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ES 8 `knn` with a filter clause (pre-filter semantics: the top-k
    is taken AMONG vectors passing the filter, never filtered after) on
    the IVF probe path.

    The filter composes with the coarse quantizer, not after it: probed
    inverted lists are scanned with the label predicate pushed into the
    candidate scan (at the storage level the IVF lists are parquet
    partitioned by cid, so the label filter prunes row groups inside the
    probed partitions only).  nprobe is raised vs the unfiltered default
    because a selective filter thins each list — the ES guidance for
    filtered HNSW/IVF alike.  Exactness contract: deterministic
    approximation (the probe set is fixed by the quantizer), pinned by
    the unrolled oracle."""
    # Spark's TakeOrderedAndProject eagerly allocates a 2k-slot buffer
    # per task; an "probe everything" nprobe (e.g. 10**9) must not OOM
    # the executor.  No real IVF layout has more lists than this cap.
    nprobe = min(int(nprobe), 1_000_000)
    assign = ivf_assign(embeddings)
    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    probe = (
        _centroids(embeddings)
        .crossJoin(F.broadcast(q))
        .withColumn("dist", F.round(_l2sq(F.col("qv"), F.col("cv")), 5))
        .orderBy(F.asc("dist"), F.asc("cid"))
        .limit(nprobe)
        .select("cid")
    )
    cand = assign.join(F.broadcast(probe), "cid").select("vec_id")
    return (
        e.join(cand, "vec_id")
        .filter((F.col("label") == int(label)) & (F.col("vec_id") != query_vec_id))
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (
                    F.sqrt(_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                ),
                5,
            ),
        )
        .select("vec_id", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def knn_filtered_topk_sql(
    query_vec_id: int = 0, label: int = 3, k: int = 10, nprobe: int = 4
) -> str:
    return f"""
WITH assign AS ({ivf_assign_sql().strip()}),
e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {IVF_CENTROID_MOD} = 0
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id}),
probe AS (
  SELECT cid FROM cents, q
  ORDER BY round(list_distance(cv, qv) * list_distance(cv, qv), 5) ASC,
           cid ASC
  LIMIT {nprobe}
),
cand AS (SELECT vec_id FROM assign WHERE cid IN (SELECT cid FROM probe))
SELECT e.vec_id,
       round(list_dot_product(e.v, q.qv)
             / (sqrt(list_dot_product(e.v, e.v))
                * sqrt(list_dot_product(q.qv, q.qv))), 5) AS cosine
FROM e JOIN cand USING (vec_id), q
WHERE e.label = {int(label)} AND e.vec_id != {query_vec_id}
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {k}
"""


def semdedup(
    embeddings: DataFrame, k: int = 8, iters: int = 3, eps: float = 0.95
) -> DataFrame:
    """SemDedup (Abbas et al. 2023): semantic near-duplicate pruning via
    the trained k-means clustering — within each cluster, a vector is a
    DUPLICATE if some other cluster member has cosine >= eps, and of each
    such pair the member FARTHER from the centroid is kept (the paper's
    keep-outliers rule; ties break by lower vec_id kept).

    Output (vec_id, cid, kept), vec_id order — the training pipeline
    filters on kept.

    Scale shape: clustering is the verified kmeans_assign plan (broadcast
    centroids, min_by, k x dim driver state); the pairwise check
    self-joins WITHIN a cluster only — one shuffle on cid, per-task work
    bounded by cluster size squared.  That is the published SemDedup
    recipe: k is chosen so n/k is small (they run 50k clusters at
    LAION-440M => ~9k per cluster); the cross-cluster problem is never
    quadratic.  Determinism: distances and cosines round like every
    embedding op (KMEANS_DECIMALS / 5), so both engines agree exactly."""
    assign = kmeans_assign(embeddings, k, iters)
    a = assign.join(
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        "vec_id",
    )
    ax = a.select(
        F.col("vec_id").alias("ia"), "cid",
        F.col("dist").alias("da"), F.col("v").alias("va"),
    )
    ay = a.select(
        F.col("vec_id").alias("ib"), "cid",
        F.col("dist").alias("db"), F.col("v").alias("vb"),
    )
    cos = F.round(
        _dot(F.col("va"), F.col("vb"))
        / (
            F.sqrt(_dot(F.col("va"), F.col("va")))
            * F.sqrt(_dot(F.col("vb"), F.col("vb")))
        ),
        5,
    )
    dropped = (
        ax.join(ay, "cid")
        .filter(F.col("ia") != F.col("ib"))
        .filter(cos >= float(eps))
        .filter(
            (F.col("db") > F.col("da"))
            | ((F.col("db") == F.col("da")) & (F.col("ib") < F.col("ia")))
        )
        .select(F.col("ia").alias("vec_id"))
        .distinct()
        .withColumn("dup", F.lit(True))
    )
    return (
        assign
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id", "cid", F.col("dup").isNull().alias("kept")
        )
        .orderBy("vec_id")
    )


def semdedup_sql(k: int = 8, iters: int = 3, eps: float = 0.95) -> str:
    return f"""
WITH {_kmeans_sql_ctes(k, iters)},
d AS (
  SELECT e.vec_id, e.v, c.cid,
         round(list_distance(e.v, c.cv) * list_distance(e.v, c.cv), 5)
             AS dist
  FROM e CROSS JOIN c{iters} c
),
a AS (
  SELECT vec_id, v, cid, dist FROM (
    SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
    FROM d
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT x.vec_id
  FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id <> y.vec_id
  WHERE round(list_dot_product(x.v, y.v)
              / (sqrt(list_dot_product(x.v, x.v))
                 * sqrt(list_dot_product(y.v, y.v))), 5) >= {float(eps)}
    AND (y.dist > x.dist OR (y.dist = x.dist AND y.vec_id < x.vec_id))
)
SELECT a.vec_id, a.cid, dr.vec_id IS NULL AS kept
FROM a LEFT JOIN dropped dr ON a.vec_id = dr.vec_id
ORDER BY a.vec_id
"""


def cosine_topk_batch(
    embeddings: DataFrame, query_vec_ids: list[int], k: int = 10
) -> DataFrame:
    """ES msearch-knn: N query vectors answered in ONE job.  The query
    set broadcasts (N x dim floats), scoring is one narrow map over the
    corpus vectors, and the per-query top-k is a window partitioned by
    query id — no global sort, scales with the corpus scan.

    Returns (query_vec_id, vec_id, cosine), top-k per query, ordered."""
    from pyspark.sql.window import Window

    ids = sorted({int(q) for q in query_vec_ids})
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_vec_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("query_vec_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_vec_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (
                    F.sqrt(_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                ),
                5,
            ),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(k))
        .select("query_vec_id", "vec_id", "cosine")
        .orderBy("query_vec_id", F.desc("cosine"), F.asc("vec_id"))
    )


def cosine_topk_batch_sql(query_vec_ids: list[int], k: int = 10) -> str:
    ids = ", ".join(str(int(q)) for q in sorted({int(q) for q in query_vec_ids}))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_vec_id, v AS qv FROM e WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_vec_id, e.vec_id,
         round(list_dot_product(e.v, q.qv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(q.qv, q.qv))), 5) AS cosine
  FROM e CROSS JOIN q
  WHERE e.vec_id != q.query_vec_id
)
SELECT query_vec_id, vec_id, cosine
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_vec_id
                           ORDER BY cosine DESC, vec_id ASC) <= {int(k)}
ORDER BY query_vec_id, cosine DESC, vec_id ASC
"""


def knn_radius(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    similarity: float = 0.2,
    num_candidates: int = 1000,
) -> DataFrame:
    """ES 8.8 `knn` with the `similarity` threshold: radius search —
    every vector whose cosine >= `similarity`, capped at
    `num_candidates` (ES applies the threshold to the gathered
    candidates; the cap keeps the response bounded whatever the radius
    catches).  Same broadcast-query / narrow-map / TakeOrdered shape as
    cosine_topk — the threshold is a post-scoring filter, so the scan
    cost is identical and the emitted rows shrink."""
    scored = (
        embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .crossJoin(
            F.broadcast(
                embeddings.filter(F.col("vec_id") == query_vec_id).select(
                    F.col("embedding").cast("array<double>").alias("qv")
                )
            )
        )
        .filter(F.col("vec_id") != query_vec_id)
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (
                    F.sqrt(_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                ),
                5,
            ),
        )
    )
    return (
        scored.filter(F.col("cosine") >= float(similarity))
        .select("vec_id", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(int(num_candidates))
    )


def knn_radius_sql(
    query_vec_id: int = 0, similarity: float = 0.2, num_candidates: int = 1000
) -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT v AS qv FROM e WHERE vec_id = {query_vec_id})
SELECT vec_id,
       round(list_dot_product(v, qv)
             / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
             5) AS cosine
FROM e, q
WHERE vec_id != {query_vec_id}
  AND round(list_dot_product(v, qv)
            / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
            5) >= {float(similarity)!r}
ORDER BY cosine DESC, vec_id ASC
LIMIT {int(num_candidates)}
"""


def rank_vectors_maxsim_topk(
    embeddings: DataFrame,
    query_group: int = 0,
    group_size: int = 5,
    k: int = 10,
) -> DataFrame:
    """ES 8.16 `rank_vectors` + `maxSimDotProduct` — late-interaction
    (ColBERT-style) multi-vector scoring.

    Each document stores a SET of vectors (here: embedding rows grouped
    into docs of `group_size` consecutive vec_ids — the deterministic
    multi-vector corpus); the query is itself a vector set (the vectors
    of `query_group`).  maxSim sums, over the query vectors, the best
    dot product any document vector achieves:

        score(D) = sum_{q in Q} max_{v in D} (q . v)

    Scale shape: the query set (`group_size` rows) is broadcast; every
    document vector is scored against all |Q| query vectors in one
    narrow map (|Q| is a small constant — ES caps multi-vector fields
    the same way), then ONE hash aggregate keyed on the document id
    computes all |Q| conditional maxes with map-side partial
    aggregation, and the final sum is a fixed-order column expression
    (no aggregation-order float noise).  One shuffle on doc_group +
    TakeOrdered k — survives any corpus size.

    Reference analogue: ranking is delegated to ES
    (output/elasticsearch.py); rank_vectors is ES 8.16's multi-vector
    script_score surface over the same store.
    """
    gsz = int(group_size)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn(
        "doc_group", F.floor(F.col("vec_id") / gsz).cast("bigint")
    )
    q = e.filter(F.col("doc_group") == int(query_group)).select(
        (F.col("vec_id") % gsz).cast("int").alias("qi"),
        F.col("v").alias("qv"),
    )
    dots = (
        e.filter(F.col("doc_group") != int(query_group))
        .crossJoin(F.broadcast(q))
        .select(
            "doc_group",
            "qi",
            F.round(_dot(F.col("v"), F.col("qv")), 6).alias("dot"),
        )
    )
    maxes = [
        F.max(F.when(F.col("qi") == i, F.col("dot"))).alias(f"m{i}")
        for i in range(gsz)
    ]
    agged = dots.groupBy("doc_group").agg(*maxes)
    total = None
    for i in range(gsz):
        t = F.coalesce(F.col(f"m{i}"), F.lit(0.0))
        total = t if total is None else total + t
    return (
        agged.select("doc_group", F.round(total, 5).alias("maxsim"))
        .orderBy(F.desc("maxsim"), F.asc("doc_group"))
        .limit(int(k))
    )


def rank_vectors_maxsim_topk_sql(
    query_group: int = 0, group_size: int = 5, k: int = 10
) -> str:
    gsz = int(group_size)
    max_cols = ",\n             ".join(
        f"COALESCE(max(CASE WHEN qi = {i} THEN dot END), 0.0) AS m{i}"
        for i in range(gsz)
    )
    total = " + ".join(f"m{i}" for i in range(gsz))
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                  CAST(floor(vec_id / {gsz}) AS BIGINT) AS doc_group
           FROM embeddings),
q AS (SELECT CAST(vec_id % {gsz} AS INT) AS qi, v AS qv
      FROM e WHERE doc_group = {int(query_group)}),
dots AS (SELECT e.doc_group, q.qi,
                round(list_dot_product(e.v, q.qv), 6) AS dot
         FROM e, q WHERE e.doc_group != {int(query_group)}),
m AS (SELECT doc_group,
             {max_cols}
      FROM dots GROUP BY doc_group)
SELECT doc_group, round({total}, 5) AS maxsim
FROM m
ORDER BY maxsim DESC, doc_group ASC
LIMIT {int(k)}
"""


# ---------------------------------------------------------------------------
# Quantized kNN: ES scalar quantization (int8) and bit vectors (hamming),
# both with the ES 9.0 `rescore_vector` oversample contract.
# ---------------------------------------------------------------------------


def _sq_bounds(embeddings: DataFrame) -> tuple[float, float]:
    """Corpus-global scalar-quantization interval [lo, hi] — the Lucene
    ScalarQuantizer confidence interval with confidence = 1.0 (exact
    min/max over every component).  min/max are order-independent, so the
    two driver scalars are bit-identical across engines and cluster
    sizes; at 100 TB this is one map-side-combined min/max agg (two
    doubles per task)."""
    row = (
        embeddings.select(F.explode(F.col("embedding").cast("array<double>")).alias("u"))
        .agg(F.min("u").alias("lo"), F.max("u").alias("hi"))
        .collect()[0]
    )
    return float(row["lo"]), float(row["hi"])


def _sq_code(v: F.Column, lo: float, hi: float) -> F.Column:
    """Quantize one double component array to int codes in [0, 127] —
    Lucene's 7-bit int8 encoding (unsigned range so dot products stay
    non-negative).  round() on a non-negative operand is HALF_UP in both
    Spark and DuckDB, and the affine transform is the same IEEE double
    expression in both engines, so codes are bit-identical."""
    scale = 127.0 / (hi - lo)
    return F.transform(
        v, lambda x: F.round((x - F.lit(lo)) * F.lit(scale), 0).cast("long")
    )


def knn_int8_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    oversample: int = 3,
) -> DataFrame:
    """ES 8.14 `int8` scalar-quantized kNN (similarity: max_inner_product)
    with ES 9.0 `rescore_vector: {oversample}` semantics: candidates are
    ranked in the COMPRESSED domain — integer dot of 7-bit codes plus
    Lucene ScalarQuantizer's corrective offset — then the top
    k * oversample candidates are exactly re-scored with the float dot.

    The corrective term is not optional: codes are unsigned offsets
    c = round((x - lo) * s), so sum(cx * cy) estimates
    s^2 * sum(x*y) - lo*s * (Sx + Sy) + 64 * (lo*s)^2; with the query
    fixed, the doc-dependent part is qdot + lo*s * Sx (Sx = sum of the
    doc's codes — one integer per vector, Lucene stores exactly this
    per-vector scalar).  Without it, candidate recall collapses (2/10 on
    the synthetic corpus; 10/10 with it at oversample 2).

    Scale shape: the quantization interval is one min/max agg (two
    scalars); the candidate pass is a narrow map over the code column +
    one TakeOrdered (no shuffle of raw vectors, 4x less I/O than
    float32); the rescore touches k * oversample rows via a broadcast
    semi-join.  qdot and Sx are exact integers and lo*s is one driver
    double, so the candidate key is the same IEEE double in any engine
    or partitioning — the window is deterministic.

    Reference parity: Telegram2Elastic delegates vector search to ES
    dense_vector (README.md:5 Kibana serving path); this is the
    quantized index_options surface of that field type.
    Returns (vec_id, dot) — rounded 5, vec_id tiebreak."""
    lo, hi = _sq_bounds(embeddings)
    corr = lo * (127.0 / (hi - lo))
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("code", _sq_code(F.col("v"), lo, hi))
    q = e.filter(F.col("vec_id") == int(query_vec_id)).select(
        F.col("v").alias("qv"), F.col("code").alias("qcode")
    )
    window = int(k) * int(oversample)
    int_sum = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, z: acc + z
    )
    cand = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != int(query_vec_id))
        .select(
            "vec_id",
            (
                int_sum(
                    F.zip_with(F.col("code"), F.col("qcode"), lambda a, b: a * b)
                ).cast("double")
                + F.lit(corr) * int_sum(F.col("code")).cast("double")
            ).alias("qkey"),
        )
        .orderBy(F.desc("qkey"), F.asc("vec_id"))
        .limit(window)
        .select("vec_id")
    )
    return (
        e.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(q))
        .withColumn("dot", F.round(_dot(F.col("v"), F.col("qv")), 5))
        .select("vec_id", "dot")
        .orderBy(F.desc("dot"), F.asc("vec_id"))
        .limit(int(k))
    )


def knn_int8_topk_sql(
    query_vec_id: int = 0, k: int = 10, oversample: int = 3
) -> str:
    qid, window = int(query_vec_id), int(k) * int(oversample)
    return f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
b AS (SELECT min(u) AS lo, max(u) AS hi
      FROM (SELECT unnest(v) AS u FROM e0)),
e AS (SELECT vec_id, v,
             list_transform(v, x -> CAST(round((x - b.lo) * (127.0 / (b.hi - b.lo)), 0) AS BIGINT)) AS code
      FROM e0, b),
q AS (SELECT v AS qv, code AS qcode FROM e WHERE vec_id = {qid}),
cand AS (
  SELECT e.vec_id,
         CAST(list_sum(list_transform(range(1, len(e.code) + 1),
                                      i -> e.code[i] * q.qcode[i])) AS DOUBLE)
         + (b.lo * (127.0 / (b.hi - b.lo)))
           * CAST(list_sum(e.code) AS DOUBLE) AS qkey
  FROM e, q, b WHERE e.vec_id != {qid}
  ORDER BY qkey DESC, e.vec_id ASC
  LIMIT {window})
SELECT e.vec_id, round(list_dot_product(e.v, q.qv), 5) AS dot
FROM e JOIN cand USING (vec_id) CROSS JOIN q
ORDER BY dot DESC, e.vec_id ASC
LIMIT {int(k)}
"""


def _bit_halves(v: F.Column) -> tuple[F.Column, F.Column]:
    """Pack the sign bits of a 64-dim vector into two 32-bit halves
    (bits 0..31 -> lo, 32..63 -> hi), each stored in a BIGINT.

    Two halves instead of one 64-bit word on purpose: bit 63 is the
    two's-complement sign bit, and summing a -2^63 term overflows
    DuckDB's HUGEINT-summing aggregate on the oracle side; both halves
    stay in [0, 2^32), where integer arithmetic is portable."""
    idx = F.sequence(F.lit(0), F.lit(EMB_DIM - 1))
    # shiftleft() takes a Python-int shift, so the power of two comes from
    # a 32-entry literal array instead (element_at is 1-based).
    powers = F.array(*[F.lit(1 << i).cast("long") for i in range(32)])
    bits = F.zip_with(
        v, idx,
        lambda x, d: F.when(x > 0, F.element_at(powers, (d % 32) + 1))
        .otherwise(F.lit(0).cast("long")),
    )
    lo = F.aggregate(
        F.slice(bits, 1, EMB_DIM // 2), F.lit(0).cast("long"), lambda a, z: a + z
    )
    hi = F.aggregate(
        F.slice(bits, EMB_DIM // 2 + 1, EMB_DIM // 2), F.lit(0).cast("long"), lambda a, z: a + z
    )
    return lo, hi


def knn_bit_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = 10,
    oversample: int = 5,
) -> DataFrame:
    """ES 8.15 `bit` dense_vector (hamming similarity) with the ES 9.0
    BBQ-style oversample + exact-rescore contract: each vector is
    sign-quantized to 64 bits packed into two 32-bit words (32x smaller
    than float32 — the reason binary quantization is ES 9's default for
    large indexes), candidates are ranked by hamming distance
    (bit_count(xor) on the packed words — pure integer, engine- and
    partitioning-independent), and the top k * oversample are re-scored
    with exact float cosine.

    Scale shape: the code table is 16 bytes/vector — at 10^12 vectors it
    is 16 TB vs 256 TB of float32, and the candidate pass is a narrow
    integer map + TakeOrdered with NO access to the raw vectors; only
    the k * oversample window pays the float read (broadcast semi-join).
    Returns (vec_id, cosine) — rounded 5, vec_id tiebreak."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    lo_c, hi_c = _bit_halves(F.col("v"))
    e = e.withColumn("blo", lo_c).withColumn("bhi", hi_c)
    q = e.filter(F.col("vec_id") == int(query_vec_id)).select(
        F.col("v").alias("qv"), F.col("blo").alias("qlo"), F.col("bhi").alias("qhi")
    )
    window = int(k) * int(oversample)
    cand = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != int(query_vec_id))
        .select(
            "vec_id",
            (
                F.bit_count(F.col("blo").bitwiseXOR(F.col("qlo")))
                + F.bit_count(F.col("bhi").bitwiseXOR(F.col("qhi")))
            ).alias("hamming"),
        )
        .orderBy(F.asc("hamming"), F.asc("vec_id"))
        .limit(window)
        .select("vec_id")
    )
    return (
        e.join(F.broadcast(cand), "vec_id")
        .crossJoin(F.broadcast(q))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (
                    F.sqrt(_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                ),
                5,
            ),
        )
        .select("vec_id", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(int(k))
    )


def knn_bit_topk_sql(
    query_vec_id: int = 0, k: int = 10, oversample: int = 5
) -> str:
    qid, window = int(query_vec_id), int(k) * int(oversample)
    half = EMB_DIM // 2
    return f"""
WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
e AS (SELECT vec_id, v,
             list_sum(list_transform(range(1, {half} + 1),
                 i -> CASE WHEN v[i] > 0 THEN (CAST(1 AS BIGINT) << ((i - 1) % 32)) ELSE 0 END)) AS blo,
             list_sum(list_transform(range({half} + 1, {EMB_DIM} + 1),
                 i -> CASE WHEN v[i] > 0 THEN (CAST(1 AS BIGINT) << ((i - 1) % 32)) ELSE 0 END)) AS bhi
      FROM e0),
q AS (SELECT v AS qv, blo AS qlo, bhi AS qhi FROM e WHERE vec_id = {qid}),
cand AS (
  SELECT e.vec_id,
         bit_count(xor(CAST(e.blo AS BIGINT), CAST(q.qlo AS BIGINT)))
         + bit_count(xor(CAST(e.bhi AS BIGINT), CAST(q.qhi AS BIGINT))) AS hamming
  FROM e, q WHERE e.vec_id != {qid}
  ORDER BY hamming ASC, e.vec_id ASC
  LIMIT {window})
SELECT e.vec_id,
       round(list_dot_product(e.v, q.qv)
             / (sqrt(list_dot_product(e.v, e.v))
                * sqrt(list_dot_product(q.qv, q.qv))), 5) AS cosine
FROM e JOIN cand USING (vec_id) CROSS JOIN q
ORDER BY cosine DESC, e.vec_id ASC
LIMIT {int(k)}
"""


# --- Margin-based bitext mining (Artetxe & Schwenk 2019) -----------------------

def bitext_margin_topk(
    embeddings: DataFrame,
    group_a: int = 0,
    group_b: int = 1,
    knn: int = 4,
    k: int = 10,
) -> DataFrame:
    """Top-k candidate bitext pairs between two embedding groups scored by
    the RATIO margin of Artetxe & Schwenk 2019 (the CCMatrix / LASER
    mining criterion): a pair is strong when its cosine stands out from
    BOTH sides' neighborhood averages, which kills the hub vectors plain
    cosine thresholds keep.

        margin(x, y) = cos(x, y) /
            ( (avg_{z in NNk(x)} cos(x, z) + avg_{w in NNk(y)} cos(w, y)) / 2 )

    with NNk taken in the OTHER group (y's competitors for x and vice
    versa; the pair itself may appear in its own neighborhood, as in the
    paper).  `label` stands in for the language id.

    Determinism: each pairwise cosine is rounded to 5 decimals and scaled
    to an INTEGER c5 = round(cos * 1e5); neighborhoods are picked by
    (c5 desc, id asc) and their sums are integer sums (associative — no
    float accumulation order anywhere); the margin is a single integer-
    ratio division  2 * knn * c5 / (sum_x + sum_y)  rounded once.

    Scale shape: this is the exact GLOBAL formulation — the registered
    driver-scale oracle pair.  At 10^12 docs the standard pipeline (and
    this engine's composition) generates candidates with the ANN family
    (knn_int8_topk / ivf_topk / lsh_buckets) and margin-scores only the
    candidate lists; the scorer here is reused unchanged since it only
    needs each pair's cosine and the two k-neighborhood sums.
    """
    knn, k = int(knn), int(k)
    if knn < 1:
        raise ValueError("knn must be >= 1")
    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))
    a = e.filter(F.col("label") == int(group_a)).select(
        F.col("vec_id").alias("a_id"), F.col("v").alias("va"),
        F.col("n").alias("na"),
    )
    b = e.filter(F.col("label") == int(group_b)).select(
        F.col("vec_id").alias("b_id"), F.col("v").alias("vb"),
        F.col("n").alias("nb"),
    )
    pairs = a.crossJoin(b).select(
        "a_id",
        "b_id",
        F.expr(
            "CAST(round(aggregate(zip_with(va, vb, (p, q) -> p * q), "
            "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) / (na * nb) "
            "* 100000) AS BIGINT)"
        ).alias("c5"),
    ).persist()
    from pyspark.sql import Window

    wa = Window.partitionBy("a_id").orderBy(F.desc("c5"), F.asc("b_id"))
    wb = Window.partitionBy("b_id").orderBy(F.desc("c5"), F.asc("a_id"))
    sum_a = (
        pairs.withColumn("r", F.row_number().over(wa))
        .filter(F.col("r") <= knn)
        .groupBy("a_id")
        .agg(F.sum("c5").alias("sa"), F.count(F.lit(1)).alias("ca"))
    )
    sum_b = (
        pairs.withColumn("r", F.row_number().over(wb))
        .filter(F.col("r") <= knn)
        .groupBy("b_id")
        .agg(F.sum("c5").alias("sb"), F.count(F.lit(1)).alias("cb"))
    )
    out = (
        pairs.join(sum_a, "a_id")
        .join(sum_b, "b_id")
        .filter((F.col("ca") == knn) & (F.col("cb") == knn))
        .filter(F.col("sa") + F.col("sb") != 0)
        .select(
            "a_id",
            "b_id",
            F.round(F.col("c5") / 100000.0, 5).alias("cosine"),
            F.round(
                (2.0 * knn * F.col("c5")) / (F.col("sa") + F.col("sb")), 5
            ).alias("margin"),
        )
        .orderBy(F.desc("margin"), F.asc("a_id"), F.asc("b_id"))
        .limit(k)
        .localCheckpoint()
    )
    pairs.unpersist()
    return out


def bitext_margin_topk_sql(
    group_a: int = 0, group_b: int = 1, knn: int = 4, k: int = 10
) -> str:
    knn, k = int(knn), int(k)
    return f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS n
  FROM embeddings
),
a AS (SELECT vec_id AS a_id, v AS va, n AS na FROM e WHERE label = {int(group_a)}),
b AS (SELECT vec_id AS b_id, v AS vb, n AS nb FROM e WHERE label = {int(group_b)}),
pairs AS (
  SELECT a_id, b_id,
         CAST(round(list_dot_product(va, vb) / (na * nb) * 100000) AS BIGINT) AS c5
  FROM a CROSS JOIN b
),
ra AS (
  SELECT a_id, c5,
         row_number() OVER (PARTITION BY a_id ORDER BY c5 DESC, b_id ASC) AS r
  FROM pairs
),
suma AS (
  SELECT a_id, sum(c5) AS sa, count(*) AS ca FROM ra WHERE r <= {knn} GROUP BY a_id
),
rb AS (
  SELECT b_id, c5,
         row_number() OVER (PARTITION BY b_id ORDER BY c5 DESC, a_id ASC) AS r
  FROM pairs
),
sumb AS (
  SELECT b_id, sum(c5) AS sb, count(*) AS cb FROM rb WHERE r <= {knn} GROUP BY b_id
)
SELECT p.a_id, p.b_id,
       round(p.c5 / 100000.0, 5) AS cosine,
       round((2.0 * {knn} * p.c5) / (s1.sa + s2.sb), 5) AS margin
FROM pairs p
JOIN suma s1 USING (a_id)
JOIN sumb s2 USING (b_id)
WHERE s1.ca = {knn} AND s2.cb = {knn} AND s1.sa + s2.sb != 0
ORDER BY margin DESC, p.a_id ASC, p.b_id ASC
LIMIT {k}
"""


# --- Distance-based outlier detection (ES data frame analytics) ----------------

def outlier_knn_scores(
    embeddings: DataFrame, knn: int = 5, k: int = 10
) -> DataFrame:
    """ES data-frame-analytics `outlier_detection`: per-vector outlier
    scores from the two distance-based methods of the ES ensemble —
    distance to the knn-th nearest neighbour and the mean distance to the
    k nearest neighbours (the ensemble's ldof/lof members need the same
    neighbourhoods; the distance pair is the deterministic pin).  Scores
    are normalized to [0, 1] by the corpus max, as ES reports them.

    Distance is cosine distance scaled to an INTEGER d5 = 100000 - c5
    (c5 = round(cos * 1e5)): neighbourhood picks order by (d5 asc, id
    asc) and the mean is an integer sum with ONE final division — no
    float accumulation order anywhere, so the result is partition- and
    engine-exact.

    Scale shape: like `bitext_margin_topk`, this is the exact GLOBAL
    formulation (the registered driver-scale oracle pair).  At 10^12 docs
    the neighbourhoods come from the ANN family (knn_int8_topk /
    ivf_topk / lsh_buckets candidates); the scorer is reused unchanged —
    it only needs each vector's knn distance list."""
    knn, k = int(knn), int(k)
    if knn < 1:
        raise ValueError("knn must be >= 1")
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))
    a = e.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"),
                 F.col("n").alias("na"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"),
                 F.col("n").alias("nb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            (
                F.lit(100000)
                - F.expr(
                    "CAST(round(aggregate(zip_with(va, vb, (p, q) -> p * q), "
                    "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) / (na * nb) "
                    "* 100000) AS BIGINT)"
                )
            ).alias("d5"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("a_id").orderBy(F.asc("d5"), F.asc("b_id"))
    nb_stats = (
        pairs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= knn)
        .groupBy("a_id")
        .agg(
            F.max("d5").alias("dk5"),          # knn-th NN distance
            F.sum("d5").alias("sd5"),          # integer sum for the mean
            F.count(F.lit(1)).alias("cnt"),
        )
        .filter(F.col("cnt") == knn)
    )
    gmax = nb_stats.agg(F.max("dk5").alias("gmax"))
    return (
        nb_stats.crossJoin(F.broadcast(gmax))
        .select(
            F.col("a_id").alias("vec_id"),
            F.round(F.col("dk5") / 100000.0, 5).alias("dist_knn"),
            F.round(F.col("sd5") / (knn * 100000.0), 5).alias("avg_dist"),
            F.round(F.col("dk5") / F.col("gmax"), 5).alias("outlier_score"),
        )
        .orderBy(F.desc("outlier_score"), F.asc("vec_id"))
        .limit(k)
    )


def outlier_knn_scores_sql(knn: int = 5, k: int = 10) -> str:
    knn, k = int(knn), int(k)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS n
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         100000 - CAST(round(list_dot_product(a.v, b.v) / (a.n * b.n)
                             * 100000) AS BIGINT) AS d5
  FROM e a CROSS JOIN e b
  WHERE a.vec_id != b.vec_id
),
ranked AS (
  SELECT a_id, d5,
         row_number() OVER (PARTITION BY a_id ORDER BY d5 ASC, b_id ASC) AS r
  FROM pairs
),
nb AS (
  SELECT a_id, max(d5) AS dk5, sum(d5) AS sd5, count(*) AS cnt
  FROM ranked WHERE r <= {knn} GROUP BY a_id
),
g AS (SELECT max(dk5) AS gmax FROM nb WHERE cnt = {knn})
SELECT nb.a_id AS vec_id,
       round(nb.dk5 / 100000.0, 5) AS dist_knn,
       round(nb.sd5 / ({knn} * 100000.0), 5) AS avg_dist,
       round(nb.dk5 / g.gmax, 5) AS outlier_score
FROM nb CROSS JOIN g
WHERE nb.cnt = {knn}
ORDER BY outlier_score DESC, vec_id ASC
LIMIT {k}
"""


# --- Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998) -------------

_MMR_KERNEL_SCHEMA = "pos int, vec_id long, rel_c5 long, sc long"


def mmr_rerank(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    pool: int = 20,
    k: int = 5,
    lam_num: int = 7,
    lam_den: int = 10,
) -> DataFrame:
    """MMR diversification of a top-`pool` relevance window: greedily pick
    the candidate maximizing  lam*rel - (1-lam)*max_sim_to_selected  (the
    Carbonell & Goldstein 1998 objective; the standard diversity rerank
    of retrieval-augmented pipelines, and the shape of ES's
    `diversified_sampler` taken to scoring).  lam = lam_num/lam_den.

    Determinism: relevance and pairwise similarities are INTEGER c5
    cosines (round(cos*1e5)); the greedy score is the exact integer
    lam_num*rel_c5 - (lam_den-lam_num)*max_sim_c5 with ties broken by
    vec_id asc, so selection is engine- and partition-exact.  The first
    pick's max-sim term is empty => 0 (pure relevance, as in the paper).
    The only floats are the two final display divisions, performed by the
    same round(x/const, 5) expression in both engines.

    Scale shape: the serving-path rerank contract — candidate generation
    is the existing ANN/WAND top-window (`pool` rows, k*oversample-
    bounded, like `ltr_rescore`/`rescore_recency`), pairwise sims are
    pool^2 rows computed JVM-side, and the greedy loop runs once over a
    single bounded group (one applyInPandas over pool^2 rows — driver
    never collects)."""
    pool, k = int(pool), int(k)
    lam_num, lam_den = int(lam_num), int(lam_den)
    if pool < 2:
        raise ValueError("pool must be >= 2")
    if not (1 <= k <= pool):
        raise ValueError("k must be in 1..pool")
    if not (0 <= lam_num <= lam_den) or lam_den < 1:
        raise ValueError("lambda must satisfy 0 <= lam_num <= lam_den")
    qid = int(query_vec_id)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("n", F.sqrt(_dot(F.col("v"), F.col("v"))))
    q = e.filter(F.col("vec_id") == qid).select(
        F.col("v").alias("qv"), F.col("n").alias("nq")
    )
    c5 = (
        "CAST(round(aggregate(zip_with({x}, {y}, (p, q) -> p * q), "
        "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) / ({nx} * {ny}) "
        "* 100000) AS BIGINT)"
    )
    poolv = (
        e.filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "v", "n",
            F.expr(c5.format(x="v", y="qv", nx="n", ny="nq")).alias("rel_c5"),
        )
        .orderBy(F.desc("rel_c5"), F.asc("vec_id"))
        .limit(pool)
        .localCheckpoint()
    )
    a = poolv.select(F.col("vec_id").alias("a_id"),
                     F.col("rel_c5").alias("a_rel"),
                     F.col("v").alias("va"), F.col("n").alias("na"))
    b = poolv.select(F.col("vec_id").alias("b_id"),
                     F.col("v").alias("vb"), F.col("n").alias("nb"))
    sims = (
        a.crossJoin(b)
        .filter(F.col("a_id") != F.col("b_id"))
        .select(
            "a_id", "a_rel", "b_id",
            F.expr(c5.format(x="va", y="vb", nx="na", ny="nb")).alias("s5"),
        )
    )

    def kern(pdf):
        import pandas as pd

        rel = {}
        sim = {}
        for a_id, a_rel, b_id, s5 in zip(
            pdf["a_id"], pdf["a_rel"], pdf["b_id"], pdf["s5"]
        ):
            rel[int(a_id)] = int(a_rel)
            sim[(int(a_id), int(b_id))] = int(s5)
        selected: list[int] = []
        rows = []
        for pos in range(1, k + 1):
            best = None
            for c in sorted(rel):
                if c in selected:
                    continue
                ms = max((sim[(c, s)] for s in selected), default=0)
                sc = lam_num * rel[c] - (lam_den - lam_num) * ms
                key = (-sc, c)
                if best is None or key < best[0]:
                    best = (key, c, sc)
            if best is None:
                break
            selected.append(best[1])
            rows.append((pos, best[1], rel[best[1]], best[2]))
        return pd.DataFrame(
            rows, columns=["pos", "vec_id", "rel_c5", "sc"]
        )

    picked = (
        sims.groupBy(F.lit(0).alias("g"))
        .applyInPandas(lambda _, pdf: kern(pdf), _MMR_KERNEL_SCHEMA)
    )
    return picked.select(
        "pos",
        "vec_id",
        F.round(F.col("rel_c5") / 100000.0, 5).alias("relevance"),
        F.round(F.col("sc") / (lam_den * 100000.0), 5).alias("mmr_score"),
    ).orderBy("pos")


def mmr_rerank_sql(
    query_vec_id: int = 0,
    pool: int = 20,
    k: int = 5,
    lam_num: int = 7,
    lam_den: int = 10,
) -> str:
    """DuckDB oracle: the SAME greedy selection unrolled into k CTE steps
    (the `sim_kmeans_assign` unrolled-iteration pattern)."""
    pool, k = int(pool), int(k)
    lam_num, lam_den = int(lam_num), int(lam_den)
    qid = int(query_vec_id)
    neg = lam_den - lam_num
    steps = []
    finals = []
    for i in range(1, k + 1):
        if i == 1:
            steps.append(
                f"s1 AS (SELECT vec_id, rel_c5, {lam_num} * rel_c5 AS sc "
                f"FROM pool ORDER BY sc DESC, vec_id ASC LIMIT 1),\n"
                f"sel1 AS (SELECT vec_id FROM s1)"
            )
        else:
            p = i - 1
            steps.append(
                f"c{i} AS (\n"
                f"  SELECT p.vec_id, p.rel_c5,\n"
                f"         {lam_num} * p.rel_c5 - {neg} * (\n"
                f"           SELECT max(s.s5) FROM sims s\n"
                f"           WHERE s.a_id = p.vec_id\n"
                f"             AND s.b_id IN (SELECT vec_id FROM sel{p})\n"
                f"         ) AS sc\n"
                f"  FROM pool p\n"
                f"  WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{p})\n"
                f"),\n"
                f"s{i} AS (SELECT * FROM c{i} ORDER BY sc DESC, vec_id ASC "
                f"LIMIT 1),\n"
                f"sel{i} AS (SELECT vec_id FROM sel{p} "
                f"UNION ALL SELECT vec_id FROM s{i})"
            )
        finals.append(
            f"SELECT {i} AS pos, vec_id, "
            f"round(rel_c5 / 100000.0, 5) AS relevance, "
            f"round(sc / ({lam_den} * 100000.0), 5) AS mmr_score FROM s{i}"
        )
    steps_sql = ",\n".join(steps)
    finals_sql = "\nUNION ALL\n".join(finals)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS n
  FROM embeddings
),
q AS (SELECT v AS qv, n AS nq FROM e WHERE vec_id = {qid}),
relq AS (
  SELECT e.vec_id, e.v, e.n,
         CAST(round(list_dot_product(e.v, q.qv) / (e.n * q.nq) * 100000)
              AS BIGINT) AS rel_c5
  FROM e CROSS JOIN q WHERE e.vec_id != {qid}
),
pool AS (
  SELECT vec_id, rel_c5 FROM relq
  ORDER BY rel_c5 DESC, vec_id ASC LIMIT {pool}
),
poolv AS (SELECT r.* FROM relq r JOIN pool USING (vec_id)),
sims AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         CAST(round(list_dot_product(a.v, b.v) / (a.n * b.n) * 100000)
              AS BIGINT) AS s5
  FROM poolv a JOIN poolv b ON a.vec_id != b.vec_id
),
{steps_sql}
{finals_sql}
ORDER BY pos
"""


# --- max_inner_product kNN (ES dense_vector similarity) -------------------------

def knn_mip_topk(
    embeddings: DataFrame, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Brute-force kNN under ES's `max_inner_product` similarity: vectors
    ranked by raw dot product (no normalization — magnitude matters, the
    recommender/IP-trained-model case), with the exact ES `_score`
    transform so negative dots stay positive and order-preserving:

        _score = dot < 0 ? 1 / (1 - dot) : dot + 1

    Determinism: the ranking key is the INTEGER m5 = round(dot * 1e5)
    with vec_id asc ties; the score transform is applied to m5/1e5 by
    the same expression in both engines.

    Scale shape: broadcast query vector, one map-only pass + TakeOrdered
    — same contract as sim_cosine_topk; the ANN family prunes at scale."""
    qid, k = int(query_vec_id), int(k)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == qid).select(F.col("v").alias("qv"))
    return (
        e.filter(F.col("vec_id") != qid)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.expr(
                "CAST(round(aggregate(zip_with(v, qv, (p, q) -> p * q), "
                "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) * 100000) "
                "AS BIGINT)"
            ).alias("m5"),
        )
        .select(
            "vec_id",
            F.round(
                F.when(
                    F.col("m5") < 0,
                    1.0 / (1.0 - F.col("m5") / 100000.0),
                ).otherwise(F.col("m5") / 100000.0 + 1.0),
                5,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(k)
    )


def knn_mip_topk_sql(query_vec_id: int = 0, k: int = 10) -> str:
    qid, k = int(query_vec_id), int(k)
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (SELECT v AS qv FROM e WHERE vec_id = {qid}),
dots AS (
  SELECT e.vec_id,
         CAST(round(list_dot_product(e.v, q.qv) * 100000) AS BIGINT) AS m5
  FROM e CROSS JOIN q WHERE e.vec_id != {qid}
)
SELECT vec_id,
       round(CASE WHEN m5 < 0 THEN 1.0 / (1.0 - m5 / 100000.0)
                  ELSE m5 / 100000.0 + 1.0 END, 5) AS score
FROM dots
ORDER BY score DESC, vec_id ASC
LIMIT {k}
"""
