"""Mergeable frequency sketches — bounded-memory corpus statistics.

At 100 TB an exact term-frequency table is itself a massive shuffle; the
streaming/summary literature answers with MERGEABLE SKETCHES (Agarwal,
Cormode et al., "Mergeable Summaries", PODS 2012): every partition builds
a fixed-size summary, summaries merge associatively, and the result
carries a proven error bound.  The engine already uses a KMV sketch for
`agg_cardinality`; this module adds the two frequency workhorses:

* **Misra-Gries heavy hitters** (`heavy_hitters_sketch`) — per-partition
  MG summaries of `capacity` counters via mapInPandas (one pass over the
  token stream, O(capacity) state), merged with the mergeable-summaries
  rule: sum counts per term, then subtract the (capacity+1)-th largest
  merged count and drop non-positives.  Guarantees (classic MG bound,
  preserved under merge):
      true_count - N/(capacity+1)  <=  est  <=  true_count
  so every term with frequency > N/(capacity+1) is RETAINED.  When
  `capacity` >= the corpus' distinct-term count no decrement ever fires
  and the sketch is EXACT — the regime the registered driver pair runs
  (same contract as the KMV pair: exact below capacity, bounded above).
  With lossy capacity the estimates depend on partition layout (as any
  MG run order does); the bound does not — pytest pins the guarantee.

* **Count-Min** (`cms_build` / `cms_probe`) — depth x width counter
  matrix; row hashes are md5-derived integers computed IDENTICALLY in
  Spark and DuckDB (the `agg_cardinality`/RERANK hashing trick), so the
  whole sketch is a deterministic function of the corpus: build is
  `depth` conditional hash aggregates in ONE pass (explode -> one
  (row, bucket) agg), probes are exact-parity oracle-checkable.
  Estimate = min over rows of the probed bucket; always >= true count,
  and <= true + 2N/width with probability 1 - 2^-depth per the CM bound.

Scale shape: MG summaries are P x capacity rows (KBs even at 10^5
partitions) — ONE tiny shuffle; CMS is one explode + one hash agg over
depth*width cells.  Neither ever materializes the full vocabulary.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKENS_CTE, tokens

MG_SCHEMA = "term string, cnt long"


def _mg_partition(capacity: int):
    """Per-partition batched Misra-Gries over token-array batches.

    Batch variant: after absorbing a document's exact token counts, if the
    table exceeds `capacity`, subtract delta = the (capacity+1)-th largest
    count from every entry and drop non-positives (removing >= delta *
    (capacity+1) mass per compaction, so total decrement <= N/(capacity+1)
    — the classic bound)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: dict[str, int] = {}
        for pdf in batches:
            for toks in pdf["tk"]:
                if toks is None or len(toks) == 0:
                    continue
                for t in toks:
                    counts[t] = counts.get(t, 0) + 1
                if len(counts) > capacity:
                    vals = sorted(counts.values(), reverse=True)
                    delta = vals[capacity]  # (capacity+1)-th largest
                    counts = {
                        k: v - delta for k, v in counts.items() if v > delta
                    }
        if counts:
            yield pd.DataFrame(
                {"term": list(counts.keys()),
                 "cnt": pd.array(list(counts.values()), dtype="int64")}
            )

    return run


def heavy_hitters_sketch(
    corpus: DataFrame, capacity: int, k: int = 20
) -> DataFrame:
    """Top-k heavy hitters from a distributed Misra-Gries sketch.

    Returns (term, est) ordered by est desc, term asc.  est is the
    merged lower-bound count (exact when capacity >= distinct terms).
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    if k > capacity:
        raise ValueError("k cannot exceed the sketch capacity")
    summaries = (
        corpus.select(tokens("text").alias("tk"))
        .mapInPandas(_mg_partition(capacity), MG_SCHEMA)
    )
    merged = summaries.groupBy("term").agg(F.sum("cnt").alias("cnt"))
    # mergeable-summaries truncation: subtract the (capacity+1)-th largest
    # count (0 when the merged table already fits).  The merged relation is
    # <= P*capacity rows, so the rank window is over a tiny relation.
    from pyspark.sql import Window

    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = merged.withColumn("rn", F.row_number().over(w))
    delta = ranked.filter(F.col("rn") == capacity + 1).select(
        F.col("cnt").alias("delta")
    )
    out = (
        ranked.crossJoin(
            F.broadcast(
                delta.groupBy().agg(
                    F.coalesce(F.max("delta"), F.lit(0)).alias("delta")
                )
            )
        )
        .select("term", (F.col("cnt") - F.col("delta")).alias("est"))
        .filter(F.col("est") > 0)
    )
    return (
        out.orderBy(F.col("est").desc(), F.col("term").asc()).limit(k)
    )


def heavy_hitters_sql(k: int = 20) -> str:
    """Oracle for the EXACT regime (capacity >= distinct terms): plain
    top-k term counts."""
    return f"""
WITH {CORPUS_CTE.strip()},
{TOKENS_CTE.strip()}
SELECT term, CAST(count(*) AS BIGINT) AS est
FROM tokens GROUP BY term
ORDER BY est DESC, term ASC
LIMIT {int(k)}
"""


# ------------------------------ Count-Min -------------------------------

# 60-bit md5-derived hash, identical in both engines (15 hex digits).
_H_SPARK = "CAST(conv(substring(md5(concat('{row}', ':', term)), 1, 15), 16, 10) AS BIGINT)"
_H_DUCK = "('0x' || substr(md5('{row}' || ':' || term), 1, 15))::BIGINT"


def cms_build(corpus: DataFrame, depth: int = 4, width: int = 1024) -> DataFrame:
    """Count-Min sketch of the corpus token stream: (row, bucket, cnt).

    One explode + one (row, bucket) hash aggregate; depth*width cells.
    """
    # tokenize ONCE: each token row fans out to its depth (row, bucket)
    # cells array-side (a unionAll of per-row explodes would re-scan and
    # re-tokenize the corpus `depth` times — the session-9 rule)
    tok = corpus.select(F.explode(tokens("text")).alias("term"))
    buckets = F.array(*[
        F.pmod(F.expr(_H_SPARK.format(row=r)), F.lit(width))
        for r in range(depth)
    ])
    cells = tok.select(
        F.posexplode(buckets).alias("row", "bucket")
    )
    return cells.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_probe(
    corpus: DataFrame,
    probe_terms: list[str],
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for `probe_terms`: (term, est, true_cnt).

    est = min over sketch rows of the probed bucket count — always >=
    true_cnt; both columns computed so the overestimate is visible.
    The probe is a broadcast of |terms| x depth (row, bucket) keys.
    """
    if not probe_terms:
        raise ValueError("probe_terms must be non-empty")
    sketch = cms_build(corpus, depth=depth, width=width)
    spark = corpus.sparkSession
    pr = spark.createDataFrame(
        [(t,) for t in sorted(set(probe_terms))], "term string"
    )
    keys = []
    for r in range(depth):
        h = F.expr(_H_SPARK.format(row=r))
        keys.append(
            pr.select(
                "term",
                F.lit(r).alias("row"),
                F.pmod(h, F.lit(width)).alias("bucket"),
            )
        )
    probe = keys[0]
    for other in keys[1:]:
        probe = probe.unionAll(other)
    est = (
        sketch.join(F.broadcast(probe), ["row", "bucket"], "inner")
        .groupBy("term")
        .agg(F.min("cnt").alias("est"))
    )
    tok = corpus.select(F.explode(tokens("text")).alias("term"))
    true_cnt = (
        tok.join(F.broadcast(pr), "term", "inner")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    return (
        pr.join(est, "term", "left")
        .join(true_cnt, "term", "left")
        .select(
            "term",
            F.coalesce("est", F.lit(0)).alias("est"),
            F.coalesce("true_cnt", F.lit(0)).alias("true_cnt"),
        )
        .orderBy("term")
    )


def cms_probe_sql(
    probe_terms: list[str], depth: int = 4, width: int = 1024
) -> str:
    """DuckDB oracle: the identical sketch (same md5 hashing, same modulo)
    built and probed relationally."""
    if not probe_terms:
        raise ValueError("probe_terms must be non-empty")
    uniq = sorted(set(probe_terms))
    terms_sql = ", ".join("('" + t.replace("'", "''") + "')" for t in uniq)
    hashes = "\nUNION ALL\n".join(
        f"SELECT term, {r} AS row, "
        f"(({_H_DUCK.format(row=r)}) % {width}) AS bucket FROM tokens"
        for r in range(depth)
    )
    probe_hashes = "\nUNION ALL\n".join(
        f"SELECT term, {r} AS row, "
        f"(({_H_DUCK.format(row=r)}) % {width}) AS bucket FROM probes"
        for r in range(depth)
    )
    return f"""
WITH {CORPUS_CTE.strip()},
{TOKENS_CTE.strip()},
cells AS (
  SELECT row, bucket, count(*) AS cnt FROM ({hashes}) GROUP BY row, bucket
),
probes AS (SELECT * FROM (VALUES {terms_sql}) AS v(term)),
pkeys AS ({probe_hashes}),
est AS (
  SELECT p.term, min(c.cnt) AS est
  FROM pkeys p JOIN cells c ON p.row = c.row AND p.bucket = c.bucket
  GROUP BY p.term
),
tru AS (
  SELECT t.term, count(*) AS true_cnt
  FROM tokens t JOIN probes p ON t.term = p.term
  GROUP BY t.term
)
SELECT pr.term,
       CAST(COALESCE(e.est, 0) AS BIGINT) AS est,
       CAST(COALESCE(tr.true_cnt, 0) AS BIGINT) AS true_cnt
FROM probes pr
LEFT JOIN est e ON pr.term = e.term
LEFT JOIN tru tr ON pr.term = tr.term
ORDER BY pr.term
"""


# --- HyperLogLog cardinality --------------------------------------------------

# The actual ES/Lucene `cardinality` algorithm (HyperLogLog; Flajolet et
# al. 2007) next to the engine's KMV pair (agg_cardinality): m = 2^p
# registers, register j = max over its hashes of rho(w) (leading-zero rank
# of the non-index hash bits).  Everything below is DETERMINISTIC and
# order-independent — register values are maxima of integer ranks from
# md5-derived hashes, the harmonic sum is an exact INT64 (2^(RANK_MAX-M_j)
# per register, summed — no float-order dependence), and the single
# int->double conversion plus one division happen identically in both
# engines; the numerator alpha*m^2*2^RANK_MAX is ONE shared Python double
# literal.  Small-range correction (linear counting when est <= 2.5m and
# empty registers remain) is the published HLL rule.
#
# Scale shape: one (group, register) hash agg (<= |groups| * 4096 partial
# states, map-side collapse), then a |groups|-row finish.  The sketch is
# mergeable by construction: max per register commutes with any
# partitioning — exactly how ES merges per-shard HLLs.

HLL_P = 12
HLL_M = 1 << HLL_P
_HLL_RANK_BITS = 60 - HLL_P          # h64 is 60-bit (15 md5 hex chars)
_HLL_RANK_MAX = _HLL_RANK_BITS + 1   # rho when the rank bits are all zero
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RANK_MAX)


def hll_cardinality(corpus: DataFrame, by: str = "lang",
                    field: str = "url") -> DataFrame:
    """Per-`by` HyperLogLog distinct-count of `field` next to the exact
    count: (by, est, exact) ordered by `by`.  Standard error is
    1.04/sqrt(m) ~ 1.6% at p=12 — the pytest-pinned band."""
    from .dedup import h64

    h = h64(F.col(field))
    w = F.expr(f"__h div {HLL_M}")
    rho = F.when(w == 0, F.lit(_HLL_RANK_MAX)).otherwise(
        F.lit(_HLL_RANK_MAX) - F.length(F.bin(w))
    )
    regs = (
        corpus.select(F.col(by).alias("g"), h.alias("__h"))
        .select("g", F.pmod(F.col("__h"), F.lit(HLL_M)).alias("reg"),
                rho.alias("rho"))
        .groupBy("g", "reg")
        .agg(F.max("rho").alias("m"))
    )
    per = regs.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RANK_MAX} - m)")
        ).alias("s_present"),
    )
    s_int = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("n_present"))
        * F.lit(1 << _HLL_RANK_MAX).cast("long")
    )
    est_raw = F.lit(_HLL_NUM) / s_int.cast("double")
    v = F.lit(HLL_M) - F.col("n_present")
    est = F.when(
        (est_raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v.cast("double")),
    ).otherwise(est_raw)
    exact = corpus.groupBy(F.col(by).alias("g")).agg(
        F.countDistinct(field).alias("exact")
    )
    return (
        per.select("g", F.round(est, 4).alias("est"))
        .join(exact, "g")
        .select(F.col("g").alias(by), "est", "exact")
        .orderBy(by)
    )


def hll_cardinality_sql(by: str = "lang", field: str = "url") -> str:
    from .dedup import H64_SQL

    h = H64_SQL.format(x=field)
    rank_max = _HLL_RANK_MAX
    return f"""
WITH {CORPUS_CTE.strip()},
hashed AS (SELECT {by} AS g, ({h}) AS h FROM corpus),
rhod AS (
  SELECT g, h % {HLL_M} AS reg,
         CASE WHEN h // {HLL_M} = 0 THEN {rank_max}
              ELSE {rank_max} - length(bin(h // {HLL_M})) END AS rho
  FROM hashed
),
regs AS (SELECT g, reg, max(rho) AS m FROM rhod GROUP BY g, reg),
per AS (
  SELECT g, count(*) AS n_present,
         SUM((1::BIGINT << ({rank_max} - m)))::BIGINT AS s_present
  FROM regs GROUP BY g
),
est0 AS (
  SELECT g, n_present,
         {_HLL_NUM!r} / CAST(s_present
             + ({HLL_M} - n_present) * (1::BIGINT << {rank_max})
           AS DOUBLE) AS est_raw
  FROM per
),
fin AS (
  SELECT g,
         CASE WHEN est_raw <= {2.5 * HLL_M!r} AND ({HLL_M} - n_present) > 0
              THEN {float(HLL_M)!r}
                   * ln({float(HLL_M)!r} / CAST({HLL_M} - n_present AS DOUBLE))
              ELSE est_raw END AS est
  FROM est0
),
ex AS (SELECT {by} AS g, count(DISTINCT {field}) AS exact FROM corpus GROUP BY 1)
SELECT fin.g AS {by}, round(fin.est, 4) AS est, ex.exact
FROM fin JOIN ex USING (g)
ORDER BY {by}
"""


# --- Bloom-filter n-gram membership (Data Portraits) ---------------------------

# Membership testing against a training corpus is the remaining sketch
# workhorse: "was this exact n-gram seen in training?" is the Data
# Portraits question (Marone & Van Durme 2023 — documenting dataset
# membership with Bloom filters) and the cheap first pass of any
# contamination audit (the engine's exact 8-gram `decontaminate` pass is
# the full join; a Bloom gate answers the same question in O(m) bits with
# a bounded false-positive rate and NO false negatives).
#
# Determinism/parity: the k bit positions of a shingle are md5-derived
# integers (the `_H_SPARK`/`_H_DUCK` recipe shared with CMS/HLL) modulo
# m, computed IDENTICALLY in Spark and DuckDB, so the whole filter — and
# every probe verdict — is an exact deterministic function of the corpus.
#
# Scale shape: the filter is the DISTINCT set of set-bit positions —
# at most m rows no matter the corpus size (one hash agg with map-side
# collapse; 2^16 bits here).  It is mergeable by construction: the union
# of set-bit sets IS the bitwise OR of the partial filters, commuting
# with any partitioning — shard filters merge like ES per-shard sketches.
# Probes are a broadcast of |probes| x k keys against that bounded
# relation; the exact-truth column (for the visible false-positive audit)
# is a semi-join against the distinct-shingle relation.

BLOOM_M = 1 << 16
BLOOM_K = 5

_BH_SPARK = (
    "CAST(conv(substring(md5(concat('b{row}', ':', shingle)), 1, 15), 16, 10)"
    " AS BIGINT)"
)
_BH_DUCK = "('0x' || substr(md5('b{row}' || ':' || shingle), 1, 15))::BIGINT"


def _corpus_shingles(corpus: DataFrame, n: int = 3) -> DataFrame:
    """Distinct n-token shingles of the corpus (space-joined); tokens
    materialized once per row (shingles_col's performance contract)."""
    from .dedup import shingles_col
    from ..functions.tokenizer import tokens

    return (
        corpus.select(tokens("text").alias("toks"))
        .select(F.explode(shingles_col(n, F.col("toks"))).alias("shingle"))
        .distinct()
    )


def bloom_bits(corpus: DataFrame, m: int = BLOOM_M, k: int = BLOOM_K,
               n: int = 3) -> DataFrame:
    """The Bloom filter itself: distinct set-bit positions (bit BIGINT).

    <= m rows regardless of corpus size; one distinct-agg shuffle."""
    if not (1 <= k <= 16):
        raise ValueError("k must be in 1..16")
    if m < 2:
        raise ValueError("m must be >= 2")
    sh = _corpus_shingles(corpus, n)
    positions = F.array(*[
        F.pmod(F.expr(_BH_SPARK.format(row=r)), F.lit(int(m)))
        for r in range(int(k))
    ])
    return (
        sh.select(F.explode(positions).alias("bit")).distinct()
    )


def bloom_probe(
    corpus: DataFrame,
    probes: list[str],
    m: int = BLOOM_M,
    k: int = BLOOM_K,
    n: int = 3,
) -> DataFrame:
    """Membership verdicts: (probe, bloom_hit, present, false_pos).

    bloom_hit  — all k probe bits set in the filter (the sketch answer;
                 never false-negative by construction).
    present    — exact membership in the distinct-shingle relation (the
                 audit column that makes any false positive visible).
    """
    if not probes:
        raise ValueError("probes must be non-empty")
    uniq = sorted(set(probes))
    spark = corpus.sparkSession
    bits = bloom_bits(corpus, m=m, k=k, n=n)
    pr = spark.createDataFrame([(s,) for s in uniq], "shingle string")
    keys = pr.select(
        "shingle",
        F.explode(F.array(*[
            F.pmod(F.expr(_BH_SPARK.format(row=r)), F.lit(int(m)))
            for r in range(int(k))
        ])).alias("bit"),
    )
    hits = (
        keys.join(bits, "bit", "left_semi")
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_set"))
    )
    truth = (
        _corpus_shingles(corpus, n)
        .join(F.broadcast(pr), "shingle", "left_semi")
        .withColumn("present", F.lit(True))
    )
    return (
        pr.join(hits, "shingle", "left")
        .join(truth, "shingle", "left")
        .select(
            F.col("shingle").alias("probe"),
            (F.coalesce("n_set", F.lit(0)) == int(k)).alias("bloom_hit"),
            F.coalesce("present", F.lit(False)).alias("present"),
            (
                (F.coalesce("n_set", F.lit(0)) == int(k))
                & ~F.coalesce("present", F.lit(False))
            ).alias("false_pos"),
        )
        .orderBy("probe")
    )


def bloom_probe_sql(
    probes: list[str], m: int = BLOOM_M, k: int = BLOOM_K, n: int = 3
) -> str:
    """DuckDB oracle: the identical filter (same md5 bit positions)."""
    if not probes:
        raise ValueError("probes must be non-empty")
    if n != 3:
        raise ValueError("oracle is pinned to the 3-token shingle CTE")
    from .dedup import TOKS_CTE_SQL

    uniq = sorted(set(probes))
    probes_sql = ", ".join("('" + s.replace("'", "''") + "')" for s in uniq)
    corp_pos = "\nUNION ALL\n".join(
        f"SELECT (({_BH_DUCK.format(row=r)}) % {int(m)}) AS bit FROM sh"
        for r in range(int(k))
    )
    probe_pos = "\nUNION ALL\n".join(
        f"SELECT shingle, (({_BH_DUCK.format(row=r)}) % {int(m)}) AS bit"
        f" FROM probes"
        for r in range(int(k))
    )
    return f"""
WITH {CORPUS_CTE.strip()},
{TOKS_CTE_SQL.strip()},
sh AS (SELECT DISTINCT shingle FROM doc_shingle),
bits AS (SELECT DISTINCT bit FROM ({corp_pos})),
probes AS (SELECT * FROM (VALUES {probes_sql}) AS v(shingle)),
pkeys AS ({probe_pos}),
hits AS (
  SELECT p.shingle, count(*) AS n_set
  FROM pkeys p JOIN bits b ON p.bit = b.bit
  GROUP BY p.shingle
),
tru AS (
  SELECT DISTINCT s.shingle FROM sh s JOIN probes p ON s.shingle = p.shingle
)
SELECT pr.shingle AS probe,
       COALESCE(h.n_set, 0) = {int(k)} AS bloom_hit,
       tr.shingle IS NOT NULL AS present,
       (COALESCE(h.n_set, 0) = {int(k)}) AND tr.shingle IS NULL AS false_pos
FROM probes pr
LEFT JOIN hits h ON pr.shingle = h.shingle
LEFT JOIN tru tr ON pr.shingle = tr.shingle
ORDER BY probe
"""
