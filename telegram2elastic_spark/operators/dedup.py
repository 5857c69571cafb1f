"""Deduplication operators for training-data pipelines.

The reference dedups at two levels — exact content addressing (sha256 keys,
poc/src/storage/s3_client.py:100-137, tests :414-503) and exists-checks on
natural keys (telegram_client.py:162-178).  A 100 TB training-data pipeline
needs the near-dup family too; each operator here is a declarative Spark
pipeline with an ANSI-SQL-equivalent oracle.

Cross-engine determinism: every hash is md5-based (`H(s) = first 15 hex
chars of md5(s) as int64`), identical in Spark (`conv(substr(md5(x),1,15),
16,10)`) and DuckDB (`('0x' || substr(md5(x),1,15))::bigint`) — no
engine-specific hash functions, no RNG.

Scale shapes (all registered defaults are the bucketed 100 TB forms; each
keeps an *_exact exhaustive twin for recall tests):
  * exact:     one hash-agg shuffle on the digest — trivially parallel.
  * jaccard:   candidates from MinHash-LSH banding (band-hash equi-join,
    collisions only), exact Jaccard verified per candidate via JVM
    array_intersect — no raw-shingle self-join, no hot-shingle m^2 group.
  * simhash:   pigeonhole chunk equi-join (hamming<=h => one of h+1 bit
    chunks identical) — LOSSLESS candidate generation, then exact hamming
    verify; the driver oracle stays the exhaustive SQL as proof.
  * embedding: candidates from same-LSH-bucket join (similarity.
    lsh_buckets), exact cosine verify inside buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE

# --- shared fragments -------------------------------------------------------

# Spark-side md5 -> int64
def h64(col: F.Column) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


H64_SQL = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

TOKS_SPARK = None  # built via tokenizer.tokens


def _toks() -> F.Column:
    from ..functions.tokenizer import tokens

    return tokens("text")


def shingles_col(n: int = 3, toks: F.Column | None = None) -> F.Column:
    """Distinct n-token shingles (space-joined), 1-based element_at so the
    same expression shape works in DuckDB.

    PERFORMANCE CONTRACT: pass `toks` as a MATERIALIZED column (project
    `_toks().alias("toks")` first and hand in `F.col("toks")`).  The
    lambda references the token array n times per element; handed the
    raw tokenizer expression, Catalyst re-evaluates the regex split PER
    ELEMENT PER REFERENCE — measured 10-20x slower on the dedup family.
    The no-arg form keeps the old (slow) behavior for ad-hoc use."""
    toks = _toks() if toks is None else toks
    # size < n guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]) and
    # element_at(toks, 0) throws — a doc with fewer than n tokens must
    # yield no shingles, matching the SQL twin's range(1, 1) = []
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _doc_shingles(corpus: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) exploded distinct shingles — tokens materialized
    once per row (see shingles_col's performance contract)."""
    return corpus.select("doc_id", _toks().alias("toks")).select(
        "doc_id", F.explode(shingles_col(n, F.col("toks"))).alias("shingle")
    )


def _shingles_sql(n: int = 3) -> str:
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return (
        "list_distinct(list_transform("
        f"range(1, greatest(len(toks) - {n - 1}, 0) + 1), i -> {parts}))"
    )


TOKS_CTE_SQL = f"""
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
shing AS (
  SELECT doc_id, {_shingles_sql(3)} AS shingles FROM tokd
),
doc_shingle AS (
  SELECT doc_id, unnest(shingles) AS shingle FROM shing
)
"""


# --- 1. exact dedup ----------------------------------------------------------

def exact_dup_groups(corpus: DataFrame) -> DataFrame:
    """Content-addressed exact dedup (sha256, s3_client.py:120-137):
    groups of byte-identical texts.  One hash-agg shuffle."""
    return (
        corpus.groupBy(F.sha2(F.col("text"), 256).alias("content_key"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keeper_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
        .orderBy("content_key")
    )


EXACT_DUP_SQL = f"""
WITH {CORPUS_CTE.strip()}
SELECT sha256(text) AS content_key,
       count(*) AS n_dups,
       min(doc_id) AS keeper_doc_id
FROM corpus
GROUP BY 1 HAVING count(*) > 1 ORDER BY content_key
"""


def dedup_keep_first(corpus: DataFrame) -> DataFrame:
    """The dedup itself: keep min-doc_id representative per content key,
    count survivors (storage-savings metric, poc/README.md:296)."""
    keyed = corpus.withColumn(
        "content_key", F.sha2(F.col("text"), 256)
    )
    keep = keyed.groupBy("content_key").agg(F.min("doc_id").alias("doc_id"))
    return keep.agg(
        F.count(F.lit(1)).alias("n_unique"),
    )


DEDUP_KEEP_FIRST_SQL = f"""
WITH {CORPUS_CTE.strip()}
SELECT count(DISTINCT sha256(text)) AS n_unique FROM corpus
"""


# --- 2. n-gram Jaccard near-dup ----------------------------------------------

def ngram_jaccard_pairs(corpus: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Pairwise Jaccard over distinct 3-token shingles; pairs (a<b) with
    similarity >= threshold.  BANDED (the 100 TB shape):

      candidates = minhash_lsh_pairs (self-join keyed on band hash —
      collisions only, no raw-shingle join, so a hot shingle shared by m
      docs never creates an m^2 group), then exact Jaccard verified per
      candidate pair with a JVM-side array_intersect — O(|candidates| x
      shingle-set size), no second shuffle over the shingle space.

    Recall is the LSH banding recall (1-(1-s^r)^b); the exhaustive
    all-shingle form is kept as ngram_jaccard_pairs_exact and the two are
    asserted equal on the test corpora."""
    cand = minhash_lsh_pairs(corpus)
    sh = corpus.select("doc_id", _toks().alias("toks")).select(
        "doc_id", shingles_col(3, F.col("toks")).alias("sh")
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                inter / (F.size("sh_a") + F.size("sh_b") - inter), 5
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_pairs_exact(
    corpus: DataFrame, threshold: float = 0.5
) -> DataFrame:
    """Exhaustive all-pairs form (shingle self equi-join) — recall oracle
    for the banded default; NOT registered for the 100 TB path (a shingle
    shared by m docs yields an m^2 join group)."""
    ds = _doc_shingles(corpus, 3)
    counts = ds.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = ds.alias("a")
    b = ds.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 5
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def ngram_jaccard_sql(threshold: float = 0.5) -> str:
    """Oracle mirrors the banded plan: LSH candidates -> exact Jaccard via
    list_intersect on the candidate pairs only."""
    return f"""
WITH cand AS ({minhash_lsh_pairs_sql().strip()}),
{CORPUS_CTE.strip()},
{TOKS_CTE_SQL.strip()}
SELECT doc_a, doc_b,
       round(len(list_intersect(a.shingles, b.shingles))
             / (len(a.shingles) + len(b.shingles)
                - len(list_intersect(a.shingles, b.shingles))), 5) AS jaccard
FROM cand
JOIN shing a ON a.doc_id = cand.doc_a
JOIN shing b ON b.doc_id = cand.doc_b
WHERE round(len(list_intersect(a.shingles, b.shingles))
            / (len(a.shingles) + len(b.shingles)
               - len(list_intersect(a.shingles, b.shingles))), 5)
      >= {threshold}
ORDER BY doc_a, doc_b
"""


def ngram_jaccard_exact_sql(threshold: float = 0.5) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
{TOKS_CTE_SQL.strip()},
counts AS (SELECT doc_id, count(*) AS n_sh FROM doc_shingle GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM doc_shingle a JOIN doc_shingle b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter / (ca.n_sh + cb.n_sh - inter), 5) AS jaccard
FROM inter
JOIN counts ca ON ca.doc_id = doc_a
JOIN counts cb ON cb.doc_id = doc_b
WHERE round(inter / (ca.n_sh + cb.n_sh - inter), 5) >= {threshold}
ORDER BY doc_a, doc_b
"""


# --- 3. MinHash + LSH ---------------------------------------------------------

N_MINHASH = 8
LSH_BANDS = 4  # 2 rows per band


def minhash_signatures(
    corpus: DataFrame, n_hashes: int = N_MINHASH, sort: bool = True
) -> DataFrame:
    """`n_hashes` MinHash values per doc (default 8): slot i = min over
    shingles of a 32-bit hash of the shingle.  The hash family shares
    digests — slot i reads 32-bit slice i%4 of md5((i//4) || ':' ||
    shingle) — so n slots cost ceil(n/4) md5 calls per shingle row
    instead of n (the md5 dominated the whole minhash family's CPU;
    this cut signatures ~2.5x at 200k docs).  32-bit min-wise values
    are the standard MinHash width (collision prob 2^-32 per pair);
    md5 slices are independent uniform bits, so the slots remain
    independent hash functions.  No arithmetic overflow, no RNG,
    identical across engines.  One explode + one agg shuffle
    regardless of n_hashes; the shared digests are materialized in the
    pre-agg projection so each is computed once per row."""
    n = int(n_hashes)
    n_blocks = (n + 3) // 4
    ds = _doc_shingles(corpus, 3)
    cols = [F.col("doc_id")] + [
        F.md5(F.concat(F.lit(f"{blk}:"), F.col("shingle"))).alias(f"_m{blk}")
        for blk in range(n_blocks)
    ]
    base = ds.select(*cols)
    aggs = []
    for i in range(n):
        blk, off = divmod(i, 4)
        aggs.append(
            F.min(
                F.conv(
                    F.substring(F.col(f"_m{blk}"), off * 8 + 1, 8), 16, 10
                ).cast("bigint")
            ).alias(f"sig_{i}")
        )
    out = base.groupBy("doc_id").agg(*aggs)
    # sort=True is the registered-pair presentation order; every internal
    # consumer (banding joins) passes sort=False — a GLOBAL sort of all
    # signatures would otherwise ride into each LSH pipeline for nothing
    # (at 10^12 docs that is a full extra range-shuffle)
    return out.orderBy("doc_id") if sort else out


def minhash_signatures_sql(n_hashes: int = N_MINHASH) -> str:
    n = int(n_hashes)
    sigs = ",\n       ".join(
        "min(('0x' || substr(md5('{blk}:' || shingle), {start}, 8))::BIGINT)"
        " AS sig_{i}".format(blk=i // 4, start=(i % 4) * 8 + 1, i=i)
        for i in range(n)
    )
    return f"""
WITH {CORPUS_CTE.strip()},
{TOKS_CTE_SQL.strip()}
SELECT doc_id,
       {sigs}
FROM doc_shingle GROUP BY doc_id ORDER BY doc_id
"""


def minhash_lsh_pairs(
    corpus: DataFrame,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """LSH banding: `bands` bands x (n_hashes/bands) rows; candidate pairs
    share >= 1 band hash.  The scale path for near-dup at 100 TB: the
    self-join key is the band hash (collisions only), never the raw
    shingle space.

    Recall tuning: P(candidate) = 1 - (1 - j^r)^b for Jaccard j with
    r = n_hashes/bands rows per band — more bands raises recall (and
    candidate volume), longer rows sharpen the threshold.  Defaults
    (8 hashes, 4 bands, r=2) put the S-curve midpoint near j ~ 0.4."""
    n_hashes, bands = int(n_hashes), int(bands)
    if n_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide n_hashes ({n_hashes})")
    r = n_hashes // bands
    sig = minhash_signatures(corpus, n_hashes, sort=False)
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"sig_{r * j + i}").cast("string")
                        for i in range(r)
                    ],
                )
            )
            for j in range(bands)
        ]
    )
    banded = sig.select(
        "doc_id", F.posexplode(band_hashes).alias("band", "band_hash")
    # both sides of the bucket self-join scan this subtree and Spark does
    # not dedupe identical subtrees — without the checkpoint the whole
    # signature pass (shingle + md5 minima) runs TWICE (r6; same fix as
    # lsh_dup_flags / dedup_cross_snapshot)
    ).localCheckpoint()
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


def minhash_lsh_pairs_sql(
    n_hashes: int = N_MINHASH, bands: int = LSH_BANDS
) -> str:
    n_hashes, bands = int(n_hashes), int(bands)
    if n_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide n_hashes ({n_hashes})")
    r = n_hashes // bands
    sig_cte = minhash_signatures_sql(n_hashes).strip().rstrip()
    # rebuild as CTE: wrap the signature query
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, md5("
        + " || '_' || ".join(
            f"CAST(sig_{r * j + i} AS VARCHAR)" for i in range(r)
        )
        + ") AS band_hash FROM sig"
        for j in range(bands)
    )
    return f"""
WITH sig AS ({sig_cte}),
banded AS ({band_rows})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
ORDER BY doc_a, doc_b
"""


# --- 4. SimHash ---------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(corpus: DataFrame) -> DataFrame:
    """32-bit tf-weighted SimHash per doc.

    Map-side only per doc in principle; expressed relationally as
    explode(term) x explode(bit) -> two hash-aggs.  At scale this is the
    mapInPandas one-pass variant; the relational form keeps it
    oracle-checkable."""
    from ..functions.tokenizer import tokens

    tf = (
        corpus.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("th", h64(F.col("term")))
    )
    bits = tf.select(
        "doc_id",
        "tf",
        "th",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    )
    weighted = bits.groupBy("doc_id", "bit").agg(
        F.sum(
            F.when(
                F.expr("shiftright(th, bit) & 1") == 1,
                F.col("tf"),
            ).otherwise(-F.col("tf"))
        ).alias("w")
    )
    return (
        weighted.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("w") > 0, F.pow(F.lit(2.0), F.col("bit")).cast("bigint")
                ).otherwise(F.lit(0))
            ).alias("simhash")
        )
        .orderBy("doc_id")
    )


SIMHASH_SQL = f"""
WITH {CORPUS_CTE.strip()},
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
tf AS (
  SELECT doc_id, term, count(*) AS tf,
         {H64_SQL.format(x='term')} AS th
  FROM toks GROUP BY doc_id, term
),
bits AS (
  SELECT doc_id, tf, th, b.bit
  FROM tf, (SELECT unnest(range({SIMHASH_BITS})) AS bit) b
),
weighted AS (
  SELECT doc_id, bit,
         sum(CASE WHEN (th >> bit) & 1 = 1 THEN tf ELSE -tf END) AS w
  FROM bits GROUP BY doc_id, bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN w > 0 THEN CAST(pow(2.0, bit) AS BIGINT) ELSE 0 END)
            AS BIGINT) AS simhash
FROM weighted GROUP BY doc_id ORDER BY doc_id
"""


def _simhash_chunk_defs(max_hamming: int) -> list[tuple[int, int]]:
    """(lo_bit, width) for max_hamming+1 contiguous chunks covering the
    SIMHASH_BITS space: if hamming(a,b) <= h, at most h chunks contain a
    differing bit, so at least one of h+1 chunks is bit-identical
    (pigeonhole) — the chunk equi-join is a LOSSLESS candidate generator."""
    n_chunks = max_hamming + 1
    bounds = [SIMHASH_BITS * i // n_chunks for i in range(n_chunks + 1)]
    return [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_chunks)]


def simhash_near_pairs(corpus: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs: hamming(simhash_a, simhash_b) <= max_hamming.

    100 TB shape (pigeonhole chunk equi-join, EXACT — not approximate):
    explode each simhash into max_hamming+1 bit chunks, equi-join on
    (chunk_id, chunk_val) — candidates are hash collisions only, never the
    O(N^2) cross product — then verify exact hamming on the candidates.
    The oracle stays the exhaustive all-pairs SQL, so the driver gate
    itself proves pigeonhole completeness cross-engine."""
    s = simhash(corpus)
    chunk_arr = F.array(
        *[
            F.expr(f"shiftright(simhash, {lo}) & {(1 << w) - 1}")
            for lo, w in _simhash_chunk_defs(max_hamming)
        ]
    )
    chunks = s.select(
        "doc_id",
        "simhash",
        F.posexplode(chunk_arr).alias("chunk_id", "chunk_val"),
    )
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"),
        "chunk_id", "chunk_val",
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"),
        "chunk_id", "chunk_val",
    )
    cand = (
        a.join(b, ["chunk_id", "chunk_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ha", "hb")
        .distinct()  # a pair may collide on several chunks
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.expr("ha ^ hb")).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def simhash_near_pairs_exact(
    corpus: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Exhaustive all-pairs form (O(N^2) nested-loop join) — kept as the
    recall/correctness oracle for the pigeonhole default."""
    s = simhash(corpus)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "hamming",
            F.bit_count(F.expr("ha ^ hb")).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def simhash_near_pairs_sql(max_hamming: int = 3) -> str:
    return f"""
WITH base AS ({SIMHASH_SQL.strip()})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM base a JOIN base b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


# --- 5. embedding-cosine near-dup ----------------------------------------------

def _cos_dot(x: F.Column, y: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p * q),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _cosine_col() -> F.Column:
    return F.round(
        _cos_dot(F.col("va"), F.col("vb"))
        / (
            F.sqrt(_cos_dot(F.col("va"), F.col("va")))
            * F.sqrt(_cos_dot(F.col("vb"), F.col("vb")))
        ),
        5,
    )


def embedding_near_pairs(embeddings: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Near-dup pairs by cosine similarity over the embedding column.

    100 TB shape: candidates are drawn from similarity.lsh_buckets (each
    vector hashes to exactly one random-hyperplane bucket), so the pair
    join is keyed on bucket — O(sum of bucket^2) ~ N^2/2^planes, never the
    full cross product — then the exact cosine predicate verifies inside
    each bucket (JVM-side zip_with/aggregate).  Recall is the hyperplane-
    LSH recall; the exhaustive form is kept as embedding_near_pairs_exact
    and compared in tests."""
    from .similarity import lsh_buckets

    b = lsh_buckets(embeddings)
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).join(b, "vec_id")
    a = e.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), "bucket"
    )
    bb = e.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), "bucket"
    )
    return (
        a.join(bb, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", _cosine_col())
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_pairs_exact(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Exhaustive all-pairs cosine (O(N^2) nested-loop) — recall oracle
    for the bucketed default."""
    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", _cosine_col())
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .orderBy("vec_a", "vec_b")
    )


def embedding_near_pairs_sql(threshold: float = 0.9) -> str:
    """Oracle mirrors the bucketed plan: same-LSH-bucket candidates ->
    exact cosine verify."""
    from .similarity import lsh_buckets_sql

    return f"""
WITH buckets AS ({lsh_buckets_sql().strip()}),
e AS (
  SELECT e0.vec_id, CAST(e0.embedding AS DOUBLE[]) AS v, b.bucket
  FROM embeddings e0 JOIN buckets b ON e0.vec_id = b.vec_id
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 5) AS cosine
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 5) >= {threshold}
ORDER BY vec_a, vec_b
"""


def embedding_near_pairs_exact_sql(threshold: float = 0.9) -> str:
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 5) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 5) >= {threshold}
ORDER BY vec_a, vec_b
"""


# --- 7. repeated-passage (block) dedup ---------------------------------------
#
# The C4 / RefinedWeb line-dedup pass, adapted to a corpus whose text has
# no newline structure: each document is cut into consecutive fixed-size
# token blocks (the "paragraph" unit), every block is hashed, and only the
# FIRST global occurrence of each distinct block survives (first = lowest
# (doc_id, block position) — deterministic, no RNG).  Documents are then
# reassembled from their surviving blocks in position order, with kept /
# dropped counts per doc.
#
# Scale shape: one shuffle on the 64-bit block hash (the window min is a
# partial-aggregate-friendly min over the hash partition), then one hash
# aggregate on doc_id for reassembly.  No self-join, no driver state; at
# 10^12 blocks both exchanges are plain hash repartitions.  Reference
# analogue: the reference dedups whole messages by id on ingest
# (poc/src/core/dedup via unique key); block-level near-document hygiene is
# the pretraining-pipeline extension of the same keep-first contract.

DEDUP_BLOCK_TOKENS = 10
# blocks per doc are far below this; packs (doc_id, pos) into one int64 so
# "first occurrence" is a single MIN
_POS_PACK = 1 << 20


def dedup_blocks(corpus: DataFrame, block: int = DEDUP_BLOCK_TOKENS) -> DataFrame:
    """(doc_id, text_dedup, blocks_kept, blocks_dropped), doc_id order.

    A block is dropped iff an identical token block occurred earlier in
    the corpus (earlier doc, or earlier position in the same doc).
    """
    from pyspark.sql import Window

    # tokens materialized once per row (the block lambda slices per block)
    toks = F.col("toks")
    n_blocks = F.ceil(F.size(toks) / F.lit(float(block))).cast("int")
    blocks_arr = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i * block + 1, block)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    b = corpus.select("doc_id", _toks().alias("toks")).select(
        "doc_id", F.posexplode(blocks_arr).alias("pos", "btext")
    )
    key = F.col("doc_id") * _POS_PACK + F.col("pos")
    b = b.withColumn(
        "keep",
        key == F.min(key).over(Window.partitionBy(h64(F.col("btext")))),
    )
    return (
        b.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "btext"))
                        )
                    ),
                    lambda s: s["btext"],
                ),
                " ",
            ).alias("text_dedup"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("blocks_kept"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1))
            .cast("bigint")
            .alias("blocks_dropped"),
        )
        .orderBy("doc_id")
    )


def dedup_blocks_sql(block: int = DEDUP_BLOCK_TOKENS) -> str:
    h = H64_SQL.format(x="btext")
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
blk AS (
  SELECT doc_id, CAST(t.pos AS INTEGER) AS pos,
         array_to_string(
           list_slice(toks, t.pos * {block} + 1, t.pos * {block} + {block}),
           ' ') AS btext
  FROM tokd,
       unnest(range(0, CAST(ceil(len(toks) / {block}.0) AS BIGINT))) AS t(pos)
),
flagged AS (
  SELECT doc_id, pos, btext,
         (doc_id * {_POS_PACK} + pos)
           = min(doc_id * {_POS_PACK} + pos) OVER (PARTITION BY {h}) AS keep
  FROM blk
)
SELECT doc_id,
       coalesce(string_agg(btext, ' ' ORDER BY pos) FILTER (WHERE keep), '')
         AS text_dedup,
       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS blocks_kept,
       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS blocks_dropped
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""


def remove_boilerplate(
    corpus: DataFrame, block: int = DEDUP_BLOCK_TOKENS, min_docs: int = 3
) -> DataFrame:
    """CCNet/RefinedWeb boilerplate removal: drop every token block whose
    content appears in >= `min_docs` DISTINCT documents (nav menus,
    cookie banners, shared footers — text that repeats ACROSS pages),
    keeping within-doc repetition intact.  Contrast dedup_blocks, which
    keeps the corpus-first occurrence; here ALL occurrences of a
    frequent block are removed, including the first — the CCNet
    paragraph-dedup contract.

    Output (doc_id, text_kept, blocks_kept, blocks_dropped), doc order.

    Scale shape: one hash aggregate over (block-hash, doc_id) for the
    distinct-doc counts, then the frequent set — by construction the
    tiny head of the block-frequency distribution (boilerplate) — is
    broadcast and anti-probed; the reassembly is the same per-doc hash
    aggregate as dedup_blocks.  No shuffle of the corpus itself beyond
    the doc_id regroup."""
    # tokens materialized once per row (the block lambda slices per block)
    toks = F.col("toks")
    n_blocks = F.ceil(F.size(toks) / F.lit(float(block))).cast("int")
    blocks_arr = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_blocks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * block + 1, block)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    b = corpus.select("doc_id", _toks().alias("toks")).select(
        "doc_id", F.posexplode(blocks_arr).alias("pos", "btext")
    ).withColumn("bh", h64(F.col("btext")))
    frequent = (
        b.groupBy("bh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= int(min_docs))
        .select("bh")
    )
    marked = b.join(
        F.broadcast(frequent.withColumn("boiler", F.lit(True))), "bh", "left"
    ).withColumn("keep", F.col("boiler").isNull())
    return (
        marked.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("keep"), F.struct("pos", "btext"))
                        )
                    ),
                    lambda s: s["btext"],
                ),
                " ",
            ).alias("text_kept"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("blocks_kept"),
            F.sum(F.when(F.col("keep"), 0).otherwise(1))
            .cast("bigint")
            .alias("blocks_dropped"),
        )
        .orderBy("doc_id")
    )


def remove_boilerplate_sql(
    block: int = DEDUP_BLOCK_TOKENS, min_docs: int = 3
) -> str:
    h = H64_SQL.format(x="btext")
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
blk AS (
  SELECT doc_id, CAST(t.pos AS INTEGER) AS pos,
         array_to_string(
           list_slice(toks, t.pos * {block} + 1, t.pos * {block} + {block}),
           ' ') AS btext
  FROM tokd,
       unnest(range(0, CAST(ceil(len(toks) / {block}.0) AS BIGINT))) AS t(pos)
),
freq AS (
  SELECT {h} AS bh
  FROM blk GROUP BY 1
  HAVING count(DISTINCT doc_id) >= {int(min_docs)}
),
flagged AS (
  SELECT b.doc_id, b.pos, b.btext, f.bh IS NULL AS keep
  FROM blk b LEFT JOIN freq f ON ({H64_SQL.format(x="b.btext")}) = f.bh
)
SELECT doc_id,
       coalesce(string_agg(btext, ' ' ORDER BY pos) FILTER (WHERE keep), '')
         AS text_kept,
       CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS blocks_kept,
       CAST(count(*) FILTER (WHERE NOT keep) AS BIGINT) AS blocks_dropped
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""


# --- 7b. exact-substring dedup (sliding windows) ------------------------------
#
# The ExactSubstr pass of Lee et al. 2021 ("Deduplicating Training Data
# Makes Language Models Better"): any w-token span that occurs verbatim
# anywhere else in the corpus is removed from every occurrence EXCEPT the
# corpus-first one.  Unlike dedup_blocks (disjoint fixed blocks — a
# shifted duplicate slips through), windows here start at EVERY token
# position, so a duplicated passage is caught at any alignment; removal
# is per-token via the union of the duplicated windows covering it.
#
# The paper builds a suffix array; the distributed equivalent is a
# rolling window-hash join: suffix-array adjacency finds exactly the
# pairs of positions sharing a >= w-token prefix, and "two positions
# share a w-token window hash" is the same predicate bucketed by hash
# instead of by sort order.  Scale shape: window rows ~ one per corpus
# token (the index build's own cardinality), ONE shuffle on the 64-bit
# window hash for the global first-occurrence min, a doc-keyed regroup
# of the duplicated positions (dup positions only — the tiny tail), and
# one join back to the corpus.  Per-doc token filtering is array-side
# (O(len * dup_windows_in_doc), no explode of covered positions).

EXSUB_WINDOW_TOKENS = 15


def dedup_exact_substrings(
    corpus: DataFrame, window: int = EXSUB_WINDOW_TOKENS
) -> DataFrame:
    """(doc_id, text_dedup, n_tokens, tokens_dropped, dup_windows),
    doc_id order.

    A token is dropped iff some w-token window containing it occurred
    verbatim earlier in the corpus (earlier doc, or earlier position in
    the same doc — keep-first, deterministic, no RNG).  Docs shorter
    than `window` tokens have no windows and always survive whole.
    """
    from pyspark.sql import Window

    w = int(window)
    toks = F.col("toks")
    n_wins = F.size(toks) - (w - 1)
    # sequence(1, 0) steps DOWN in Spark — guard the no-window case
    wins_arr = F.when(
        n_wins >= 1,
        F.transform(
            F.sequence(F.lit(1), n_wins),
            lambda i: F.concat_ws(" ", F.slice(toks, i, w)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tokd = corpus.select("doc_id", _toks().alias("toks"))
    occ = tokd.select(
        "doc_id", F.posexplode(wins_arr).alias("pos", "wtext")
    )
    key = F.col("doc_id") * _POS_PACK + F.col("pos")
    dup = occ.withColumn(
        "dup",
        key != F.min(key).over(Window.partitionBy(h64(F.col("wtext")))),
    ).filter(F.col("dup"))
    dup_pos = dup.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("pos")).alias("dps")
    )
    joined = tokd.join(dup_pos, "doc_id", "left").withColumn(
        "dps",
        F.coalesce(F.col("dps"), F.array().cast("array<int>")),
    )
    dps = F.col("dps")
    kept = F.filter(
        F.transform(toks, lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda s: ~F.exists(
            dps, lambda p: (p <= s["i"]) & (s["i"] < p + w)
        ),
    )
    return (
        joined.select(
            "doc_id",
            F.array_join(
                F.transform(kept, lambda s: s["t"]), " "
            ).alias("text_dedup"),
            F.size(toks).cast("bigint").alias("n_tokens"),
            (F.size(toks) - F.size(kept)).cast("bigint").alias(
                "tokens_dropped"
            ),
            F.size(dps).cast("bigint").alias("dup_windows"),
        )
        .orderBy("doc_id")
    )


def dedup_exact_substrings_sql(window: int = EXSUB_WINDOW_TOKENS) -> str:
    w = int(window)
    h = H64_SQL.format(x="wtext")
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
win AS (
  SELECT doc_id, CAST(p.pos AS INTEGER) AS pos,
         array_to_string(list_slice(toks, p.pos + 1, p.pos + {w}), ' ')
           AS wtext
  FROM tokd,
       unnest(range(0, greatest(len(toks) - {w - 1}, 0))) AS p(pos)
),
dup AS (
  SELECT doc_id, pos
  FROM (
    SELECT doc_id, pos,
           (doc_id * {_POS_PACK} + pos)
             <> min(doc_id * {_POS_PACK} + pos) OVER (PARTITION BY {h})
             AS dup
    FROM win
  ) WHERE dup
),
dps AS (
  SELECT doc_id, list_sort(list(pos)) AS dps FROM dup GROUP BY doc_id
),
joined AS (
  SELECT t.doc_id, t.toks, coalesce(d.dps, []) AS dps
  FROM tokd t LEFT JOIN dps d ON t.doc_id = d.doc_id
),
flt AS (
  SELECT doc_id, toks, dps,
         list_filter(range(0, len(toks)),
                     i -> len(list_filter(dps,
                              p -> p <= i AND i < p + {w})) = 0) AS kept
  FROM joined
)
SELECT doc_id,
       coalesce(array_to_string(list_transform(kept, i -> toks[i + 1]), ' '),
                '') AS text_dedup,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(toks) - len(kept) AS BIGINT) AS tokens_dropped,
       CAST(len(dps) AS BIGINT) AS dup_windows
FROM flt
ORDER BY doc_id
"""


def dedup_components(
    corpus: DataFrame,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
    max_iters: int = 20,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the MinHash-LSH
    candidate graph (the step the pair ops stop short of — production
    dedup keeps one doc per component, so pairs must be transitively
    closed first; cf. the union-find stage of every large-scale MinHash
    pipeline).

    Algorithm: hash-min label propagation.  label(v) starts at v; each
    round every vertex takes the min of its own label and its neighbors'
    labels; fixpoint = every vertex holds the min doc_id reachable from
    it, i.e. its component id.  Deterministic (min over ids, no RNG).

    Distributed shape per round: ONE shuffle — edges joined to the label
    table on src (the label table is the smaller side at dup-graph
    sparsity), then a min groupBy on dst with map-side partial agg.
    Rounds needed = graph diameter, which for near-dup clusters is tiny
    (dup sets are quasi-cliques — each LSH bucket is a star around its
    min id, so 2-4 rounds converge); `max_iters` bounds pathological
    chains, and the loop exits early on a converged round
    (changed-count == 0).  At 100 TB the production upgrade is
    alternating large-star/small-star (same join shape, provably
    O(log n) rounds); hash-min is the honest default because
    dup-cluster diameter, not vertex count, drives round count.
    localCheckpoint per round truncates the iterative lineage chain.

    Edge construction is STAR-REDUCED: instead of materializing the
    all-pairs candidate list (O(m^2) rows per LSH bucket — the
    `minhash_lsh_pairs` contract, which stays all-pairs because pairs
    ARE its output), each bucket member connects to the bucket's min
    doc_id (O(m) rows).  Transitive closure is unchanged: star edges
    are a subset of the candidate pairs (the min is a member and
    min < x), and every candidate pair (x, y) in a bucket is linked
    through that bucket's min — so components are IDENTICAL to closing
    over the full pair list (the recursive-CTE oracle proves it per
    run).  At 40-way replication this is ~20x fewer edge rows.

    Returns (doc_id, component) for every doc that has at least one
    near-dup candidate, component = min doc_id of its cluster.
    """
    n_hashes, bands = int(n_hashes), int(bands)
    if n_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide n_hashes ({n_hashes})")
    r = n_hashes // bands
    sig = minhash_signatures(corpus, n_hashes, sort=False)
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"sig_{r * j + i}").cast("string")
                        for i in range(r)
                    ],
                )
            )
            for j in range(bands)
        ]
    )
    banded = sig.select(
        "doc_id", F.posexplode(band_hashes).alias("band", "band_hash")
    ).localCheckpoint()
    bucket_root = (
        banded.groupBy("band", "band_hash")
        .agg(F.min("doc_id").alias("root"), F.count(F.lit(1)).alias("m"))
        .filter(F.col("m") > 1)
        .drop("m")
    )
    # both shuffles key on (band, band_hash); rows out = bucket members,
    # never member pairs
    edges = (
        banded.join(bucket_root, ["band", "band_hash"])
        .filter(F.col("doc_id") != F.col("root"))
        .select(F.col("root").alias("src"), F.col("doc_id").alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(int(max_iters)):
        neigh_min = (
            sym.join(labels.withColumnRenamed("doc_id", "src"), "src")
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lbl").alias("nmin"))
        )
        updated = (
            labels.join(neigh_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("lbl"), F.coalesce("nmin", F.col("lbl"))).alias(
                    "lbl"
                ),
                (F.col("nmin") < F.col("lbl")).alias("chg"),
            )
            # lazy: the convergence count below is the materializing
            # action — one job per round, not two
            .localCheckpoint(eager=False)
        )
        changed = updated.filter(F.col("chg")).count()
        labels = updated.select("doc_id", "lbl")
        if changed == 0:
            break
    return labels.select(
        "doc_id", F.col("lbl").alias("component")
    ).orderBy("doc_id")


def dedup_components_sql(
    n_hashes: int = N_MINHASH, bands: int = LSH_BANDS
) -> str:
    """Oracle: transitive closure by recursive CTE (min reachable id per
    vertex) over the same LSH candidate edges."""
    return f"""
WITH RECURSIVE
edges AS ({minhash_lsh_pairs_sql(n_hashes=n_hashes, bands=bands).strip()}),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM edges
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM edges
),
reach(v, l) AS (
  SELECT DISTINCT src AS v, src AS l FROM sym
  UNION
  SELECT sym.dst AS v, reach.l
  FROM reach JOIN sym ON sym.src = reach.v
)
SELECT v AS doc_id, min(l) AS component
FROM reach GROUP BY v ORDER BY doc_id
"""


def dedup_components_keep_min(
    corpus: DataFrame,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Component-level dedup decision: keep exactly the min-id doc of
    each near-dup cluster (docs with no candidate pair are implicitly
    kept — they never enter the label table, so no corpus-sized work
    beyond the LSH join itself).  Returns dropped docs: (doc_id,
    component, kept_doc_id)."""
    comp = dedup_components(corpus, n_hashes=n_hashes, bands=bands)
    return (
        comp.filter(F.col("doc_id") != F.col("component"))
        .select(
            "doc_id", "component", F.col("component").alias("kept_doc_id")
        )
        .orderBy("doc_id")
    )


def dedup_components_keep_min_sql(
    n_hashes: int = N_MINHASH, bands: int = LSH_BANDS
) -> str:
    return f"""
SELECT doc_id, component, component AS kept_doc_id
FROM ({dedup_components_sql(n_hashes=n_hashes, bands=bands).strip()}) c
WHERE doc_id != component
ORDER BY doc_id
"""


# --- URL canonicalization + keep-latest dedup --------------------------------

# Tracking params dropped by the canonicalizer (the CC-pipeline staples).
_TRACKING_RE = "^(utm_[^=]*|fbclid|gclid|ref)="


def canonical_url_col(url: F.Column | str = "url") -> F.Column:
    """Deterministic URL canonical form (the web-crawl dedup key):
      1. fragment stripped,
      2. scheme + host lowercased,
      3. default port (:80/:443) stripped,
      4. trailing path slashes dropped,
      5. tracking query params (utm_*, fbclid, gclid, ref) removed and
         the survivors sorted.
    Pure built-in expressions (split / regexp / higher-order array ops)
    — map-only, codegen'd, exactly mirrored by CANONICAL_URL_SQL."""
    u = F.split(F.col(url) if isinstance(url, str) else url, "#").getItem(0)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z]+)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z]+://([^/?]+)", 1))
    host = F.regexp_replace(hostport, ":(80|443)$", "")
    path = F.regexp_replace(
        F.regexp_extract(u, r"^[A-Za-z]+://[^/?]+([^?]*)", 1), "/+$", ""
    )
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
            )
        ),
        "&",
    )
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(params != "", F.concat(F.lit("?"), params)).otherwise(F.lit("")),
    )


CANONICAL_URL_SQL = """
lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) || '://'
|| regexp_replace(lower(regexp_extract(u, '^[A-Za-z]+://([^/?]+)', 1)),
                  ':(80|443)$', '')
|| regexp_replace(regexp_extract(u, '^[A-Za-z]+://[^/?]+([^?]*)', 1),
                  '/+$', '')
|| CASE WHEN array_to_string(list_sort(list_filter(
            str_split(regexp_extract(u, '\\?(.*)$', 1), '&'),
            p -> p <> '' AND NOT regexp_matches(p, '{tracking}'))), '&') <> ''
        THEN '?' || array_to_string(list_sort(list_filter(
            str_split(regexp_extract(u, '\\?(.*)$', 1), '&'),
            p -> p <> '' AND NOT regexp_matches(p, '{tracking}'))), '&')
        ELSE '' END
""".replace("{tracking}", _TRACKING_RE)


def dedup_url_canonical(corpus: DataFrame) -> DataFrame:
    """Canonical-URL dedup, keep-latest: recrawls of the same canonical
    URL collapse to the newest capture (warc_ts desc, doc_id desc tie).
    ONE shuffle on the canonical key (partitioned window — never a
    global sort); the canonicalizer itself is map-only.

    Returns (canonical_url, kept_doc_id, n_docs) per canonical group."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("canonical_url").orderBy(
        F.desc("warc_ts"), F.desc("doc_id")
    )
    return (
        corpus.select(
            canonical_url_col("url").alias("canonical_url"),
            "doc_id",
            "warc_ts",
        )
        .withColumn("rn", F.row_number().over(w))
        .groupBy("canonical_url")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias(
                "kept_doc_id"
            ),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("canonical_url")
    )


def dedup_url_canonical_sql() -> str:
    canon = CANONICAL_URL_SQL.strip()
    return f"""
WITH {CORPUS_CTE.strip()},
c AS (
  SELECT doc_id, warc_ts, {canon} AS canonical_url
  FROM (SELECT doc_id, warc_ts, str_split(url, '#')[1] AS u FROM corpus)
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY canonical_url
            ORDER BY warc_ts DESC, doc_id DESC) AS rn
  FROM c
)
SELECT canonical_url,
       max(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc_id,
       count(*) AS n_docs
FROM r GROUP BY canonical_url ORDER BY canonical_url
"""


# --- exact substring dedup (Lee et al. 2021, "Deduplicating Training Data
# Makes Language Models Better") --------------------------------------------


def _gram_windows(tokd: DataFrame, n: int) -> DataFrame:
    """(doc_id, gpos, gram): every n-token window with its 1-based start
    position.  tokd must carry a MATERIALIZED `toks` column (tokenize-once
    contract, see shingles_col).  Docs with < n tokens yield no windows
    (sequence(1,0) counts DOWN — the _ngrams guard)."""
    arr = F.transform(
        F.sequence(F.lit(1), F.size("toks") - (n - 1)),
        lambda i: F.struct(
            i.alias("gpos"),
            F.concat_ws(
                " ", *[F.element_at(F.col("toks"), i + j) for j in range(n)]
            ).alias("gram"),
        ),
    )
    g = F.explode(
        F.when(
            F.size("toks") < n,
            F.array().cast("array<struct<gpos:int,gram:string>>"),
        ).otherwise(arr)
    )
    return tokd.select("doc_id", g.alias("g")).select(
        "doc_id", F.col("g.gpos").alias("gpos"), F.col("g.gram").alias("gram")
    )


def _dup_covered_positions(corpus: DataFrame, n: int) -> tuple[DataFrame, DataFrame]:
    """(tokd, covered): token positions covered by any n-gram that occurs
    MORE THAN ONCE in the whole corpus — the paper's suffix-array
    duplicated-substring criterion at n-gram granularity (cross-doc AND
    within-doc repeats both qualify, as in the paper).

    Scale shape: dup detection is one hash agg keyed by gram (map-side
    combine); occurrences come from an equi-join of the window table to
    the duplicated-gram set (shuffle on gram — the heavy key space is
    the gram space itself, already salted by content); coverage is a
    per-doc bounded explode + distinct keyed by doc_id.  No sorting, no
    suffix array: the n-gram relaxation is what makes the operator a
    pure dataflow at 10^12 docs."""
    tokd = corpus.select("doc_id", _toks().alias("toks"))
    grams = _gram_windows(tokd, n)
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("gram")
    )
    occ = grams.join(dup, "gram").select("doc_id", "gpos")
    covered = occ.select(
        "doc_id",
        F.explode(F.sequence("gpos", F.col("gpos") + (n - 1))).alias("p"),
    ).distinct()
    return tokd, covered


def dedup_substring_spans(corpus: DataFrame, n: int = 8) -> DataFrame:
    """Per-doc duplicated-substring exposure: (doc_id, n_tokens,
    n_dup_tokens, dup_frac) where n_dup_tokens counts tokens covered by
    at least one corpus-duplicated n-gram window (position union — each
    token counted once, the same no-double-count contract as
    repetition_metrics)."""
    tokd, covered = _dup_covered_positions(corpus, int(n))
    ndup = covered.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_dup_tokens")
    )
    ntok = tokd.select("doc_id", F.size("toks").cast("long").alias("n_tokens"))
    nd = F.coalesce(F.col("n_dup_tokens"), F.lit(0)).cast("long")
    return (
        ntok.join(ndup, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            nd.alias("n_dup_tokens"),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(F.round(nd / F.col("n_tokens"), 5))
            .alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def dedup_substring_clean(corpus: DataFrame, n: int = 8) -> DataFrame:
    """The paper's REMOVAL step: drop every token covered by a
    corpus-duplicated n-gram, keep the rest in document order.
    (doc_id, clean_text); fully-duplicated docs come out empty — the
    filter stage downstream drops them.

    Reassembly is a per-doc sort of the doc's own kept positions
    (array_sort over a collect_list bounded by doc length), never a
    global sort."""
    tokd, covered = _dup_covered_positions(corpus, int(n))
    pos = tokd.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    kept = pos.join(covered, ["doc_id", "p"], "left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("p", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text")
    )
    return (
        corpus.select("doc_id")
        .join(clean, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("clean_text", F.lit("")).alias("clean_text")
        )
        .orderBy("doc_id")
    )


def _substring_ctes(n: int) -> str:
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
grams AS (
  SELECT doc_id, CAST(x.i AS BIGINT) AS gpos, {parts} AS gram
  FROM tokd, unnest(range(1, len(toks) - {n - 1} + 1)) AS x(i)
),
dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1),
occ AS (
  SELECT doc_id, gpos FROM grams WHERE gram IN (SELECT gram FROM dup)
),
covered AS (
  SELECT DISTINCT doc_id, gpos + y.d AS p
  FROM occ, unnest(range(0, {n})) AS y(d)
)"""


def dedup_substring_spans_sql(n: int = 8) -> str:
    n = int(n)
    return f"""
WITH {CORPUS_CTE.strip()},
{_substring_ctes(n).strip()},
ndup AS (SELECT doc_id, count(*) AS n_dup FROM covered GROUP BY doc_id),
ntok AS (SELECT doc_id, len(toks) AS n_tokens FROM tokd)
SELECT ntok.doc_id, n_tokens,
       coalesce(n_dup, 0) AS n_dup_tokens,
       CASE WHEN n_tokens = 0 THEN 0.0
            ELSE round(coalesce(n_dup, 0) / n_tokens, 5) END AS dup_frac
FROM ntok LEFT JOIN ndup ON ntok.doc_id = ndup.doc_id
ORDER BY ntok.doc_id
"""


def dedup_substring_clean_sql(n: int = 8) -> str:
    n = int(n)
    return f"""
WITH {CORPUS_CTE.strip()},
{_substring_ctes(n).strip()},
pos AS (
  SELECT doc_id, CAST(x.p AS BIGINT) AS p, toks[x.p] AS tok
  FROM tokd, unnest(range(1, len(toks) + 1)) AS x(p)
),
kept AS (
  SELECT pos.doc_id, pos.p, pos.tok
  FROM pos
  WHERE NOT EXISTS (
    SELECT 1 FROM covered c WHERE c.doc_id = pos.doc_id AND c.p = pos.p
  )
),
clean AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT corpus.doc_id, coalesce(clean_text, '') AS clean_text
FROM corpus LEFT JOIN clean ON corpus.doc_id = clean.doc_id
ORDER BY corpus.doc_id
"""


# --- Fingerprint (token-set) dedup -------------------------------------------

def fingerprint_dedup(corpus: DataFrame, top: int = 20) -> DataFrame:
    """OpenRefine/ES-fingerprint dedup: the key is the SORTED DISTINCT
    token set (the `fingerprint` analyzer's output) — catches
    reorderings and repetition-only edits that byte-exact sha256 dedup
    misses, cheaper than MinHash when token-set equality is the target.

    Returns (fingerprint, n_docs, keep_doc_id) for the `top` largest
    groups (n_docs desc, fingerprint asc), keeper = min doc_id.
    Scale shape: one tokenize + one hash agg on the fingerprint key —
    identical to exact dedup's sha256 groups, just a different key."""
    from ..functions.tokenizer import tokens

    fp = F.array_join(F.array_sort(F.array_distinct(tokens("text"))), " ")
    return (
        corpus.select(fp.alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .orderBy(F.desc("n_docs"), F.asc("fingerprint"))
        .limit(int(top))
    )


def fingerprint_dedup_sql(top: int = 20) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
fp AS (
  SELECT doc_id,
         array_to_string(list_sort(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
             t -> t <> ''))), ' ') AS fingerprint
  FROM corpus
)
SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS keep_doc_id
FROM fp GROUP BY fingerprint
ORDER BY n_docs DESC, fingerprint ASC
LIMIT {int(top)}
"""


def dedup_components_keep_best(
    corpus: DataFrame,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Quality-aware cluster dedup — the production keep decision: within
    each near-dup component keep the HIGHEST-quality member (composite
    quality score; doc_id asc tie-break), not the arbitrary min-id.
    RefinedWeb/FineWeb keep a representative this way so dedup does not
    systematically discard the cleanest copy.

    Returns the DROPPED docs: (doc_id, component, quality, kept_doc_id,
    kept_quality), doc_id order.  Scale shape: components (LSH label
    propagation) + the per-doc quality map join, then ONE hash agg per
    component using a lexicographic struct max (quality, -doc_id) — no
    window, no sort beyond the final small output."""
    from ..functions.text_quality import quality_scores

    comp = dedup_components(corpus, n_hashes=n_hashes, bands=bands)
    q = quality_scores(corpus).select("doc_id", "quality")
    j = comp.join(q, "doc_id")
    keep = (
        j.groupBy("component")
        .agg(
            F.max(
                F.struct(
                    F.col("quality").alias("q"),
                    (-F.col("doc_id")).alias("nd"),
                    F.col("doc_id").alias("d"),
                )
            ).alias("b")
        )
        .select(
            "component",
            F.col("b.d").alias("kept_doc_id"),
            F.col("b.q").alias("kept_quality"),
        )
    )
    return (
        j.join(keep, "component")
        .filter(F.col("doc_id") != F.col("kept_doc_id"))
        .select("doc_id", "component", "quality", "kept_doc_id", "kept_quality")
        .orderBy("doc_id")
    )


def dedup_components_keep_best_sql(
    n_hashes: int = N_MINHASH, bands: int = LSH_BANDS
) -> str:
    from ..functions.text_quality import quality_scores_sql

    return f"""
WITH comp AS ({dedup_components_sql(n_hashes=n_hashes, bands=bands).strip()}),
q AS (SELECT doc_id, quality FROM ({quality_scores_sql().strip()}) qq),
j AS (
  SELECT comp.doc_id, comp.component, q.quality
  FROM comp JOIN q ON comp.doc_id = q.doc_id
),
ranked AS (
  SELECT doc_id, component, quality,
         row_number() OVER (
             PARTITION BY component
             ORDER BY quality DESC, doc_id ASC) AS rn
  FROM j
),
keep AS (
  SELECT component, doc_id AS kept_doc_id, quality AS kept_quality
  FROM ranked WHERE rn = 1
)
SELECT r.doc_id, r.component, r.quality, keep.kept_doc_id, keep.kept_quality
FROM ranked r JOIN keep ON r.component = keep.component
WHERE r.doc_id != keep.kept_doc_id
ORDER BY r.doc_id
"""


# --- Cross-snapshot dedup -------------------------------------------------------

SNAPSHOT_SPLIT = 10  # source srcN: N < split = prior crawl, N >= split = new






def dedup_cross_snapshot(
    corpus: DataFrame,
    split: int = SNAPSHOT_SPLIT,
    threshold: float = 0.5,
    max_candidates: int = 8,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Cross-snapshot near-dedup (the Common-Crawl production shape:
    each new crawl is deduped AGAINST ALL PRIOR CRAWLS, not just within
    itself — CCNet/RefinedWeb both dedupe across dumps).  Snapshot id is
    the integer suffix of `source` (srcN); docs with N >= `split` are
    the new crawl.  A new-crawl doc is flagged when a verified near-dup
    (3-gram Jaccard >= threshold) exists among its LSH candidates in
    ANY prior snapshot; flagged docs report the earliest verified
    prior-crawl anchor (min dup_of) and the strongest evidence
    (max jaccard).

    Candidate CAP at TWO levels (the production recall knob): per LSH
    bucket only the `max_candidates` smallest-id OLD members are
    eligible, and per new doc only the `max_candidates` smallest-id
    eligible olds are exact-verified.  The bucket-level cap kills the
    quadratic an all-pairs band join pays on heavily-replicated
    boilerplate (a bucket with m old copies emits C rows per new
    member, not m) — measured 15.4 s -> 5.6 s warm on the
    40x-replicated bench corpus, par with dedup_components at the same
    scale (the remaining cost is the shared signature pass); every
    MinHash pipeline at crawl scale applies the same bounded-verify.  Both caps are deterministic (doc_id asc) and
    mirrored in the oracle; when bucket sizes and per-doc candidate
    counts are <= cap the result is exact (asserted against the
    effectively-uncapped form at driver scale in tests).

    Scale shape: ONE signature pass, per-band bucket rollup of the OLD
    side (bounded in-array sort per bucket), an equi-join of new
    banded rows against the C-row bucket lists, one bounded per-new-doc
    cap (no window), and the exact shingle verify on capped candidates
    only.  In production the prior crawls' bucket lists are a
    PRECOMPUTED store (built once per dump, appended like index
    segments), so a new dump pays one signature pass over itself plus
    the band probe — the old corpus is never re-shingled.  Reference
    analogue: the url-exists skip on re-ingest (telegram2elastic.py
    upsert semantics), generalized to near-dups."""
    n_hashes, bands = int(n_hashes), int(bands)
    if n_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide n_hashes ({n_hashes})")
    r = n_hashes // bands
    cap = int(max_candidates)
    sig = minhash_signatures(corpus, n_hashes, sort=False)
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "_",
                    *[F.col(f"sig_{r * j + i}").cast("string") for i in range(r)],
                )
            )
            for j in range(bands)
        ]
    )
    snap = corpus.select(
        "doc_id",
        F.regexp_extract("source", "^src([0-9]+)$", 1)
        .cast("int")
        .alias("snap"),
    )
    banded = (
        sig.select("doc_id", F.posexplode(band_hashes).alias("band", "band_hash"))
        .join(snap, "doc_id")
        # both the old-bucket branch and the new-probe branch scan this
        # subtree and Spark does not dedupe identical subtrees, so the
        # whole signature pass would run TWICE; checkpointing the banded
        # rows (n x bands small rows) halves the op.  In production the
        # old side is a precomputed per-dump bucket store (docstring), so
        # the checkpoint models exactly what a crawl pipeline persists.
        .localCheckpoint()
    )
    bucket_olds = (
        banded.filter(F.col("snap") < int(split))
        .groupBy("band", "band_hash")
        .agg(F.slice(F.array_sort(F.collect_list("doc_id")), 1, cap).alias("olds"))
    )
    cand = (
        banded.filter(F.col("snap") >= int(split))
        .join(bucket_olds, ["band", "band_hash"])
        .select(
            F.col("doc_id").alias("new_doc"),
            F.explode("olds").alias("old_doc"),
        )
        .distinct()
    )
    capped = (
        cand.groupBy("new_doc")
        .agg(F.slice(F.array_sort(F.collect_list("old_doc")), 1, cap).alias("olds"))
        .select("new_doc", F.explode("olds").alias("old_doc"))
    )
    # The exact-verify join reads the shingle subtree on BOTH sides, and
    # Spark computes each side independently (no cross-subtree CSE) — two
    # full tokenize+shingle passes.  capped pairs are (new, old) by
    # construction (banded filters snap on each branch), so each side
    # only ever matches docs of its own snapshot half: pre-filtering by
    # snap halves each pass (r6) with identical join results.
    sh_src = corpus.select(
        "doc_id",
        F.regexp_extract("source", "^src([0-9]+)$", 1)
        .cast("int")
        .alias("snap"),
        _toks().alias("toks"),
    ).select("doc_id", "snap", shingles_col(3, F.col("toks")).alias("sh"))
    sn = sh_src.filter(F.col("snap") >= int(split)).select(
        F.col("doc_id").alias("new_doc"), F.col("sh").alias("sh_n")
    )
    so = sh_src.filter(F.col("snap") < int(split)).select(
        F.col("doc_id").alias("old_doc"), F.col("sh").alias("sh_o")
    )
    inter = F.size(F.array_intersect(F.col("sh_n"), F.col("sh_o")))
    return (
        capped.join(sn, "new_doc")
        .join(so, "old_doc")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size("sh_n") + F.size("sh_o") - inter), 5),
        )
        .filter(F.col("jaccard") >= threshold)
        .groupBy("new_doc")
        .agg(
            F.min("old_doc").alias("dup_of"),
            F.round(F.max("jaccard"), 5).alias("max_jaccard"),
        )
        .orderBy("new_doc")
    )


def dedup_cross_snapshot_sql(
    split: int = SNAPSHOT_SPLIT,
    threshold: float = 0.5,
    max_candidates: int = 8,
    n_hashes: int = N_MINHASH,
    bands: int = LSH_BANDS,
) -> str:
    n_hashes, bands = int(n_hashes), int(bands)
    if n_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide n_hashes ({n_hashes})")
    r = n_hashes // bands
    cap = int(max_candidates)
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, md5("
        + " || '_' || ".join(f"CAST(sig_{r * j + i} AS VARCHAR)" for i in range(r))
        + ") AS band_hash FROM sig"
        for j in range(bands)
    )
    return f"""
WITH sig AS ({minhash_signatures_sql(n_hashes).strip()}),
banded AS ({band_rows}),
snap AS (
  SELECT doc_id,
         CAST(regexp_extract(source, '^src([0-9]+)$', 1) AS INTEGER) AS snap
  FROM documents
),
olds AS (
  SELECT band, band_hash, doc_id AS old_doc FROM (
    SELECT b.band, b.band_hash, b.doc_id,
           row_number() OVER (PARTITION BY b.band, b.band_hash
                              ORDER BY b.doc_id) AS rn
    FROM banded b JOIN snap s ON b.doc_id = s.doc_id
    WHERE s.snap < {int(split)}
  ) WHERE rn <= {cap}
),
cand AS (
  SELECT DISTINCT n.doc_id AS new_doc, o.old_doc
  FROM banded n
  JOIN snap s ON n.doc_id = s.doc_id AND s.snap >= {int(split)}
  JOIN olds o ON o.band = n.band AND o.band_hash = n.band_hash
),
capped AS (
  SELECT new_doc, old_doc FROM (
    SELECT new_doc, old_doc,
           row_number() OVER (PARTITION BY new_doc ORDER BY old_doc) AS rn
    FROM cand
  ) WHERE rn <= {cap}
),
{CORPUS_CTE.strip()},
{TOKS_CTE_SQL.strip()},
ver AS (
  SELECT c.new_doc, c.old_doc,
         round(len(list_intersect(a.shingles, b.shingles))
               / (len(a.shingles) + len(b.shingles)
                  - len(list_intersect(a.shingles, b.shingles))), 5) AS j
  FROM capped c
  JOIN shing a ON a.doc_id = c.new_doc
  JOIN shing b ON b.doc_id = c.old_doc
)
SELECT new_doc, min(old_doc) AS dup_of, round(max(j), 5) AS max_jaccard
FROM ver WHERE j >= {threshold}
GROUP BY 1
ORDER BY 1
"""


# --- Online LSH dedup: per-doc verdicts ----------------------------------------

def lsh_dup_flags(
    corpus: DataFrame, n_hashes: int = N_MINHASH, bands: int = LSH_BANDS
) -> DataFrame:
    """Per-doc near-dup VERDICT from MinHash-LSH banding: a document is
    flagged iff any of its band buckets already holds an EARLIER doc
    (doc_id order = arrival order), and `dup_of` names the earliest
    collider across its buckets — the keep-first orientation of the
    whole dedup family applied to LSH candidates.  This is the batch
    twin of the STREAMING ingest-time dedup (streaming/windows.py
    `run_lsh_dedup_availablenow`), whose bucket minima live as operator
    state.

    Scale shape: one (band, band_hash) hash aggregate for the bucket
    minima + one equi-join back on the banded relation — collisions
    only, never a pair join."""
    n_hashes, bands = int(n_hashes), int(bands)
    if n_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide n_hashes ({n_hashes})")
    r = n_hashes // bands
    sig = minhash_signatures(corpus, n_hashes, sort=False)
    band_hashes = F.array(
        *[
            F.md5(
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"sig_{r * j + i}").cast("string")
                        for i in range(r)
                    ],
                )
            )
            for j in range(bands)
        ]
    )
    banded = sig.select(
        "doc_id", F.posexplode(band_hashes).alias("band", "band_hash")
    # the bucket-minimum branch and the join-back branch both scan this
    # subtree and Spark does not dedupe identical subtrees, so the whole
    # signature pass (shingle + md5 minima) would run TWICE; checkpointing
    # the banded rows (n x bands small rows) halves the op — the same
    # fix dedup_cross_snapshot carries (r6)
    ).localCheckpoint()
    keepers = banded.groupBy("band", "band_hash").agg(
        F.min("doc_id").alias("bucket_min")
    )
    return (
        banded.join(keepers, ["band", "band_hash"])
        .groupBy("doc_id")
        .agg(F.min("bucket_min").alias("earliest"))
        .select(
            "doc_id",
            (F.col("earliest") < F.col("doc_id")).alias("is_dup"),
            F.when(
                F.col("earliest") < F.col("doc_id"), F.col("earliest")
            ).alias("dup_of"),
        )
        .orderBy("doc_id")
    )


def lsh_dup_flags_sql(
    n_hashes: int = N_MINHASH, bands: int = LSH_BANDS
) -> str:
    n_hashes, bands = int(n_hashes), int(bands)
    if n_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide n_hashes ({n_hashes})")
    r = n_hashes // bands
    sig_cte = minhash_signatures_sql(n_hashes).strip()
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {j} AS band, md5("
        + " || '_' || ".join(
            f"CAST(sig_{r * j + i} AS VARCHAR)" for i in range(r)
        )
        + ") AS band_hash FROM sig"
        for j in range(bands)
    )
    return f"""
WITH sig AS ({sig_cte}),
banded AS ({band_rows}),
keepers AS (
  SELECT band, band_hash, min(doc_id) AS bucket_min
  FROM banded GROUP BY band, band_hash
),
per_doc AS (
  SELECT b.doc_id, min(k.bucket_min) AS earliest
  FROM banded b JOIN keepers k
    ON b.band = k.band AND b.band_hash = k.band_hash
  GROUP BY b.doc_id
)
SELECT doc_id,
       earliest < doc_id AS is_dup,
       CASE WHEN earliest < doc_id THEN earliest END AS dup_of
FROM per_doc
ORDER BY doc_id
"""


def minhash_sig_cols(n_hashes: int = N_MINHASH) -> list:
    """The MinHash signature as STATELESS per-row expressions (array-side
    min over the in-row shingle set — no explode, no aggregate): the
    streaming-safe form of `minhash_signatures`, provably equal to the
    agg form (same min over the same hash family; identity tested).
    Returns [sig_0, ..., sig_{n-1}] Columns over a `toks` column."""
    n = int(n_hashes)
    cols = []
    sh = shingles_col(3, F.col("toks"))
    for i in range(n):
        blk, off = divmod(i, 4)
        h = lambda s, blk=blk, off=off: F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{blk}:"), s)), off * 8 + 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        cols.append(
            F.array_min(F.transform(sh, lambda s: h(s))).alias(f"sig_{i}")
        )
    return cols
