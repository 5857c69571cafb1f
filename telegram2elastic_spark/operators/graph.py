"""Graph-ranking operators over corpus-derived graphs — the PageRank /
HITS family every web-scale pipeline eventually runs (link-authority
scoring, TextRank keyword extraction, graph-based quality signals).

The reference delegates all ranking to Elasticsearch (it has no graph
surface); these are first-class web-pipeline additions in the spirit of
Brin & Page 1998 (PageRank) and Kleinberg 1999 (HITS), re-expressed as
fixed-iteration Spark plans with exact DuckDB oracles.

Determinism contract: ALL rank arithmetic is integer (ranks live in
micro-units of 1e-9, damping 0.85 as the exact rational 85/100, every
division a floor division on non-negative integers).  Integer addition
is associative, so per-node sums are partitioning- and engine-order
independent — the two engines produce bit-identical ranks with NO float
anywhere.  Intermediate products are computed in DECIMAL(38,0) (Spark)
/ HUGEINT (DuckDB) so `rank * weight` cannot overflow int64 even at
10^12-token co-occurrence counts; quotients always fit BIGINT because
weight <= out-weight implies quotient <= rank, and total rank mass is
bounded by n_nodes * UNIT (sum_i r'_i = n*BASE + 0.85 * sum of floored
contributions <= n * UNIT at every step).

Scale shape (both ops): each iteration is ONE equi-join of the rank
table against the static edge relation plus ONE keyed hash agg with
map-side combine — the canonical distributed PageRank step.  The edge
relation is built once and persisted; iteration count is a fixed small
constant (diameter-independent by design: these are ranking scores, not
fixpoints), so the whole computation is `iters` shuffles over data no
larger than the posting relation the index build already shuffles.

Reference analogue: none (ES has no PageRank); cited instead to the
web-pipeline role — link-graph authority is a standard crawl-quality
feature, TextRank a standard keyword extractor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE, tokens

# One rank unit = 1e-9 of probability mass per node.
UNIT = 1_000_000_000
# Damping d = 0.85 as the exact rational 85/100; BASE = (1-d) * UNIT.
DAMP_NUM = 85
DAMP_DEN = 100
BASE = (DAMP_DEN - DAMP_NUM) * UNIT // DAMP_DEN  # 150_000_000


def _cooc_pairs(corpus: DataFrame, window: int) -> DataFrame:
    """Unordered (w1 < w2) co-occurring token pairs within `window`
    positions, one row per occurrence — array-side generation (window
    offsets unrolled as zip_with slices), zero self-join.  Same shape
    as training.skipgram_counts, minus self-pairs (w1 == w2): TextRank
    graphs carry no self-loops."""
    toks = corpus.select(tokens("text").alias("toks"))
    arrays = []
    for off in range(1, window + 1):
        arrays.append(
            F.zip_with(
                F.slice(
                    F.col("toks"), 1, F.greatest(F.size("toks") - off, F.lit(0))
                ),
                F.slice(
                    F.col("toks"),
                    off + 1,
                    F.greatest(F.size("toks") - off, F.lit(0)),
                ),
                lambda a, b: F.struct(
                    F.least(a, b).alias("w1"), F.greatest(a, b).alias("w2")
                ),
            )
        )
    return (
        toks.select(F.explode(F.concat(*arrays)).alias("p"))
        .select("p.w1", "p.w2")
        .filter(F.col("w1") != F.col("w2"))
    )


def _cooc_sql(window: int) -> str:
    arrays = []
    for off in range(1, window + 1):
        arrays.append(
            f"list_transform(range(1, greatest(len(toks) - {off}, 0) + 1), "
            f"i -> {{'w1': least(toks[i], toks[i + {off}]), "
            f"'w2': greatest(toks[i], toks[i + {off}])}})"
        )
    concat = " || ".join(arrays)
    return f"""
tokd AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
pairs AS (
  SELECT p.w1 AS w1, p.w2 AS w2
  FROM tokd, LATERAL (SELECT unnest({concat}) AS p)
  WHERE p.w1 <> p.w2
)"""


def textrank_terms(
    corpus: DataFrame, window: int = 2, iters: int = 3, k: int = 20
) -> DataFrame:
    """Top-k (term, rank) — TextRank (Mihalcea & Tarau 2004) over the
    corpus-level term co-occurrence graph: undirected edges between
    tokens within `window` positions, weighted by occurrence count;
    `iters` damped power-iteration rounds in exact integer arithmetic.

        r0(v)  = UNIT
        r_t(v) = BASE + (85 * sum_{(u,v)} floor(r_{t-1}(u) * w_uv
                                                 / outw_u)) DIV 100

    Isolated terms (tokens never adjacent to a DIFFERENT token — only
    possible in single-token or constant-token docs) have no edges and
    are excluded from the graph in both engines.  Every graph node has
    in-edges (the graph is symmetric), so the per-round inner join
    drops nothing.

    Scale shape: the co-occurrence edge relation (vocab-pair-sized,
    built with one hash agg from array-side pair generation) is
    persisted once; each round = one equi-join on src + one hash agg
    on dst.  At 10^12 tokens the edge relation is the bigram dictionary
    — millions of rows, not corpus-sized; the iteration never touches
    the corpus again.
    """
    window, iters, k = int(window), int(iters), int(k)
    if window < 1 or iters < 1:
        raise ValueError("window and iters must be >= 1")
    und = (
        _cooc_pairs(corpus, window)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    sym = und.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst"), "w"
    ).unionByName(
        und.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), "w")
    )
    outw = sym.groupBy("src").agg(F.sum("w").alias("outw"))
    edges = sym.join(outw, "src").persist()
    ranks = outw.select(
        F.col("src").alias("term"), F.lit(UNIT).cast("long").alias("rank")
    )
    for _ in range(iters):
        # shuffle_hash, never broadcast: at web scale the rank table is
        # vocab-sized (10^8+ rows) and MUST shuffle; locally the hint also
        # keeps AQE from broadcasting the (larger) edge side.
        contrib = edges.join(
            ranks.hint("shuffle_hash"), edges["src"] == ranks["term"]
        ).select(
            "dst",
            # DECIMAL(38,0) product -> floor quotient fits BIGINT
            # (w <= outw implies quotient <= rank).
            F.expr(
                "CAST(rank AS DECIMAL(38,0)) * w DIV outw"
            ).alias("c"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("s"))
            .select(
                F.col("dst").alias("term"),
                F.expr(
                    f"CAST({BASE} + ({DAMP_NUM} * s) DIV {DAMP_DEN} AS BIGINT)"
                ).alias("rank"),
            )
        )
    # materialize the k-row answer, then release the edge cache — graph
    # ops run inside long-lived sessions (bench, serve loops) and the
    # intermediates must not stay resident
    out = ranks.orderBy(F.desc("rank"), F.asc("term")).limit(k).localCheckpoint()
    edges.unpersist()
    return out


def textrank_terms_sql(window: int = 2, iters: int = 3, k: int = 20) -> str:
    """Oracle: the identical integer recurrence with the iterations
    unrolled as CTEs r1..r{iters} (HUGEINT intermediates)."""
    window, iters, k = int(window), int(iters), int(k)
    rounds = []
    for t in range(1, iters + 1):
        prev = "r0" if t == 1 else f"r{t - 1}"
        rounds.append(
            f"""r{t} AS (
  SELECT e.dst AS term,
         CAST({BASE} + ({DAMP_NUM} * sum(
             CAST(r.rank AS HUGEINT) * e.w // e.outw)) // {DAMP_DEN}
              AS BIGINT) AS rank
  FROM edges e JOIN {prev} r ON e.src = r.term
  GROUP BY e.dst
)"""
        )
    unrolled = ",\n".join(rounds)
    return f"""
WITH {CORPUS_CTE.strip()},
{_cooc_sql(window).strip()},
und AS (
  SELECT w1, w2, count(*) AS w FROM pairs GROUP BY w1, w2
),
sym AS (
  SELECT w1 AS src, w2 AS dst, w FROM und
  UNION ALL
  SELECT w2 AS src, w1 AS dst, w FROM und
),
outw AS (
  SELECT src, sum(w) AS outw FROM sym GROUP BY src
),
edges AS (
  SELECT s.src, s.dst, s.w, o.outw FROM sym s JOIN outw o USING (src)
),
r0 AS (
  SELECT src AS term, CAST({UNIT} AS BIGINT) AS rank FROM outw
),
{unrolled}
SELECT term, rank FROM r{iters}
ORDER BY rank DESC, term ASC
LIMIT {k}
"""


def textrank_seeded(
    corpus: DataFrame,
    seeds: list[str],
    window: int = 2,
    iters: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-k (term, rank) — PERSONALIZED PageRank (random walk with
    restart) over the same term co-occurrence graph as textrank_terms:
    the restart mass (0.15 * UNIT * n_nodes, the total the uniform
    variant spreads as BASE per node) is concentrated on the `seeds`
    present in the graph, so ranks measure `iters`-step walk proximity
    to the seed set — query-biased keyword extraction (Haveliwala 2002,
    topic-sensitive PageRank).

        base(v) = (15 * UNIT * n_nodes) DIV (100 * n_seeds)  if v in seeds
                  0                                           otherwise
        r0      = base
        r_t(v)  = base(v) + (85 * sum floor-contributions) DIV 100

    Same exact-integer contract as textrank_terms (DECIMAL(38,0)
    intermediates); n_nodes and the surviving-seed count are two driver
    ints from one vocab-sized agg, so `base` is an exact Python-int
    literal.  Seeds absent from the graph are ignored; raises if none
    remain.
    """
    window, iters, k = int(window), int(iters), int(k)
    if window < 1 or iters < 1:
        raise ValueError("window and iters must be >= 1")
    seeds = sorted(set(seeds))
    if not seeds:
        raise ValueError("seeds must be non-empty")
    und = (
        _cooc_pairs(corpus, window)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    sym = und.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst"), "w"
    ).unionByName(
        und.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), "w")
    )
    outw = sym.groupBy("src").agg(F.sum("w").alias("outw"))
    edges = sym.join(outw, "src").persist()
    # n_nodes / surviving-seed count are two driver ints; base is then an
    # exact Python-int literal, and absent seeds fail fast here.  The agg
    # reads the PERSISTED edges (distinct src == outw's key set) rather
    # than the outw subtree: as a separate eager job the latter re-ran
    # the whole co-occurrence aggregation a second time (no cross-job
    # exchange reuse — r6); this way the action doubles as the edge-cache
    # materialization the iteration reuses.
    nn, ns = (
        edges.select("src")
        .distinct()
        .agg(
            F.count(F.lit(1)),
            F.sum(
                F.when(F.col("src").isin(seeds), F.lit(1)).otherwise(F.lit(0))
            ),
        )
        .first()
    )
    if not ns:
        raise ValueError("no seed term co-occurs in the corpus graph")
    base_val = ((DAMP_DEN - DAMP_NUM) * UNIT * int(nn)) // (DAMP_DEN * int(ns))

    def base_col(term_col: str):
        return F.when(
            F.col(term_col).isin(seeds), F.lit(base_val).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    ranks = outw.select(
        F.col("src").alias("term"), base_col("src").alias("rank")
    )
    for _ in range(iters):
        contrib = edges.join(
            ranks.hint("shuffle_hash"), edges["src"] == ranks["term"]
        ).select(
            "dst",
            F.expr("CAST(rank AS DECIMAL(38,0)) * w DIV outw").alias("c"),
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum(F.col("c").cast("decimal(38,0)")).alias("s"))
            .select(
                F.col("dst").alias("term"),
                (
                    base_col("dst")
                    + F.expr(
                        f"CAST(({DAMP_NUM} * s) DIV {DAMP_DEN} AS BIGINT)"
                    )
                ).alias("rank"),
            )
        )
    out = ranks.orderBy(F.desc("rank"), F.asc("term")).limit(k).localCheckpoint()
    edges.unpersist()
    return out


def textrank_seeded_sql(
    seeds: list[str], window: int = 2, iters: int = 3, k: int = 20
) -> str:
    """Oracle: identical integer recurrence, iterations unrolled;
    n_nodes / n_seeds as scalar subqueries over the node set."""
    window, iters, k = int(window), int(iters), int(k)
    seeds = sorted(set(seeds))
    inlist = ", ".join("'" + s.replace("'", "''") + "'" for s in seeds)
    base = (
        f"CASE WHEN {{col}} IN ({inlist}) THEN CAST("
        f"{DAMP_DEN - DAMP_NUM} * CAST({UNIT} AS HUGEINT)"
        f" * (SELECT count(*) FROM outw)"
        f" // ({DAMP_DEN} * (SELECT count(*) FROM outw"
        f" WHERE src IN ({inlist}))) AS BIGINT) ELSE 0 END"
    )
    rounds = []
    for t in range(1, iters + 1):
        prev = "r0" if t == 1 else f"r{t - 1}"
        rounds.append(
            f"""r{t} AS (
  SELECT e.dst AS term,
         {base.format(col="e.dst")}
         + CAST(({DAMP_NUM} * sum(
             CAST(r.rank AS HUGEINT) * e.w // e.outw)) // {DAMP_DEN}
                AS BIGINT) AS rank
  FROM edges e JOIN {prev} r ON e.src = r.term
  GROUP BY e.dst
)"""
        )
    unrolled = ",\n".join(rounds)
    return f"""
WITH {CORPUS_CTE.strip()},
{_cooc_sql(window).strip()},
und AS (
  SELECT w1, w2, count(*) AS w FROM pairs GROUP BY w1, w2
),
sym AS (
  SELECT w1 AS src, w2 AS dst, w FROM und
  UNION ALL
  SELECT w2 AS src, w1 AS dst, w FROM und
),
outw AS (
  SELECT src, sum(w) AS outw FROM sym GROUP BY src
),
edges AS (
  SELECT s.src, s.dst, s.w, o.outw FROM sym s JOIN outw o USING (src)
),
r0 AS (
  SELECT src AS term, {base.format(col="src")} AS rank FROM outw
),
{unrolled}
SELECT term, rank FROM r{iters}
ORDER BY rank DESC, term ASC
LIMIT {k}
"""


def hits_authorities(
    corpus: DataFrame, iters: int = 2, k: int = 20
) -> DataFrame:
    """Top-k (term, auth) — HITS (Kleinberg 1999) on the doc-term
    bipartite presence graph: docs are hubs, terms authorities.

        a0(term) = UNIT
        h(doc)   = sum of a(term) over the doc's DISTINCT terms,
                   then normalized hn = (h * UNIT) DIV max(h)
        a(term)  = sum of hn(doc) over docs containing term,
                   then normalized an = (a * UNIT) DIV max(a)

    one (h, a) pair of half-steps per iteration; max-normalization (the
    standard HITS stabilizer) replaces the L2 norm so the arithmetic
    stays integer-exact — ranks are engine- and partition-order
    independent (integer sums are associative; the max is a 1-row
    broadcast in Spark, a scalar subquery in DuckDB).

    Scale shape: the presence relation IS the (doc, term) posting
    relation the index build already materializes; each half-step is
    one keyed hash agg over it plus a 1-row broadcast for the max —
    `iters` passes, no self-join, no window.
    """
    iters, k = int(iters), int(k)
    if iters < 1:
        raise ValueError("iters must be >= 1")
    # Two cached layouts of the presence relation, pre-partitioned on
    # each half-step's join key (r6): every iteration joins pres once on
    # `term` and once on `doc_id`, and a single-layout cache re-shuffled
    # the (corpus-sized) relation per join — 2 shuffles x iters.  A
    # repartition("term") BEFORE the dedup clusters every (doc_id, term)
    # duplicate into one partition, so the distinct aggregate needs no
    # further exchange and the cache comes out hash(term)-partitioned;
    # the doc_id layout is one reshuffle of the deduped rows.  Joins
    # against them then exchange only the (much smaller) rank tables.
    pres_t = (
        corpus.select(
            F.col("doc_id"), F.explode(tokens("text")).alias("term")
        )
        .repartition("term")
        .dropDuplicates(["doc_id", "term"])
        .persist()
    )
    pres_d = pres_t.repartition("doc_id").persist()
    cached = [pres_t, pres_d]
    auth = pres_t.select("term").distinct().select(
        "term", F.lit(UNIT).cast("long").alias("a")
    )
    for _ in range(iters):
        # shuffle_hash on the rank tables (vocab- / corpus-sized at web
        # scale — never broadcastable); only the 1-row max is broadcast.
        # Each half-step is persisted: its result is consumed TWICE (the
        # 1-row max subquery + the normalized join) and feeds the next
        # half-step — without the cache the join subtrees recompute
        # exponentially across iterations (measured 34 s -> ~8 s at the
        # 200k-doc bench).
        hub = (
            pres_t.join(auth.hint("shuffle_hash"), "term")
            .groupBy("doc_id")
            .agg(F.sum(F.col("a").cast("decimal(38,0)")).alias("h"))
            .persist()
        )
        cached.append(hub)
        hmax = hub.agg(F.max("h").alias("hmax"))
        hubn = hub.crossJoin(F.broadcast(hmax)).select(
            "doc_id",
            F.expr(f"CAST(h * {UNIT} DIV hmax AS BIGINT)").alias("hn"),
        )
        auth_raw = (
            pres_d.join(hubn.hint("shuffle_hash"), "doc_id")
            .groupBy("term")
            .agg(F.sum(F.col("hn").cast("decimal(38,0)")).alias("araw"))
            .persist()
        )
        cached.append(auth_raw)
        amax = auth_raw.agg(F.max("araw").alias("amax"))
        auth = auth_raw.crossJoin(F.broadcast(amax)).select(
            "term",
            F.expr(f"CAST(araw * {UNIT} DIV amax AS BIGINT)").alias("a"),
        )
    out = (
        auth.select("term", F.col("a").alias("auth"))
        .orderBy(F.desc("auth"), F.asc("term"))
        .limit(k)
        .localCheckpoint()  # k rows; frees the iteration caches below
    )
    for df in cached:
        df.unpersist()
    return out


def hits_authorities_sql(iters: int = 2, k: int = 20) -> str:
    iters, k = int(iters), int(k)
    rounds = []
    for t in range(1, iters + 1):
        prev = "a0" if t == 1 else f"a{t - 1}"
        rounds.append(
            f"""h{t} AS (
  SELECT p.doc_id, sum(CAST(a.a AS HUGEINT)) AS h
  FROM pres p JOIN {prev} a USING (term)
  GROUP BY p.doc_id
),
hn{t} AS (
  SELECT doc_id,
         CAST(h * {UNIT} // (SELECT max(h) FROM h{t}) AS BIGINT) AS hn
  FROM h{t}
),
a{t} AS (
  SELECT p.term,
         CAST(sum(CAST(hh.hn AS HUGEINT)) * {UNIT}
              // (SELECT max(s) FROM (
                    SELECT sum(CAST(hh2.hn AS HUGEINT)) AS s
                    FROM pres p2 JOIN hn{t} hh2 USING (doc_id)
                    GROUP BY p2.term))
              AS BIGINT) AS a
  FROM pres p JOIN hn{t} hh USING (doc_id)
  GROUP BY p.term
)"""
        )
    unrolled = ",\n".join(rounds)
    return f"""
WITH {CORPUS_CTE.strip()},
pres AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(
             regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
             t -> t <> '')) AS term
  FROM corpus
),
a0 AS (
  SELECT DISTINCT term, CAST({UNIT} AS BIGINT) AS a FROM pres
),
{unrolled}
SELECT term, a AS auth FROM a{iters}
ORDER BY auth DESC, term ASC
LIMIT {k}
"""


# --------------------------------------------------------------------------
# Triangle counting (degree-ordered orientation — Suri & Vassilvitskii 2011)
# --------------------------------------------------------------------------

def triangle_counts(corpus: DataFrame, window: int = 2, k: int = 20) -> DataFrame:
    """Per-node triangle counts over the DISTINCT-edge co-occurrence
    graph, top-k by (triangles desc, term asc) — the clustering-structure
    signal next to TextRank/HITS (triangle-rich neighborhoods = topical
    cliques; the same operator counts link-graph triangles at crawl
    scale).

    Scale shape — the canonical MapReduce triangle algorithm: every
    undirected edge is ORIENTED from the lower to the higher endpoint in
    the total order pi(v) = (degree(v), v).  Each node's out-degree in
    the oriented graph is O(sqrt(|E|)) regardless of its raw degree, so
    the wedge join (oriented ⋈ oriented on src) never explodes on hubs —
    the whole computation is two equi-joins + one hash agg over the edge
    relation, no per-node adjacency materialization.  Every triangle is
    generated exactly once (its pi-least vertex is the wedge apex).

    All arithmetic is integer; output is engine- and partition-exact.
    """
    edges = _cooc_pairs(corpus, window).distinct()
    deg = (
        edges.select(F.col("w1").alias("v"))
        .unionAll(edges.select(F.col("w2").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        edges.join(deg.withColumnRenamed("v", "w1").withColumnRenamed("d", "d1"), "w1")
        .join(deg.withColumnRenamed("v", "w2").withColumnRenamed("d", "d2"), "w2")
    )
    lower_first = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("w1") < F.col("w2"))
    )
    oriented = e.select(
        F.when(lower_first, F.col("w1")).otherwise(F.col("w2")).alias("src"),
        F.when(lower_first, F.col("w2")).otherwise(F.col("w1")).alias("dst"),
        F.when(lower_first, F.col("d2")).otherwise(F.col("d1")).alias("ddst"),
    )
    o1 = oriented.select(
        F.col("src"), F.col("dst").alias("b"), F.col("ddst").alias("db")
    )
    o2 = oriented.select(
        F.col("src"), F.col("dst").alias("c"), F.col("ddst").alias("dc")
    )
    # wedges at the pi-least apex, (b, c) in pi order — each triangle once
    wedges = o1.join(o2, "src").where(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tris = wedges.join(closing, ["b", "c"]).select("src", "b", "c")
    per_node = (
        tris.select(F.explode(F.array("src", "b", "c")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return per_node.orderBy(F.desc("triangles"), "term").limit(k)


def triangle_counts_sql(window: int = 2, k: int = 20) -> str:
    """Oracle: same orientation construction; the triangle relation is
    the plain 3-way edge join (the reference semantics the oriented plan
    must reproduce)."""
    return f"""
WITH {CORPUS_CTE.strip()},
{_cooc_sql(int(window)).strip().lstrip(',').strip()},
edges AS (SELECT DISTINCT w1, w2 FROM pairs),
tris AS (
  -- independent of the engine's degree orientation: a triangle a<b<c
  -- (lexically) appears as exactly the edge triple (a,b),(a,c),(b,c)
  -- in the w1<w2 edge relation
  SELECT e1.w1 AS a, e1.w2 AS b, e2.w2 AS c
  FROM edges e1
  JOIN edges e2 ON e2.w1 = e1.w1 AND e2.w2 > e1.w2
  JOIN edges e3 ON e3.w1 = e1.w2 AND e3.w2 = e2.w2)
SELECT term, count(*) AS triangles FROM (
  SELECT a AS term FROM tris
  UNION ALL SELECT b FROM tris
  UNION ALL SELECT c FROM tris)
GROUP BY term ORDER BY triangles DESC, term LIMIT {k}"""
