"""Trigram fuzzy search — the pg_trgm GIN path of the reference.

The reference creates a GIN trigram index on message text
(poc/src/core/models.py:188 `gin_trgm_ops`; alembic 15e9cd5477d0:24) so the
API can do typo-tolerant matching ranked by trigram similarity.  Spark-first
rebuild of the same two-phase GIN shape:

  1. candidate generation = inverted lookup: explode each doc's distinct
     character trigrams and keep ONLY rows whose trigram is one of the
     query's trigrams (a literal IN-list -> pushdown-friendly, exactly the
     posting-list probe a GIN index performs).  Docs sharing zero trigrams
     are never shuffled or scored.
  2. exact rank = set similarity on the candidates:
         sim(d, q) = |T(d) ∩ T(q)| / |T(d) ∪ T(q)|
     (pg_trgm's similarity()), computed from the per-doc shared-trigram
     count + the doc's distinct-trigram count — one hash aggregation.

Trigram definition here: sliding 3-char windows over lower(text) (distinct
set).  pg_trgm additionally word-pads ('  w '); the windowing is the
operator semantics that carries over, and both engines below compute the
identical definition so the oracle is exact.

At 10^12 docs the explode+filter is a narrow map-side scan; only candidate
rows (docs sharing >= 1 of the <= |q| trigrams) enter the single shuffle —
the same reason pg_trgm probes posting lists instead of scanning the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE

SIM_DECIMALS = 5


def _query_trigrams(q: str) -> list[str]:
    s = q.lower()
    return sorted({s[i : i + 3] for i in range(max(len(s) - 2, 0))})


def _doc_trigrams_col(lt: str = "_lt") -> F.Column:
    """Distinct 3-char windows of an ALREADY-LOWERED text column `lt`;
    empty array for text < 3 chars (guarded — Spark's sequence(1, 0)
    would count DOWN).

    `lt` must be a materialized column, not the lower(text) expression:
    a lambda body re-evaluates any non-attribute expression it references
    PER ELEMENT (the tokenize-once rule, NOTES_r4 session 9), which here
    turns an L-char doc into O(L^2) lowercasing work — measured 2.4x on
    the 200k-doc trigram build."""
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, length({lt}) - 2),"
            f" i -> substring({lt}, i, 3))"
        )
    )
    return F.when(
        F.length(F.col(lt)) < 3, F.array().cast("array<string>")
    ).otherwise(grams)


def _with_grams(corpus: DataFrame) -> DataFrame:
    """(doc_id, url, grams) with the lowered text bound as a real column
    so the trigram window transform touches an attribute, never an
    expression."""
    return corpus.select(
        "doc_id", "url", F.lower(F.col("text")).alias("_lt")
    ).select("doc_id", "url", _doc_trigrams_col().alias("grams"))


def fuzzy_topk(corpus: DataFrame, q: str, k: int = 10) -> DataFrame:
    """Top-k docs by trigram similarity to `q` (typo-tolerant match).

    Plan: the query's trigram set is a literal array, so the probe is ONE
    map-side `array_intersect` per doc — no explode (a 1k-trigram doc
    would otherwise fan out 1k rows), no aggregation shuffle; the only
    wide op is the final TakeOrdered top-k.  Docs sharing zero trigrams
    are filtered map-side (the GIN-candidate property)."""
    qgrams = _query_trigrams(q)
    spark = corpus.sparkSession
    if not qgrams:
        return spark.createDataFrame([], "doc_id long, url string, sim double")
    n_q = len(qgrams)
    qarr = F.array(*[F.lit(g) for g in qgrams])
    docs = _with_grams(corpus)
    shared = F.size(F.array_intersect(F.col("grams"), qarr))
    return (
        docs.withColumn("shared", shared)
        .filter(F.col("shared") > 0)
        .withColumn(
            "sim",
            F.round(
                F.col("shared")
                / (F.size("grams") + F.lit(n_q) - F.col("shared")),
                SIM_DECIMALS,
            ),
        )
        .select("doc_id", "url", "sim")
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(k)
    )


# --- index-backed path (the actual GIN analogue) ------------------------------

N_GRAM_BUCKETS = 64


def build_trigram_index(corpus: DataFrame, out_dir: str) -> None:
    """Materialize the trigram GIN: posting rows (g, doc_id, n_grams)
    partitioned by gbucket = pmod(xxhash64(g), 64) — a k-trigram query
    prunes to <= k of the 64 bucket dirs (same layout discipline as the
    term postings).  Each posting row carries the doc's distinct-trigram
    count (|T(d)|, the similarity denominator) DENORMALIZED — the same
    norms-travel-with-postings discipline as dl_bytes in the BM25 blocks —
    so scoring never joins the corpus-sized docs table; docs is only the
    k-row url lookup."""
    # persisted across the two writes: the trigram window pass runs once,
    # not once per output table
    docs = _with_grams(corpus).persist()
    docs.select(
        "doc_id", "url", F.size("grams").cast("int").alias("n_grams")
    ).write.mode("overwrite").parquet(f"{out_dir}/docs")
    (
        docs.select(
            "doc_id",
            F.size("grams").cast("int").alias("n_grams"),
            F.explode("grams").alias("g"),
        )
        .withColumn("gbucket", F.pmod(F.xxhash64("g"), F.lit(N_GRAM_BUCKETS)))
        # files sorted by (g, doc_id) inside each bucket: the driver-local
        # probe's load-time grouping detects sortedness and skips its
        # string argsort (the cold-probe hot spot), parquet row-group
        # min/max on g tightens the indexed probe's pushed IN filter, and
        # per-trigram doc lists come out doc_id-ordered for free
        .repartition("gbucket")
        .sortWithinPartitions("g", "doc_id")
        .write.mode("overwrite")
        .partitionBy("gbucket")
        .parquet(f"{out_dir}/grams")
    )


def fuzzy_topk_indexed(spark, index_dir: str, q: str, k: int = 10) -> DataFrame:
    """fuzzy_topk served from the materialized trigram index: probe only
    the query trigrams' posting buckets (partition pruning + pushed IN
    filter — the GIN posting-list probe), count shared grams per doc, join
    the tiny top-k against the docs table.  Result-identical to the
    scan-time fuzzy_topk (same oracle)."""
    from ..functions.xxhash import term_bucket

    qgrams = _query_trigrams(q)
    if not qgrams:
        return spark.createDataFrame([], "doc_id long, url string, sim double")
    n_q = len(qgrams)
    # bucket literals hashed driver-side (bit-identical pure-Python XXH64)
    # — no Spark job before the single probe job
    buckets = sorted({term_bucket(g, N_GRAM_BUCKETS) for g in qgrams})
    grams = (
        spark.read.parquet(f"{index_dir}/grams")
        .filter(F.col("gbucket").isin(buckets))
        .filter(F.col("g").isin(qgrams))
    )
    # n_grams rides the posting rows (denormalized at build) — scoring and
    # top-k happen WITHOUT touching the corpus-sized docs table; only the
    # k winners join docs for the url (broadcast of k rows)
    topk = (
        grams.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.first("n_grams").alias("n_grams"),
        )
        .withColumn(
            "sim",
            F.round(
                F.col("shared")
                / (F.col("n_grams") + F.lit(n_q) - F.col("shared")),
                SIM_DECIMALS,
            ),
        )
        .select("doc_id", "sim")
        .orderBy(F.desc("sim"), F.asc("doc_id"))
        .limit(k)
    )
    docs = spark.read.parquet(f"{index_dir}/docs").select("doc_id", "url")
    return (
        docs.join(F.broadcast(topk), "doc_id", "inner")
        .select("doc_id", "url", "sim")
        .orderBy(F.desc("sim"), F.asc("doc_id"))
    )


def fuzzy_topk_local(
    index_dir: str, q: str, k: int = 10, cache: dict | None = None
) -> list[tuple]:
    """Low-latency fuzzy probe: the driver acts as the query node (the
    fuzzy analogue of wand_topk_local) — read ONLY the query trigrams'
    gbucket dirs via pyarrow (dictionary/row-group pushdown), score in
    numpy, no Spark job in the loop.  `cache` (optional dict) keeps
    per-bucket gram tables hot across a query stream, the GIN page cache
    a query node would hold.

    Returns [(doc_id, sim), ...] — rank-identical to fuzzy_topk_indexed
    (url lookup is the caller's k-row concern)."""
    import numpy as np
    import pyarrow.dataset as ds

    from ..functions.xxhash import term_bucket

    qgrams = _query_trigrams(q)
    if not qgrams:
        return []
    n_q = len(qgrams)
    by_bucket: dict[int, list[str]] = {}
    for g in qgrams:
        by_bucket.setdefault(term_bucket(g, N_GRAM_BUCKETS), []).append(g)

    _EMPTY_LIST = (
        np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    )

    def _gram_lists(
        b: int, grams: list[str]
    ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """{trigram: (doc_ids, n_grams)} for the query's trigrams in one
        gbucket dir.  Cache granularity is PER TRIGRAM (the GIN page-cache
        shape): a cold trigram costs one filtered pyarrow read — the
        bucket files are written sorted by g (build_trigram_index), so
        parquet row-group min/max statistics prune the scan to the
        trigram's own pages instead of materializing the whole bucket."""
        out = {}
        missing = []
        for g in grams:
            hit = None if cache is None else cache.get(("g", g))
            if hit is not None:
                out[g] = hit
            else:
                missing.append(g)
        if not missing:
            return out
        try:
            tbl = ds.dataset(
                f"{index_dir}/grams/gbucket={b}", format="parquet"
            ).to_table(
                columns=["doc_id", "n_grams", "g"],
                filter=ds.field("g").isin(missing),
            )
        except FileNotFoundError:
            # no corpus trigram hashed into this bucket (small indexes):
            # every queried trigram here has an empty posting list
            for g in missing:
                out[g] = _EMPTY_LIST
                if cache is not None:
                    cache[("g", g)] = _EMPTY_LIST
            return out
        gs = tbl["g"].to_numpy(zero_copy_only=False)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ngs = tbl["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        # written sorted by g; the O(n) check covers pre-round-4 layouts
        if gs.size and not np.all(gs[:-1] <= gs[1:]):
            order = np.argsort(gs, kind="stable")
            gs, ids, ngs = gs[order], ids[order], ngs[order]
        uniq, starts = np.unique(gs, return_index=True)
        bounds = np.concatenate((starts[1:], [gs.size]))
        found = {
            str(u): (ids[s:e], ngs[s:e])
            for u, s, e in zip(uniq, starts, bounds)
        }
        for g in missing:
            lst = found.get(g, _EMPTY_LIST)
            out[g] = lst
            if cache is not None:
                cache[("g", g)] = lst
        return out

    id_parts, ng_parts = [], []
    for b, gs in sorted(by_bucket.items()):
        lists = _gram_lists(b, gs)
        for g in gs:
            hit = lists[g]
            if hit[0].size:
                id_parts.append(hit[0])
                ng_parts.append(hit[1])
    if not id_parts:
        return []
    ids = np.concatenate(id_parts)
    ng = np.concatenate(ng_parts)
    max_id = int(ids.max())
    if max_id < (1 << 26):
        # dense id space (the build assigns sequential internal doc ids):
        # counting sort — shared-gram counts via ONE bincount pass and a
        # scatter for the per-doc gram totals, no O(n log n) argsort.
        # This is the warm-probe hot loop: the query's trigram posting
        # lists total ~|corpus| ids for common trigrams.
        shared_all = np.bincount(ids, minlength=max_id + 1)
        ngmap = np.zeros(max_id + 1, dtype=np.int64)
        ngmap[ids] = ng
        uniq = np.nonzero(shared_all)[0]
        shared = shared_all[uniq]
        n_grams = ngmap[uniq]
    else:
        # sparse 64-bit id space: sort-based grouping
        order = np.argsort(ids, kind="stable")
        ids, ng = ids[order], ng[order]
        uniq, starts, shared = np.unique(
            ids, return_index=True, return_counts=True
        )
        n_grams = ng[starts]
    sim = np.round(shared / (n_grams + n_q - shared), SIM_DECIMALS)
    top = min(k, uniq.size)
    sel = np.lexsort((uniq, -sim))[:top]
    return [(int(uniq[i]), float(sim[i])) for i in sel]


def fuzzy_topk_sql(q: str, k: int = 10) -> str:
    qgrams = _query_trigrams(q)
    n_q = len(qgrams)
    qlist = "[" + ", ".join("'" + g.replace("'", "''") + "'" for g in qgrams) + "]"
    return f"""
WITH {CORPUS_CTE.strip()},
docs AS (
  SELECT doc_id, url,
         CASE WHEN len(lower(text)) < 3 THEN []
              ELSE list_distinct(list_transform(
                  range(1, len(lower(text)) - 1),
                  i -> substr(lower(text), i, 3)))
         END AS grams
  FROM corpus
),
probed AS (
  SELECT doc_id, url, grams,
         len(list_intersect(grams, {qlist})) AS shared
  FROM docs
)
SELECT doc_id, url,
       round(shared / (len(grams) + {n_q} - shared), {SIM_DECIMALS}) AS sim
FROM probed
WHERE shared > 0
ORDER BY sim DESC, doc_id ASC
LIMIT {k}
"""
