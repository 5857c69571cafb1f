"""ES aggregations alongside search hits: facet buckets and
significant_terms.

The reference serves faceted dashboards from Elasticsearch/Kibana over its
message indices (README.md:5); an ES search request carries an `aggs`
block evaluated over the SAME filtered document set as the hits.  Both
operators here take the search pipeline's filter stage (query/search.py
`search_filtered` — substring + score + spam predicates, pushdown-
friendly) and aggregate over the surviving set.

`search_facets` — terms-bucket facets for several fields in ONE pass via
grouping sets (lang buckets + source buckets + the grand total share one
shuffle; Spark plans a single Expand + hash aggregate, map-side partial).

`significant_terms` — ES's "what is unusual about these hits" bucket:
terms scored by JLH = (fg% - bg%) * (fg% / bg%), foreground = term share
inside the filtered set, background = share over the whole corpus.  Both
sides are one tokenize->explode->agg each; the per-term join is
vocab-sized, the output is top-k.  At 100 TB the background table is the
index's own term_dict (df already materialized) — wired here from the
corpus for oracle exactness, with df identical to term_dict's by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE, tokens
from .bm25 import SCORE_DECIMALS
from .search import SCORE_SQL, SPAM_SQL, _filters_sql, search_filtered


def search_facets(
    corpus: DataFrame,
    q: str | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """(lang, source, cnt) buckets over the filtered search set via
    grouping sets: one row per lang (source NULL), one per source (lang
    NULL), one grand total (both NULL) — a single Expand+agg pass."""
    df = search_filtered(corpus, q, min_score)
    return (
        df.groupingSets([["lang"], ["source"], []], "lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("lang", "source")
    )


def search_facets_sql(q: str | None = None, min_score: float | None = None) -> str:
    # HAVING cnt > 0 only affects the empty-foreground corner: standard SQL
    # emits the () grand-total row (cnt=0) over empty input, Spark's
    # groupingSets emits nothing — the guard pins both to "no buckets".
    where = _filters_sql(q, min_score, None)
    return f"""
WITH {CORPUS_CTE.strip()},
scored AS (SELECT *, {SCORE_SQL} AS score FROM corpus),
fset AS (SELECT * FROM scored WHERE {where})
SELECT lang, source, count(*) AS cnt
FROM fset
GROUP BY GROUPING SETS ((lang), (source), ())
HAVING count(*) > 0
ORDER BY lang NULLS FIRST, source NULLS FIRST
"""


def significant_terms(
    corpus: DataFrame,
    q: str | None = None,
    min_score: float | None = None,
    k: int = 20,
    min_doc_count: int = 3,
    index: dict | None = None,
    background_lang: str | None = None,
    heuristic: str = "jlh",
) -> DataFrame:
    """Top-k (term, fg_count, bg_count, jlh|sig) over the filtered set.

    `heuristic` selects the ES significance heuristic: "jlh" (default,
    scored into `jlh`), "mutual_information", "chi_square", "gnd" or
    "percentage" (scored into `sig`).  The NXY heuristics use ES's
    background_is_superset
    contingency cells with include_negatives=true:
        n11 = f           n01 = F - f
        n10 = n - f       n00 = N - F - n + f      (total = N)
    where f/F are foreground/background doc frequencies and n/N the set
    sizes.  chi_square = N * (n11*n00 - n01*n10)^2 / (margin product)
    (0 when a margin is empty); mutual_information = sum over cells of
    (Nxy/N) * log2(N*Nxy / (Nx*Ny)) with empty cells contributing 0.
    Cells are cast to double BEFORE multiplying — n11*n00 at 10^12 docs
    overflows int64.  The superset cells require the foreground to be a
    subset of the background, so these heuristics reject
    `background_lang` (ES raises the same way when subsetFreq >
    supersetFreq).

    `background_lang` is the ES `background_filter` knob: significance
    measured against a RESTRICTED background (here a language slice)
    instead of the whole index — "what distinguishes the match set from
    other docs of the same language", the tail-comparison ES documents
    for this param.  A filtered background cannot come from term_dict
    (it holds global df only), so this knob forces the relational
    background pass — mutually exclusive with `index`.  Foreground
    terms absent from the restricted background drop out (inner join —
    JLH is undefined at bg% = 0), in both engines.

    fg% = term's doc frequency inside the filtered (foreground) set /
    |foreground|; bg% = doc frequency over the whole corpus / N.
    JLH = (fg% - bg%) * (fg% / bg%), rounded for deterministic order;
    ES's default significance heuristic.  Terms below `min_doc_count`
    foreground docs are dropped (ES shard_min_doc_count analogue).

    With `index`, the background statistics come straight from the term
    dictionary (df is already materialized at build time — identical to
    the corpus aggregation by construction) and N from the stats table:
    only the foreground set is tokenized, which is the serving shape —
    at 100 TB the background pass would otherwise re-aggregate the whole
    corpus per request."""
    fg_docs = search_filtered(corpus, q, min_score)
    fg_n = fg_docs.select(F.count(F.lit(1)).alias("fg_n"))

    def doc_freq(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(out))
        )

    fg = doc_freq(fg_docs, "fg_count").filter(
        F.col("fg_count") >= int(min_doc_count)
    )
    if index is not None:
        if background_lang is not None:
            raise ValueError(
                "background_filter needs the relational background pass"
                " (term_dict holds global df only) — pass index=None"
            )
        bg = index["term_dict"].select(
            "term", F.col("df").cast("long").alias("bg_count")
        )
        bg_n = index["stats"].select(F.col("n_docs").alias("bg_n"))
    else:
        bg_docs = (
            corpus.filter(F.col("lang") == background_lang)
            if background_lang is not None
            else corpus
        )
        bg = doc_freq(bg_docs, "bg_count")
        bg_n = bg_docs.select(F.count(F.lit(1)).alias("bg_n"))
    joined = (
        fg.join(bg, "term")
        .crossJoin(F.broadcast(fg_n))
        .crossJoin(F.broadcast(bg_n))
    )
    if heuristic == "jlh":
        fg_pct = F.col("fg_count") / F.col("fg_n")
        bg_pct = F.col("bg_count") / F.col("bg_n")
        return (
            joined.withColumn(
                "jlh",
                F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), SCORE_DECIMALS),
            )
            .select("term", "fg_count", "bg_count", "jlh")
            .orderBy(F.desc("jlh"), F.asc("term"))
            .limit(k)
        )
    if heuristic not in ("mutual_information", "chi_square", "gnd", "percentage"):
        raise ValueError(f"unknown significance heuristic {heuristic!r}")
    if background_lang is not None:
        raise ValueError(
            "NXY heuristics need the foreground to be a subset of the "
            "background (background_is_superset) — background_filter is "
            "jlh-only here"
        )
    if heuristic == "percentage":
        # ES PercentageScore: subsetFreq / supersetFreq — the fraction of
        # the term's background docs that fall inside the foreground.
        sig = F.col("fg_count").cast("double") / F.col("bg_count").cast("double")
        return (
            joined.withColumn("sig", F.round(sig, SCORE_DECIMALS))
            .select("term", "fg_count", "bg_count", "sig")
            .orderBy(F.desc("sig"), F.asc("term"))
            .limit(k)
        )
    if heuristic == "gnd":
        # Google Normalized Distance (Cilibrasi & Vitányi) over the
        # superset cells — fx = background df, fy = |foreground|,
        # fxy = foreground df — mapped to a similarity with exp(-ngd)
        # so smaller distance ranks higher (ES GND heuristic shape).
        fx = F.col("bg_count").cast("double")
        fy = F.col("fg_n").cast("double")
        fxy = F.col("fg_count").cast("double")
        N_ = F.col("bg_n").cast("double")
        denom = F.log(N_) - F.least(F.log(fx), F.log(fy))
        ngd = (
            F.greatest(F.log(fx), F.log(fy)) - F.log(fxy)
        ) / denom
        sig = F.when(denom == 0, F.lit(0.0)).otherwise(F.exp(-ngd))
        return (
            joined.withColumn("sig", F.round(sig, SCORE_DECIMALS))
            .select("term", "fg_count", "bg_count", "sig")
            .orderBy(F.desc("sig"), F.asc("term"))
            .limit(k)
        )
    f_ = F.col("fg_count").cast("double")
    F2 = F.col("bg_count").cast("double")
    n_ = F.col("fg_n").cast("double")
    N_ = F.col("bg_n").cast("double")
    n11, n01, n10 = f_, F2 - f_, n_ - f_
    n00 = N_ - F2 - n_ + f_
    if heuristic == "chi_square":
        denom = (n11 + n01) * (n11 + n10) * (n01 + n00) * (n10 + n00)
        sig = F.when(denom == 0, F.lit(0.0)).otherwise(
            N_ * (n11 * n00 - n01 * n10) * (n11 * n00 - n01 * n10) / denom
        )
    else:

        def cell(nxy: F.Column, nx: F.Column, ny: F.Column) -> F.Column:
            return F.when(nxy == 0, F.lit(0.0)).otherwise(
                (nxy / N_) * F.log2(N_ * nxy / (nx * ny))
            )

        sig = (
            cell(n11, F2, n_)
            + cell(n01, F2, N_ - n_)
            + cell(n10, N_ - F2, n_)
            + cell(n00, N_ - F2, N_ - n_)
        )
    return (
        joined.withColumn("sig", F.round(sig, SCORE_DECIMALS))
        .select("term", "fg_count", "bg_count", "sig")
        .orderBy(F.desc("sig"), F.asc("term"))
        .limit(k)
    )


def significant_terms_sql(
    q: str | None = None,
    min_score: float | None = None,
    k: int = 20,
    min_doc_count: int = 3,
    background_lang: str | None = None,
    heuristic: str = "jlh",
) -> str:
    where = _filters_sql(q, min_score, None)
    bg_where = (
        f"WHERE lang = '{background_lang}'" if background_lang is not None else ""
    )
    if heuristic == "jlh":
        score_sql = (
            "round(((fg.fg_count * 1.0 / fg_n.fg_n)"
            " - (bg.bg_count * 1.0 / bg_n.bg_n))"
            " * ((fg.fg_count * 1.0 / fg_n.fg_n)"
            f" / (bg.bg_count * 1.0 / bg_n.bg_n)), {SCORE_DECIMALS}) AS jlh"
        )
        out_col = "jlh"
    else:
        # NXY cells (background_is_superset), doubles before any product
        f1 = "CAST(fg.fg_count AS DOUBLE)"
        F1 = "CAST(bg.bg_count AS DOUBLE)"
        n1 = "CAST(fg_n.fg_n AS DOUBLE)"
        N1 = "CAST(bg_n.bg_n AS DOUBLE)"
        n11, n01 = f1, f"({F1} - {f1})"
        n10, n00 = f"({n1} - {f1})", f"({N1} - {F1} - {n1} + {f1})"
        if heuristic == "percentage":
            raw = f"{f1} / {F1}"
        elif heuristic == "gnd":
            fx, fy, fxy = F1, n1, f1
            denom = f"(ln({N1}) - least(ln({fx}), ln({fy})))"
            ngd = f"((greatest(ln({fx}), ln({fy})) - ln({fxy})) / {denom})"
            raw = f"CASE WHEN {denom} = 0 THEN 0.0 ELSE exp(-{ngd}) END"
        elif heuristic == "chi_square":
            denom = (
                f"(({n11} + {n01}) * ({n11} + {n10})"
                f" * ({n01} + {n00}) * ({n10} + {n00}))"
            )
            raw = (
                f"CASE WHEN {denom} = 0 THEN 0.0 ELSE "
                f"{N1} * ({n11} * {n00} - {n01} * {n10})"
                f" * ({n11} * {n00} - {n01} * {n10}) / {denom} END"
            )
        elif heuristic == "mutual_information":
            def cell(nxy: str, nx: str, ny: str) -> str:
                return (
                    f"CASE WHEN {nxy} = 0 THEN 0.0 ELSE "
                    f"({nxy} / {N1}) * log2({N1} * {nxy} / ({nx} * {ny})) END"
                )

            raw = " + ".join(
                [
                    cell(n11, F1, n1),
                    cell(n01, F1, f"({N1} - {n1})"),
                    cell(n10, f"({N1} - {F1})", n1),
                    cell(n00, f"({N1} - {F1})", f"({N1} - {n1})"),
                ]
            )
        else:
            raise ValueError(f"unknown significance heuristic {heuristic!r}")
        score_sql = f"round({raw}, {SCORE_DECIMALS}) AS sig"
        out_col = "sig"
    return f"""
WITH {CORPUS_CTE.strip()},
scored AS (SELECT *, {SCORE_SQL} AS score FROM corpus),
fset AS (SELECT * FROM scored WHERE {where}),
bset AS (SELECT * FROM corpus {bg_where}),
fg_n AS (SELECT count(*) AS fg_n FROM fset),
bg_n AS (SELECT count(*) AS bg_n FROM bset),
fg AS (
  SELECT term, count(*) AS fg_count FROM (
    SELECT doc_id, unnest(list_distinct(list_filter(
        regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
        t -> t <> ''))) AS term
    FROM fset
  ) GROUP BY term HAVING count(*) >= {int(min_doc_count)}
),
bg AS (
  SELECT term, count(*) AS bg_count FROM (
    SELECT doc_id, unnest(list_distinct(list_filter(
        regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
        t -> t <> ''))) AS term
    FROM bset
  ) GROUP BY term
)
SELECT fg.term, fg.fg_count, bg.bg_count,
       {score_sql}
FROM fg JOIN bg USING (term)
CROSS JOIN fg_n CROSS JOIN bg_n
ORDER BY {out_col} DESC, fg.term ASC
LIMIT {k}
"""


def facets_composite(
    corpus: DataFrame,
    size: int = 10,
    after: tuple[str, str] | None = None,
    q: str | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """ES `composite` aggregation: page through ALL (lang, source) buckets
    in key order, `size` at a time, resuming from the `after` key — the
    scalable alternative to a deep `terms` agg (ES caps terms buckets;
    composite streams them).  The page's last row is the next `after`.

    Scale shape: one hash aggregate (map-side partial) over the filtered
    set; the after-cursor is a KEY predicate, not an offset — pushed
    beneath the aggregate to the scan (lang > a OR (lang = a AND ...)),
    so page N costs the same as page 1 and a lang-partitioned layout
    prunes whole partitions.  No Window, no global sort: TakeOrdered on
    (lang, source) emits `size` rows."""
    df = search_filtered(corpus, q, min_score)
    if after is not None:
        a_lang, a_source = after
        df = df.filter(
            (F.col("lang") > a_lang)
            | ((F.col("lang") == a_lang) & (F.col("source") > a_source))
        )
    return (
        df.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("lang", "source")
        .limit(int(size))
    )


def facets_composite_sql(
    size: int = 10,
    after: tuple[str, str] | None = None,
    q: str | None = None,
    min_score: float | None = None,
) -> str:
    where = _filters_sql(q, min_score, None)
    cursor = ""
    if after is not None:
        a_lang, a_source = after
        cursor = (
            f" AND (lang > '{a_lang}' OR "
            f"(lang = '{a_lang}' AND source > '{a_source}'))"
        )
    return f"""
WITH {CORPUS_CTE.strip()},
scored AS (SELECT *, {SCORE_SQL} AS score FROM corpus),
fset AS (SELECT * FROM scored WHERE {where}{cursor})
SELECT lang, source, count(*) AS cnt
FROM fset
GROUP BY lang, source
ORDER BY lang, source
LIMIT {size}
"""


def facets_top_hits(
    corpus: DataFrame,
    q: str | None = None,
    min_score: float | None = None,
    per_bucket: int = 3,
) -> DataFrame:
    """ES `top_hits` sub-aggregation: the best `per_bucket` documents
    inside every lang bucket (score desc, doc_id asc), alongside the
    bucket's total count — "show me each language's best matches".

    Scale shape: one Window partitioned BY THE BUCKET KEY (rank within
    lang never crosses partitions — the sort is per-group, not global)
    over the same filtered set the hits came from; bucket totals ride the
    same partition via a window count, so the whole op is one shuffle on
    lang."""
    from pyspark.sql import Window

    df = search_filtered(corpus, q, min_score)
    w = Window.partitionBy("lang").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    wc = Window.partitionBy("lang")
    return (
        df.select(
            "lang", "doc_id", F.round("score", SCORE_DECIMALS).alias("score")
        )
        .withColumn("rank", F.row_number().over(w))
        .withColumn("bucket_total", F.count(F.lit(1)).over(wc))
        .filter(F.col("rank") <= int(per_bucket))
        .select("lang", "rank", "doc_id", "score", "bucket_total")
        .orderBy("lang", "rank")
    )


def facets_top_hits_sql(
    q: str | None = None,
    min_score: float | None = None,
    per_bucket: int = 3,
) -> str:
    where = _filters_sql(q, min_score, None)
    return f"""
WITH {CORPUS_CTE.strip()},
scored AS (SELECT *, {SCORE_SQL} AS score FROM corpus),
fset AS (SELECT * FROM scored WHERE {where}),
ranked AS (
  SELECT lang, doc_id, round(score, {SCORE_DECIMALS}) AS score,
         row_number() OVER (
             PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS rank,
         count(*) OVER (PARTITION BY lang) AS bucket_total
  FROM fset
)
SELECT lang, rank, doc_id, score, bucket_total
FROM ranked WHERE rank <= {per_bucket}
ORDER BY lang, rank
"""


def timeline_hourly_dense(
    corpus: DataFrame,
    q: str | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """ES `date_histogram` with empty-bucket emission (min_doc_count=0 /
    extended_bounds): every hour between the FILTERED set's first and
    last hit gets a row, zero-count hours included — dashboards need the
    gaps, and a selective query leaves plenty of them.

    Scale shape: the per-hour counts are one hash aggregate (size =
    hours-with-hits); the dense hour axis explodes from a 1-row (min,
    max) aggregate.  Axis rows = hours of history, counts rows <= axis
    rows — the left join broadcasts the COUNTS side (the preserved axis
    side of an outer join cannot be the broadcast build side), so no
    corpus-sized structure ever shuffles."""
    df = search_filtered(corpus, q, min_score)
    counts = (
        df.groupBy(F.date_trunc("hour", "warc_ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    axis = (
        df.agg(
            F.min(F.date_trunc("hour", "warc_ts")).alias("lo"),
            F.max(F.date_trunc("hour", "warc_ts")).alias("hi"),
        )
        .select(
            F.explode(
                F.expr("sequence(lo, hi, interval 1 hour)")
            ).alias("hr")
        )
    )
    return (
        axis.join(F.broadcast(counts), "hr", "left")
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        )
        .orderBy("hour")
    )


def timeline_hourly_dense_sql(
    q: str | None = None, min_score: float | None = None
) -> str:
    where = _filters_sql(q, min_score, None)
    return f"""
WITH {CORPUS_CTE.strip()},
scored AS (SELECT *, {SCORE_SQL} AS score FROM corpus),
fset AS (SELECT * FROM scored WHERE {where}),
counts AS (
  SELECT date_trunc('hour', warc_ts) AS hr, count(*) AS n_docs
  FROM fset GROUP BY 1
),
bounds AS (
  SELECT min(date_trunc('hour', warc_ts)) AS lo,
         max(date_trunc('hour', warc_ts)) AS hi
  FROM fset
),
axis AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
  FROM bounds
)
SELECT strftime(axis.hr, '%Y-%m-%d %H:00') AS hour,
       CAST(coalesce(counts.n_docs, 0) AS BIGINT) AS n_docs
FROM axis LEFT JOIN counts ON axis.hr = counts.hr
ORDER BY hour
"""


def rare_terms(
    corpus: DataFrame,
    max_doc_count: int = 2,
    k: int = 20,
    index: dict | None = None,
) -> DataFrame:
    """ES `rare_terms` aggregation: the long-tail terms with document
    frequency <= max_doc_count, rarest first (df asc, term asc), capped
    at k.  With `index`, served straight from the term dictionary (df
    materialized at build — zero corpus touches, the ES shape where the
    agg walks the terms dict); without, one tokenize+agg pass.

    Scale note: ES implements this with a CuckooFilter because its terms
    agg shards can't see global df; the engine's term_dict IS the global
    df table, so the exact answer is a vocab-sized filter + TakeOrdered."""
    if index is not None:
        df = index["term_dict"].select("term", "df")
    else:
        df = (
            corpus.select(
                F.explode(F.array_distinct(tokens("text"))).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
        )
    return (
        df.filter(F.col("df") <= int(max_doc_count))
        .orderBy("df", "term")
        .limit(int(k))
    )


def rare_terms_sql(max_doc_count: int = 2, k: int = 20) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
tdf AS (
  SELECT term, count(*) AS df FROM (
    SELECT DISTINCT doc_id, unnest(list_distinct(list_filter(
        regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
        t -> t <> ''))) AS term
    FROM corpus
  ) GROUP BY term
)
SELECT term, df FROM tdf
WHERE df <= {max_doc_count}
ORDER BY df, term
LIMIT {k}
"""


def agg_filters(
    corpus: DataFrame, filters: dict[str, str] | None = None
) -> DataFrame:
    """ES `filters` aggregation: named buckets from arbitrary predicates,
    all counted in ONE pass (sum of conditional 1s — a single scan, no
    per-bucket jobs), plus the ES `other_bucket`.  Default buckets mirror
    a dashboard: short/long docs and english."""
    if filters is None:
        filters = DEFAULT_FILTERS
    aggs = [
        F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")).alias(name)
        for name, pred in sorted(filters.items())
    ]
    other = " AND ".join(f"NOT ({p})" for p in sorted(filters.values()))
    aggs.append(
        F.sum(F.expr(f"CASE WHEN {other} THEN 1 ELSE 0 END")).alias("other")
    )
    return corpus.agg(*aggs)


DEFAULT_FILTERS = {
    "english": "lang = 'en'",
    "long_doc": "n_chars >= 400",
    "short_doc": "n_chars < 150",
}


def agg_filters_sql(filters: dict[str, str] | None = None) -> str:
    if filters is None:
        filters = DEFAULT_FILTERS
    cols = ",\n       ".join(
        f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS {name}"
        for name, pred in sorted(filters.items())
    )
    other = " AND ".join(f"NOT ({p})" for p in sorted(filters.values()))
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT {cols},
       CAST(sum(CASE WHEN {other} THEN 1 ELSE 0 END) AS BIGINT) AS other
FROM corpus
"""


# --- ES range / date_range aggregations -------------------------------------
# ES `range` buckets may OVERLAP (a doc lands in every bucket whose
# [from, to) interval contains its value) — so the implementation is a
# broadcast non-equi join against the tiny ranges table (one corpus scan,
# each doc fans out only to its matching buckets), not a CASE bucketizer.
# Default ranges deliberately overlap to exercise that semantics.
DEFAULT_RANGES = [
    ("*-200", None, 200),
    ("100-400", 100, 400),
    ("300-*", 300, None),
]


def agg_range(
    corpus: DataFrame,
    ranges: list[tuple[str, int | None, int | None]] | None = None,
) -> DataFrame:
    """ES `range` aggregation over n_chars: (key, r_from, r_to, cnt,
    avg_chars) per bucket, [from, to) half-open like ES, overlapping
    buckets allowed.  Scale shape: broadcast the k-row ranges table, one
    scan + one hash agg on the bucket key."""
    if ranges is None:
        ranges = DEFAULT_RANGES
    spark = corpus.sparkSession
    rdf = spark.createDataFrame(
        [(k, f, t) for k, f, t in ranges], "key string, r_from int, r_to int"
    )
    cond = (
        (F.col("r_from").isNull() | (F.col("n_chars") >= F.col("r_from")))
        & (F.col("r_to").isNull() | (F.col("n_chars") < F.col("r_to")))
    )
    return (
        corpus.select("n_chars")
        .join(F.broadcast(rdf), cond, "inner")
        .groupBy("key", "r_from", "r_to")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy(F.asc_nulls_first("r_from"), "key")
    )


def agg_range_sql(
    ranges: list[tuple[str, int | None, int | None]] | None = None,
) -> str:
    if ranges is None:
        ranges = DEFAULT_RANGES
    vals = ", ".join(
        "('" + k.replace("'", "''") + "', "
        + ("NULL" if f is None else str(f)) + ", "
        + ("NULL" if t is None else str(t)) + ")"
        for k, f, t in ranges
    )
    return f"""
WITH {CORPUS_CTE.strip()},
ranges(key, r_from, r_to) AS (VALUES {vals})
SELECT r.key, r.r_from, r.r_to, count(*) AS cnt,
       round(avg(c.n_chars), 4) AS avg_chars
FROM corpus c JOIN ranges r
  ON (r.r_from IS NULL OR c.n_chars >= r.r_from)
 AND (r.r_to   IS NULL OR c.n_chars <  r.r_to)
GROUP BY r.key, r.r_from, r.r_to
ORDER BY r.r_from NULLS FIRST, r.key
"""


# Minute-scale boundaries so every bucket is populated (and the overlap
# exercised) at every driver sf — the sf0.001 corpus spans ~31 minutes.
DEFAULT_DATE_RANGES = [
    ("early", None, "2022-01-01 00:20:00"),
    ("mid", "2022-01-01 00:10:00", "2022-01-01 00:40:00"),
    ("late", "2022-01-01 00:30:00", None),
]


def agg_date_range(
    corpus: DataFrame,
    ranges: list[tuple[str, str | None, str | None]] | None = None,
) -> DataFrame:
    """ES `date_range` aggregation over warc_ts — same overlapping
    [from, to) semantics as `agg_range`, boundaries absolute timestamps
    (ES date-math like `now-1d/d` resolves to these before bucketing).
    Emits the bucket doc count plus the bucket's actual min/max ts (the
    ES min/max sub-aggs a dashboard shows per window)."""
    if ranges is None:
        ranges = DEFAULT_DATE_RANGES
    spark = corpus.sparkSession
    rdf = spark.createDataFrame(
        [(k, f, t) for k, f, t in ranges],
        "key string, r_from string, r_to string",
    ).select(
        "key",
        F.col("r_from").cast("timestamp").alias("r_from"),
        F.col("r_to").cast("timestamp").alias("r_to"),
    )
    cond = (
        (F.col("r_from").isNull() | (F.col("warc_ts") >= F.col("r_from")))
        & (F.col("r_to").isNull() | (F.col("warc_ts") < F.col("r_to")))
    )
    return (
        corpus.select("warc_ts")
        .join(F.broadcast(rdf), cond, "inner")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.date_format(F.min("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .alias("first_ts"),
            F.date_format(F.max("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .alias("last_ts"),
        )
        .orderBy("key")
    )


def agg_date_range_sql(
    ranges: list[tuple[str, str | None, str | None]] | None = None,
) -> str:
    if ranges is None:
        ranges = DEFAULT_DATE_RANGES
    vals = ", ".join(
        "('" + k.replace("'", "''") + "', "
        + ("CAST(NULL AS TIMESTAMP)" if f is None else f"TIMESTAMP '{f}'")
        + ", "
        + ("CAST(NULL AS TIMESTAMP)" if t is None else f"TIMESTAMP '{t}'")
        + ")"
        for k, f, t in ranges
    )
    return f"""
WITH {CORPUS_CTE.strip()},
ranges(key, r_from, r_to) AS (VALUES {vals})
SELECT r.key, count(*) AS cnt,
       strftime(min(c.warc_ts), '%Y-%m-%dT%H:%M:%SZ') AS first_ts,
       strftime(max(c.warc_ts), '%Y-%m-%dT%H:%M:%SZ') AS last_ts
FROM corpus c JOIN ranges r
  ON (r.r_from IS NULL OR c.warc_ts >= r.r_from)
 AND (r.r_to   IS NULL OR c.warc_ts <  r.r_to)
GROUP BY r.key
ORDER BY r.key
"""


# --- ES adjacency_matrix aggregation ----------------------------------------
def agg_adjacency_matrix(
    corpus: DataFrame, filters: dict[str, str] | None = None
) -> DataFrame:
    """ES `adjacency_matrix`: doc counts for every named filter and every
    pairwise intersection ("a&b" keys, ES's separator), empty buckets
    dropped.  ONE corpus scan: each filter becomes a conditional-sum
    column (singles = sum(p), pairs = sum(p AND q)) in a single hash agg
    — no per-bucket jobs, no self-join; the k*(k+1)/2 output cells are
    unpivoted from the 1-row aggregate driver-side (k is tiny)."""
    if filters is None:
        filters = DEFAULT_FILTERS
    names = sorted(filters)
    cells: list[tuple[str, str]] = [(n, filters[n]) for n in names]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            cells.append((f"{a}&{b}", f"({filters[a]}) AND ({filters[b]})"))
    aggs = [
        F.sum(F.expr(f"CASE WHEN {pred} THEN 1 ELSE 0 END")).alias(f"c{i}")
        for i, (_n, pred) in enumerate(cells)
    ]
    wide = corpus.agg(*aggs)
    stack = ", ".join(
        "'" + n.replace("'", "''") + f"', c{i}" for i, (n, _p) in enumerate(cells)
    )
    return (
        wide.select(
            F.expr(f"stack({len(cells)}, {stack}) AS (key, cnt)")
        )
        .filter(F.col("cnt") > 0)
        .orderBy("key")
    )


def agg_adjacency_matrix_sql(filters: dict[str, str] | None = None) -> str:
    if filters is None:
        filters = DEFAULT_FILTERS
    names = sorted(filters)
    cells = [(n, filters[n]) for n in names]
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            cells.append((f"{a}&{b}", f"({filters[a]}) AND ({filters[b]})"))
    cols = ",\n       ".join(
        f"sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS c{i}"
        for i, (_n, pred) in enumerate(cells)
    )
    sels = "\nUNION ALL\n".join(
        f"SELECT '{n}' AS key, c{i} AS cnt FROM wide"
        for i, (n, _p) in enumerate(cells)
    )
    return f"""
WITH {CORPUS_CTE.strip()},
wide AS (SELECT {cols} FROM corpus)
SELECT key, CAST(cnt AS BIGINT) AS cnt FROM ({sels})
WHERE cnt > 0
ORDER BY key
"""


# --- ES diversified_sampler aggregation -------------------------------------
def sampler_diversified(
    corpus: DataFrame,
    q: str | None = "merge",
    shard_size: int = 100,
    max_per_lang: int = 20,
) -> DataFrame:
    """ES `diversified_sampler` (+ a terms sub-agg): take the best
    `shard_size` hits by relevance while admitting at most `max_per_lang`
    docs per lang (the diversity field), then aggregate per-lang counts
    and mean score over the SAMPLE — "what does a relevance-biased,
    de-skewed sample look like".

    Scale shape: the per-lang cap is a Window partitioned by the
    diversity key (rank never crosses lang partitions — one shuffle on
    lang); the global shard_size cut is a TakeOrdered over the capped
    survivors (<= n_langs * max_per_lang rows); the sub-agg runs on
    <= shard_size rows driver-adjacent.  Deterministic: relevance is the
    engine score, ties by doc_id asc."""
    from pyspark.sql import Window

    # min_score=0.0 drops NULL-score docs (ES docs with no relevance do
    # not enter the sampler) — and pins the Spark/DuckDB NULL-sort corner
    df = search_filtered(corpus, q, 0.0)
    w = Window.partitionBy("lang").orderBy(F.desc("score"), F.asc("doc_id"))
    sample = (
        df.select("lang", "doc_id", "score")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(max_per_lang))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(shard_size))
    )
    return (
        sample.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("lang")
    )


def sampler_diversified_sql(
    q: str | None = "merge", shard_size: int = 100, max_per_lang: int = 20
) -> str:
    where = _filters_sql(q, 0.0, None)
    return f"""
WITH {CORPUS_CTE.strip()},
scored AS (SELECT *, {SCORE_SQL} AS score FROM corpus),
fset AS (SELECT * FROM scored WHERE {where}),
capped AS (
  SELECT lang, doc_id, score,
         row_number() OVER (
             PARTITION BY lang ORDER BY score DESC, doc_id ASC) AS rn
  FROM fset
),
sample AS (
  SELECT lang, doc_id, score FROM capped
  WHERE rn <= {max_per_lang}
  ORDER BY score DESC, doc_id ASC
  LIMIT {shard_size}
)
SELECT lang, count(*) AS cnt, round(avg(score), 4) AS avg_score
FROM sample GROUP BY lang ORDER BY lang
"""


def sampler_agg(
    corpus: DataFrame,
    q: str | None = "merge",
    shard_size: int = 100,
) -> DataFrame:
    """ES `sampler` aggregation (+ a terms sub-agg): run sub-aggs over
    only the best `shard_size` hits by relevance — the cheap
    "aggregate the head, not the corpus" knob (diversified_sampler is
    the same with a per-key admission cap).  Deterministic: ties by
    doc_id asc.

    Scale shape: the sample is a TakeOrdered over the scored scan (k-row
    driver state, no full sort); the sub-agg runs on <= shard_size
    rows."""
    df = search_filtered(corpus, q, 0.0)
    sample = (
        df.select("lang", "doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(shard_size))
    )
    return (
        sample.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("lang")
    )


def sampler_agg_sql(q: str | None = "merge", shard_size: int = 100) -> str:
    where = _filters_sql(q, 0.0, None)
    return f"""
WITH {CORPUS_CTE.strip()},
scored AS (SELECT *, {SCORE_SQL} AS score FROM corpus),
fset AS (SELECT * FROM scored WHERE {where}),
sample AS (
  SELECT lang, doc_id, score FROM fset
  ORDER BY score DESC, doc_id ASC
  LIMIT {int(shard_size)}
)
SELECT lang, count(*) AS cnt, round(avg(score), 4) AS avg_score
FROM sample GROUP BY lang ORDER BY lang
"""


# --- ES auto_date_histogram -------------------------------------------------
# The ES interval ladder (rounded to the fixed-width subset: auto intervals
# above days are calendar-aware in ES; this engine pins fixed widths so
# both engines bucket identically).
AUTO_INTERVALS = [60, 300, 900, 3600, 10800, 43200, 86400, 604800, 2592000]


def auto_date_histogram(
    corpus: DataFrame, target_buckets: int = 20
) -> DataFrame:
    """ES `auto_date_histogram`: pick the smallest ladder interval that
    yields at most `target_buckets` buckets over the data's actual time
    span, then histogram on it.  Returns (bucket, n_docs, interval_sec).

    Scale shape: the interval choice needs only the global (min, max)
    epoch — a 1-row all-column agg (map-side combinable) collected
    driver-side, exactly the coordinator-level decision ES makes; the
    histogram itself is one hash aggregate over one scan.  The ladder
    walk is pure integer arithmetic, so the DuckDB oracle reproduces the
    same choice from the same bounds."""
    bounds = corpus.agg(
        F.min(F.col("warc_ts").cast("long")).alias("mine"),
        F.max(F.col("warc_ts").cast("long")).alias("maxe"),
    ).first()
    mine, maxe = int(bounds["mine"]), int(bounds["maxe"])
    iv = AUTO_INTERVALS[-1]
    for cand in AUTO_INTERVALS:
        if (maxe // cand) - (mine // cand) + 1 <= int(target_buckets):
            iv = cand
            break
    bucket = F.timestamp_seconds(
        (F.col("warc_ts").cast("long") / iv).cast("long") * iv
    )
    return (
        corpus.groupBy(
            F.date_format(bucket, "yyyy-MM-dd HH:mm").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("interval_sec", F.lit(iv).cast("long"))
        .orderBy("bucket")
    )


def auto_date_histogram_sql(target_buckets: int = 20) -> str:
    # the ladder walk as a CASE chain over the same integer bounds
    conds = " ".join(
        f"WHEN (maxe // {iv}) - (mine // {iv}) + 1 <= {int(target_buckets)} "
        f"THEN {iv}"
        for iv in AUTO_INTERVALS
    )
    return f"""
WITH {CORPUS_CTE.strip()},
bounds AS (
  SELECT CAST(epoch(min(warc_ts)) AS BIGINT) AS mine,
         CAST(epoch(max(warc_ts)) AS BIGINT) AS maxe
  FROM corpus
),
chosen AS (
  SELECT CASE {conds} ELSE {AUTO_INTERVALS[-1]} END AS iv FROM bounds
)
SELECT strftime(to_timestamp((CAST(epoch(c.warc_ts) AS BIGINT) // ch.iv) * ch.iv),
                '%Y-%m-%d %H:%M') AS bucket,
       count(*) AS n_docs,
       CAST(any_value(ch.iv) AS BIGINT) AS interval_sec
FROM corpus c CROSS JOIN chosen ch
GROUP BY 1
ORDER BY bucket
"""


def significant_text(
    corpus: DataFrame,
    terms: list[str],
    sample_size: int = 100,
    k: int = 20,
    min_doc_count: int = 3,
) -> DataFrame:
    """ES `significant_text` aggregation: significant terms computed by
    RE-ANALYZING the text of the top-ranked sample only (the ES contract
    — no field data, foreground = the best `sample_size` hits of the
    query, the sampler-agg wrapping ES recommends), with the
    filter_duplicate_text guard: exact-duplicate texts inside the sample
    are counted once (the highest-ranked copy wins), so boilerplate
    mirrors cannot inflate fg counts.

    Plan: the sample is a TakeOrdered of the BM25 ranking (sample_size
    rows — driver-bounded), the duplicate filter is a window over the
    sample's text hash (<= sample_size rows, bounded), and only those
    docs are tokenized for fg counts; bg stats are the corpus df
    aggregate (term_dict at serving time — significant_terms' index=
    path applies identically).  Scoring: JLH like significant_terms.
    Returns (term, fg_count, bg_count, jlh)."""
    from pyspark.sql import Window

    from ..operators.dedup import h64
    from .bm25 import bm25_scores

    sample = (
        bm25_scores(corpus, terms)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(int(sample_size))
        .join(corpus.select("doc_id", "text"), "doc_id")
    )
    rn_w = Window.partitionBy(F.lit(0)).orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    sample = sample.withColumn("rn", F.row_number().over(rn_w))
    dup_w = Window.partitionBy(h64(F.col("text")))
    sample = sample.withColumn("min_rn", F.min("rn").over(dup_w)).filter(
        F.col("rn") == F.col("min_rn")
    )
    fg_n = sample.select(F.count(F.lit(1)).alias("fg_n"))
    fg = (
        sample.select(
            F.explode(F.array_distinct(tokens("text"))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fg_count"))
        .filter(F.col("fg_count") >= int(min_doc_count))
    )
    bg = (
        corpus.select(
            F.explode(F.array_distinct(tokens("text"))).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("bg_count"))
    )
    bg_n = corpus.select(F.count(F.lit(1)).alias("bg_n"))
    fg_pct = F.col("fg_count") / F.col("fg_n")
    bg_pct = F.col("bg_count") / F.col("bg_n")
    return (
        fg.join(bg, "term")
        .crossJoin(F.broadcast(fg_n))
        .crossJoin(F.broadcast(bg_n))
        .withColumn(
            "jlh",
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), SCORE_DECIMALS),
        )
        .select("term", "fg_count", "bg_count", "jlh")
        .orderBy(F.desc("jlh"), F.asc("term"))
        .limit(int(k))
    )


def significant_text_sql(
    terms: list[str],
    sample_size: int = 100,
    k: int = 20,
    min_doc_count: int = 3,
) -> str:
    from ..functions.tokenizer import DOC_LEN_SQL
    from ..operators.dedup import H64_SQL
    from .bm25 import B, K1, _sql_quote_terms

    h = H64_SQL.format(x="text")
    return f"""
WITH {CORPUS_CTE.strip()},
dl AS (SELECT doc_id, {DOC_LEN_SQL} AS doc_len FROM corpus),
stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM dl),
toks0 AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks0
  WHERE term IN ({_sql_quote_terms(sorted(set(terms)))})
  GROUP BY doc_id, term
),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         round(sum(
           ln(1 + (stats.n - tdf.df + 0.5) / (tdf.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN tdf ON tf.term = tdf.term
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
sample0 AS (
  SELECT s.doc_id, s.score, c.text,
         row_number() OVER (ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN corpus c ON s.doc_id = c.doc_id
  ORDER BY s.score DESC, s.doc_id ASC
  LIMIT {int(sample_size)}
),
sample AS (
  SELECT * FROM sample0
  QUALIFY rn = min(rn) OVER (PARTITION BY {h})
),
fg_n AS (SELECT count(*) AS fg_n FROM sample),
bg_n AS (SELECT count(*) AS bg_n FROM corpus),
fg AS (
  SELECT term, count(*) AS fg_count FROM (
    SELECT doc_id, unnest(list_distinct(list_filter(
        regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
        t -> t <> ''))) AS term
    FROM sample
  ) GROUP BY term HAVING count(*) >= {int(min_doc_count)}
),
bg AS (
  SELECT term, count(*) AS bg_count FROM (
    SELECT doc_id, unnest(list_distinct(list_filter(
        regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
        t -> t <> ''))) AS term
    FROM corpus
  ) GROUP BY term
)
SELECT fg.term, fg.fg_count, bg.bg_count,
       round(((fg.fg_count * 1.0 / fg_n.fg_n) - (bg.bg_count * 1.0 / bg_n.bg_n))
             * ((fg.fg_count * 1.0 / fg_n.fg_n) / (bg.bg_count * 1.0 / bg_n.bg_n)),
             {SCORE_DECIMALS}) AS jlh
FROM fg JOIN bg USING (term)
CROSS JOIN fg_n CROSS JOIN bg_n
ORDER BY jlh DESC, fg.term ASC
LIMIT {int(k)}
"""


def terms_agg_sharded(
    corpus: DataFrame,
    size: int = 10,
    shard_size: int = 15,
    n_shards: int = 4,
) -> DataFrame:
    """ES `terms` aggregation with its real distributed semantics: each
    shard returns only its local top `shard_size` terms by doc count,
    the coordinator sums the RETURNED shard counts, and every bucket
    carries `error_ub` — the ES doc_count_error_upper_bound: the sum,
    over shards that did NOT return the term, of that shard's last
    (shard_size-th) returned count; a term missing from a shard's
    truncated list can have hidden at most that many docs there.

    Made deterministic (and oracle-reproducible) by pinning the shard
    assignment to pmod(doc_id, n_shards) — the engine's salt layout.
    Counts are doc counts (one element per distinct term per doc), so a
    shard's full list is exactly its slice of term_dict df.

    Scale shape: the per-(shard, term) count is ONE hash aggregate with
    map-side combine; the per-shard top-k ranks within n_shards
    partitions (in a real deployment this is a read of the per-shard
    term dictionary already sorted by df); everything after operates on
    <= n_shards * shard_size rows on the driver-side-sized merge path,
    exactly like the ES coordinator."""
    from pyspark.sql import Window

    t = corpus.select(
        F.pmod(F.col("doc_id"), F.lit(int(n_shards))).alias("shard"),
        F.explode(F.array_distinct(tokens("text"))).alias("term"),
    )
    per = t.groupBy("shard", "term").agg(F.count(F.lit(1)).alias("df_s"))
    w = Window.partitionBy("shard").orderBy(F.desc("df_s"), F.asc("term"))
    ranked = per.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= int(shard_size)
    )
    last = ranked.groupBy("shard").agg(
        F.max(
            F.when(F.col("rn") == int(shard_size), F.col("df_s")).otherwise(0)
        ).alias("last_df")
    )
    cand = ranked.select("term").distinct()
    grid = cand.crossJoin(F.broadcast(last))
    merged = (
        grid.join(ranked.select("shard", "term", "df_s"), ["shard", "term"], "left")
        .groupBy("term")
        .agg(
            F.sum(F.coalesce(F.col("df_s"), F.lit(0)))
            .cast("bigint")
            .alias("doc_count"),
            F.sum(
                F.when(F.col("df_s").isNull(), F.col("last_df")).otherwise(0)
            )
            .cast("bigint")
            .alias("error_ub"),
        )
    )
    return merged.orderBy(F.desc("doc_count"), F.asc("term")).limit(int(size))


def terms_agg_sharded_sql(
    size: int = 10, shard_size: int = 15, n_shards: int = 4
) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
t AS (
  SELECT doc_id % {int(n_shards)} AS shard,
         unnest(list_distinct(list_filter(
             regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
             x -> x <> ''))) AS term
  FROM corpus
),
per AS (SELECT shard, term, count(*) AS df_s FROM t GROUP BY shard, term),
ranked AS (
  SELECT shard, term, df_s,
         row_number() OVER (
           PARTITION BY shard ORDER BY df_s DESC, term ASC
         ) AS rn
  FROM per
  QUALIFY rn <= {int(shard_size)}
),
last AS (
  SELECT shard,
         max(CASE WHEN rn = {int(shard_size)} THEN df_s ELSE 0 END) AS last_df
  FROM ranked GROUP BY shard
),
cand AS (SELECT DISTINCT term FROM ranked),
grid AS (SELECT c.term, l.shard, l.last_df FROM cand c CROSS JOIN last l),
merged AS (
  SELECT g.term,
         CAST(sum(coalesce(r.df_s, 0)) AS BIGINT) AS doc_count,
         CAST(sum(CASE WHEN r.df_s IS NULL THEN g.last_df ELSE 0 END)
              AS BIGINT) AS error_ub
  FROM grid g
  LEFT JOIN ranked r ON g.shard = r.shard AND g.term = r.term
  GROUP BY g.term
)
SELECT term, doc_count, error_ub FROM merged
ORDER BY doc_count DESC, term ASC
LIMIT {int(size)}
"""


# --------------------------------------------------------------------------
# ES 8.4 frequent_item_sets aggregation (Eclat-style candidate generation)
# --------------------------------------------------------------------------

def frequent_item_sets(
    corpus: DataFrame,
    support_pct: int,
    max_set_size: int = 2,
    k: int = 20,
    closed: bool = False,
) -> DataFrame:
    """ES 8.4 ``frequent_item_sets`` aggregation: co-occurring item sets
    with support >= ``support_pct`` percent of documents (transactions =
    docs, items = distinct tokens — the keyword-field analogue on this
    corpus).  Sizes 2..max_set_size (<= 3), ES ``minimum_set_size=2``.

    Exactness notes:
    * the support threshold is INTEGER: ceil(pct*n/100) = (pct*n+99)//100,
      so both engines cut at the same count with no float;
    * restricting candidate generation to frequent singletons (and, for
      triples, to members of frequent pairs) is the apriori principle —
      lossless, every member of a frequent set is itself frequent;
    * ``closed=True`` drops a pair subsumed by an equal-support triple
      (ES reports closed sets; with the size cap, closedness is applied
      within the computed sizes — documented divergence from ES's
      unbounded-size Eclat).

    Scale shape (Eclat with transaction merging): singleton support is one
    hash agg; the frequent head F1 is driver-collected (vocab head, tiny
    by Zipf — the max_expansions pattern).  When |F1| <= 62 every doc's
    frequent-item SET is encoded as one 62-bit mask and IDENTICAL
    transactions are merged first (one mask-keyed hash agg) — candidate
    itemsets are then enumerated once per DISTINCT mask, weighted by its
    doc count.  Web corpora are boilerplate-heavy, so distinct masks ≪
    docs; itemset generation cost stops scaling with corpus size
    entirely (65 s -> ~8 s at the 200k-doc bench).  |F1| > 62 falls back
    to per-doc array-side generation (same one-hash-agg shape, no merge).
    No self-join of the posting relation anywhere.

    Output: (itemset string — members space-joined in lexical order,
    set_size int, support long), ordered by support desc, itemset asc.
    """
    if max_set_size not in (2, 3):
        raise ValueError("max_set_size must be 2 or 3")
    if not 1 <= support_pct <= 100:
        raise ValueError("support_pct must be in 1..100")
    n_docs = corpus.count()
    threshold = (support_pct * n_docs + 99) // 100

    # Tokenize ONCE: the distinct posting relation feeds the F1 agg and
    # the transaction encoding — persisted for the two consumers, released
    # after the (tiny) merged-transaction relation is materialized.
    di = corpus.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("item")
    ).persist()
    f1 = di.groupBy("item").count().where(F.col("count") >= threshold)
    f1_items = sorted(r.item for r in f1.select("item").collect())
    spark = corpus.sparkSession
    if not f1_items:
        di.unpersist()
        return spark.createDataFrame(
            [], "itemset string, set_size int, support bigint"
        )
    di_f = di.join(F.broadcast(f1.select("item")), "item")

    if len(f1_items) <= 62:
        # Transaction-merged path: doc -> 62-bit mask over the sorted F1
        # ordinals (items are distinct per doc, so sum == bitwise OR),
        # identical masks merged with their doc counts.
        bit_map = F.create_map(
            *[x for i, t in enumerate(f1_items)
              for x in (F.lit(t), F.lit(1 << i).cast("long"))]
        )
        masks = (
            di_f.groupBy("doc_id")
            .agg(F.sum(bit_map[F.col("item")]).alias("mask"))
            .groupBy("mask")
            .agg(F.count(F.lit(1)).alias("weight"))
        )
        decoded = F.filter(
            F.array(*[
                F.when(
                    F.col("mask").bitwiseAND(F.lit(1 << i)) != 0, F.lit(t)
                )
                for i, t in enumerate(f1_items)
            ]),
            lambda x: x.isNotNull(),
        )
        tx = masks.select(decoded.alias("items"), "weight")
    else:
        tx = (
            di_f.groupBy("doc_id")
            .agg(F.sort_array(F.collect_set("item")).alias("items"))
            .select("items", F.lit(1).cast("long").alias("weight"))
        )
    # Merged transactions are distinct-mask-sized (<= distinct docs, and
    # boilerplate collapses hard) — persist eagerly, then the corpus-sized
    # relations are never touched again.
    tx = tx.persist()
    tx.count()
    di.unpersist()

    def _pairs(items_col):
        return F.flatten(
            F.transform(
                items_col,
                lambda x, i: F.transform(
                    F.slice(items_col, i + 2, F.size(items_col)),
                    lambda y: F.struct(x.alias("i1"), y.alias("i2")),
                ),
            )
        )

    p2 = (
        tx.select(F.explode(_pairs(F.col("items"))).alias("p"), "weight")
        .groupBy("p.i1", "p.i2")
        .agg(F.sum("weight").alias("support"))
        .where(F.col("support") >= threshold)
    )

    out2 = p2.select(
        F.concat_ws(" ", "i1", "i2").alias("itemset"),
        F.lit(2).alias("set_size"),
        "support",
    )

    if max_set_size == 2:
        out = out2
    else:
        # Apriori level-2 prune: triples may only draw from items that
        # appear in some frequent pair (driver-collected — a subset of
        # the already-bounded F1 head).
        p2_items = sorted({
            x
            for r in p2.select("i1", "i2").collect()
            for x in (r.i1, r.i2)
        })
        if not p2_items:
            out = out2
        else:
            lit_p2 = F.array(*[F.lit(t) for t in p2_items])
            tx3 = tx.select(
                F.array_intersect(F.col("items"), lit_p2).alias("items"),
                "weight",
            ).where(F.size("items") >= 3)
            trip = F.flatten(
                F.transform(
                    F.col("items"),
                    lambda x, i: F.flatten(
                        F.transform(
                            F.slice(
                                F.col("items"), i + 2, F.size(F.col("items"))
                            ),
                            lambda y, j: F.transform(
                                F.slice(
                                    F.col("items"),
                                    i + j + 3,
                                    F.size(F.col("items")),
                                ),
                                lambda z: F.struct(
                                    x.alias("i1"), y.alias("i2"),
                                    z.alias("i3"),
                                ),
                            ),
                        )
                    ),
                )
            )
            p3 = (
                tx3.select(F.explode(trip).alias("t"), "weight")
                .groupBy("t.i1", "t.i2", "t.i3")
                .agg(F.sum("weight").alias("support"))
                .where(F.col("support") >= threshold)
            )
            if closed:
                # A pair is closed unless an equal-support triple
                # contains it.
                sub = p3.select(
                    F.col("i1").alias("a"), F.col("i2").alias("b"), "support"
                ).union(
                    p3.select(
                        F.col("i1").alias("a"), F.col("i3").alias("b"),
                        "support",
                    )
                ).union(
                    p3.select(
                        F.col("i2").alias("a"), F.col("i3").alias("b"),
                        "support",
                    )
                ).distinct()
                p2c = p2.join(
                    sub,
                    (p2.i1 == sub.a) & (p2.i2 == sub.b)
                    & (p2.support == sub.support),
                    "left_anti",
                )
                out2 = p2c.select(
                    F.concat_ws(" ", "i1", "i2").alias("itemset"),
                    F.lit(2).alias("set_size"),
                    "support",
                )
            out3 = p3.select(
                F.concat_ws(" ", "i1", "i2", "i3").alias("itemset"),
                F.lit(3).alias("set_size"),
                "support",
            )
            out = out2.unionByName(out3)

    res = out.orderBy(F.desc("support"), "itemset").limit(k).localCheckpoint()
    tx.unpersist()
    return res


def frequent_item_sets_sql(
    support_pct: int,
    max_set_size: int = 2,
    k: int = 20,
    closed: bool = False,
) -> str:
    """DuckDB oracle — plain distinct-(doc,item) self-joins with the same
    integer threshold."""
    if max_set_size not in (2, 3):
        raise ValueError("max_set_size must be 2 or 3")
    if not 1 <= support_pct <= 100:
        raise ValueError("support_pct must be in 1..100")
    from ..functions.tokenizer import TOKENS_CTE  # noqa: PLC0415

    thr = f"(SELECT ({support_pct} * count(*) + 99) // 100 FROM corpus)"
    base = f"""
WITH {CORPUS_CTE.strip()},
{TOKENS_CTE.strip()},
di AS (SELECT DISTINCT doc_id, term AS item FROM tokens),
f1 AS (SELECT item FROM di GROUP BY item HAVING count(*) >= {thr}),
dif AS (SELECT doc_id, item FROM di JOIN f1 USING (item)),
p2 AS (
  SELECT a.item AS i1, b.item AS i2, count(*) AS support
  FROM dif a JOIN dif b ON a.doc_id = b.doc_id AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= {thr})"""
    if max_set_size == 2:
        return base + f"""
SELECT i1 || ' ' || i2 AS itemset, 2 AS set_size, support
FROM p2 ORDER BY support DESC, itemset LIMIT {k}"""
    base += f""",
p3 AS (
  SELECT a.item AS i1, b.item AS i2, c.item AS i3, count(*) AS support
  FROM dif a
  JOIN dif b ON a.doc_id = b.doc_id AND a.item < b.item
  JOIN dif c ON b.doc_id = c.doc_id AND b.item < c.item
  GROUP BY 1, 2, 3 HAVING count(*) >= {thr})"""
    pair_src = "p2"
    if closed:
        base += """,
p2c AS (
  SELECT * FROM p2 WHERE NOT EXISTS (
    SELECT 1 FROM p3 WHERE p3.support = p2.support AND (
      (p3.i1 = p2.i1 AND p3.i2 = p2.i2) OR
      (p3.i1 = p2.i1 AND p3.i3 = p2.i2) OR
      (p3.i2 = p2.i1 AND p3.i3 = p2.i2))))"""
        pair_src = "p2c"
    return base + f"""
SELECT itemset, set_size, support FROM (
  SELECT i1 || ' ' || i2 AS itemset, 2 AS set_size, support FROM {pair_src}
  UNION ALL
  SELECT i1 || ' ' || i2 || ' ' || i3, 3, support FROM p3)
ORDER BY support DESC, itemset LIMIT {k}"""


# --------------------------------------------------------------------------
# ES categorize_text aggregation (ML log-pattern categorization)
# --------------------------------------------------------------------------

def categorize_text(
    corpus: DataFrame,
    max_matched_tokens: int = 5,
    k: int = 20,
) -> DataFrame:
    """ES ``categorize_text`` aggregation: groups message-like text into
    categories by token pattern.  Deterministic pin of the ES/ML drain
    heuristic: the category key is the doc's token stream with every
    token containing a digit DROPPED (digits mark variable parts — ids,
    counters, timestamps), truncated to the first ``max_matched_tokens``
    tokens and space-joined.  Docs whose every token is variable (empty
    key) are not categorized, as in ES.

    ES's similarity_threshold merging is load-order dependent and NOT
    reproduced; the digit-strip + prefix key is the deterministic core
    both Drain (He et al. 2017) and ES's categorizer share.

    Scale shape: ONE codegen'd map stage (tokenize, filter, slice,
    concat) + one hash agg on the category key; top-k.

    Output: (category, doc_count), support desc, category asc.
    """
    if max_matched_tokens < 1:
        raise ValueError("max_matched_tokens must be >= 1")
    key = F.concat_ws(
        " ",
        F.slice(
            F.filter(tokens("text"), lambda t: ~t.rlike(r"\p{N}")),
            1,
            max_matched_tokens,
        ),
    )
    return (
        corpus.select(key.alias("category"))
        .where(F.col("category") != "")
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.desc("doc_count"), "category")
        .limit(k)
    )


def categorize_text_sql(max_matched_tokens: int = 5, k: int = 20) -> str:
    if max_matched_tokens < 1:
        raise ValueError("max_matched_tokens must be >= 1")
    return f"""
WITH {CORPUS_CTE.strip()},
keys AS (
  SELECT array_to_string(
           list_slice(
             list_filter(
               list_filter(regexp_split_to_array(lower(text),
                           '{TOKEN_SPLIT_RE}'), t -> t <> ''),
               t -> NOT regexp_matches(t, '\\p{{N}}')),
             1, {max_matched_tokens}),
           ' ') AS category
  FROM corpus)
SELECT category, count(*) AS doc_count
FROM keys WHERE category <> ''
GROUP BY category ORDER BY doc_count DESC, category LIMIT {k}"""
