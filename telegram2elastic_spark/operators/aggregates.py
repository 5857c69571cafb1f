"""Aggregation operators from SURVEY.md §2.6, Spark-first.

All are single-shuffle hash aggregations with map-side partial aggregation
(Catalyst emits partial+final HashAggregate automatically); at 10^12 rows
the group keys here (source, day, event_type) are low-cardinality, so the
final stage is tiny and the work is embarrassingly parallel map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE


def _ordered_rollup(df: DataFrame, *order_cols) -> DataFrame:
    """Total order for a rollup-sized result without a range-partitioned
    sort.  An orderBy on a low-cardinality aggregate costs a range-
    sampling job plus an extra shuffle (measured: 3 extra AQE stage-jobs
    per op); coalescing the tiny final aggregate to one partition and
    sorting within it yields the identical total order in a single
    stage.  Only for outputs that are small BY CONTRACT (group keys here
    are low-cardinality rollup keys — see module docstring); never use
    on corpus-sized frames."""
    return df.coalesce(1).sortWithinPartitions(*order_cols)


def archive_counters(corpus: DataFrame) -> DataFrame:
    """A2 analogue: per-archive rollup counters the reference maintained
    row-at-a-time (total_messages += 1 ... telegram_client.py:392-396),
    re-expressed as one declarative agg over `source`."""
    return (
        corpus.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("total_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max(
                F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
            ).alias("last_doc_ts"),
            F.round(F.avg("n_chars"), 5).alias("avg_chars"),
        )
        .transform(_ordered_rollup, "source")
    )


ARCHIVE_COUNTERS_SQL = f"""
WITH {CORPUS_CTE.strip()}
SELECT source,
       count(*) AS total_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       max(strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ')) AS last_doc_ts,
       round(avg(n_chars), 5) AS avg_chars
FROM corpus GROUP BY source ORDER BY source
"""


def timeline_daily(corpus: DataFrame) -> DataFrame:
    """A5: docs per day (the reference's heatmap daily_counts,
    poc/docs/PRODUCTION_ARCHITECTURE.md:976-981); the groupBy key is the
    same expression as the daily ES index name (elasticsearch.py:10)."""
    return (
        corpus.groupBy(
            F.date_format("warc_ts", "yyyy-MM-dd").alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("lang").alias("n_langs"),
        )
        .transform(_ordered_rollup, "day")
    )


TIMELINE_DAILY_SQL = f"""
WITH {CORPUS_CTE.strip()}
SELECT strftime(warc_ts, '%Y-%m-%d') AS day,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs
FROM corpus GROUP BY 1 ORDER BY day
"""


def events_rollup(events: DataFrame) -> DataFrame:
    """Stream-table rollup over the events table (S3/A2 analogue):
    per event_type counters + engagement-style ratios."""
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 5).alias("total_value"),
            F.round(F.avg("value"), 5).alias("avg_value"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .transform(_ordered_rollup, "event_type")
    )


EVENTS_ROLLUP_SQL = """
SELECT event_type,
       count(*) AS n,
       round(sum(value), 5) AS total_value,
       round(avg(value), 5) AS avg_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def reactions_map(events: DataFrame) -> DataFrame:
    """C21: true MapType reactions op — the reference builds an
    emoji->count dict per message plus a summed total
    (poc/src/core/telegram_client.py:336-349 `reactions_data[emoji] =
    count; reactions_count += count`).  Here per user: event_type->count
    entries become a real MapType via sort_array + map_from_entries, the
    total is a higher-order `aggregate` over map_values (never leaves the
    map), and the map ships out as its canonical JSON encoding (sorted
    keys -> deterministic bytes for the cross-engine gate).

    One hash-agg shuffle on (user_id, event_type) with map-side combine,
    then one on user_id — group keys are low-cardinality relative to the
    event stream, so this scales like any counters rollup."""
    per = events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    m = F.map_from_entries(
        F.sort_array(F.collect_list(F.struct("event_type", "c")))
    )
    return (
        per.groupBy("user_id")
        .agg(m.alias("m"))
        .select(
            "user_id",
            F.size("m").alias("n_kinds"),
            F.aggregate(
                F.map_values("m"),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("total"),
            F.to_json("m").alias("reactions_json"),
        )
        .orderBy("user_id")
    )


REACTIONS_MAP_SQL = """
WITH per AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS INTEGER) AS n_kinds,
       CAST(sum(c) AS BIGINT) AS total,
       '{' || string_agg('"' || event_type || '":' || CAST(c AS VARCHAR),
                         ',' ORDER BY event_type) || '}' AS reactions_json
FROM per GROUP BY user_id ORDER BY user_id
"""


def top_users_per_type(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k per group (window O5/O6 family): highest-value users per
    event_type — rank window + filter, deterministic tie-break."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("total_value"), F.asc("user_id"))
    )
    per_user = events.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 5).alias("total_value")
    )
    return (
        per_user.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .transform(_ordered_rollup, "event_type", "rank")
    )


def top_users_per_type_sql(k: int = 3) -> str:
    return f"""
WITH per_user AS (
  SELECT event_type, user_id, round(sum(value), 5) AS total_value
  FROM events GROUP BY event_type, user_id
),
ranked AS (
  SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY total_value DESC, user_id ASC
  ) AS rank
  FROM per_user
)
SELECT event_type, user_id, total_value, rank FROM ranked
WHERE rank <= {k} ORDER BY event_type, rank
"""


def forward_chain_join(events: DataFrame) -> DataFrame:
    """J6 analogue (forwarded-message self-join, models.py:111-112):
    self-join events to the previous event of the same user by id — an
    equi self-join exercising shuffle-join planning (AQE picks the
    strategy; the join key is high-cardinality so no broadcast)."""
    prev = events.select(
        F.col("event_id").alias("prev_id"),
        F.col("user_id").alias("p_user"),
        F.col("event_type").alias("prev_type"),
    )
    return (
        events.join(
            prev,
            (events["user_id"] == prev["p_user"])
            & (events["event_id"] == prev["prev_id"] + 1),
            "inner",
        )
        .select("event_id", "user_id", "event_type", "prev_type")
        .orderBy("event_id")
    )


FORWARD_CHAIN_SQL = """
SELECT e.event_id, e.user_id, e.event_type, p.event_type AS prev_type
FROM events e
JOIN events p ON e.user_id = p.user_id AND e.event_id = p.event_id + 1
ORDER BY e.event_id
"""


def timeline_rollup(corpus: DataFrame) -> DataFrame:
    """A8 (grouping sets): day x lang rollup with subtotals + grand total —
    the reference's dashboard heatmaps (PRODUCTION_ARCHITECTURE.md:903-996)
    as one multi-level aggregation instead of N separate queries.
    ROLLUP is a single shuffle (Catalyst expands grouping sets map-side)."""
    return (
        corpus.rollup(
            F.date_format("warc_ts", "yyyy-MM-dd").alias("day"), "lang"
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .select(
            F.coalesce("day", F.lit("ALL")).alias("day"),
            F.coalesce("lang", F.lit("ALL")).alias("lang"),
            "n_docs",
            "total_chars",
        )
        .orderBy("day", "lang")
    )


TIMELINE_ROLLUP_SQL = f"""
WITH {CORPUS_CTE.strip()}
SELECT coalesce(strftime(warc_ts, '%Y-%m-%d'), 'ALL') AS day,
       coalesce(lang, 'ALL') AS lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM corpus
GROUP BY ROLLUP (strftime(warc_ts, '%Y-%m-%d'), lang)
ORDER BY day, lang
"""


def agg_percentiles(corpus: DataFrame) -> DataFrame:
    """ES `percentiles` metric aggregation: per-lang p50/p95/p99 of
    document length (reference dashboards chart message-size
    distributions from ES aggs, README.md:5).  Exact interpolated
    percentiles via the built-in `percentile` expression — one hash
    aggregate with map-side partial sketches (Spark accumulates per-group
    digests, no per-group sort materialization), identical linear
    interpolation to ANSI percentile_cont.  At ES-scale the approximate
    twin is percentile_approx (t-digest, same plan shape); the exact form
    is registered so the DuckDB oracle pins values."""
    pct = F.percentile("n_chars", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    return (
        corpus.groupBy("lang")
        .agg(pct.alias("p"))
        .select(
            "lang",
            F.round(F.col("p")[0], 4).alias("p50"),
            F.round(F.col("p")[1], 4).alias("p95"),
            F.round(F.col("p")[2], 4).alias("p99"),
        )
        .orderBy("lang")
    )


AGG_PERCENTILES_SQL = """
SELECT lang,
       round(quantile_cont(n_chars, 0.5),  4) AS p50,
       round(quantile_cont(n_chars, 0.95), 4) AS p95,
       round(quantile_cont(n_chars, 0.99), 4) AS p99
FROM documents
GROUP BY lang
ORDER BY lang
"""


def agg_percentile_ranks(
    corpus: DataFrame, values: tuple = (500, 1500, 3000)
) -> DataFrame:
    """ES `percentile_ranks` metric aggregation (the inverse of
    `percentiles`): for each given value, the percentage of docs whose
    n_chars is <= that value, per lang.  Exact rank = conditional count
    over total — the whole vector computes in ONE map-side-combinable
    hash aggregate (a conditional sum per requested value), no sort, no
    digest needed for the exact form; ES's t-digest twin has the same
    plan shape."""
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.sum(F.when(F.col("n_chars") <= int(v), 1).otherwise(0)).alias(
            f"c{i}"
        )
        for i, v in enumerate(values)
    ]
    out = corpus.groupBy("lang").agg(*aggs)
    cols = [
        F.round(F.col(f"c{i}") * 100.0 / F.col("n"), 4).alias(f"rank_{int(v)}")
        for i, v in enumerate(values)
    ]
    return out.select("lang", *cols).orderBy("lang")


def agg_percentile_ranks_sql(values: tuple = (500, 1500, 3000)) -> str:
    cols = ",\n       ".join(
        f"round(100.0 * sum(CASE WHEN n_chars <= {int(v)} THEN 1 ELSE 0 END)"
        f" / count(*), 4) AS rank_{int(v)}"
        for v in values
    )
    return f"""
SELECT lang,
       {cols}
FROM documents
GROUP BY lang
ORDER BY lang
"""


KMV_K = 32


def agg_cardinality_kmv(corpus: DataFrame, k: int = KMV_K) -> DataFrame:
    """ES `cardinality` aggregation as a deterministic KMV (k-minimum-
    values) sketch: distinct-text estimate = (k-1) / h_(k), where h_(k)
    is the k-th smallest distinct md5-derived hash normalized to [0,1).
    md5 is computed identically by Spark and DuckDB, so the oracle pins
    the exact estimate — the determinism trick that makes an
    approximate-cardinality operator driver-gateable (ES's HLL++ sketch
    has the same shape: tiny fixed-size state merged associatively).

    Scale shape: the map side keeps only hashes (distinct collapses in
    the partial aggregate); the k smallest survive via TakeOrdered — the
    shuffle carries O(k) rows per partition, never the distinct set.  At
    10^12 docs a static hash-threshold pre-filter (keep h < k*16^8/N_lo)
    drops virtually all rows before the shuffle."""
    h = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("bigint")
    kth = (
        corpus.select(h.alias("h"))
        .distinct()
        .orderBy("h")
        .limit(int(k))
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("n"))
    )
    space = float(16 ** 8)
    return kth.select(
        F.lit(int(k)).alias("k"),
        F.col("kth").alias("kth_hash"),
        F.when(
            F.col("n") < int(k), F.col("n").cast("double")
        ).otherwise(
            F.round((int(k) - 1) * space / F.col("kth"), 2)
        ).alias("est_distinct"),
    )


def agg_cardinality_kmv_sql(k: int = KMV_K) -> str:
    return f"""
WITH h AS (
  SELECT DISTINCT CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT) AS h
  FROM documents
),
kmin AS (SELECT h FROM h ORDER BY h LIMIT {k}),
agg AS (SELECT max(h) AS kth, count(*) AS n FROM kmin)
SELECT {k} AS k,
       kth AS kth_hash,
       CASE WHEN n < {k} THEN CAST(n AS DOUBLE)
            ELSE round(({k} - 1) * 4294967296.0 / kth, 2) END AS est_distinct
FROM agg
"""


def timeline_pipeline(corpus: DataFrame, window: int = 3) -> DataFrame:
    """ES pipeline aggregations over a date_histogram: `cumulative_sum`,
    `derivative` (first bucket null) and a trailing `moving_fn` average
    (window `window`, shrinking at the left edge like ES) on the hourly
    doc counts.  The reference's Kibana dashboards chart these series
    over the per-day ES indices (README.md:5).

    Scale shape: the parent histogram is one map-side hash aggregate;
    every pipeline agg is a Window over the BUCKET sequence — axis-sized
    data (hours of history), thousands of rows at a century of corpus,
    so the single-partition window over buckets is free.  The corpus is
    touched exactly once."""
    from pyspark.sql import Window

    buckets = (
        corpus.groupBy(
            F.date_format(
                F.date_trunc("hour", "warc_ts"), "yyyy-MM-dd HH:00"
            ).alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # bounded, bucket-count-sized frames: the lit(0) partition is the
    # deliberate single-partition window over axis data (see
    # query/search.py bounded-window note)
    w = Window.partitionBy(F.lit(0)).orderBy("hour")
    return (
        buckets.withColumn(
            "cum_docs",
            F.sum("n_docs").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn("deriv", F.col("n_docs") - F.lag("n_docs", 1).over(w))
        .withColumn(
            "moving_avg",
            F.round(
                F.avg("n_docs").over(w.rowsBetween(-(int(window) - 1), 0)), 4
            ),
        )
        .select("hour", "n_docs", "cum_docs", "deriv", "moving_avg")
        .orderBy("hour")
    )


def timeline_pipeline_sql(window: int = 3) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
buckets AS (
  SELECT strftime(date_trunc('hour', warc_ts), '%Y-%m-%d %H:00') AS hour,
         count(*) AS n_docs
  FROM corpus GROUP BY 1
)
SELECT hour, n_docs,
       CAST(sum(n_docs) OVER (ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_docs,
       n_docs - lag(n_docs, 1) OVER (ORDER BY hour) AS deriv,
       round(avg(n_docs) OVER (ORDER BY hour
           ROWS BETWEEN {int(window) - 1} PRECEDING AND CURRENT ROW), 4)
           AS moving_avg
FROM buckets
ORDER BY hour
"""


def timeline_bucket_sort(
    corpus: DataFrame, size: int = 10, skip: int = 0
) -> DataFrame:
    """ES `bucket_sort` pipeline aggregation: re-order the parent
    date_histogram's buckets by a metric (doc count desc, bucket key asc
    on ties) and page with from/size — the "busiest hours" dashboard
    shape.  The parent histogram is one map-side hash aggregate; the
    sort runs over AXIS-sized bucket rows, so the orderBy/limit is a
    TakeOrdered over thousands of rows at any corpus size.  `skip`
    pages via a bounded window rank over the already-limited head
    (skip+size rows), never a global row_number."""
    from pyspark.sql import Window

    buckets = (
        corpus.groupBy(
            F.date_format(
                F.date_trunc("hour", "warc_ts"), "yyyy-MM-dd HH:00"
            ).alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    head = buckets.orderBy(F.desc("n_docs"), F.asc("hour")).limit(
        int(skip) + int(size)
    )
    if not skip:
        return head
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("n_docs"), F.asc("hour"))
    return (
        head.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > int(skip))
        .drop("rn")
    )


def timeline_bucket_sort_sql(size: int = 10, skip: int = 0) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
buckets AS (
  SELECT strftime(date_trunc('hour', warc_ts), '%Y-%m-%d %H:00') AS hour,
         count(*) AS n_docs
  FROM corpus GROUP BY 1
)
SELECT hour, n_docs FROM buckets
ORDER BY n_docs DESC, hour ASC
LIMIT {int(size)} OFFSET {int(skip)}
"""


def agg_bucket_selector(
    corpus: DataFrame, min_docs: int = 5, min_avg_chars: float = 200.0
) -> DataFrame:
    """ES `bucket_selector` pipeline aggregation: drop parent buckets
    whose metrics fail the script predicate — here a daily
    date_histogram with two metrics (doc count, avg n_chars) kept iff
    `n_docs >= min_docs && avg_chars > min_avg_chars` (the canonical
    "params.count >= X" buckets_path script).  Surviving buckets keep
    key order, like ES.

    Shape: the parent histogram is one map-side-combinable hash agg; the
    selector is a FILTER over axis-sized bucket rows — never a second
    pass over the corpus.  avg rounded to 4 before comparing (and in the
    output) so both engines apply the predicate to identical values."""
    buckets = corpus.groupBy(
        F.date_format("warc_ts", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
    return buckets.filter(
        (F.col("n_docs") >= int(min_docs))
        & (F.col("avg_chars") > float(min_avg_chars))
    ).orderBy("day")


def agg_bucket_selector_sql(
    min_docs: int = 5, min_avg_chars: float = 200.0
) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
buckets AS (
  SELECT strftime(warc_ts, '%Y-%m-%d') AS day,
         count(*) AS n_docs,
         round(avg(n_chars), 4) AS avg_chars
  FROM corpus GROUP BY 1
)
SELECT day, n_docs, avg_chars FROM buckets
WHERE n_docs >= {int(min_docs)} AND avg_chars > {float(min_avg_chars)!r}
ORDER BY day
"""


def timeline_serial_diff(corpus: DataFrame, lag: int = 24) -> DataFrame:
    """ES `serial_diff` pipeline aggregation: n_docs minus the value
    `lag` buckets earlier (the seasonality-removal shape — lag=24 on an
    hourly histogram differences against the same hour yesterday).
    Buckets with no lagged predecessor emit null, like ES.  Same
    axis-sized single-partition window as timeline_pipeline."""
    from pyspark.sql import Window

    buckets = (
        corpus.groupBy(
            F.date_format(
                F.date_trunc("hour", "warc_ts"), "yyyy-MM-dd HH:00"
            ).alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    w = Window.partitionBy(F.lit(0)).orderBy("hour")
    return (
        buckets.withColumn(
            "diff", F.col("n_docs") - F.lag("n_docs", int(lag)).over(w)
        )
        .select("hour", "n_docs", "diff")
        .orderBy("hour")
    )


def timeline_serial_diff_sql(lag: int = 24) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
buckets AS (
  SELECT strftime(date_trunc('hour', warc_ts), '%Y-%m-%d %H:00') AS hour,
         count(*) AS n_docs
  FROM corpus GROUP BY 1
)
SELECT hour, n_docs,
       n_docs - lag(n_docs, {int(lag)}) OVER (ORDER BY hour) AS diff
FROM buckets
ORDER BY hour
"""


def agg_extended_stats(corpus: DataFrame) -> DataFrame:
    """ES `extended_stats` metric aggregation per lang: count / min /
    max / sum / avg / population variance+stddev of document length.
    One hash aggregate, all moments map-side-combinable (sum, sum of
    squares) — the distributed-moments shape ES uses.  Variance is
    computed from the raw moments (E[x^2] - E[x]^2) IDENTICALLY in both
    engines and rounded, so the oracle hash is stable where a builtin
    var_pop's summation order would not be."""
    n = F.count(F.lit(1)).cast("double")
    s = F.sum(F.col("n_chars").cast("double"))
    s2 = F.sum(F.col("n_chars").cast("double") * F.col("n_chars"))
    var = s2 / n - (s / n) * (s / n)
    return (
        corpus.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(s / n, 4).alias("avg_chars"),
            F.round(var, 4).alias("var_chars"),
            F.round(F.sqrt(var), 4).alias("std_chars"),
        )
        .orderBy("lang")
    )


AGG_EXTENDED_STATS_SQL = """
SELECT lang,
       count(*) AS cnt,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       round(sum(CAST(n_chars AS DOUBLE)) / count(*), 4) AS avg_chars,
       round(sum(CAST(n_chars AS DOUBLE) * n_chars) / count(*)
             - (sum(CAST(n_chars AS DOUBLE)) / count(*))
               * (sum(CAST(n_chars AS DOUBLE)) / count(*)), 4) AS var_chars,
       round(sqrt(sum(CAST(n_chars AS DOUBLE) * n_chars) / count(*)
             - (sum(CAST(n_chars AS DOUBLE)) / count(*))
               * (sum(CAST(n_chars AS DOUBLE)) / count(*))), 4) AS std_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def agg_histogram(corpus: DataFrame, interval: int = 100) -> DataFrame:
    """ES numeric `histogram` aggregation: doc-length buckets of fixed
    `interval` (key = floor(n/interval)*interval, ES bucket-key rule) —
    one map-side-combinable hash aggregate."""
    key = (F.floor(F.col("n_chars") / int(interval)) * int(interval)).cast(
        "long"
    )
    return (
        corpus.groupBy(key.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("bucket")
    )


def agg_histogram_sql(interval: int = 100) -> str:
    return f"""
SELECT CAST(floor(n_chars / {int(interval)}) * {int(interval)} AS BIGINT)
           AS bucket,
       count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars
FROM documents
GROUP BY 1
ORDER BY bucket
"""


def doc_termvectors(corpus: DataFrame, doc_id: int = 7) -> DataFrame:
    """ES `_termvectors` API: one document's (term, freq, first_position)
    vector, computed on the fly from the stored text exactly like ES does
    when term vectors aren't indexed.  The doc_id predicate is pushed to
    the scan — one document is tokenized, never the corpus."""
    from ..functions.tokenizer import tokens

    return (
        corpus.filter(F.col("doc_id") == int(doc_id))
        .select(F.posexplode(tokens("text")).alias("pos0", "term"))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            (F.min("pos0") + 1).alias("first_pos"),
        )
        .orderBy("term")
    )


def doc_termvectors_sql(doc_id: int = 7) -> str:
    from ..functions.tokenizer import TOKEN_SPLIT_RE

    return f"""
WITH {CORPUS_CTE.strip()},
toks AS (
  SELECT t.term, t.pos
  FROM (
    SELECT list_filter(regexp_split_to_array(lower(text),
               '{TOKEN_SPLIT_RE}'), x -> x <> '') AS ts
    FROM corpus WHERE doc_id = {int(doc_id)}
  ), LATERAL (
    SELECT unnest(ts) AS term, generate_subscripts(ts, 1) AS pos
  ) t
)
SELECT term,
       count(*) AS freq,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM toks
GROUP BY term
ORDER BY term
"""


def mtermvectors(corpus: DataFrame, doc_ids: list[int] = (3, 7, 11)) -> DataFrame:
    """ES `_mtermvectors` API: per-doc (term, freq, first_position)
    vectors for a small id set in one request.  The `doc_id IN (...)`
    predicate is pushed to the scan (partition pruning / row-group stats
    at scale) — only the requested docs are tokenized."""
    from ..functions.tokenizer import tokens

    ids = [int(d) for d in doc_ids]
    return (
        corpus.filter(F.col("doc_id").isin(ids))
        .select("doc_id", F.posexplode(tokens("text")).alias("pos0", "term"))
        .groupBy("doc_id", "term")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            (F.min("pos0") + 1).alias("first_pos"),
        )
        .orderBy("doc_id", "term")
    )


def mtermvectors_sql(doc_ids: list[int] = (3, 7, 11)) -> str:
    from ..functions.tokenizer import TOKEN_SPLIT_RE

    in_list = ", ".join(str(int(d)) for d in doc_ids)
    return f"""
WITH {CORPUS_CTE.strip()},
toks AS (
  SELECT s.doc_id, t.term, t.pos
  FROM (
    SELECT doc_id,
           list_filter(regexp_split_to_array(lower(text),
               '{TOKEN_SPLIT_RE}'), x -> x <> '') AS ts
    FROM corpus WHERE doc_id IN ({in_list})
  ) s, LATERAL (
    SELECT unnest(ts) AS term, generate_subscripts(ts, 1) AS pos
  ) t
)
SELECT doc_id, term,
       count(*) AS freq,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM toks
GROUP BY doc_id, term
ORDER BY doc_id, term
"""


def timeline_bucket_script(
    corpus: DataFrame, needle: str = "merge", min_docs: int = 50
) -> DataFrame:
    """ES `bucket_script` + `bucket_selector` pipeline aggs over an
    hourly date_histogram: each bucket carries total docs and docs whose
    text contains `needle`; bucket_script computes the per-bucket ratio
    match_docs / n_docs, bucket_selector drops buckets with fewer than
    `min_docs` docs (the ES "hide noise hours" dashboard pattern).

    Scale shape: ONE corpus scan — the needle sub-count is a conditional
    sum inside the same map-side hash aggregate as the parent histogram;
    script and selector run on axis-sized bucket rows (no second pass,
    no window needed since the script references only its own bucket).
    The ratio divides two exact integer counts, so both engines produce
    the identical double."""
    return (
        corpus.groupBy(
            F.date_format(
                F.date_trunc("hour", "warc_ts"), "yyyy-MM-dd HH:00"
            ).alias("hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.lower(F.col("text")).contains(needle.lower()), 1
                ).otherwise(0)
            ).alias("match_docs"),
        )
        .filter(F.col("n_docs") >= int(min_docs))
        .withColumn(
            "match_ratio",
            F.round(F.col("match_docs") / F.col("n_docs"), 6),
        )
        .orderBy("hour")
    )


def timeline_bucket_script_sql(
    needle: str = "merge", min_docs: int = 50
) -> str:
    nl = needle.replace("'", "''").lower()
    return f"""
WITH {CORPUS_CTE.strip()},
buckets AS (
  SELECT strftime(date_trunc('hour', warc_ts), '%Y-%m-%d %H:00') AS hour,
         count(*) AS n_docs,
         CAST(sum(CASE WHEN contains(lower(text), '{nl}') THEN 1 ELSE 0 END)
              AS BIGINT) AS match_docs
  FROM corpus GROUP BY 1
)
SELECT hour, n_docs, match_docs,
       round(match_docs / CAST(n_docs AS DOUBLE), 6) AS match_ratio
FROM buckets
WHERE n_docs >= {int(min_docs)}
ORDER BY hour
"""


def matrix_stats(corpus: DataFrame) -> DataFrame:
    """ES `matrix_stats` aggregation over (n_chars, doc_len): per-field
    count/mean/variance plus the cross-field covariance and Pearson
    correlation.  Distributed shape: every statistic derives from the
    raw moments (sum x, sum x^2, sum x*y, n) — a SINGLE map-side-
    combinable hash aggregate over one scan, no second pass.  Both input
    fields are exact integers, so the moment sums are exact in IEEE
    doubles and both engines derive bit-identical statistics before the
    cosmetic rounding."""
    from ..functions.tokenizer import tokens

    base = corpus.select(
        F.col("n_chars").cast("double").alias("x"),
        F.size(tokens("text")).cast("double").alias("y"),
    )
    m = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    mean_x, mean_y = F.col("sx") / n, F.col("sy") / n
    var_x = F.col("sxx") / n - mean_x * mean_x
    var_y = F.col("syy") / n - mean_y * mean_y
    cov = F.col("sxy") / n - mean_x * mean_y
    return m.select(
        F.col("n").alias("doc_count"),
        F.round(mean_x, 6).alias("mean_chars"),
        F.round(mean_y, 6).alias("mean_tokens"),
        F.round(var_x, 6).alias("var_chars"),
        F.round(var_y, 6).alias("var_tokens"),
        F.round(cov, 6).alias("covariance"),
        F.round(cov / F.sqrt(var_x * var_y), 6).alias("correlation"),
    )


def matrix_stats_sql() -> str:
    from ..functions.tokenizer import DOC_LEN_SQL

    return f"""
WITH {CORPUS_CTE.strip()},
base AS (
  SELECT CAST(n_chars AS DOUBLE) AS x,
         CAST({DOC_LEN_SQL} AS DOUBLE) AS y
  FROM corpus
),
m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x*x) AS sxx, sum(y*y) AS syy, sum(x*y) AS sxy
  FROM base
)
SELECT n AS doc_count,
       round(sx/n, 6) AS mean_chars,
       round(sy/n, 6) AS mean_tokens,
       round(sxx/n - (sx/n)*(sx/n), 6) AS var_chars,
       round(syy/n - (sy/n)*(sy/n), 6) AS var_tokens,
       round(sxy/n - (sx/n)*(sy/n), 6) AS covariance,
       round((sxy/n - (sx/n)*(sy/n))
             / sqrt((sxx/n - (sx/n)*(sx/n)) * (syy/n - (sy/n)*(sy/n))),
             6) AS correlation
FROM m
"""


def agg_multi_terms(corpus: DataFrame, k: int = 10) -> DataFrame:
    """ES `multi_terms` aggregation: buckets keyed by the (lang, source)
    term TUPLE, ordered by doc count desc (key asc tie-break), top-k.
    One map-side-combinable hash aggregate on the compound key — the
    compound cardinality is |langs| x |sources|, still tiny, so the
    final ordering is axis-sized."""
    return (
        corpus.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("lang"), F.asc("source"))
        .limit(k)
    )


def agg_multi_terms_sql(k: int = 10) -> str:
    return f"""
SELECT lang, source, count(*) AS cnt
FROM documents
GROUP BY lang, source
ORDER BY cnt DESC, lang ASC, source ASC
LIMIT {k}
"""


def agg_weighted_avg(corpus: DataFrame) -> DataFrame:
    """ES `weighted_avg` metric agg per lang bucket: value = n_chars,
    weight = the stored html payload size (octet_length).  Both value
    and weight are exact integers, so sum(v*w) and sum(w) are exact in
    either engine — the single double division is the only float surface,
    absorbed by the rounding."""
    return (
        corpus.groupBy("lang")
        .agg(
            F.round(
                F.sum(F.col("n_chars").cast("long") * F.octet_length("html"))
                / F.sum(F.octet_length("html")),
                4,
            ).alias("wavg_chars"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("lang")
    )


def agg_weighted_avg_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT lang,
       round(sum(CAST(n_chars AS BIGINT) * octet_length(html))
             / CAST(sum(octet_length(html)) AS DOUBLE), 4) AS wavg_chars,
       count(*) AS cnt
FROM corpus
GROUP BY lang
ORDER BY lang
"""


def agg_string_stats(corpus: DataFrame) -> DataFrame:
    """ES `string_stats` (with show_distribution's entropy) over the url
    keyword field: count, min/max/avg length, Shannon entropy (bits) of
    the character distribution across ALL urls.

    Scale shape: lengths are one scan + one agg; the entropy pass
    explodes characters but aggregates to <=|alphabet| rows map-side
    (the per-char counts combine before the shuffle), then the entropy
    sum is alphabet-sized on the driver side of a 1-row cross join."""
    lens = corpus.agg(
        F.count(F.lit(1)).alias("count"),
        F.min(F.length("url")).alias("min_length"),
        F.max(F.length("url")).alias("max_length"),
        F.round(F.avg(F.length("url")), 4).alias("avg_length"),
    )
    chars = (
        corpus.select(F.explode(F.split("url", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ent = (
        chars.crossJoin(chars.agg(F.sum("n").alias("tot")))
        .agg(
            F.round(
                -F.sum(
                    (F.col("n") / F.col("tot"))
                    * F.log2(F.col("n") / F.col("tot"))
                ),
                4,
            ).alias("entropy")
        )
    )
    return lens.crossJoin(ent)


def agg_string_stats_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
lens AS (
  SELECT count(*) AS count,
         min(length(url)) AS min_length,
         max(length(url)) AS max_length,
         round(avg(length(url)), 4) AS avg_length
  FROM corpus
),
chars AS (
  SELECT ch, count(*) AS n
  FROM corpus, LATERAL (SELECT unnest(string_split(url, '')) AS ch)
  WHERE ch <> ''
  GROUP BY ch
),
ent AS (
  SELECT round(-sum((n / tot) * log2(n / tot)), 4) AS entropy
  FROM chars CROSS JOIN (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM chars)
)
SELECT lens.*, ent.entropy FROM lens CROSS JOIN ent
"""


def agg_bucket_metrics(corpus: DataFrame) -> DataFrame:
    """ES sibling pipeline aggs min_bucket / max_bucket / avg_bucket /
    sum_bucket / stats_bucket over the daily date_histogram: ONE row
    (min_cnt, min_day, max_cnt, max_day, avg_cnt, sum_cnt, n_buckets).
    ES reports ALL tied keys; this engine picks the smallest day
    (deterministic) — min_by/max_by on the (cnt, day) struct, so ties
    never depend on partitioning.  The bucket axis is day-sized: the
    pipeline stage is a single tiny aggregate after the one histogram
    shuffle."""
    daily = corpus.groupBy(
        F.date_format("warc_ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return daily.agg(
        F.min("cnt").alias("min_cnt"),
        F.min_by("day", F.struct(F.col("cnt"), F.col("day"))).alias("min_day"),
        F.max("cnt").alias("max_cnt"),
        F.min_by(
            "day", F.struct((-F.col("cnt")).alias("c"), F.col("day"))
        ).alias("max_day"),
        F.round(F.avg("cnt"), 4).alias("avg_cnt"),
        F.sum("cnt").alias("sum_cnt"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


def agg_bucket_metrics_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
daily AS (
  SELECT strftime(warc_ts, '%Y-%m-%d') AS day, count(*) AS cnt
  FROM corpus GROUP BY 1
),
m AS (SELECT min(cnt) AS mn, max(cnt) AS mx FROM daily)
SELECT m.mn AS min_cnt,
       (SELECT min(day) FROM daily WHERE cnt = m.mn) AS min_day,
       m.mx AS max_cnt,
       (SELECT min(day) FROM daily WHERE cnt = m.mx) AS max_day,
       (SELECT round(avg(cnt), 4) FROM daily) AS avg_cnt,
       (SELECT CAST(sum(cnt) AS BIGINT) FROM daily) AS sum_cnt,
       (SELECT count(*) FROM daily) AS n_buckets
FROM m
"""


def agg_normalize_pct(corpus: DataFrame) -> DataFrame:
    """ES `normalize` pipeline agg (method=percent_of_sum) over the daily
    histogram: each bucket's share of total docs.  The total comes from a
    1-row broadcast cross join, not a Window — no single-partition window
    over the bucket axis."""
    daily = corpus.groupBy(
        F.date_format("warc_ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    total = daily.agg(F.sum("cnt").alias("tot"))
    return (
        daily.crossJoin(F.broadcast(total))
        .select(
            "day",
            "cnt",
            F.round(F.lit(100.0) * F.col("cnt") / F.col("tot"), 4).alias(
                "pct_of_sum"
            ),
        )
        .orderBy("day")
    )


def agg_normalize_pct_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
daily AS (
  SELECT strftime(warc_ts, '%Y-%m-%d') AS day, count(*) AS cnt
  FROM corpus GROUP BY 1
)
SELECT day, cnt,
       round(100.0 * cnt / (SELECT sum(cnt) FROM daily), 4) AS pct_of_sum
FROM daily
ORDER BY day
"""


def agg_boxplot(corpus: DataFrame) -> DataFrame:
    """ES `boxplot` metric aggregation per lang: min / q1 / q2 (median) /
    q3 / max of document length.  Quartiles share agg_percentiles'
    machinery — one hash aggregate with map-side partial state, exact
    linear interpolation matching ANSI percentile_cont (ES serves the
    same five numbers from a TDigest; the exact form is registered so the
    oracle pins values, and percentile_approx is the drop-in at-scale
    twin with the identical plan shape)."""
    q = F.percentile("n_chars", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return (
        corpus.groupBy("lang")
        .agg(
            F.min("n_chars").alias("min_chars"),
            q.alias("q"),
            F.max("n_chars").alias("max_chars"),
        )
        .select(
            "lang",
            "min_chars",
            F.round(F.col("q")[0], 4).alias("q1"),
            F.round(F.col("q")[1], 4).alias("q2"),
            F.round(F.col("q")[2], 4).alias("q3"),
            "max_chars",
        )
        .orderBy("lang")
    )


AGG_BOXPLOT_SQL = """
SELECT lang,
       min(n_chars) AS min_chars,
       round(quantile_cont(n_chars, 0.25), 4) AS q1,
       round(quantile_cont(n_chars, 0.5),  4) AS q2,
       round(quantile_cont(n_chars, 0.75), 4) AS q3,
       max(n_chars) AS max_chars
FROM documents
GROUP BY lang
ORDER BY lang
"""


def agg_t_test(
    corpus: DataFrame,
    filter_a: str = "source = 'src0'",
    filter_b: str = "source = 'src1'",
) -> DataFrame:
    """ES `t_test` metric aggregation (heteroscedastic / Welch's,
    ES's default): t-statistic for document length between two filter
    populations.  One pass: each row contributes (n, sum, sum-of-squares)
    to its population via conditional aggregates — a single map-side-
    combinable hash aggregate with NO join and no second scan, the same
    raw-moments trick as extended_stats (summation-order-proof, so the
    rounded value is engine-portable).  t = (m_a - m_b) /
    sqrt(s2_a/n_a + s2_b/n_b) with SAMPLE variances."""
    x = F.col("n_chars").cast("double")
    stats = corpus.select(
        F.expr(filter_a).alias("in_a"), F.expr(filter_b).alias("in_b"), x.alias("x")
    ).agg(
        F.count(F.when(F.col("in_a"), 1)).cast("double").alias("na"),
        F.sum(F.when(F.col("in_a"), F.col("x"))).alias("sa"),
        F.sum(F.when(F.col("in_a"), F.col("x") * F.col("x"))).alias("qa"),
        F.count(F.when(F.col("in_b"), 1)).cast("double").alias("nb"),
        F.sum(F.when(F.col("in_b"), F.col("x"))).alias("sb"),
        F.sum(F.when(F.col("in_b"), F.col("x") * F.col("x"))).alias("qb"),
    )
    ma = F.col("sa") / F.col("na")
    mb = F.col("sb") / F.col("nb")
    va = (F.col("qa") - F.col("na") * ma * ma) / (F.col("na") - 1)
    vb = (F.col("qb") - F.col("nb") * mb * mb) / (F.col("nb") - 1)
    return stats.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(ma, 4).alias("mean_a"),
        F.round(mb, 4).alias("mean_b"),
        F.round(
            (ma - mb) / F.sqrt(va / F.col("na") + vb / F.col("nb")), 5
        ).alias("t_value"),
    )


def agg_t_test_sql(
    filter_a: str = "source = 'src0'", filter_b: str = "source = 'src1'"
) -> str:
    return f"""
WITH m AS (
  SELECT
    CAST(count(*) FILTER (WHERE {filter_a}) AS DOUBLE) AS na,
    sum(CAST(n_chars AS DOUBLE)) FILTER (WHERE {filter_a}) AS sa,
    sum(CAST(n_chars AS DOUBLE) * n_chars) FILTER (WHERE {filter_a}) AS qa,
    CAST(count(*) FILTER (WHERE {filter_b}) AS DOUBLE) AS nb,
    sum(CAST(n_chars AS DOUBLE)) FILTER (WHERE {filter_b}) AS sb,
    sum(CAST(n_chars AS DOUBLE) * n_chars) FILTER (WHERE {filter_b}) AS qb
  FROM documents
)
SELECT CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       round(sa / na, 4) AS mean_a,
       round(sb / nb, 4) AS mean_b,
       round((sa / na - sb / nb)
             / sqrt(((qa - na * (sa / na) * (sa / na)) / (na - 1)) / na
                    + ((qb - nb * (sb / nb) * (sb / nb)) / (nb - 1)) / nb),
             5) AS t_value
FROM m
"""


def agg_top_metrics(corpus: DataFrame) -> DataFrame:
    """ES `top_metrics` aggregation: per lang bucket, the metrics of the
    single top document by the sort field (newest warc_ts — unique by
    construction, so the pick is deterministic without a tie-break).
    One hash aggregate with map-side-combinable max_by partial state —
    NO per-bucket sort and no window; the shape ES itself uses (a
    per-bucket 1-element heap)."""
    return (
        corpus.groupBy("lang")
        .agg(
            F.max("warc_ts").alias("top_ts"),
            F.max_by("doc_id", "warc_ts").alias("top_doc_id"),
            F.max_by("n_chars", "warc_ts").alias("top_n_chars"),
        )
        .orderBy("lang")
    )


def agg_top_metrics_sql() -> str:
    from ..corpus import CORPUS_CTE

    return f"""
WITH {CORPUS_CTE.strip()}
SELECT lang,
       max(warc_ts) AS top_ts,
       arg_max(doc_id, warc_ts) AS top_doc_id,
       arg_max(n_chars, warc_ts) AS top_n_chars
FROM corpus
GROUP BY lang
ORDER BY lang
"""


# --- ES global / missing aggregations -------------------------------------

def agg_global(corpus: DataFrame, lang: str = "en") -> DataFrame:
    """ES `global` aggregation: inside a filtered search context the
    global agg computes over ALL documents, ignoring the query — the
    "show matched count next to corpus-wide stats" pattern.  One scan,
    two conditional aggregates (the filter becomes a CASE inside the
    same map-side hash agg — no second pass over the data)."""
    return corpus.agg(
        F.count(F.when(F.col("lang") == lang, 1)).alias("matched_docs"),
        F.count(F.lit(1)).alias("global_docs"),
        F.round(F.avg("n_chars"), 4).alias("global_avg_chars"),
    )


def agg_global_sql(lang: str = "en") -> str:
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT count(*) FILTER (WHERE lang = '{lang}') AS matched_docs,
       count(*) AS global_docs,
       round(avg(n_chars), 4) AS global_avg_chars
FROM corpus
"""


# The corpus has no absent fields (every column is populated), so the
# `missing` agg exercises a DERIVED optional field: `referrer` is NULL for
# every 7th doc — the web-page-without-a-referrer analogue, deterministic
# in both engines.
REFERRER_MOD = 7


def _referrer_col() -> F.Column:
    return F.when(F.col("doc_id") % REFERRER_MOD == 0, F.lit(None)).otherwise(
        F.concat(F.lit("https://ref"), (F.col("doc_id") % 13).cast("string"))
    )


REFERRER_SQL = (
    f"CASE WHEN doc_id % {REFERRER_MOD} = 0 THEN NULL "
    "ELSE 'https://ref' || CAST(doc_id % 13 AS VARCHAR) END"
)


def agg_missing(corpus: DataFrame) -> DataFrame:
    """ES `missing` aggregation: bucket of docs lacking a field, reported
    beside the present-count and the field's cardinality.  Map-only
    conditional aggregates — the NULL test never shuffles rows."""
    c = corpus.withColumn("referrer", _referrer_col())
    return c.agg(
        F.count(F.when(F.col("referrer").isNull(), 1)).alias("missing_docs"),
        F.count("referrer").alias("present_docs"),
        F.countDistinct("referrer").alias("referrer_cardinality"),
    )


def agg_missing_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
c AS (SELECT *, {REFERRER_SQL} AS referrer FROM corpus)
SELECT count(*) FILTER (WHERE referrer IS NULL) AS missing_docs,
       count(referrer) AS present_docs,
       count(DISTINCT referrer) AS referrer_cardinality
FROM c
"""


# --- ES median_absolute_deviation -----------------------------------------

def agg_mad(corpus: DataFrame) -> DataFrame:
    """ES `median_absolute_deviation` metric agg — exact here (ES
    approximates with TDigest; the engine's exact interpolated median is
    strictly stronger, same contract as agg_percentiles).  Two passes:
    median, then median of |x - median| with the scalar broadcast via
    crossJoin — each pass is one exact-percentile aggregate."""
    med = corpus.agg(
        F.percentile(F.col("n_chars").cast("double"), F.lit(0.5)).alias("med")
    )
    return (
        corpus.crossJoin(F.broadcast(med))
        .select((F.abs(F.col("n_chars") - F.col("med"))).alias("dev"), "med")
        .agg(
            F.round(F.first("med"), 4).alias("median_chars"),
            F.round(F.percentile(F.col("dev"), F.lit(0.5)), 4).alias("mad_chars"),
        )
    )


def agg_mad_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
med AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med FROM corpus)
SELECT round(any_value(med), 4) AS median_chars,
       round(quantile_cont(abs(n_chars - med), 0.5), 4) AS mad_chars
FROM corpus, med
"""


# --- ES cumulative_cardinality pipeline agg --------------------------------

def agg_cumulative_cardinality(corpus: DataFrame) -> DataFrame:
    """ES `cumulative_cardinality` (distinct hosts seen up to each day).

    The scale trick: cumulative distinct does NOT need per-day distinct
    unions — a host contributes to the cumulative count from its FIRST
    day onward, so min(day) per host (one hash agg), count per first-day,
    then a running sum over the day axis (bounded window: axis-sized,
    not corpus-sized).  Days with no new hosts still appear (dense axis
    from the corpus's own days)."""
    from pyspark.sql.window import Window

    host_day = corpus.select(
        F.regexp_extract("url", "^[a-z]+://([^/]+)", 1).alias("host"),
        F.date_format("warc_ts", "yyyy-MM-dd").alias("day"),
    )
    first_day = host_day.groupBy("host").agg(F.min("day").alias("day"))
    new_per_day = first_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_hosts")
    )
    axis = host_day.select("day").distinct()
    w = Window.partitionBy(F.lit(0)).orderBy("day")  # bounded: day axis
    return (
        axis.join(new_per_day, "day", "left")
        .select("day", F.coalesce("new_hosts", F.lit(0)).alias("new_hosts"))
        .withColumn("cum_hosts", F.sum("new_hosts").over(w))
        .orderBy("day")
    )


def agg_cumulative_cardinality_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
hd AS (
  SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
         strftime(warc_ts, '%Y-%m-%d') AS day
  FROM corpus
),
fd AS (SELECT host, min(day) AS day FROM hd GROUP BY host),
npd AS (SELECT day, count(*) AS new_hosts FROM fd GROUP BY day),
axis AS (SELECT DISTINCT day FROM hd)
SELECT axis.day, COALESCE(new_hosts, 0) AS new_hosts,
       CAST(sum(COALESCE(new_hosts, 0)) OVER (ORDER BY axis.day) AS BIGINT)
         AS cum_hosts
FROM axis LEFT JOIN npd ON axis.day = npd.day
ORDER BY axis.day
"""


# --- ES rate agg ------------------------------------------------------------

def agg_rate(corpus: DataFrame) -> DataFrame:
    """ES `rate` agg inside a daily date_histogram (unit: hour) — per-day
    doc and byte throughput normalized to the bucket/unit ratio (24).
    One hash agg; the rate is post-agg arithmetic."""
    return (
        corpus.groupBy(F.date_format("warc_ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("docs"), F.sum("n_chars").alias("chars"))
        .select(
            "day",
            "docs",
            F.round(F.col("docs") / 24.0, 4).alias("docs_per_hour"),
            F.round(F.col("chars") / 24.0, 4).alias("chars_per_hour"),
        )
        .orderBy("day")
    )


def agg_rate_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT strftime(warc_ts, '%Y-%m-%d') AS day,
       count(*) AS docs,
       round(count(*) / 24.0, 4) AS docs_per_hour,
       round(sum(n_chars) / 24.0, 4) AS chars_per_hour
FROM corpus GROUP BY 1 ORDER BY day
"""


# --- ES percentiles_bucket pipeline agg -------------------------------------

def agg_percentiles_bucket(corpus: DataFrame) -> DataFrame:
    """ES `percentiles_bucket` sibling pipeline agg: exact interpolated
    percentiles OF the daily doc-count buckets (axis-sized input — the
    heavy work is the one daily hash agg; the percentile runs over
    #days rows)."""
    daily = corpus.groupBy(
        F.date_format("warc_ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("docs"))
    return daily.agg(
        *[
            F.round(
                F.percentile(F.col("docs").cast("double"), F.lit(p / 100.0)), 4
            ).alias(f"p{p}")
            for p in (25, 50, 75, 90)
        ]
    )


def agg_percentiles_bucket_sql() -> str:
    cols = ",\n       ".join(
        f"round(quantile_cont(CAST(docs AS DOUBLE), {p / 100.0}), 4) AS p{p}"
        for p in (25, 50, 75, 90)
    )
    return f"""
WITH {CORPUS_CTE.strip()},
daily AS (
  SELECT strftime(warc_ts, '%Y-%m-%d') AS day, count(*) AS docs
  FROM corpus GROUP BY 1
)
SELECT {cols} FROM daily
"""


# --- ES random_sampler agg ---------------------------------------------------

def agg_random_sampler(corpus: DataFrame, permille: int = 200) -> DataFrame:
    """ES `random_sampler` agg: probability-sampled aggregate with the
    estimate scaled back by 1/p.  RNG-free (hash-membership on url, the
    repo-wide determinism contract) — ES itself hashes doc ids under a
    fixed seed.  Map-only filter + one hash agg over the sample."""
    from .dedup import h64

    p = int(permille)
    if not 1 <= p <= 1000:
        raise ValueError("permille must be in [1, 1000]")
    sample = corpus.filter(F.pmod(h64(F.col("url")), F.lit(1000)) < p)
    return sample.agg(
        F.count(F.lit(1)).alias("sampled_docs"),
        F.round(F.count(F.lit(1)) * 1000.0 / p, 4).alias("est_total_docs"),
        F.round(F.sum("n_chars") * 1000.0 / p, 4).alias("est_total_chars"),
        F.round(F.avg("n_chars"), 4).alias("sample_avg_chars"),
    )


def agg_random_sampler_sql(permille: int = 200) -> str:
    from .dedup import H64_SQL

    p = int(permille)
    h = H64_SQL.format(x="url")
    return f"""
WITH {CORPUS_CTE.strip()},
s AS (SELECT * FROM corpus WHERE ({h}) % 1000 < {p})
SELECT count(*) AS sampled_docs,
       round(count(*) * 1000.0 / {p}, 4) AS est_total_docs,
       round(sum(n_chars) * 1000.0 / {p}, 4) AS est_total_chars,
       round(avg(n_chars), 4) AS sample_avg_chars
FROM s
"""


# --- ES variable_width_histogram ---------------------------------------------

VWH_DECIMALS = 4


def variable_width_histogram(
    corpus: DataFrame, k: int = 4, iters: int = 2
) -> DataFrame:
    """ES `variable_width_histogram`: k buckets whose widths adapt to the
    value distribution.  ES clusters online (order-dependent); the engine
    pins a deterministic contract instead: 1-D Lloyd's k-means seeded at
    the exact (2i+1)/(2k) quantiles, `iters` rounds, every centroid and
    boundary rounded to VWH_DECIMALS so both engines walk the identical
    trajectory (the kmeans_centroids determinism kit, in one dimension).

    1-D argmin needs no distance table: with sorted centroids the nearest
    centroid is decided by the k-1 midpoint boundaries, so assignment is
    `1 + sum(x > b_i)` — pure map-side arithmetic over driver-literal
    boundaries (k floats per round; the collect is k rows, like the
    quantizer).  Ties (x == midpoint) go to the lower bucket in both
    engines.  Empty clusters keep their previous centroid.

    Returns non-empty buckets: (bucket, centroid, n_docs, min_chars,
    max_chars) ordered by bucket.
    """
    k, iters = int(k), int(iters)
    x = corpus.select(F.col("n_chars").cast("double").alias("x"))
    qs = [(2 * i + 1) / (2.0 * k) for i in range(k)]
    seeds = x.agg(
        *[
            F.round(F.percentile(F.col("x"), F.lit(q)), VWH_DECIMALS).alias(
                f"c{i}"
            )
            for i, q in enumerate(qs)
        ]
    ).first()
    cents = [float(seeds[f"c{i}"]) for i in range(k)]

    def assign_col(cs: list[float]) -> F.Column:
        cid = F.lit(1)
        for i in range(k - 1):
            b = round((cs[i] + cs[i + 1]) / 2.0, VWH_DECIMALS)
            cid = cid + F.when(F.col("x") > b, 1).otherwise(0)
        return cid.alias("cid")

    for _ in range(iters):
        means = {
            r["cid"]: float(r["m"])
            for r in x.select("x", assign_col(cents))
            .groupBy("cid")
            .agg(F.round(F.avg("x"), VWH_DECIMALS).alias("m"))
            .collect()
        }
        cents = [means.get(i + 1, cents[i]) for i in range(k)]
    return (
        x.select("x", assign_col(cents))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("x").cast("long").alias("min_chars"),
            F.max("x").cast("long").alias("max_chars"),
        )
        .select(
            F.col("cid").cast("int").alias("bucket"),
            "n_docs",
            "min_chars",
            "max_chars",
        )
        .orderBy("bucket")
    )


def variable_width_histogram_sql(k: int = 4, iters: int = 2) -> str:
    """Unrolled Lloyd's CTE chain (fixed depth => exact oracle)."""
    k, iters = int(k), int(iters)
    d = VWH_DECIMALS
    qs = [(2 * i + 1) / (2.0 * k) for i in range(k)]
    seed_cols = ", ".join(
        f"round(quantile_cont(CAST(n_chars AS DOUBLE), {q}), {d}) AS c{i}"
        for i, q in enumerate(qs)
    )

    def cid_expr(it: str) -> str:
        parts = ["1"]
        for i in range(k - 1):
            parts.append(
                f"(CASE WHEN x > round(({it}.c{i} + {it}.c{i + 1}) / 2.0, {d})"
                " THEN 1 ELSE 0 END)"
            )
        return " + ".join(parts)

    ctes = [f"x AS (SELECT CAST(n_chars AS DOUBLE) AS x FROM corpus)"]
    ctes.append(f"it0 AS (SELECT {seed_cols} FROM corpus)")
    for t in range(iters):
        ctes.append(
            f"a{t} AS (SELECT x, {cid_expr(f'it{t}')} AS cid FROM x, it{t})"
        )
        ctes.append(
            f"m{t} AS (SELECT cid, round(avg(x), {d}) AS m FROM a{t} GROUP BY cid)"
        )
        next_cols = ", ".join(
            f"COALESCE((SELECT m FROM m{t} WHERE cid = {i + 1}), it{t}.c{i}) AS c{i}"
            for i in range(k)
        )
        ctes.append(f"it{t + 1} AS (SELECT {next_cols} FROM it{t})")
    body = ",\n".join(ctes)
    return f"""
WITH {CORPUS_CTE.strip()},
{body}
SELECT CAST(cid AS INTEGER) AS bucket,
       count(*) AS n_docs,
       CAST(min(x) AS BIGINT) AS min_chars,
       CAST(max(x) AS BIGINT) AS max_chars
FROM (SELECT x, {cid_expr(f'it{iters}')} AS cid FROM x, it{iters}) f
GROUP BY cid ORDER BY bucket
"""


def agg_moving_percentiles(corpus: DataFrame, window: int = 3) -> DataFrame:
    """ES `moving_percentiles` pipeline agg: exact interpolated p50/p90
    over a trailing `window`-bucket frame of the daily doc-count
    histogram (ES slides its TDigests; the engine slides the exact
    aggregate).  The window is bounded by the day axis, not the corpus
    (same contract as timeline_pipeline's moving_fn)."""
    from pyspark.sql.window import Window

    daily = corpus.groupBy(
        F.date_format("warc_ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("docs"))
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("day")
        .rowsBetween(-(int(window) - 1), 0)
    )
    return daily.select(
        "day",
        "docs",
        F.round(
            F.percentile(F.col("docs").cast("double"), F.lit(0.5)).over(w), 4
        ).alias("moving_p50"),
        F.round(
            F.percentile(F.col("docs").cast("double"), F.lit(0.9)).over(w), 4
        ).alias("moving_p90"),
    ).orderBy("day")


def agg_moving_percentiles_sql(window: int = 3) -> str:
    w = int(window) - 1
    return f"""
WITH {CORPUS_CTE.strip()},
daily AS (
  SELECT strftime(warc_ts, '%Y-%m-%d') AS day, count(*) AS docs
  FROM corpus GROUP BY 1
)
SELECT day, docs,
       round(quantile_cont(CAST(docs AS DOUBLE), 0.5) OVER (
           ORDER BY day ROWS BETWEEN {w} PRECEDING AND CURRENT ROW), 4)
         AS moving_p50,
       round(quantile_cont(CAST(docs AS DOUBLE), 0.9) OVER (
           ORDER BY day ROWS BETWEEN {w} PRECEDING AND CURRENT ROW), 4)
         AS moving_p90
FROM daily ORDER BY day
"""


# --- ES 8.x change_point aggregation ---------------------------------------


def agg_change_point(corpus: DataFrame) -> DataFrame:
    """ES `change_point` sibling pipeline aggregation (8.x): locate the
    bucket where the hourly doc-count series' mean shifts most.

    ES runs a battery of ML detectors; the engine uses the deterministic
    CUSUM-equivalent mean-shift statistic so both engines (and reruns)
    agree bit-for-bit: for every candidate split before bucket i
    (1-based rn >= 2), score = |mean(right) - mean(left)| *
    sqrt(|left|*|right|/n), the two-sample mean-shift normalization.
    The reported bucket is the FIRST bucket of the right segment (where
    the change begins, matching ES's `bucket` in the response); ties
    break on earliest day.  Scores/means rounded to 4 before ordering so
    the argmax is cross-engine stable.

    Shape: one map-side-combinable hash agg to the day axis, then
    axis-sized windows (the series is bounded by days, not corpus size)
    — the same single-partition-window contract as timeline_pipeline.
    """
    from pyspark.sql.window import Window

    hourly = corpus.groupBy(
        F.date_format(F.date_trunc("hour", "warc_ts"), "yyyy-MM-dd HH:00").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("docs"))
    w = Window.partitionBy(F.lit(0)).orderBy("bucket")
    wall = Window.partitionBy(F.lit(0))
    cum = (
        hourly.withColumn("rn", F.row_number().over(w))
        .withColumn("cum", F.sum("docs").over(w))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("total", F.sum("docs").over(wall))
    )
    left_cnt = F.col("rn") - 1
    right_cnt = F.col("n") - F.col("rn") + 1
    left_sum = F.col("cum") - F.col("docs")
    mean_l = left_sum / left_cnt
    mean_r = (F.col("total") - left_sum) / right_cnt
    scored = cum.filter(F.col("rn") >= 2).select(
        "bucket",
        F.round(mean_l, 4).alias("left_mean"),
        F.round(mean_r, 4).alias("right_mean"),
        F.round(
            F.abs(mean_r - mean_l)
            * F.sqrt((left_cnt * right_cnt).cast("double") / F.col("n")),
            4,
        ).alias("score"),
    )
    return scored.orderBy(F.desc("score"), F.asc("bucket")).limit(1)


def agg_change_point_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
hourly AS (
  SELECT strftime(date_trunc('hour', warc_ts), '%Y-%m-%d %H:00') AS bucket,
         count(*) AS docs
  FROM corpus GROUP BY 1
),
cum AS (
  SELECT bucket, docs,
         row_number() OVER (ORDER BY bucket) AS rn,
         sum(docs) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
         count(*) OVER () AS n,
         sum(docs) OVER () AS total
  FROM hourly
),
scored AS (
  SELECT bucket,
         round((cum - docs) * 1.0 / (rn - 1), 4) AS left_mean,
         round((total - cum + docs) * 1.0 / (n - rn + 1), 4) AS right_mean,
         round(abs((total - cum + docs) * 1.0 / (n - rn + 1)
                   - (cum - docs) * 1.0 / (rn - 1))
               * sqrt((rn - 1.0) * (n - rn + 1.0) / n), 4) AS score
  FROM cum WHERE rn >= 2
)
SELECT bucket, left_mean, right_mean, score
FROM scored ORDER BY score DESC, bucket ASC LIMIT 1
"""


# --- ES 8.4 frequent_item_sets aggregation ----------------------------------


def agg_frequent_item_sets(
    corpus: DataFrame, min_support: int = 200, top: int = 20
) -> DataFrame:
    """ES `frequent_item_sets` aggregation (size-2 itemsets over the
    per-document distinct token set), Apriori-pruned.

    Stage 1 keeps only items whose own document frequency >= min_support
    (downward closure: a pair can never out-support its rarest member),
    so the pair generation never touches infrequent vocabulary — the
    100 TB guard: the self-join fans out only over per-doc FREQUENT
    distinct items, a vocabulary-bounded set.  Stage 2 self-joins the
    (doc_id, item) relation on doc_id with item1 < item2 (co-partitioned
    equi-join, one shuffle) and hash-counts pair support.

    Output: (item1, item2, support) for pairs with support >=
    min_support, top `top` by (support desc, item1, item2) — ES orders
    sets by doc_count descending."""
    from ..functions.tokenizer import tokens

    items = (
        corpus.select("doc_id", F.explode(F.array_distinct(tokens("text"))).alias("item"))
    )
    freq = (
        items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= int(min_support))
        .select("item")
    )
    fitems = items.join(F.broadcast(freq), "item", "inner").select("doc_id", "item")
    # Pair generation is ARRAY-SIDE (r6): regroup each doc's frequent
    # items into one array (a single (doc_id, item) shuffle) and expand
    # pairs with explode x filter(x > item1) — the doc_id self-join it
    # replaces re-computed the whole items subtree for BOTH join sides
    # (Catalyst has no cross-subtree CSE: 3 tokenize scans per call) and
    # shuffled the relation twice.  Same comparator (<, Spark UTF8
    # binary), same pair multiset, identical support counts.
    farr = fitems.groupBy("doc_id").agg(F.collect_list("item").alias("arr"))
    pairs = (
        farr.select(F.explode("arr").alias("item1"), "arr")
        .select(
            "item1",
            F.explode(
                F.filter("arr", lambda x: x > F.col("item1"))
            ).alias("item2"),
        )
    )
    return (
        pairs.groupBy("item1", "item2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= int(min_support))
        .orderBy(F.desc("support"), F.asc("item1"), F.asc("item2"))
        .limit(int(top))
    )


def agg_frequent_item_sets_sql(min_support: int = 200, top: int = 20) -> str:
    from ..functions.tokenizer import TOKEN_SPLIT_RE

    return f"""
WITH {CORPUS_CTE.strip()},
items AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS item
  FROM corpus
),
freq AS (
  SELECT item FROM items GROUP BY item HAVING count(*) >= {int(min_support)}
),
fitems AS (
  SELECT doc_id, item FROM items WHERE item IN (SELECT item FROM freq)
)
SELECT a.item AS item1, b.item AS item2, count(*) AS support
FROM fitems a JOIN fitems b
  ON a.doc_id = b.doc_id AND a.item < b.item
GROUP BY 1, 2
HAVING count(*) >= {int(min_support)}
ORDER BY support DESC, item1 ASC, item2 ASC
LIMIT {int(top)}
"""


# --- ES categorize_text aggregation -----------------------------------------


def categorize_text(corpus: DataFrame, n_sig: int = 3, top: int = 15) -> DataFrame:
    """ES `categorize_text` aggregation: cluster semi-structured text
    into categories and count docs per category.

    ES's categorizer templates log messages by their distinctive tokens
    (drift/ML-tuned); the engine's deterministic re-spec: a document's
    category key is its `n_sig` RAREST distinct tokens (corpus document
    frequency asc, term asc — rare tokens are the distinctive ones, the
    same rarity signal ES's categorizer weights), joined space-separated
    in alphabetical order.  Cross-engine stable by construction.

    Shape: one tokenize+distinct, one df hash agg (vocabulary-sized,
    broadcast back), a per-doc window over the doc's DISTINCT vocabulary
    (bounded by vocab, not doc length), then a category hash agg.  No
    corpus-sized sort: the window partitions by doc_id."""
    from pyspark.sql.window import Window

    from ..functions.tokenizer import tokens

    items = corpus.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("term")
    )
    tdf = items.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("term"))
    sig = (
        items.join(F.broadcast(tdf), "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(n_sig))
    )
    keys = sig.groupBy("doc_id").agg(
        F.array_join(F.array_sort(F.collect_list("term")), " ").alias("category")
    )
    return (
        keys.groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("category"))
        .limit(int(top))
    )


def categorize_text_sql(n_sig: int = 3, top: int = 15) -> str:
    from ..functions.tokenizer import TOKEN_SPLIT_RE

    return f"""
WITH {CORPUS_CTE.strip()},
items AS (
  SELECT DISTINCT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
tdf AS (SELECT term, count(*) AS df FROM items GROUP BY term),
sig AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY df ASC, term ASC) AS rk
  FROM items JOIN tdf USING (term)
),
keys AS (
  SELECT doc_id, string_agg(term, ' ' ORDER BY term) AS category
  FROM sig WHERE rk <= {int(n_sig)} GROUP BY doc_id
)
SELECT category, count(*) AS n_docs
FROM keys GROUP BY category
ORDER BY n_docs DESC, category ASC
LIMIT {int(top)}
"""


# --- ES scripted_metric aggregation ------------------------------------------


def scripted_metric(
    df: DataFrame,
    combine_fn,
    reduce_fn,
    state_schema: str,
    out_schema: str,
) -> DataFrame:
    """ES `scripted_metric` aggregation harness: arbitrary
    map+combine per shard, reduce on the coordinator.

    `combine_fn(pdf) -> dict` runs per Arrow batch (the shard-combine:
    ES executes map_script per doc then combine_script per shard — the
    engine fuses both over a vectorized pandas batch, which is the
    Arrow-native equivalent of a per-shard scan).  `reduce_fn(states:
    list[dict]) -> dict` merges the per-batch states driver-side, the
    exact analogue of ES's coordinator-side reduce_script over
    per-shard states.  CONTRACT (same as ES): combine states must be
    mergeable by reduce_fn regardless of row partitioning — i.e. the
    combine is associative/commutative over row subsets.

    Shape at 100 TB: the corpus-sized pass is one mapInPandas emitting
    ONE tiny state row per batch; only the (partitions x batches)-row
    state table moves to the driver.  No shuffle at all."""
    import pandas as pd

    spark = df.sparkSession

    def per_batch(batches):
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame([combine_fn(pdf)])

    states = df.mapInPandas(per_batch, state_schema).collect()
    out = reduce_fn([r.asDict() for r in states])
    return spark.createDataFrame([out], out_schema)


def scripted_metric_profile(corpus: DataFrame) -> DataFrame:
    """Registered scripted_metric example: a one-pass numeric profile of
    n_chars (count / mean / population variance / max) computed from
    exact integer partial sums (cnt, sum, sum of squares, max) so the
    reduce is order-independent and the floats are derived once, at the
    end — the canonical ES scripted_metric demo shape."""

    def combine(pdf):
        x = pdf["n_chars"].astype("int64")
        return {
            "cnt": int(len(x)),
            "s": int(x.sum()),
            "ss": int((x * x).sum()),
            "mx": int(x.max()),
        }

    def reduce(states):
        cnt = sum(s["cnt"] for s in states)
        sm = sum(s["s"] for s in states)
        ss = sum(s["ss"] for s in states)
        mx = max(s["mx"] for s in states)
        mean = sm * 1.0 / cnt
        return {
            "n_docs": cnt,
            "mean_chars": round(mean, 4),
            "var_chars": round(ss * 1.0 / cnt - mean * mean, 4),
            "max_chars": mx,
        }

    return scripted_metric(
        corpus.select("n_chars"),
        combine,
        reduce,
        "cnt long, s long, ss long, mx long",
        "n_docs long, mean_chars double, var_chars double, max_chars long",
    )


def scripted_metric_profile_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT count(*) AS n_docs,
       round(sum(n_chars) * 1.0 / count(*), 4) AS mean_chars,
       round(sum(n_chars * n_chars) * 1.0 / count(*)
             - (sum(n_chars) * 1.0 / count(*)) * (sum(n_chars) * 1.0 / count(*)),
             4) AS var_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM corpus
"""


# --- ip_range aggregation ------------------------------------------------------

# The corpus carries no IP field; a client IPv4 is DERIVED
# deterministically from doc_id (the geo.py pattern — both engines
# compute identical values from integer arithmetic):
#     ip_num = (doc_id * 2654435761) % 2^32        (Knuth multiplicative)
IP_NUM_SQL = "(doc_id * 2654435761) % 4294967296"


def _ip_to_num(ip: str) -> int:
    a, b, c, d = (int(x) for x in ip.split("."))
    for o in (a, b, c, d):
        if not 0 <= o <= 255:
            raise ValueError(f"bad IPv4 octet in {ip!r}")
    return (a << 24) | (b << 16) | (c << 8) | d


def _cidr_bounds(cidr: str) -> tuple[int, int]:
    base, bits = cidr.split("/")
    bits = int(bits)
    lo = _ip_to_num(base) & ~((1 << (32 - bits)) - 1) & 0xFFFFFFFF
    return lo, lo + (1 << (32 - bits))


def agg_ip_range(
    corpus: DataFrame, ranges: list[dict] | None = None
) -> DataFrame:
    """ES `ip_range` aggregation: bucket docs by client IP into the given
    ranges; each range is {key?, from?, to?} (dotted IPv4, half-open
    [from, to) — the ES contract) or {key?, mask: "a.b.c.d/n"}.  Every
    range is emitted even when empty, in definition order.

    Shape: ip_num is map-only arithmetic; each bucket is ONE conditional
    count in a single hash aggregate over the scan (ranges may overlap,
    so this is a multi-count, not a partition); the output is axis-sized
    (len(ranges) rows) assembled from the one aggregate row."""
    ranges = ranges if ranges is not None else [
        {"to": "64.0.0.0"},
        {"from": "64.0.0.0", "to": "192.0.0.0"},
        {"from": "192.0.0.0"},
    ]
    ip = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    aggs, keys = [], []
    for i, r in enumerate(ranges):
        if "mask" in r:
            lo, hi = _cidr_bounds(r["mask"])
            key = r.get("key", r["mask"])
        else:
            lo = _ip_to_num(r["from"]) if "from" in r else None
            hi = _ip_to_num(r["to"]) if "to" in r else None
            key = r.get("key") or (
                f"{r.get('from', '*')}-{r.get('to', '*')}"
            )
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ip >= F.lit(lo))
        if hi is not None:
            cond = cond & (ip < F.lit(hi))
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"c{i}")
        )
        keys.append(key)
    one = corpus.agg(*aggs)
    spark = corpus.sparkSession
    axis = spark.createDataFrame(
        [(i, k) for i, (k) in enumerate(keys)], "ord int, range_key string"
    )
    counts = one.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("ord"), F.col(f"c{i}").alias("doc_count")
                )
                for i in range(len(keys))
            ])
        ).alias("e")
    ).select("e.ord", "e.doc_count")
    return (
        axis.join(counts, "ord", "left")
        .select(
            "range_key",
            F.coalesce("doc_count", F.lit(0)).cast("bigint").alias("doc_count"),
            F.col("ord").cast("int").alias("ord"),
        )
        .orderBy("ord")
    )


def agg_ip_range_sql(ranges: list[dict] | None = None) -> str:
    ranges = ranges if ranges is not None else [
        {"to": "64.0.0.0"},
        {"from": "64.0.0.0", "to": "192.0.0.0"},
        {"from": "192.0.0.0"},
    ]
    parts = []
    for i, r in enumerate(ranges):
        if "mask" in r:
            lo, hi = _cidr_bounds(r["mask"])
            key = r.get("key", r["mask"])
        else:
            lo = _ip_to_num(r["from"]) if "from" in r else None
            hi = _ip_to_num(r["to"]) if "to" in r else None
            key = r.get("key") or (
                f"{r.get('from', '*')}-{r.get('to', '*')}"
            )
        conds = ["TRUE"]
        if lo is not None:
            conds.append(f"ip >= {lo}")
        if hi is not None:
            conds.append(f"ip < {hi}")
        k = key.replace("'", "''")
        parts.append(
            f"({i}, '{k}', (SELECT CAST(count(*) FILTER ("
            + " AND ".join(conds)
            + ") AS BIGINT) FROM ips))"
        )
    rows = ", ".join(parts)
    return f"""
WITH {CORPUS_CTE.strip()},
ips AS (SELECT {IP_NUM_SQL} AS ip FROM corpus)
SELECT range_key, doc_count, ord
FROM (VALUES {rows}) AS t(ord, range_key, doc_count)
ORDER BY ord
"""


# --- ip_prefix aggregation ------------------------------------------------------


def agg_ip_prefix(
    corpus: DataFrame, prefix_length: int = 4, min_doc_count: int = 1
) -> DataFrame:
    """ES 8.1 `ip_prefix` aggregation: bucket client IPs by their
    /prefix_length network; one row per non-empty network (doc_count >=
    min_doc_count, ES default 1), key = dotted network address +
    "/len", ordered by the network address ascending (the ES key
    order).  The client IPv4 is the same Knuth-multiplicative derived
    field agg_ip_range uses.

    Shape: network = integer arithmetic on the scan (map-only; modulo
    instead of bit-ops so Spark and DuckDB evaluate the identical
    expression), then ONE network-keyed hash aggregate with map-side
    combine — at most 2^prefix_length partial states per task.  At
    10^12 docs the shuffle carries bucket states, never rows."""
    p = int(prefix_length)
    if not 0 <= p <= 32:
        raise ValueError(f"prefix_length must be in [0, 32], got {p}")
    step = 1 << (32 - p)
    ip = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    net = (ip - (ip % F.lit(step))).alias("net")
    g = (
        corpus.select(net)
        .groupBy("net")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter(F.col("doc_count") >= int(min_doc_count))
    )
    dotted = F.concat_ws(
        ".",
        (F.floor(F.col("net") / 16777216) % 256).cast("string"),
        (F.floor(F.col("net") / 65536) % 256).cast("string"),
        (F.floor(F.col("net") / 256) % 256).cast("string"),
        (F.col("net") % 256).cast("string"),
    )
    return (
        g.orderBy("net")
        .select(
            F.concat(dotted, F.lit(f"/{p}")).alias("prefix"),
            F.col("doc_count").cast("bigint").alias("doc_count"),
        )
    )


def agg_ip_prefix_sql(prefix_length: int = 4, min_doc_count: int = 1) -> str:
    p = int(prefix_length)
    step = 1 << (32 - p)
    return f"""
WITH {CORPUS_CTE.strip()},
nets AS (
  SELECT ({IP_NUM_SQL}) - (({IP_NUM_SQL}) % {step}) AS net FROM corpus
),
g AS (
  SELECT net, count(*) AS doc_count FROM nets GROUP BY net
  HAVING count(*) >= {int(min_doc_count)}
)
SELECT CAST(net // 16777216 % 256 AS VARCHAR) || '.' ||
       CAST(net // 65536 % 256 AS VARCHAR) || '.' ||
       CAST(net // 256 % 256 AS VARCHAR) || '.' ||
       CAST(net % 256 AS VARCHAR) || '/{p}' AS prefix,
       CAST(doc_count AS BIGINT) AS doc_count
FROM g ORDER BY net
"""


# --- bucket_correlation / bucket_count_ks_test ----------------------------------


def agg_bucket_correlation(corpus: DataFrame) -> DataFrame:
    """ES `bucket_correlation` sibling pipeline agg: Pearson correlation
    between a parent histogram's doc counts and a caller-supplied
    indicator curve.  Here the parent is the daily histogram and the
    indicator is the day-of-week weekend indicator derived from the
    bucket key itself (deterministic in both engines) — the common
    "does traffic correlate with weekends" shape.

    Output: one row (n_buckets, correlation) rounded to 5.  Shape: one
    map-side-combinable hash agg to the day axis, then a single
    axis-sized aggregate — the corpus is scanned once."""
    daily = corpus.groupBy(
        F.date_format("warc_ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("docs"))
    ind = F.when(
        F.dayofweek(F.to_date("day")).isin(1, 7), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    return (
        daily.withColumn("ind", ind)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.round(F.corr("docs", "ind"), 5).alias("correlation"),
        )
    )


def agg_bucket_correlation_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
daily AS (
  SELECT strftime(warc_ts, '%Y-%m-%d') AS day,
         CAST(count(*) AS DOUBLE) AS docs
  FROM corpus GROUP BY 1
),
keyed AS (
  SELECT docs,
         CASE WHEN dayofweek(CAST(day AS DATE)) IN (0, 6)
              THEN 1.0 ELSE 0.0 END AS ind
  FROM daily
)
SELECT CAST(count(*) AS BIGINT) AS n_buckets,
       round(corr(docs, ind), 5) AS correlation
FROM keyed
"""


def agg_bucket_count_ks_test(corpus: DataFrame) -> DataFrame:
    """ES `bucket_count_ks_test` sibling pipeline agg: the two-sample
    Kolmogorov-Smirnov statistic between a parent histogram's doc-count
    distribution and the uniform alternative (ES's default `fractions` =
    even split).  The statistic is the max |empirical CDF - uniform CDF|
    over the bucket axis, computed on the daily histogram in key order.

    Output: one row (n_buckets, ks_statistic) rounded to 5.  Shape: day
    hash agg + axis-sized window (single partition over the bounded day
    axis — the timeline_pipeline contract)."""
    from pyspark.sql.window import Window

    daily = corpus.groupBy(
        F.date_format("warc_ts", "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("docs"))
    w = Window.partitionBy(F.lit(0)).orderBy("day")
    wall = Window.partitionBy(F.lit(0))
    cdf = (
        daily.withColumn("cum", F.sum("docs").over(w))
        .withColumn("total", F.sum("docs").over(wall))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn(
            "d",
            F.abs(F.col("cum") / F.col("total") - F.col("rn") / F.col("n")),
        )
    )
    return cdf.agg(
        F.max("n").cast("bigint").alias("n_buckets"),
        F.round(F.max("d"), 5).alias("ks_statistic"),
    )


def agg_bucket_count_ks_test_sql() -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
daily AS (
  SELECT strftime(warc_ts, '%Y-%m-%d') AS day,
         CAST(count(*) AS DOUBLE) AS docs
  FROM corpus GROUP BY 1
),
cdf AS (
  SELECT abs(
           sum(docs) OVER (ORDER BY day) / (sum(docs) OVER ())
           - CAST(row_number() OVER (ORDER BY day) AS DOUBLE)
             / (count(*) OVER ())
         ) AS d,
         count(*) OVER () AS n
  FROM daily
)
SELECT CAST(max(n) AS BIGINT) AS n_buckets,
       round(max(d), 5) AS ks_statistic
FROM cdf
"""


def downsample(events: DataFrame, interval_hours: int = 6) -> DataFrame:
    """ES TSDB `_downsample` (8.5+): pre-aggregate a time-series index
    into fixed-interval buckets per time series (dimension tuple).

    Dimension (the tsid) is `event_type`; the gauge metric `value` keeps
    the ES `aggregate_metric_double` quadruple (min, max, sum,
    value_count), counter semantics keep last_value (latest by
    `event_id` — unique doc order, so the pick is deterministic in both
    engines), and `_doc_count` carries the bucket's original row count so
    downstream aggregations over the downsampled index stay weightable
    (the ES _doc_count field contract).

    Plan: one scan, ONE hash aggregate keyed (bucket, tsid) with map-side
    partial aggregation; at 10^12 rows the output cardinality is
    |tsids| x buckets — tiny vs input — so the shuffle moves partial
    states, not rows.  Reference analogue: the day-partitioned index
    rollups the reference delegates to ES ILM (output.py index_suffix
    day partitioning)."""
    secs = int(interval_hours) * 3600
    bucket = (F.floor(F.unix_timestamp("ts") / secs) * secs).cast("long")
    return (
        events.groupBy(bucket.alias("bucket_epoch"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.min("value"), 5).alias("value_min"),
            F.round(F.max("value"), 5).alias("value_max"),
            F.round(F.sum("value"), 5).alias("value_sum"),
            F.count("value").alias("value_count"),
            F.round(F.max_by("value", "event_id"), 5).alias("value_last"),
        )
        .orderBy("bucket_epoch", "event_type")
    )


def downsample_sql(interval_hours: int = 6) -> str:
    secs = int(interval_hours) * 3600
    return f"""
SELECT CAST(floor(epoch(ts) / {secs}) * {secs} AS BIGINT) AS bucket_epoch,
       event_type,
       count(*) AS doc_count,
       round(min(value), 5) AS value_min,
       round(max(value), 5) AS value_max,
       round(sum(value), 5) AS value_sum,
       count(value) AS value_count,
       round(arg_max(value, event_id), 5) AS value_last
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def time_series_agg(events: DataFrame, size: int = 50) -> DataFrame:
    """ES `time_series` aggregation (8.7+, TSDB indices): one bucket per
    time series — the tsid is the full dimension tuple, here
    (event_type, user_id) — with per-series sub-metrics.  Completes the
    TSDB family next to `downsample` (same dimensions contract, no time
    bucketing: the series itself is the bucket).

    Per series: doc_count, the gauge envelope (min/max/avg of `value`),
    the counter read (last value by `event_id` — unique doc order, so
    `max_by` is deterministic in both engines), and the series' time
    span.  Buckets are ordered by tsid ascending and truncated to
    `size`, the ES bucket ordering for this agg.  The avg is computed
    from an EXACT integer cent sum (`value` carries 2 decimals) divided
    once at the end — a float sum's order of addition differs between
    engines and flipped the 5th decimal at sf0.01.

    Shape: ONE hash aggregate keyed by the tsid with map-side partial
    aggregation — at 10^12 rows the shuffle carries |tsids| partial
    states, not events; the `size` cut is a TakeOrdered on the bucket
    axis.  Reference analogue: per-(chat, sender) rollups over the
    message stream (models.py archive_id/sender grouping)."""
    return (
        events.groupBy("event_type", "user_id")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.min("value"), 5).alias("value_min"),
            F.round(F.max("value"), 5).alias("value_max"),
            F.round(
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                / (F.count(F.lit(1)) * 100.0),
                5,
            ).alias("value_avg"),
            F.round(F.max_by("value", "event_id"), 5).alias("value_last"),
            F.min("ts").alias("ts_first"),
            F.max("ts").alias("ts_last"),
        )
        .orderBy("event_type", "user_id")
        .limit(int(size))
    )


def time_series_agg_sql(size: int = 50) -> str:
    return f"""
SELECT event_type,
       user_id,
       count(*) AS doc_count,
       round(min(value), 5) AS value_min,
       round(max(value), 5) AS value_max,
       round(sum(CAST(round(value * 100) AS BIGINT)) / (count(*) * 100.0),
             5) AS value_avg,
       round(arg_max(value, event_id), 5) AS value_last,
       min(ts) AS ts_first,
       max(ts) AS ts_last
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
LIMIT {int(size)}
"""


def events_value_rate(events: DataFrame) -> DataFrame:
    """ES ``rate`` aggregation with a ``field`` (the value-sum variant —
    the plain doc-count rate over the corpus is agg_rate above): daily
    buckets, rate re-scaled to unit=hour — events/hour and value/hour per
    day bucket.

    Exactness: the value sum is computed in EXACT integer cents
    (round(value*100) -> BIGINT; the driver values carry two decimals),
    so the float appears only in ONE final division per rate — a single
    IEEE op both engines execute identically.  count/24.0 likewise.

    Scale shape: one bucket-keyed hash agg with map-side combine; the
    bucket axis is days, so the result is axis-sized.
    """
    day = F.date_format("ts", "yyyy-MM-dd")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.groupBy(day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("cents"),
        )
        .select(
            "day",
            (F.col("n") / F.lit(24.0)).alias("events_per_hour"),
            (F.col("cents") / F.lit(2400.0)).alias("value_per_hour"),
        )
        .orderBy("day")
    )


EVENTS_VALUE_RATE_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) / 24.0 AS events_per_hour,
       sum(CAST(round(value * 100) AS BIGINT)) / 2400.0 AS value_per_hour
FROM events GROUP BY 1 ORDER BY day
"""


def transform_latest(corpus: DataFrame) -> DataFrame:
    """ES ``_transform`` with a ``latest`` config (7.12): an
    entity-centric index holding each entity's MOST RECENT document —
    here per host, sorted on (warc_ts, doc_id).

    The reduction is per-column max_by on a SCALAR DECIMAL(38,0) ordering
    key (epoch-micros * 10^19 + doc_id — the eql.py idiom), so the whole
    transform is ONE HashAggregate with map-side combine; no window, no
    sort.  The continuous form of the same transform is
    streaming/windows.streaming_latest (state = the per-key best tuple).

    Output: (host, doc_id, url, warc_ts, n_chars) ordered by host.
    """
    from ..query.collapse import host_col  # noqa: PLC0415

    key = F.unix_micros(F.col("warc_ts").cast("timestamp")).cast(
        "decimal(38,0)"
    ) * F.expr("CAST(10000000000000000000 AS DECIMAL(20,0))") + F.col(
        "doc_id"
    ).cast("decimal(38,0)")
    return (
        corpus.groupBy(host_col().alias("host"))
        .agg(
            F.max_by("doc_id", key).alias("doc_id"),
            F.max_by("url", key).alias("url"),
            F.max_by("warc_ts", key).alias("warc_ts"),
            F.max_by("n_chars", key).alias("n_chars"),
        )
        .orderBy("host")
    )


TRANSFORM_LATEST_SQL = None  # built below (needs CORPUS_CTE at import time)


def transform_latest_sql() -> str:
    from ..query.collapse import HOST_SQL  # noqa: PLC0415

    return f"""
WITH {CORPUS_CTE.strip()}
SELECT {HOST_SQL} AS host, doc_id, url, warc_ts, n_chars
FROM corpus
QUALIFY row_number() OVER (
    PARTITION BY {HOST_SQL}
    ORDER BY epoch_us(warc_ts) DESC, doc_id DESC) = 1
ORDER BY host"""
