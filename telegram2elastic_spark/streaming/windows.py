"""Streaming analytics over the event stream: watermarked windowed
aggregation + sessionization.

The reference's realtime loop only *indexes*; its dashboards compute
timeline rollups after the fact (PRODUCTION_ARCHITECTURE.md:903-996).
Stream-native versions: Structured Streaming with event-time watermarks,
so late events are handled and state is bounded (the 10^12-scale
requirement for an unbounded stream).  The same aggregations exist in
batch form (operators.aggregates.timeline_daily) — these are the
readStream duals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_counts_stream(
    events_stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding per-type counters with a watermark — the streaming
    dual of the daily-counts rollup (A5)."""
    w = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 5).alias("total_value"),
        )
    )


def run_windowed_counts_availablenow(
    spark: SparkSession, events_path: str, checkpoint: str
) -> DataFrame:
    """Drive the streaming agg to completion over a bounded parquet dir
    (Trigger.AvailableNow + memory sink) and return the result table —
    the pattern for tests and backfills."""
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    # event-time watermarks need TIMESTAMP (tz-aware); the testdata parquet
    # stores TIMESTAMP_NTZ — reinterpret as UTC instants
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = windowed_counts_stream(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("windowed_counts")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        "SELECT date_format(win.start, \"yyyy-MM-dd'T'HH:mm:ss'Z'\") AS win_start, "
        "event_type, n, total_value FROM windowed_counts "
        "ORDER BY win_start, event_type"
    )


def windowed_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Batch dual of windowed_counts_stream (same results on bounded input;
    oracle-checkable)."""
    return (
        events.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 5).alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                "win_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )


WINDOWED_COUNTS_SQL = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%dT%H:%M:%SZ')
           AS win_start,
       event_type,
       count(*) AS n,
       round(sum(value), 5) AS total_value
FROM events
GROUP BY 1, 2 ORDER BY win_start, event_type
"""


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization (lag + cumulative gap-count window): per-user
    sessions split on inactivity > gap.  Returns per-session rollups."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_s = F.col("ts").cast("timestamp").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    marked = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    ).withColumn("session_no", F.sum("new_session").over(w))
    return (
        marked.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
                "session_start"
            ),
            F.round(F.sum("value"), 5).alias("session_value"),
        )
        .orderBy("user_id", "session_no")
    )


def sessionize_sql(gap_minutes: int = 30) -> str:
    return f"""
WITH marked AS (
  SELECT *,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {gap_minutes * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT *, sum(new_session) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS UNBOUNDED PRECEDING)::BIGINT AS session_no
  FROM marked
)
SELECT user_id, session_no,
       count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%dT%H:%M:%SZ') AS session_start,
       round(sum(value), 5) AS session_value
FROM sessioned GROUP BY user_id, session_no ORDER BY user_id, session_no
"""


def streaming_first_seen(
    spark: SparkSession,
    corpus_path: str,
    checkpoint: str,
    timeout_ms: int = 0,
) -> DataFrame:
    """Custom stateful streaming operator: first-seen-url filter.

    The reference dedups realtime messages against the store per event
    (message_exists, poc/src/core/telegram_client.py:162-178); the
    stream-native version keeps the seen-set as *operator state* —
    applyInPandasWithState keyed by url, state = a single flag, so a
    re-delivered/edited url never re-emits.  State is partitioned by the
    grouping key across executors (scales horizontally) and can be bounded
    with a timeout when urls have a natural re-delivery horizon.

    Runs the bounded corpus dir through Trigger.AvailableNow and returns
    the deduped table (memory sink).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(corpus_path).schema

    def fn(key, pdfs, state):
        if state.exists:
            return iter(())  # url already emitted once
        # the key's rows may span multiple Arrow chunks within one trigger:
        # scan ALL chunks and keep the global minimum doc_id so the chosen
        # representative is deterministic across runs/partitionings
        best_url, best_id = None, None
        for pdf in pdfs:
            if len(pdf):
                i = pdf["doc_id"].idxmin()
                did = int(pdf["doc_id"].loc[i])
                if best_id is None or did < best_id:
                    best_url, best_id = pdf["url"].loc[i], did
        state.update((1,))
        if best_id is None:
            return iter(())
        return iter([pd.DataFrame({"url": [best_url], "doc_id": [best_id]})])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(corpus_path)
    )
    out = (
        stream.groupBy("url")
        .applyInPandasWithState(
            fn,
            outputStructType="url string, doc_id long",
            stateStructType="seen int",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("first_seen")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql("SELECT url, doc_id FROM first_seen ORDER BY doc_id")


def streaming_latest(
    spark: SparkSession,
    corpus_path: str,
    checkpoint: str,
) -> DataFrame:
    """Continuous ES ``_transform/latest``: the entity-centric
    latest-doc table maintained as OPERATOR STATE — the streaming twin of
    aggregates.transform_latest.  State per host = its best
    (warc_ts-micros, doc_id) tuple; a micro-batch re-emits a host only
    when a newer doc arrives (transform checkpoint semantics).  The
    memory sink's final state per key IS the entity table.

    Runs the bounded corpus dir through Trigger.AvailableNow; returns the
    final per-host latest rows (dedup on host keeping the last emission).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..query.collapse import host_col

    schema = spark.read.parquet(corpus_path).schema

    def fn(key, pdfs, state):
        best = state.get if state.exists else None  # (u, doc_id, url)
        changed = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            u = pdf["warc_ts"].astype("datetime64[us]").astype("int64")
            for uu, did, url in zip(u.tolist(), pdf["doc_id"].tolist(),
                                    pdf["url"].tolist()):
                cand = (int(uu), int(did), url)
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best, changed = cand, True
        if changed:
            state.update(best)
            return iter([pd.DataFrame({
                "host": [key[0]],
                "doc_id": [best[1]],
                "url": [best[2]],
                "u": [best[0]],
            })])
        return iter(())

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(corpus_path)
    )
    out = (
        stream.withColumn("host", host_col())
        .groupBy("host")
        .applyInPandasWithState(
            fn,
            outputStructType="host string, doc_id long, url string, u long",
            stateStructType="u long, doc_id long, url string",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("latest_tf")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # last emission per host = the final state
    return spark.sql(
        "SELECT host, doc_id, url FROM ("
        "  SELECT *, row_number() OVER ("
        "    PARTITION BY host ORDER BY u DESC, doc_id DESC) AS rn"
        "  FROM latest_tf) WHERE rn = 1 ORDER BY host"
    )


# --- stream-stream interval join ------------------------------------------------

def purchases_after_signup(
    events: DataFrame, within_min: int = 60, k: int | None = 200
) -> DataFrame:
    """Batch interval join: every (signup, purchase) pair of the same
    user where the purchase lands within `within_min` minutes AFTER the
    signup — the attribution-window join (distinct from the EQL funnel:
    ALL qualifying pairs, not the greedy-earliest chain).

    Scale shape: an equi-join on user_id with a pushed range predicate —
    Spark executes it as one shuffled hash join keyed by user; the range
    condition prunes inside the key group.  The streaming twin below is
    the SAME join as a watermarked stream-stream join (state eviction
    from the watermark + interval bound)."""
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id"),
        F.col("event_id").alias("signup_id"),
        F.col("ts").cast("timestamp").alias("s_ts"),
    )
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").cast("timestamp").alias("p_ts"),
        F.col("value"),
    )
    out = (
        s.join(p, "user_id")
        .filter(
            (F.col("p_ts") >= F.col("s_ts"))
            & (
                F.col("p_ts")
                <= F.col("s_ts") + F.expr(f"INTERVAL {int(within_min)} MINUTES")
            )
        )
        .select(
            "user_id",
            "signup_id",
            "purchase_id",
            (
                (F.unix_micros("p_ts") - F.unix_micros("s_ts"))
                / F.lit(1000000)
            ).cast("long").alias("lag_sec"),
            F.round("value", 5).alias("value"),
        )
        .orderBy("user_id", "signup_id", "purchase_id")
    )
    # k=None returns every pair (a plain sort; a bounded k compiles to
    # TakeOrdered, whose heap is k-sized — never pass a sentinel huge k)
    return out if k is None else out.limit(int(k))


def purchases_after_signup_sql(within_min: int = 60, k: int = 200) -> str:
    return f"""
WITH s AS (
  SELECT user_id, event_id AS signup_id, ts AS s_ts
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS p_ts, value
  FROM events WHERE event_type = 'purchase'
)
SELECT s.user_id AS user_id, s.signup_id, p.purchase_id,
       CAST((epoch_us(p.p_ts) - epoch_us(s.s_ts)) // 1000000 AS BIGINT) AS lag_sec,
       round(p.value, 5) AS value
FROM s JOIN p ON s.user_id = p.user_id
WHERE p.p_ts >= s.s_ts
  AND p.p_ts <= s.s_ts + INTERVAL {int(within_min)} MINUTES
ORDER BY user_id, signup_id, purchase_id
LIMIT {int(k)}
"""


def run_interval_join_availablenow(
    spark: SparkSession,
    events_path: str,
    checkpoint: str,
    within_min: int = 60,
    watermark: str = "2 hours",
) -> DataFrame:
    """The SAME interval join as a watermarked STREAM-STREAM join
    (Structured Streaming's canonical two-stream state pattern): both
    sides carry event-time watermarks, and the join's time-range bound
    lets Spark evict signup state once the purchase watermark passes
    s_ts + within_min — bounded state at any stream length.  Driven to
    completion with Trigger.AvailableNow; append mode (stream-stream
    inner joins emit exactly the qualified pairs)."""
    schema = spark.read.parquet(events_path).schema
    raw = (
        spark.readStream.schema(schema)
        .parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    s = (
        raw.filter(F.col("event_type") == "signup")
        .select(
            F.col("user_id").alias("s_user"),
            F.col("event_id").alias("signup_id"),
            F.col("ts").alias("s_ts"),
        )
        .withWatermark("s_ts", watermark)
    )
    p = (
        raw.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            F.col("value"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = s.join(
        p,
        F.expr(
            f"s_user = p_user AND p_ts >= s_ts "
            f"AND p_ts <= s_ts + INTERVAL {int(within_min)} MINUTES"
        ),
    ).select(
        F.col("s_user").alias("user_id"),
        "signup_id",
        "purchase_id",
        ((F.unix_micros("p_ts") - F.unix_micros("s_ts")) / F.lit(1000000))
        .cast("long")
        .alias("lag_sec"),
        F.round("value", 5).alias("value"),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("interval_join")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        "SELECT * FROM interval_join "
        "ORDER BY user_id, signup_id, purchase_id"
    )


# --- ingest-time LSH near-dup (stateful bucket memory) --------------------------

def run_lsh_dedup_availablenow(
    spark: SparkSession,
    corpus_path: str,
    checkpoint: str,
    n_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Ingest-time near-dup detection: MinHash band buckets live as
    OPERATOR STATE (applyInPandasWithState keyed by (band, band_hash),
    state = the bucket's minimum doc_id), so every arriving document is
    flagged against ALL previously ingested documents without re-scanning
    them — the streaming twin of `dedup.lsh_dup_flags` and the online
    form of the cross-snapshot dedup shape.

    Signatures are computed STATELESSLY per row (`minhash_sig_cols` —
    array-side min, no pre-agg) so the query has exactly one stateful
    operator.  The per-doc reduction (any bucket collided -> is_dup,
    earliest collider -> dup_of) is a stateless presentation step over
    the sink.  Under in-order-by-doc_id delivery the verdicts equal the
    batch twin exactly (identity tested across micro-batches); state is
    one long per occupied bucket — bounded by the bucket space, the same
    memory the batch bucket-minima aggregate holds."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from telegram2elastic_spark.operators.dedup import minhash_sig_cols
    from telegram2elastic_spark.functions.tokenizer import tokens

    n_hashes, bands = int(n_hashes), int(bands)
    if n_hashes % bands:
        raise ValueError(f"bands ({bands}) must divide n_hashes ({n_hashes})")
    r = n_hashes // bands
    schema = spark.read.parquet(corpus_path).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(corpus_path)
    sig = (
        stream.select("doc_id", tokens("text").alias("toks"))
        # < 3 tokens => no shingles => absent from the batch twin's
        # signature relation; drop here too so the verdict sets match
        .filter(F.size("toks") >= 3)
        .select("doc_id", *minhash_sig_cols(n_hashes))
    )
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
    )

    def fn(key, pdfs, state):
        cur = state.get[0] if state.exists else None
        rows = []
        ids = []
        for pdf in pdfs:
            ids.extend(int(d) for d in pdf["doc_id"])
        for d in sorted(ids):
            prior = cur if (cur is not None and cur < d) else None
            rows.append((d, key[0], prior))
            if cur is None or d < cur:
                cur = d
        state.update((int(cur),))
        if not rows:
            return iter(())
        return iter(
            [pd.DataFrame(rows, columns=["doc_id", "band", "prior"])]
        )

    verdicts = banded.groupBy("band", "band_hash").applyInPandasWithState(
        fn,
        outputStructType="doc_id long, band int, prior long",
        stateStructType="bucket_min long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        verdicts.writeStream.outputMode("update")
        .format("memory")
        .queryName("lsh_dedup")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        "SELECT doc_id, min(prior) IS NOT NULL AS is_dup, "
        "min(prior) AS dup_of "
        "FROM lsh_dedup GROUP BY doc_id ORDER BY doc_id"
    )
