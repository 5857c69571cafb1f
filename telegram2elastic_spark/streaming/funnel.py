"""Streaming EQL funnel — the live-SIEM form of query/eql.py's anchored
greedy-earliest sequence, as a custom stateful streaming operator.

ES runs EQL over indices that an ingest stream keeps appending to (the
reference's realtime loop, telegram2elastic.py:527-535, is exactly such a
producer); the stream-native equivalent keeps the per-key funnel progress
as OPERATOR STATE (applyInPandasWithState keyed by user_id) so a sequence
whose steps arrive in different micro-batches still completes, with no
re-scan of history.

Semantics = query/eql.eql_sequence EXACTLY (the identity is tested at
sf0.001): anchored greedy-earliest binding in (ts, event_id) tuple order,
maxspan first-to-last inclusive, until kills in-flight anchors.  The
stream contract is the standard one: events arrive in (ts, event_id)
order per key (the test feeds ts-sorted files; a production deployment
puts a watermark + sort-within-trigger in front).  Because binding is
greedy-earliest, an arriving step-i+1 event binds EVERY open anchor
waiting at step i — which is precisely "the earliest qualifying event"
for each of them, so in-order streaming reproduces the batch answer.

State is bounded: an anchor whose maxspan window has passed can never
complete and is pruned on the next event for its key (and the whole
key's state clears when no anchors remain); memory per key = open
anchors inside one maxspan window.

Output: (user_id, e1_id, e2_id, e3_id) — e3_id NULL for 2-step
sequences; event ids determine the timestamps.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..query.eql import _parse_step

_US = 1_000_000


def streaming_eql_funnel(
    spark: SparkSession,
    events_path: str,
    checkpoint: str,
    steps: list[str],
    maxspan_sec: int,
    until: str | None = None,
) -> DataFrame:
    """Run the funnel over the bounded events dir as a file stream
    (maxFilesPerTrigger=1 → several micro-batches, state crosses them),
    Trigger.AvailableNow, memory sink; returns the completed funnels.

    Only type-equality steps are supported on the stream (the batch
    engine's `where value ...` predicates would need the value column
    carried into state — straightforward, omitted until needed).
    """
    if len(steps) not in (2, 3):
        raise ValueError("streaming funnel supports 2 or 3 steps")
    step_types = []
    for s in steps:
        t, w = _parse_step(s)
        if w is not None:
            raise ValueError("streaming funnel supports type-only steps")
        step_types.append(t)
    if maxspan_sec <= 0:
        raise ValueError("maxspan_sec must be positive")
    span_us = maxspan_sec * _US
    n_steps = len(step_types)

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    schema = spark.read.parquet(events_path).schema

    def fn(key, pdfs, state):
        # anchor: [last_u, last_id, u1, e1_id, stage, b2_id]
        #   stage = number of bound steps so far (1 after the anchor opens)
        anchors = json.loads(state.get[0]) if state.exists else []
        out_u, out_rows = [], []
        frames = [pdf[["event_id", "ts", "event_type"]] for pdf in pdfs if len(pdf)]
        if frames:
            allr = pd.concat(frames)
            u64 = allr["ts"].astype("datetime64[us]").astype("int64")
            order = sorted(
                zip(u64.tolist(), allr["event_id"].tolist(),
                    allr["event_type"].tolist())
            )
            for u, eid, et in order:
                # expired anchors can never complete at or after this event
                anchors = [a for a in anchors if u - a[2] <= span_us]
                if until is not None and et == until:
                    anchors = []  # kills every in-flight (uncompleted) anchor
                # bind EVERY open anchor waiting on this step type; tuple
                # order (u, eid) > (last_u, last_id) holds except for ties
                # re-delivered out of order, which the guard rejects
                kept = []
                for a in anchors:
                    last_u, last_id, u1, e1, stage, b2 = a
                    if (
                        stage < n_steps
                        and et == step_types[stage]
                        and (u, eid) > (last_u, last_id)
                    ):
                        stage += 1
                        if stage == n_steps:
                            out_u.append(key[0])
                            if n_steps == 2:
                                out_rows.append((e1, eid, None))
                            else:
                                out_rows.append((e1, b2, eid))
                            continue  # completed: anchor retires
                        b2 = eid
                        a = [u, eid, u1, e1, stage, b2]
                    kept.append(a)
                anchors = kept
                if et == step_types[0]:
                    anchors.append([u, eid, u, eid, 1, None])
        state.update((json.dumps(anchors),))
        if not out_rows:
            return iter(())
        return iter([pd.DataFrame({
            "user_id": out_u,
            "e1_id": [r[0] for r in out_rows],
            "e2_id": [r[1] for r in out_rows],
            "e3_id": pd.array([r[2] for r in out_rows], dtype="Int64"),
        })])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, e1_id long, e2_id long, e3_id long",
        stateStructType="anchors string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("eql_funnel")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        "SELECT user_id, e1_id, e2_id, e3_id FROM eql_funnel "
        "ORDER BY user_id, e1_id"
    )
