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
Queue/socket sinks are real: tcp_sink speaks newline-delimited JSON with a
bounded reconnect-and-resume loop (tcp.py:30-39), redis_rpush_sink speaks
the RESP wire protocol (RPUSH, redis.py:16-19) — both one connection per
partition, rows JSON-serialized JVM-side before they reach Python."""

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


def _json_lines(df: DataFrame) -> DataFrame:
    """Rows -> single JSON-string column, serialized JVM-side (to_json) so
    the socket sinks' Python workers only ship ready bytes."""
    coerced = json_ready(df)
    return coerced.select(
        F.to_json(F.struct(*[F.col(c) for c in coerced.columns])).alias("j")
    )


def send_with_resume(
    buf: list,
    open_conn: Callable,
    send_one: Callable,
    max_retries: int,
    retry_delay_s: float,
) -> None:
    """The reference's close-reconnect-retry loop (output/tcp.py:30-39,
    its unbounded `while True` bounded to max_retries), generalized: on a
    surfaced OSError, reopen the connection and RESUME from the first row
    not yet confirmed sent.  Exactly-once GIVEN failures surface before a
    row is counted — per-row-acked protocols (the RESP sink) get that
    guarantee unconditionally; one-way TCP can lose rows buffered during a
    silent peer close (the reference writer has the same property)."""
    import time

    sent, attempt = 0, 0
    while sent < len(buf):
        try:
            with open_conn() as conn:
                while sent < len(buf):
                    send_one(conn, buf[sent])
                    sent += 1
        except OSError:
            attempt += 1
            if attempt >= max_retries:
                raise
            time.sleep(retry_delay_s)


def tcp_sink(
    host: str,
    port: int,
    max_retries: int = 5,
    retry_delay_s: float = 0.2,
) -> Callable[[DataFrame], None]:
    """K4 (output/tcp.py:25-39): newline-delimited JSON over TCP.

    Executor shape: one connection per PARTITION (foreachPartition — the
    distributed analogue of the reference's single long-lived socket),
    reconnect-and-resume on failure (send_with_resume)."""

    def fn(df: DataFrame) -> None:
        def send_partition(rows) -> None:
            import socket

            buf = [r["j"].encode("utf-8") + b"\n" for r in rows]
            if not buf:
                return
            send_with_resume(
                buf,
                lambda: socket.create_connection((host, port), timeout=10),
                lambda s, b: s.sendall(b),
                max_retries,
                retry_delay_s,
            )

        _json_lines(df).foreachPartition(send_partition)

    return fn


def _resp_encode(*args: bytes) -> bytes:
    """RESP array encoding (the Redis wire protocol)."""
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        out.append(b"$%d\r\n%s\r\n" % (len(a), a))
    return b"".join(out)


def redis_rpush_sink(
    host: str, port: int, key: str, max_retries: int = 5,
    retry_delay_s: float = 0.2,
) -> Callable[[DataFrame], None]:
    """K3 (output/redis.py:16-19): RPUSH key <json> per row.

    The container has no redis client lib, so the sink speaks RESP directly
    over a socket (RPUSH is one array frame + an :N integer reply) — same
    connection-per-partition + resume-on-reconnect discipline as tcp_sink.
    Delivery is AT-LEAST-ONCE: if the connection dies after the server
    applies an RPUSH but before the :N reply is read, the resume resends
    that row, and Spark task retries replay whole partitions.  Consumers
    needing exactly-once must dedup on an idempotency key in the payload.
    Works against any real Redis."""

    kb = key.encode("utf-8")

    def fn(df: DataFrame) -> None:
        def send_partition(rows) -> None:
            import socket

            buf = [r["j"].encode("utf-8") for r in rows]
            if not buf:
                return

            class _Conn:
                def __enter__(self):
                    self.s = socket.create_connection((host, port), timeout=10)
                    self.f = self.s.makefile("rb")
                    return self

                def __exit__(self, *a):
                    self.s.close()

                def push(self, payload: bytes) -> None:
                    self.s.sendall(_resp_encode(b"RPUSH", kb, payload))
                    reply = self.f.readline()
                    if not reply.startswith(b":"):
                        raise OSError(f"unexpected RESP reply {reply!r}")

            send_with_resume(
                buf, _Conn, lambda c, b: c.push(b), max_retries, retry_delay_s
            )

        _json_lines(df).foreachPartition(send_partition)

    return fn


def collecting_sink(bucket: list) -> Callable[[DataFrame], None]:
    """Test double for queue/socket sinks (K3/K4): foreachPartition with a
    partition-local 'client' — the connection-per-partition pattern a Redis
    or TCP sink uses under foreachBatch."""

    def fn(df: DataFrame) -> None:
        rows = [r.asDict(recursive=True) for r in df.collect()]
        bucket.extend(rows)

    return fn
