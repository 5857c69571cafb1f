"""Sink layer: JSONL coercions, fan-out single-execution semantics."""

import glob
import json

from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import sinks


def test_json_ready_coercions(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir).limit(3)
    out = sinks.json_ready(corpus)
    row = out.orderBy("doc_id").first()
    # timestamp -> ISO string
    assert row["warc_ts"].endswith("Z") and "T" in row["warc_ts"]
    # binary -> base64 ascii
    import base64

    decoded = base64.b64decode(row["html"]).decode()
    assert decoded.startswith("<html><body><p>")


def test_write_jsonl_roundtrip(spark, sf_dir, tmp_path):
    corpus = load_corpus(spark, sf_dir).limit(10).select("doc_id", "url", "warc_ts")
    path = str(tmp_path / "out")
    sinks.write_jsonl(corpus, path)
    lines = []
    for f in glob.glob(f"{path}/part-*.json"):
        with open(f) as fh:
            lines += [json.loads(line) for line in fh if line.strip()]
    assert len(lines) == 10
    assert all("T" in r["warc_ts"] for r in lines)


def test_fanout_all_sinks_get_same_rows(spark, sf_dir, tmp_path):
    corpus = load_corpus(spark, sf_dir).limit(5).select("doc_id", "url")
    reg = sinks.SinkRegistry()
    b1: list = []
    b2: list = []
    reg.add("mem1", sinks.collecting_sink(b1))
    reg.add("mem2", sinks.collecting_sink(b2))
    reg.add("jsonl", sinks.jsonl_sink(str(tmp_path / "j")))
    reg.write_all(corpus)
    assert sorted(r["doc_id"] for r in b1) == sorted(r["doc_id"] for r in b2)
    assert len(b1) == 5
    assert glob.glob(str(tmp_path / "j") + "/part-*")


# --- real socket sinks (K3/K4) against in-process servers --------------------

import socketserver
import threading


def _start_server(handler_cls):
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), handler_cls)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def test_tcp_sink_delivers_all_rows(spark, sf_dir):
    """K4: newline-delimited JSON arrives complete, one object per row."""
    received, lock = [], threading.Lock()

    class H(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                with lock:
                    received.append(json.loads(line))

    srv, port = _start_server(H)
    try:
        corpus = (
            load_corpus(spark, sf_dir).limit(20)
            .select("doc_id", "url", "warc_ts").repartition(3)
        )
        sinks.tcp_sink("127.0.0.1", port)(corpus)
        deadline = 50
        while len(received) < 20 and deadline:
            import time; time.sleep(0.1); deadline -= 1
        assert sorted(r["doc_id"] for r in received) == list(range(20))
        assert all("T" in r["warc_ts"] for r in received)  # ISO coercion
    finally:
        srv.shutdown(); srv.server_close()


def test_send_with_resume_reconnects_without_duplicates():
    """K4 retry contract (output/tcp.py:30-39), unit level: the first
    connection raises after 3 sends; the loop must reopen and resume from
    the first unsent row — exactly-once given surfaced failures."""
    delivered, conns = [], [0]

    class FakeConn:
        def __init__(self):
            conns[0] += 1
            self.n = 0

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def send(self, b):
            if conns[0] == 1 and self.n >= 3:
                raise OSError("simulated mid-stream disconnect")
            delivered.append(b)
            self.n += 1

    sinks.send_with_resume(
        list(range(12)), FakeConn, lambda c, b: c.send(b),
        max_retries=5, retry_delay_s=0.0,
    )
    assert delivered == list(range(12))  # complete, ordered, no duplicates
    assert conns[0] == 2  # really reconnected


def test_send_with_resume_bounded_retries():
    class Dead:
        def __enter__(self):
            raise OSError("connection refused")

        def __exit__(self, *a):
            return False

    import pytest as _pytest

    with _pytest.raises(OSError):
        sinks.send_with_resume(
            [1], Dead, lambda c, b: None, max_retries=3, retry_delay_s=0.0
        )


def test_redis_sink_resumes_without_duplicating_acked_rows(spark, sf_dir):
    """K3 across a REAL mid-stream disconnect: the server kills the first
    connection after acking 3 pushes; unacked rows are resent, acked rows
    are not.  (Delivery is at-least-once overall — a crash between the
    server applying RPUSH and the client reading :N would resend that one
    row — but rows whose ack WAS read must never be resent.)"""
    store, conn_count = {}, [0]
    lock = threading.Lock()

    class FlakyRedis(socketserver.StreamRequestHandler):
        def handle(self):
            with lock:
                conn_count[0] += 1
                first = conn_count[0] == 1
            handled = 0
            while True:
                head = self.rfile.readline()
                if not head:
                    return
                args = []
                for _ in range(int(head[1:])):
                    ln = int(self.rfile.readline()[1:])
                    args.append(self.rfile.read(ln))
                    self.rfile.read(2)
                key = args[1].decode()
                with lock:
                    store.setdefault(key, []).append(args[2])
                    n = len(store[key])
                self.wfile.write(b":%d\r\n" % n)
                self.wfile.flush()
                handled += 1
                if first and handled >= 3:
                    return  # close mid-stream AFTER acking 3

    srv, port = _start_server(FlakyRedis)
    try:
        corpus = (
            load_corpus(spark, sf_dir).limit(12)
            .select("doc_id", "url").coalesce(1)
        )
        sinks.redis_rpush_sink(
            "127.0.0.1", port, key="q", retry_delay_s=0.05
        )(corpus)
        vals = sorted(json.loads(v)["doc_id"] for v in store["q"])
        assert vals == list(range(12)), vals  # complete AND no duplicates
        assert conn_count[0] >= 2
    finally:
        srv.shutdown(); srv.server_close()


def test_redis_rpush_sink_speaks_resp(spark, sf_dir):
    """K3 (output/redis.py:16-19): RESP RPUSH frames against a minimal
    in-process Redis: list grows per row, integer replies consumed."""
    store, lock = {}, threading.Lock()

    class FakeRedis(socketserver.StreamRequestHandler):
        def handle(self):
            while True:
                head = self.rfile.readline()
                if not head:
                    return
                assert head.startswith(b"*")
                args = []
                for _ in range(int(head[1:])):
                    ln = int(self.rfile.readline()[1:])
                    args.append(self.rfile.read(ln))
                    self.rfile.read(2)  # trailing \r\n
                assert args[0] == b"RPUSH"
                key = args[1].decode()
                with lock:
                    store.setdefault(key, []).extend(args[2:])
                    n = len(store[key])
                self.wfile.write(b":%d\r\n" % n)
                self.wfile.flush()

    srv, port = _start_server(FakeRedis)
    try:
        corpus = (
            load_corpus(spark, sf_dir).limit(15)
            .select("doc_id", "url").repartition(2)
        )
        sinks.redis_rpush_sink("127.0.0.1", port, key="messages")(corpus)
        vals = [json.loads(v) for v in store["messages"]]
        assert sorted(r["doc_id"] for r in vals) == list(range(15))
    finally:
        srv.shutdown(); srv.server_close()
