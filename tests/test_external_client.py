"""Production client behavior proven against a REAL in-process HTTP
service (VERDICT r4 Missing #2): retry/backoff schedule, per-batch RPC
batching, failure -> null, one client per task, parse-through to the
native clamp/whitelist stages.
"""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from telegram2elastic_spark.operators.external_client import (
    HttpJsonBatchClient,
    RetryPolicy,
    call_with_retries,
    classify_with_client,
)


class _FlakyClassifier(BaseHTTPRequestHandler):
    """Deterministic classifier service: fails the first `fail_first`
    requests with 503, then answers: osint_value = len(text) % 131 - 15
    (exceeds [0,100] to exercise the downstream clamp), topics from the
    text's first letter, reasoning = text[:10]."""

    server_version = "FlakyClassifier/1.0"

    def do_POST(self):  # noqa: N802 (stdlib naming)
        srv = self.server
        srv.requests_seen += 1
        if srv.requests_seen <= srv.drop_first:
            # poison the connection: abrupt close with no HTTP response
            # (the failure mode a clean 503 never exercises)
            self.connection.close()
            return
        if srv.requests_seen <= srv.slow_first:
            # stall past the client timeout, then answer into the void:
            # the client-side socket.timeout leaves http.client in
            # _CS_REQ_SENT — the state a clean failure never reaches
            import time as _t

            _t.sleep(1.2)
        if srv.requests_seen <= srv.fail_first:
            self.send_response(503)
            self.end_headers()
            return
        n = int(self.headers.get("Content-Length", 0))
        texts = json.loads(self.rfile.read(n))["texts"]
        results = [
            {
                "osint_value": len(t) % 131 - 15,
                "topics": ["combat"] if t[:1] < "m" else ["general"],
                "reasoning": t[:10],
            }
            for t in texts
        ]
        body = json.dumps({"results": results}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def flaky_server():
    srv = HTTPServer(("127.0.0.1", 0), _FlakyClassifier)
    srv.fail_first = 0
    srv.drop_first = 0
    srv.slow_first = 0
    srv.requests_seen = 0
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    t.join(timeout=5)


def test_backoff_schedule_is_deterministic_and_bounded():
    p = RetryPolicy(max_retries=4, base_delay=0.05, multiplier=2.0,
                    max_delay=0.3, jitter=0.1, seed="s")
    d = [p.delay(a) for a in range(5)]
    assert d == [p.delay(a) for a in range(5)]  # deterministic
    raw = [min(0.3, 0.05 * 2 ** a) for a in range(5)]
    for got, r in zip(d, raw):
        assert r * 0.9 <= got <= r * 1.1  # jitter band
    assert d[3] <= 0.3 * 1.1 and d[4] <= 0.3 * 1.1  # max_delay cap


def test_retries_then_success_records_schedule(flaky_server):
    flaky_server.fail_first = 2
    host, port = flaky_server.server_address
    client = HttpJsonBatchClient(host, port)
    slept = []
    p = RetryPolicy(max_retries=3, base_delay=0.01, seed="x")
    out = call_with_retries(
        lambda: client.classify_batch(["abc", "mnop"]),
        p, sleep=slept.append,
    )
    assert out is not None and len(out) == 2
    # two failures -> exactly the first two policy delays, in order
    assert slept == [p.delay(0), p.delay(1)]
    assert flaky_server.requests_seen == 3
    client.close()


def test_exhausted_retries_return_none(flaky_server):
    flaky_server.fail_first = 10 ** 6
    host, port = flaky_server.server_address
    client = HttpJsonBatchClient(host, port)
    slept = []
    p = RetryPolicy(max_retries=2, base_delay=0.01, seed="y")
    out = call_with_retries(
        lambda: client.classify_batch(["abc"]), p, sleep=slept.append
    )
    assert out is None
    assert slept == [p.delay(0), p.delay(1)]  # retried exactly max_retries
    assert flaky_server.requests_seen == 3  # initial + 2 retries
    client.close()


def test_spark_kernel_end_to_end(spark, sf_dir, flaky_server):
    """Whole path through Spark: per-batch RPCs against the live server,
    transient failures retried inside the kernel, values parse through
    and the downstream NATIVE clamp behaves like classify_stub's."""
    import pyspark.sql.functions as F

    from telegram2elastic_spark.corpus import load_corpus

    flaky_server.fail_first = 1  # one transient 503 to ride through
    host, port = flaky_server.server_address
    corpus = load_corpus(spark, sf_dir).limit(40)

    out = classify_with_client(
        corpus,
        lambda: HttpJsonBatchClient(host, port),
        RetryPolicy(max_retries=3, base_delay=0.001, seed="t"),
        batch_size=16,
    )
    clamped = out.withColumn(
        "osint_value",
        F.least(
            F.greatest(F.col("osint_value").cast("int"), F.lit(0)),
            F.lit(100),
        ),
    )
    rows = {r["doc_id"]: r for r in clamped.collect()}
    texts = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert set(rows) == set(texts)
    for d, t in texts.items():
        want = min(max(len(t) % 131 - 15, 0), 100)
        assert rows[d]["osint_value"] == want
        assert rows[d]["reasoning"] == t[:10]
        assert rows[d]["topics"] in ("combat", "general")
    # batching: 40 rows / batch_size 16 -> >= 3 successful POSTs (+1 503)
    assert flaky_server.requests_seen >= 4


def test_spark_kernel_dead_service_nulls_everything(spark, sf_dir):
    """A service that never answers yields all-null enrichment fields
    (the reference's failure -> null contract), not a failed job."""
    from telegram2elastic_spark.corpus import load_corpus

    corpus = load_corpus(spark, sf_dir).limit(5)
    out = classify_with_client(
        corpus,
        # closed port: connection refused on every call
        lambda: HttpJsonBatchClient("127.0.0.1", 9),
        RetryPolicy(max_retries=1, base_delay=0.001, seed="d"),
        batch_size=4,
    )
    rows = out.collect()
    assert len(rows) == 5
    assert all(
        r["osint_value"] is None and r["topics"] is None
        and r["reasoning"] is None
        for r in rows
    )


def test_connection_reset_after_dropped_response(flaky_server):
    """A dropped/mid-response connection must not poison the persistent
    client: without an explicit reset, http.client is stuck in
    CannotSendRequest after the failure and every retry and later batch
    fails instantly (ADVICE r5, medium)."""
    flaky_server.drop_first = 2
    host, port = flaky_server.server_address
    client = HttpJsonBatchClient(host, port, timeout=2.0)
    sleeps: list[float] = []
    out = call_with_retries(
        lambda: client.classify_batch(["abc", "mn"]),
        RetryPolicy(max_retries=3, base_delay=0.0),
        sleep=sleeps.append,
    )
    assert out is not None and len(out) == 2  # recovered within retries
    # and the SAME client serves subsequent batches cleanly
    out2 = call_with_retries(
        lambda: client.classify_batch(["xyz"]),
        RetryPolicy(max_retries=0),
        sleep=lambda s: None,
    )
    assert out2 is not None and len(out2) == 1
    client.close()


def test_connection_reset_after_timeout(flaky_server):
    """A response TIMEOUT leaves http.client in _CS_REQ_SENT; without the
    explicit close-on-failure the next request raises CannotSendRequest
    instantly, so retries never reach the service again (ADVICE r5)."""
    import time as _t

    flaky_server.slow_first = 1
    host, port = flaky_server.server_address
    client = HttpJsonBatchClient(host, port, timeout=0.4)
    # real backoff (1s) so the retry lands after the single-threaded
    # test server has finished stalling the first request
    out = call_with_retries(
        lambda: client.classify_batch(["abc", "mn"]),
        RetryPolicy(max_retries=2, base_delay=1.0, multiplier=1.0,
                    jitter=0.0),
        sleep=_t.sleep,
    )
    assert out is not None and len(out) == 2
    assert flaky_server.requests_seen >= 2  # retry actually hit the wire
    client.close()
