"""Streaming EQL funnel: batch-identity at sf0.001, cross-micro-batch
state, until kills, bounded state."""

import os
import time

import pandas as pd
import pytest

from telegram2elastic_spark.query import eql
from telegram2elastic_spark.streaming.funnel import streaming_eql_funnel


def _write_stream_files(tmp_path, pdf, n_files, name):
    """ts-sorted events split into n sequential files (increasing mtime,
    lexical names) so triggers replay the stream in event order."""
    d = tmp_path / name
    d.mkdir()
    pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark rejects NANOS
    step = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        chunk = pdf.iloc[i * step:(i + 1) * step]
        if not len(chunk):
            break
        chunk.to_parquet(d / f"part-{i:03d}.parquet", index=False)
        time.sleep(0.05)  # strictly increasing mtimes
    return str(d)


@pytest.fixture(scope="module")
def events_pdf(sf_dir):
    return pd.read_parquet(os.path.join(sf_dir, "events.parquet"))


def _batch_ids(spark, sf_dir, steps, span, until=None):
    from telegram2elastic_spark.corpus import load_events

    rows = eql.eql_sequence(
        load_events(spark, sf_dir), steps, span, until=until, k=10**6
    ).collect()
    if len(steps) == 2:
        return sorted((r.user_id, r.e1_id, r.e2_id, None) for r in rows)
    return sorted((r.user_id, r.e1_id, r.e2_id, r.e3_id) for r in rows)


def test_streaming_equals_batch_2step_until(spark, sf_dir, tmp_path, events_pdf):
    src = _write_stream_files(tmp_path, events_pdf, 4, "ev2")
    got = streaming_eql_funnel(
        spark, src, str(tmp_path / "ck2"),
        ["signup", "purchase"], 21600, until="error",
    ).collect()
    got_ids = sorted((r.user_id, r.e1_id, r.e2_id, r.e3_id) for r in got)
    assert got_ids == _batch_ids(
        spark, sf_dir, ["signup", "purchase"], 21600, until="error"
    )
    assert len(got_ids) > 0


def test_streaming_equals_batch_3step(spark, sf_dir, tmp_path, events_pdf):
    src = _write_stream_files(tmp_path, events_pdf, 4, "ev3")
    got = streaming_eql_funnel(
        spark, src, str(tmp_path / "ck3"),
        ["signup", "click", "purchase"], 21600,
    ).collect()
    got_ids = sorted((r.user_id, r.e1_id, r.e2_id, r.e3_id) for r in got)
    assert got_ids == _batch_ids(
        spark, sf_dir, ["signup", "click", "purchase"], 21600
    )
    assert len(got_ids) > 0


def _mini_pdf(rows):
    base = pd.Timestamp("2024-01-01")
    return pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "ts": [base + pd.Timedelta(seconds=r[1]) for r in rows],
        "user_id": [r[2] for r in rows],
        "event_type": [r[3] for r in rows],
        "value": 0.0,
        "props": "{}",
    })


def test_anchor_state_crosses_micro_batches(spark, tmp_path):
    # anchor (A) in file 0, completion (B) in file 1 — only operator
    # state can connect them.
    pdf = _mini_pdf([(1, 0, 7, "A"), (2, 10, 7, "B")])
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / "cross"
    d.mkdir()
    pdf.iloc[:1].to_parquet(d / "part-000.parquet", index=False)
    time.sleep(0.05)
    pdf.iloc[1:].to_parquet(d / "part-001.parquet", index=False)
    got = streaming_eql_funnel(
        spark, str(d), str(tmp_path / "ckx"), ["A", "B"], 3600
    ).collect()
    assert [(r.user_id, r.e1_id, r.e2_id) for r in got] == [(7, 1, 2)]


def test_streaming_until_kills_inflight(spark, tmp_path):
    pdf = _mini_pdf([
        (1, 0, 1, "A"), (2, 5, 1, "X"), (3, 10, 1, "B"),   # killed
        (4, 0, 2, "A"), (5, 5, 2, "B"), (6, 10, 2, "X"),   # survives
    ])
    src = _write_stream_files(tmp_path, pdf, 2, "until")
    got = streaming_eql_funnel(
        spark, src, str(tmp_path / "cku"), ["A", "B"], 3600, until="X"
    ).collect()
    assert [(r.user_id, r.e1_id, r.e2_id) for r in got] == [(2, 4, 5)]


def test_expired_anchors_are_pruned(spark, tmp_path):
    # B arrives past maxspan: no match, and the anchor must be gone from
    # state (a later B also fails).
    pdf = _mini_pdf([(1, 0, 3, "A"), (2, 200, 3, "B"), (3, 300, 3, "B")])
    src = _write_stream_files(tmp_path, pdf, 2, "expire")
    got = streaming_eql_funnel(
        spark, src, str(tmp_path / "cke"), ["A", "B"], 100
    ).collect()
    assert got == []


def test_streaming_arg_validation(spark, tmp_path):
    with pytest.raises(ValueError):
        streaming_eql_funnel(spark, "x", "y", ["A"], 100)
    with pytest.raises(ValueError):
        streaming_eql_funnel(
            spark, "x", "y", [{"type": "A", "where": "value > 1"}, "B"], 100
        )
