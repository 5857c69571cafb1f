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
