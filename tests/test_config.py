"""Config-driven wiring (telegram2elastic.py:624-659): YAML outputs list ->
sinks with per-output output_maps, translation stage flag, fail-fast on
unknown types."""

import glob
import json
import socketserver
import threading

import pytest

from telegram2elastic_spark import config as cfg
from telegram2elastic_spark.corpus import load_corpus


def test_load_and_run_yaml_config(spark, sf_dir, tmp_path):
    received, lock = [], threading.Lock()

    class H(socketserver.StreamRequestHandler):
        def handle(self):
            for line in self.rfile:
                with lock:
                    received.append(json.loads(line))

    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), H)
    srv.daemon_threads = True
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]

    conf_path = tmp_path / "conf.yml"
    conf_path.write_text(f"""
translate_to_lang: en
outputs:
  - type: jsonl
    path: {tmp_path / "out_jsonl"}
    output_map:
      id: "doc_id"
      message: "text"
      translated: "translated_text"
  - type: tcp
    host: 127.0.0.1
    port: {port}
    output_map:
      id: "doc_id"
      chat: "source"
""")
    try:
        config = cfg.load_config(str(conf_path))
        corpus = load_corpus(spark, sf_dir).filter("doc_id < 20")
        names = cfg.run_pipeline(corpus, config)
        assert names == ["jsonl_0", "tcp_1"]

        rows = []
        for f in glob.glob(str(tmp_path / "out_jsonl") + "/part-*.json"):
            with open(f) as fh:
                rows += [json.loads(line) for line in fh if line.strip()]
        assert sorted(r["id"] for r in rows) == list(range(20))
        # translation flowed into the output map, null-on-error included
        by_id = {r["id"]: r for r in rows}
        assert by_id[0].get("translated") is None  # doc_id % 13 == 0 -> error
        assert ">en:" in by_id[1]["translated"]

        deadline = 50
        while len(received) < 20 and deadline:
            import time; time.sleep(0.1); deadline -= 1
        assert sorted(r["id"] for r in received) == list(range(20))
        assert all(set(r) == {"id", "chat"} for r in received)
    finally:
        srv.shutdown(); srv.server_close()


def test_unknown_sink_type_fails_at_wiring(tmp_path):
    with pytest.raises(ValueError, match="unknown sink type"):
        cfg.build_registry({"outputs": [{"type": "kafka"}]})


def test_not_a_dict_config(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("- just\n- a list\n")
    with pytest.raises(ValueError, match="unable to parse"):
        cfg.load_config(str(p))
