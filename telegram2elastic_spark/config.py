"""Config-driven pipeline wiring.

The reference wires its whole output side from a YAML file
(telegram2elastic.py:624-659: `outputs:` list -> OutputHandler.add per
entry; config.sample.yml:103-136 shows per-output `output_map` expression
dicts and redis/tcp/file parameters).  Spark-first translation:

  * each `outputs:` entry becomes a named sink in a SinkRegistry (K7
    fan-out — one cached projection, N write actions);
  * a per-output `output_map` ({field: expression}) is applied BEFORE that
    sink via projection.apply_output_map — expressions are Spark SQL
    strings compiled driver-side into Column trees (Catalyst prunes/pushes
    through them), replacing the reference's per-row exec of Python code
    strings (telegram2elastic.py:156-175) with something safe and
    vectorized;
  * `translate_to_lang` turns on the U-5 translation stage, whose
    `translated_text` column then flows into every output map that asks
    for it (README.md:38-50).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .operators import projection, sinks

SINK_BUILDERS: dict[str, Callable[[dict], Callable[[DataFrame], None]]] = {
    "jsonl": lambda o: sinks.jsonl_sink(o["path"]),
    "file": lambda o: sinks.jsonl_sink(o["path"]),  # reference alias
    "parquet": lambda o: sinks.parquet_sink(o["path"]),
    "tcp": lambda o: sinks.tcp_sink(o["host"], int(o["port"])),
    "redis": lambda o: sinks.redis_rpush_sink(
        o.get("host", "localhost"), int(o.get("port", 6379)), o["key"]
    ),
}


def load_config(path: str) -> dict:
    """yaml.safe_load + the reference's shape check
    (telegram2elastic.py:627-632)."""
    import yaml

    with open(path) as f:
        config = yaml.safe_load(f)
    if not isinstance(config, dict):
        raise ValueError(f"unable to parse config file {path!r}")
    return config


def build_registry(config: dict) -> sinks.SinkRegistry:
    """`outputs:` list -> SinkRegistry (OutputHandler.add loop,
    telegram2elastic.py:634-636).  Unknown types fail fast at wiring time,
    not first-write time."""
    reg = sinks.SinkRegistry()
    for i, out in enumerate(config.get("outputs", [])):
        typ = out.get("type")
        if typ not in SINK_BUILDERS:
            raise ValueError(
                f"outputs[{i}]: unknown sink type {typ!r} "
                f"(supported: {sorted(SINK_BUILDERS)})"
            )
        base = SINK_BUILDERS[typ](out)
        omap = out.get("output_map")
        if omap:
            def sink(df: DataFrame, _base=base, _omap=dict(omap)) -> None:
                _base(projection.apply_output_map(df, _omap))
        else:
            sink = base
        reg.add(f"{typ}_{i}", sink)
    return reg


def run_pipeline(corpus: DataFrame, config: dict) -> list[str]:
    """Config-in, writes-out: optional translation stage, then fan-out to
    every configured sink (each with its own output map).  Returns the
    sink names written."""
    if config.get("translate_to_lang"):
        from .operators.enrichment import translate_stub

        corpus = corpus.join(
            translate_stub(corpus).select("doc_id", "translated_text"),
            "doc_id",
        )
    reg = build_registry(config)
    reg.write_all(corpus)
    return reg.names()
