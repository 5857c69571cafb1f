"""ES ingest pipeline (_simulate) — processor semantics vs the DuckDB
oracle, grok/dissect compilation, convert leniency."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import ingest_pipeline as ip

from .oracle import assert_same

PIPE = [
    {"dissect": {"field": "url", "pattern": "%{scheme}://%{host}/page/%{page}"}},
    {"gsub": {"field": "host", "pattern": "\\.example$", "replacement": "",
              "target_field": "site"}},
    {"grok": {"field": "text", "pattern": "^%{WORD:first_word}"}},
    {"convert": {"field": "page", "type": "long", "target_field": "page_num"}},
    {"uppercase": {"field": "lang", "target_field": "lang_uc"}},
    {"set": {"field": "pipeline", "value": "webtext-v1"}},
    {"substring": {"field": "text", "start": 0, "end": 40,
                   "target_field": "lead"}},
    {"rename": {"field": "site", "target_field": "host_short"}},
    {"remove": {"field": "html"}},
]
COLS = ["scheme", "host_short", "page_num", "first_word", "lang_uc",
        "pipeline", "lead"]


def test_simulate_vs_oracle(spark, duck, sf_dir):
    assert_same(
        ip.simulate_pipeline(load_corpus(spark, sf_dir), PIPE, cols=COLS),
        duck.execute(ip.simulate_pipeline_sql(PIPE, cols=COLS)).df(),
    )


def test_processor_semantics(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    row = ip.simulate_pipeline(corpus, PIPE, cols=COLS, limit=1).first()
    assert row["scheme"] == "https"
    assert row["host_short"] == f"site{row['doc_id'] % 1000}"
    assert row["page_num"] == row["doc_id"]
    assert row["pipeline"] == "webtext-v1"
    assert len(row["lead"]) <= 40
    assert row["lang_uc"].isupper()
    # convert leniency: unparseable -> NULL, never an error
    lenient = ip.simulate_pipeline(
        corpus,
        [{"convert": {"field": "lang", "type": "long",
                      "target_field": "bad"}}],
        cols=["bad"], limit=5,
    ).collect()
    assert all(r["bad"] is None for r in lenient)


def test_grok_compile():
    rx, fields = ip.compile_grok("%{WORD:w} %{NUMBER:n:int} %{GREEDYDATA}")
    assert fields == [("w", "string"), ("n", "int")]
    import re

    m = re.match(rx, "hello 42 rest of line")
    assert m and m.group(1) == "hello" and m.group(2) == "42"
    with pytest.raises(ValueError):
        ip.compile_grok("%{NOPE:x}")


def test_dissect_compile():
    rx, keys = ip.compile_dissect("%{scheme}://%{host}/%{path}")
    assert keys == ["scheme", "host", "path"]
    import re

    m = re.match(rx, "https://a.example/x/y/z")
    assert m.groups() == ("https", "a.example", "x/y/z")
    # skip field %{} matches without capturing
    rx2, keys2 = ip.compile_dissect("%{}://%{host}/%{}")
    m2 = re.match(rx2, "https://a.example/x/y")
    assert keys2 == ["host"] and m2.groups() == ("a.example",)


def test_unknown_processor_raises(spark, sf_dir):
    with pytest.raises(ValueError):
        ip.apply_pipeline(load_corpus(spark, sf_dir), [{"nope": {}}])
    with pytest.raises(ValueError):
        ip.apply_pipeline(
            load_corpus(spark, sf_dir), [{"set": {}, "remove": {}}]
        )


# session 13: kv / csv / append / fingerprint / templated set
PIPE2 = [
    {"dissect": {"field": "url",
                 "pattern": "%{scheme}://%{host}/page/%{page}"}},
    {"set": {"field": "qs", "value": "host={{host}}&page={{page}}&x="}},
    {"kv": {"field": "qs", "field_split": "&", "value_split": "=",
            "target_keys": ["host", "page", "x", "missing"]}},
    {"set": {"field": "csvline", "value": "{{lang}},{{scheme}}"}},
    {"csv": {"field": "csvline",
             "target_fields": ["c_lang", "c_scheme", "c_extra"]}},
    {"split": {"field": "lang", "separator": "", "target_field": "langs"}},
    {"append": {"field": "langs", "value": "zz"}},
    {"join": {"field": "langs", "separator": "-", "target_field": "langj"}},
    {"fingerprint": {"fields": ["url", "lang", "page"],
                     "target_field": "fp"}},
]
COLS2 = ["qs", "host", "page", "x", "missing", "c_lang", "c_scheme",
         "c_extra", "langj", "fp"]


def test_simulate_session13_processors_vs_oracle(spark, duck, sf_dir):
    assert_same(
        ip.simulate_pipeline(load_corpus(spark, sf_dir), PIPE2, cols=COLS2),
        duck.execute(ip.simulate_pipeline_sql(PIPE2, cols=COLS2)).df(),
    )


def test_session13_processor_semantics(spark, sf_dir):
    import hashlib

    corpus = load_corpus(spark, sf_dir)
    row = ip.simulate_pipeline(corpus, PIPE2, cols=COLS2, limit=1).first()
    d = row["doc_id"]
    assert row["qs"] == f"host=site{d % 1000}.example&page={d}&x="
    assert row["host"] == f"site{d % 1000}.example"
    assert row["page"] == str(d)
    assert row["x"] == ""          # present key, empty value
    assert row["missing"] is None  # absent key -> NULL
    assert row["c_extra"] is None  # csv: missing trailing field -> NULL
    assert row["langj"].endswith("-zz")
    url = f"https://site{d % 1000}.example/page/{d}"
    want = hashlib.sha256(
        f"{url}|{row['c_lang']}|{d}".encode()
    ).hexdigest()
    assert row["fp"] == want
