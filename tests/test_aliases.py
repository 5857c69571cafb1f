"""Index aliases + rollover lifecycle (ES _rollover / ILM hot rotation)."""

import json
import os
import tempfile

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index import aliases as al
from telegram2elastic_spark.index.build import build_index, write_index


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_corpus(spark, sf_dir)


def test_init_and_resolve(tmp_path):
    root = str(tmp_path)
    d1 = al.alias_init(root, "logs")
    assert d1.endswith("logs-000001")
    assert al.resolve_alias(root, "logs") == [d1]
    assert al.resolve_alias(root, "logs", write=True) == [d1]
    with pytest.raises(ValueError):
        al.alias_init(root, "logs")
    with pytest.raises(KeyError):
        al.resolve_alias(root, "nope")


def test_rollover_on_max_docs(spark, corpus, tmp_path):
    root = str(tmp_path)
    d1 = al.alias_init(root, "web")
    write_index(build_index(corpus, n_doc_parts=4), d1)
    n = corpus.count()
    # below threshold: no roll
    rolled, _ = al.rollover(spark, root, "web", max_docs=n + 1)
    assert not rolled
    rolled, d2 = al.rollover(spark, root, "web", max_docs=n)
    assert rolled and d2.endswith("web-000002")
    assert al.resolve_alias(root, "web", write=True) == [d2]
    assert al.resolve_alias(root, "web") == [d1, d2]
    # state file is valid JSON after the swap (atomic commit)
    with open(os.path.join(root, "aliases.json")) as f:
        state = json.load(f)
    assert state["aliases"]["web"]["write_index"] == "web-000002"


def test_rollover_on_age(spark, tmp_path):
    root = str(tmp_path)
    al.alias_init(root, "t", created_at=1000.0)
    rolled, _ = al.rollover(spark, root, "t", max_age_sec=500, now=1400.0)
    assert not rolled
    rolled, d2 = al.rollover(spark, root, "t", max_age_sec=500, now=1600.0)
    assert rolled and d2.endswith("t-000002")


def test_search_through_read_alias(spark, corpus, tmp_path):
    """Alias search == federated over the same generations; freshly
    rolled empty generation is skipped."""
    from telegram2elastic_spark.index.build import read_index
    from telegram2elastic_spark.query.federated import federated_topk_indexed

    root = str(tmp_path)
    half_a = corpus.filter("doc_id % 2 = 0")
    half_b = corpus.filter("doc_id % 2 = 1")
    d1 = al.alias_init(root, "web")
    write_index(build_index(half_a, n_doc_parts=4), d1)
    rolled, d2 = al.rollover(spark, root, "web", max_docs=1)
    assert rolled
    write_index(build_index(half_b, n_doc_parts=4), d2)
    # roll once more and leave generation 3 EMPTY
    rolled, _ = al.rollover(spark, root, "web", max_docs=1)
    assert rolled

    got = al.search_alias(spark, root, "web", ["spark", "merge"], k=10)
    want = federated_topk_indexed(
        {
            "web-000001": read_index(spark, d1),
            "web-000002": read_index(spark, d2),
        },
        ["spark", "merge"],
        k=10,
    )
    assert got == want
    assert got, "expected hits through the alias"
    # per-index stats: every doc from gen1 is even, gen2 odd
    for name, doc_id, _ in got:
        if name == "idx_web-000001":
            assert doc_id % 2 == 0
        else:
            assert doc_id % 2 == 1
