"""_shrink/_split (resize_index): query results invariant under resalt."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.index.maintenance import resize_index
from telegram2elastic_spark.query.phrase import phrase_topk
from telegram2elastic_spark.query.wand import wand_topk


@pytest.fixture(scope="module")
def idx8(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=8, positions=True)


def _rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.mark.parametrize("target", [4, 2, 1])
def test_shrink_preserves_results(idx8, target):
    small = resize_index(idx8, target)
    assert small["_n_doc_parts"] == target
    assert _rows(wand_topk(small, ["spark", "merge"], k=10)) == _rows(
        wand_topk(idx8, ["spark", "merge"], k=10)
    )
    assert _rows(phrase_topk(small, ["merge", "batch"], k=10, slop=1)) == _rows(
        phrase_topk(idx8, ["merge", "batch"], k=10, slop=1)
    )


def test_shrink_is_metadata_only(idx8):
    """Shrink reuses block bytes verbatim: same block count, same total
    gap bytes, only the salt column changes."""
    small = resize_index(idx8, 4)
    a = idx8["postings"].selectExpr(
        "count(*) AS c", "sum(length(doc_gaps)) AS b"
    ).first()
    b = small["postings"].selectExpr(
        "count(*) AS c", "sum(length(doc_gaps)) AS b"
    ).first()
    assert (a["c"], a["b"]) == (b["c"], b["b"])
    assert small["postings"].filter("salt >= 4").count() == 0


def test_split_preserves_results(idx8):
    big = resize_index(idx8, 16)
    assert big["_n_doc_parts"] == 16
    assert _rows(wand_topk(big, ["spark", "merge"], k=10)) == _rows(
        wand_topk(idx8, ["spark", "merge"], k=10)
    )
    assert _rows(phrase_topk(big, ["merge", "batch"], k=10, slop=1)) == _rows(
        phrase_topk(idx8, ["merge", "batch"], k=10, slop=1)
    )
    assert big["postings"].filter("salt >= 16 OR salt < 0").count() == 0
    assert big["postings"].select("salt").distinct().count() > 8


def test_split_matches_fresh_build(spark, sf_dir, idx8):
    """Split re-encode is byte-identical to building at the target salt
    count directly (deterministic encoder per (term, salt) set)."""
    big = resize_index(idx8, 16)
    fresh = build_index(load_corpus(spark, sf_dir), n_doc_parts=16, positions=True)
    cols = ["term", "salt", "block_id", "n_docs", "first_doc_id", "last_doc_id"]
    a = sorted(tuple(r) for r in big["postings"].select(cols).collect())
    b = sorted(tuple(r) for r in fresh["postings"].select(cols).collect())
    assert a == b
    ga = big["postings"].selectExpr("sum(length(doc_gaps))").first()[0]
    gb = fresh["postings"].selectExpr("sum(length(doc_gaps))").first()[0]
    assert ga == gb


def test_resize_rejects_non_factor(idx8):
    with pytest.raises(ValueError):
        resize_index(idx8, 3)
