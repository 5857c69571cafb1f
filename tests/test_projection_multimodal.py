"""Projection/rule-cascade operators and multimodal plumbing vs oracles."""

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import multimodal, projection

from .oracle import assert_same


def test_default_projection(spark, duck, sf_dir):
    assert_same(
        projection.default_projection(load_corpus(spark, sf_dir)),
        duck.execute(projection.DEFAULT_PROJECTION_SQL).df(),
    )


def test_nested_output_map(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    out = projection.apply_output_map(
        corpus, {"id": "doc_id", "sender.username": "upper(lang)", "sender.host": "source"}
    )
    assert out.columns == ["id", "sender"]
    row = out.orderBy("id").first()
    assert set(row["sender"].asDict()) == {"host", "username"}
    assert row["sender"]["username"] == row["sender"]["username"].upper()


def test_sender_struct(spark, duck, sf_dir):
    assert_same(
        projection.sender_struct(load_corpus(spark, sf_dir)),
        duck.execute(projection.SENDER_STRUCT_SQL).df(),
    )


def test_rule_cascade(spark, duck, sf_dir):
    got = projection.rule_cascade(load_corpus(spark, sf_dir))
    assert_same(got, duck.execute(projection.rule_cascade_sql()).df())
    # default rule catches everything: no null rule_idx
    assert got.filter("rule_idx is null").count() == 0


def test_media_metadata(spark, duck, sf_dir):
    assert_same(
        multimodal.media_metadata(load_corpus(spark, sf_dir)),
        duck.execute(multimodal.MEDIA_METADATA_SQL).df(),
    )


def test_decode_media(spark, duck, sf_dir):
    assert_same(
        multimodal.decode_media(load_corpus(spark, sf_dir)),
        duck.execute(multimodal.DECODE_MEDIA_SQL).df(),
    )


def test_decode_image_real_is_gated(spark, sf_dir):
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_image_real(load_corpus(spark, sf_dir))
