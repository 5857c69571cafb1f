"""Enrichment operators vs DuckDB oracles."""

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.operators import enrichment as en

from .oracle import assert_same


def test_extract_entities(spark, duck, sf_dir):
    assert_same(
        en.extract_entities(load_corpus(spark, sf_dir)),
        duck.execute(en.extract_entities_sql()).df(),
    )


def test_docs_mentioning(spark, duck, sf_dir):
    assert_same(
        en.docs_mentioning(load_corpus(spark, sf_dir), "spark"),
        duck.execute(en.docs_mentioning_sql("spark")).df(),
    )


def test_classify_stub(spark, duck, sf_dir):
    got = en.classify_stub(load_corpus(spark, sf_dir))
    assert_same(got, duck.execute(en.classify_stub_sql()).df())
    # contract: clamped to [0,100]; topics never empty
    rows = got.collect()
    assert all(0 <= r["osint_value"] <= 100 for r in rows)
    assert all(r["topics"] for r in rows)


def test_parse_fenced_json(spark, duck, sf_dir):
    assert_same(
        en.parse_fenced_json(load_corpus(spark, sf_dir)),
        duck.execute(en.PARSE_FENCED_SQL).df(),
    )


def test_docs_with_topics_arrays_overlap(spark, duck, sf_dir):
    """F9 with a real ArrayType topics column: any-of must equal the
    reference's OR-of-any loop (arrays_overlap semantics) and agree with
    the DuckDB list_intersect oracle."""
    got = en.docs_with_topics(
        load_corpus(spark, sf_dir), ["combat", "equipment"]
    )
    assert_same(
        got, duck.execute(en.docs_with_topics_sql(["combat", "equipment"])).df()
    )
    # every returned row really carries one of the query topics
    for r in got.collect():
        assert {"combat", "equipment"} & set(r["topics"].split(","))


def test_translate_stub_null_on_error(spark, duck, sf_dir):
    """U-5 contract: per-row failure -> NULL, success -> deterministic
    translation; matches the DuckDB oracle."""
    got = en.translate_stub(load_corpus(spark, sf_dir))
    assert_same(got, duck.execute(en.translate_stub_sql()).df())
    rows = got.collect()
    for r in rows:
        if r["doc_id"] % 13 == 0:
            assert r["translated_text"] is None
        else:
            assert r["translated_text"].startswith(f"{r['lang']}>en:")
