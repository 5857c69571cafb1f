"""Tokenizer + extractor invariants.

The input_hint invariant: extracted text is byte-identical per url vs the
reference extractor.  Our corpus wraps text into html deterministically, so
extract_text(html) must round-trip to the exact `text` bytes for every url.
"""

from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.functions.tokenizer import (
    extract_text,
    py_tokenize,
    tokens,
)

GOLDEN = [
    ("Hello, World!", ["hello", "world"]),
    ("", []),
    ("   ", []),
    ("a-b_c d", ["a", "b", "c", "d"]),  # underscore is NOT a token char
    ("Привіт СВІТЕ 123", ["привіт", "світе", "123"]),  # Cyrillic + digits
    ("Київ, Києва, Києву", ["київ", "києва", "києву"]),  # case endings
    ("emoji 💰💰💰 run", ["emoji", "run"]),
    ("tab\tnewline\nmix", ["tab", "newline", "mix"]),
    ("ALLCAPS lower MiXeD", ["allcaps", "lower", "mixed"]),
    ("1,234.56 price", ["1", "234", "56", "price"]),
]


def test_golden_tokens_spark_vs_python(spark):
    df = spark.createDataFrame([(t,) for t, _ in GOLDEN], "text string")
    got = [r["toks"] for r in df.select(tokens("text").alias("toks")).collect()]
    for (text, want), g in zip(GOLDEN, got):
        assert g == want, f"{text!r}: {g} != {want}"
        assert py_tokenize(text) == want, f"py oracle {text!r}"


def test_extract_text_byte_identity_per_url(spark, sf_dir):
    """html -> extract_text == original text, for EVERY url (no sampling)."""
    corpus = load_corpus(spark, sf_dir)
    bad = (
        corpus.withColumn("extracted", extract_text(F.col("html")))
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_extracted_tokens_match_direct_tokens(spark, sf_dir):
    """Tokenizing extracted text == tokenizing the stored text column."""
    corpus = load_corpus(spark, sf_dir)
    bad = (
        corpus.withColumn("t1", tokens(extract_text(F.col("html"))))
        .withColumn("t2", tokens("text"))
        .filter(F.col("t1") != F.col("t2"))
        .count()
    )
    assert bad == 0


def test_doc_len_counts_empty_docs(spark):
    df = spark.createDataFrame([("",), ("one two",)], "text string")
    sizes = [r["s"] for r in df.select(F.size(tokens("text")).alias("s")).collect()]
    assert sizes == [0, 2]
