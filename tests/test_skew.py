"""Heavy-hitter skew: a Zipf-extreme corpus must produce a balanced
doc-partitioned index — no salt group ever holds a whole head-term posting
list (SURVEY.md §7.4; north_star skew-split requirement)."""

import numpy as np
from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import as_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.index.codec import decode_block
from telegram2elastic_spark.query.bm25 import bm25_topk
from telegram2elastic_spark.query.wand import wand_topk

N_DOCS = 2000
P = 8


def _zipf_corpus(spark):
    """Deterministic Zipf-extreme corpus: 'the' in ~every doc (df≈N),
    'rare<i>' each in one doc — the worst case for term-keyed grouping."""
    rows = []
    for i in range(N_DOCS):
        words = ["the"] * (1 + i % 5) + ["mid" + str(i % 20)]
        if i % 10 == 0:
            words.append("rare" + str(i))
        rows.append((i, " ".join(words), "en", "s" + str(i % 3), len(words)))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    return as_corpus(docs)


def test_heavy_hitter_is_split_across_all_salts(spark):
    corpus = _zipf_corpus(spark)
    idx = build_index(corpus, n_doc_parts=P)
    the_blocks = (
        idx["postings"].filter(F.col("term") == "the").collect()
    )
    per_salt = {}
    for r in the_blocks:
        per_salt[r["salt"]] = per_salt.get(r["salt"], 0) + r["n_docs"]
    # present in every salt, and balanced: max/min <= 1.2 (round-robin
    # doc_id % P over a contiguous id range is near-perfectly even)
    assert set(per_salt) == set(range(P))
    assert max(per_salt.values()) <= 1.2 * min(per_salt.values())
    assert sum(per_salt.values()) == N_DOCS  # df('the') == N


def test_posting_lists_sorted_within_salt(spark):
    corpus = _zipf_corpus(spark)
    idx = build_index(corpus, n_doc_parts=P)
    for r in idx["postings"].filter(F.col("term") == "the").collect():
        ids, tfs = decode_block(bytes(r["doc_gaps"]), bytes(r["tf_bytes"]))
        assert np.all(np.diff(ids.astype(np.int64)) > 0)
        assert ids.size == r["n_docs"]
        assert int(tfs.max()) == r["block_max_tf"]


def test_zipf_rank_identity(spark):
    """Skewed corpus: compressed path == relational on head+tail mix."""
    corpus = _zipf_corpus(spark)
    idx = build_index(corpus, n_doc_parts=P)
    for terms in (["the"], ["the", "mid3"], ["rare100", "the"], ["mid7"]):
        want = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(corpus, terms, k=10).collect()
        ]
        got = [
            (r["doc_id"], r["score"])
            for r in wand_topk(idx, terms, k=10).collect()
        ]
        assert got == want, terms
