"""Varbyte/delta/block codec round-trip properties."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from telegram2elastic_spark.index.codec import (
    BLOCK_SIZE,
    decode_block,
    delta_decode,
    delta_encode,
    encode_blocks,
    varbyte_decode,
    varbyte_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varbyte_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=400, unique=True
    )
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    ids = np.array(sorted(ids), dtype=np.uint64)
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_varbyte_edge_cases():
    for vals in ([], [0], [127], [128], [2**63 - 1], [0, 0, 0]):
        v = np.array(vals, dtype=np.uint64)
        assert np.array_equal(varbyte_decode(varbyte_encode(v)), v)


def test_blocks_roundtrip_and_metadata():
    rng = np.random.default_rng(42)
    n = 5 * BLOCK_SIZE + 17  # non-aligned boundary
    ids = np.cumsum(rng.integers(1, 1000, size=n)).astype(np.uint64)
    tfs = rng.integers(1, 50, size=n).astype(np.uint64)
    blocks = encode_blocks(ids, tfs)
    assert len(blocks) == 6
    out_ids, out_tfs = [], []
    for b in blocks:
        i, t = decode_block(b["doc_gaps"], b["tf_bytes"])
        assert b["first_doc_id"] == int(i[0])
        assert b["last_doc_id"] == int(i[-1])
        assert b["block_max_tf"] == int(t.max())
        assert b["n_docs"] == i.size
        out_ids.append(i)
        out_tfs.append(t)
    assert np.array_equal(np.concatenate(out_ids), ids)
    assert np.array_equal(np.concatenate(out_tfs), tfs)


def test_compression_actually_compresses():
    # dense gaps -> ~1 byte per id instead of 8
    ids = np.arange(0, 10000, dtype=np.uint64)
    enc = varbyte_encode(delta_encode(ids))
    assert len(enc) < 10000 * 1.2


def test_batch_encoder_identity(spark):
    """The vectorized multi-term kernel (_encode_terms_batch) must emit
    byte-identical block rows to the reference per-term encoder
    (codec.encode_blocks) for every term in the batch."""
    import numpy as np
    import pandas as pd

    from telegram2elastic_spark.index.build import _encode_terms_batch
    from telegram2elastic_spark.index.codec import BLOCK_SIZE, encode_blocks

    rng = np.random.RandomState(11)
    rows = []
    for t_i in range(37):  # mixed sizes: some multi-block, some 1-doc
        n = int(rng.randint(1, BLOCK_SIZE * 3 + 5))
        ids = np.sort(rng.choice(np.arange(1, 10_000), size=n, replace=False))
        for d in ids:
            rows.append(
                {
                    "term": f"t{t_i:03d}",
                    "salt": 3,
                    "enc_key": 0,
                    "doc_id": int(d),
                    "tf": int(rng.randint(1, 200)),
                    "dl": int(rng.randint(1, 500)),
                }
            )
    pdf = pd.DataFrame(rows).sample(frac=1.0, random_state=5)  # shuffle input
    got = _encode_terms_batch(pdf)
    for term, g in pdf.groupby("term"):
        g = g.sort_values("doc_id")
        want = encode_blocks(
            g["doc_id"].to_numpy(), g["tf"].to_numpy(), BLOCK_SIZE,
            doc_lens=g["dl"].to_numpy(),
        )
        sub = got[got["term"] == term].sort_values("block_id")
        assert len(sub) == len(want)
        for (_, row), b in zip(sub.iterrows(), want):
            assert row["block_id"] == b["block_id"]
            assert row["n_docs"] == b["n_docs"]
            assert row["first_doc_id"] == b["first_doc_id"]
            assert row["last_doc_id"] == b["last_doc_id"]
            assert bytes(row["doc_gaps"]) == b["doc_gaps"]
            assert bytes(row["tf_bytes"]) == b["tf_bytes"]
            assert bytes(row["dl_bytes"]) == b["dl_bytes"]
            assert row["block_max_tf"] == b["block_max_tf"]


@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 64) - 1),
        min_size=0,
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_varbyte_widths_consistent_with_encode(vals):
    """sum(varbyte_widths(v)) == len(varbyte_encode(v)), and the prefix
    sums are exact split points: encoding a prefix equals the buffer
    prefix (the invariant the multi-term batch encoder slices on)."""
    import numpy as np

    from telegram2elastic_spark.index.codec import varbyte_encode, varbyte_widths

    v = np.asarray(vals, dtype=np.uint64)
    buf = varbyte_encode(v)
    w = varbyte_widths(v)
    assert int(w.sum()) == len(buf)
    if len(vals) >= 2:
        cut = len(vals) // 2
        off = int(w[:cut].sum())
        assert varbyte_encode(v[:cut]) == buf[:off]
        assert varbyte_encode(v[cut:]) == buf[off:]


def test_mapside_position_encoding_byte_identity(spark, sf_dir):
    """r5: term_frequencies(positions=True) pre-encodes position deltas
    map-side (pos_vb) so the encode shuffle carries bytes, not raw ints.
    The resulting blocks must be byte-identical to the former
    collect_list path (varbyte is per-value, so concatenation of
    per-posting blobs == encode_positions of the raw arrays)."""
    import pyspark.sql.functions as F

    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.functions.tokenizer import tokens
    from telegram2elastic_spark.index import build as B

    corpus = load_corpus(spark, sf_dir)
    new_post = B.build_postings(
        B.term_frequencies(corpus, positions=True), n_doc_parts=4
    )
    toks = corpus.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", F.size("toks").alias("dl"),
        F.posexplode("toks").alias("pos", "term"),
    )
    old_tf = toks.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).alias("tf"),
        F.array_sort(F.collect_list("pos")).alias("positions"),
    )
    old_post = B.build_postings(old_tf, n_doc_parts=4)

    def as_map(df):
        return {
            (r["term"], r["salt"], r["block_id"]): (
                bytes(r["doc_gaps"]), bytes(r["tf_bytes"]),
                bytes(r["dl_bytes"]), bytes(r["pos_bytes"]),
            )
            for r in df.collect()
        }

    a, b = as_map(new_post), as_map(old_post)
    assert a == b
