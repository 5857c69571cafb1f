"""Property tests for the r5 real-codec path and the narrow tf kernel.

The BMP parser is a genuine format parser: round-trip against an
independent writer (not synth_bmp_bytes), top-down variant, truncation
fuzz.  The tf kernel is checked against a plain pandas groupby
reference on random token batches.
"""

import struct

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from telegram2elastic_spark.operators.multimodal import (
    parse_bmp,
    synth_bmp_bytes,
)

pytestmark = pytest.mark.quick  # module is pure-python fast; keep one in the gate


def _write_bmp(w: int, h: int, px: np.ndarray, top_down: bool = False) -> bytes:
    """Independent BMP writer (shares no code with synth_bmp_bytes):
    px is (h, w, 3) uint8 in top-left-origin BGR order."""
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    ys = range(h) if top_down else range(h - 1, -1, -1)
    for y in ys:
        row = px[y].tobytes()
        rows += row + b"\x00" * (stride - len(row))
    off = 54
    hdr = struct.pack("<2sIHHI", b"BM", off + len(rows), 0, 0, off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0,
        len(rows), 2835, 2835, 0, 0,
    )
    return bytes(hdr + dib + rows)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 9),
    seed=st.integers(0, 2**31 - 1),
    top_down=st.booleans(),
)
def test_parse_bmp_roundtrip_independent_writer(w, h, seed, top_down):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    parsed = parse_bmp(_write_bmp(w, h, px, top_down=top_down))
    assert parsed is not None
    pw, ph, bpp, n_px, px_sum = parsed
    assert (pw, ph, bpp, n_px) == (w, h, 24, w * h)
    assert px_sum == int(px.sum(dtype=np.int64))


@settings(max_examples=50, deadline=None)
@given(doc_id=st.integers(0, 10**9), cut=st.integers(0, 200))
def test_parse_bmp_truncation_never_crashes(doc_id, cut):
    data = synth_bmp_bytes(doc_id)
    chopped = data[: max(0, len(data) - cut)]
    out = parse_bmp(chopped)
    if cut == 0:
        assert out is not None
    else:
        # declared file size no longer matches -> clean rejection
        assert out is None


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "cc", "dd", "e"]), max_size=30),
        min_size=1,
        max_size=12,
    ),
    st.booleans(),
)
def test_tf_kernel_matches_pandas_reference(token_lists, with_pos):
    from telegram2elastic_spark.index.build import _tf_positions_kernel
    from telegram2elastic_spark.index.codec import varbyte_decode

    pdf = pd.DataFrame(
        {
            "doc_id": pd.Series(range(len(token_lists)), dtype="int64"),
            "toks": pd.Series(
                [np.array(t, dtype=object) for t in token_lists],
                dtype="object",
            ),
        }
    )
    outs = list(_tf_positions_kernel(iter([pdf]), with_pos=with_pos))
    got = (
        pd.concat(outs, ignore_index=True)
        if outs
        else pd.DataFrame(
            {
                "term": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype="int64"),
                "dl": pd.Series([], dtype="int64"),
                "tf": pd.Series([], dtype="int64"),
            }
        )
    )
    # reference: plain python counting
    ref_rows = []
    for d, toks in enumerate(token_lists):
        for t in sorted(set(toks)):
            ref_rows.append((t, d, len(toks), toks.count(t)))
    ref = pd.DataFrame(ref_rows, columns=["term", "doc_id", "dl", "tf"])
    g = got[["term", "doc_id", "dl", "tf"]].sort_values(
        ["doc_id", "term"], ignore_index=True
    ).astype({"doc_id": "int64", "dl": "int64", "tf": "int64"})
    r = ref.sort_values(["doc_id", "term"], ignore_index=True).astype(
        {"doc_id": "int64", "dl": "int64", "tf": "int64"}
    )
    pd.testing.assert_frame_equal(g, r)
    if with_pos and len(got):
        # pos_vb decodes to the doc's occurrence offsets (delta-encoded)
        for _, row in got.iterrows():
            gaps = varbyte_decode(bytes(row["pos_vb"]))
            pos = np.cumsum(gaps.astype(np.int64))
            toks = token_lists[int(row["doc_id"])]
            want = [i for i, t in enumerate(toks) if t == row["term"]]
            assert pos.tolist() == want


@settings(max_examples=20, deadline=None)
@given(
    n_docs=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_block_cache_equals_direct_decode(n_docs, seed):
    """Any pruned block subset through the r5 block-granular cache must
    decode identically to the direct path, in any access order."""
    from telegram2elastic_spark.index.build import (
        _encode_terms_batch,
        _tf_positions_kernel,
    )
    from telegram2elastic_spark.query.phrase import (
        _decode_blocks_block_cached,
        _decode_term_blocks,
    )

    rng = np.random.default_rng(seed)
    vocab = ["a", "b", "cc"]
    toks = [
        np.array(
            rng.choice(vocab, size=rng.integers(1, 20)), dtype=object
        )
        for _ in range(n_docs)
    ]
    src = pd.DataFrame(
        {
            "doc_id": pd.Series(range(n_docs), dtype="int64"),
            "toks": pd.Series(toks, dtype="object"),
        }
    )
    tf = pd.concat(
        _tf_positions_kernel(iter([src]), with_pos=True), ignore_index=True
    )
    tf["salt"] = np.int32(0)
    blocks = _encode_terms_batch(tf)
    for term, g in blocks.groupby("term", sort=False):
        g = g.sort_values("block_id")
        # random subset of blocks, random repeat order
        n = len(g)
        for _ in range(3):
            take = rng.integers(0, 2, size=n).astype(bool)
            if not take.any():
                continue
            sub = g.loc[take]
            tb: dict = {}
            got = _decode_blocks_block_cached(term, sub, tb)
            want = _decode_term_blocks(term, sub)
            assert np.array_equal(got[0], want[0])
            assert np.array_equal(got[1], want[1])
            assert len(got[2]) == len(want[2])
            for a, b in zip(got[2], want[2]):
                assert np.array_equal(a, b)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "cc"]), max_size=12),
        min_size=1, max_size=10,
    ),
)
def test_tf_kernel_slicing_invariant(token_lists):
    """The memory-bound batch slicing must not change the output: a
    1-token budget (every doc its own slice) equals the default."""
    from telegram2elastic_spark.index import build as B

    pdf = pd.DataFrame(
        {
            "doc_id": pd.Series(range(len(token_lists)), dtype="int64"),
            "toks": pd.Series(
                [np.array(t, dtype=object) for t in token_lists],
                dtype="object",
            ),
        }
    )

    def run():
        outs = list(B._tf_positions_kernel(iter([pdf]), with_pos=True))
        if not outs:
            return pd.DataFrame()
        df = pd.concat(outs, ignore_index=True)
        return df.sort_values(["doc_id", "term"], ignore_index=True)

    default = run()
    orig = B._TF_SLICE_TOKENS
    try:
        B._TF_SLICE_TOKENS = 1
        tiny = run()
    finally:
        B._TF_SLICE_TOKENS = orig
    pd.testing.assert_frame_equal(default, tiny)
