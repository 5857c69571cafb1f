"""Property test for the phrase bounded-emission band (phrase_topk
docstring): per-salt truncation to the top-k by the idf-free kernel g
plus the band (2*10^-SCORE_DECIMALS + ROUND_GUARD)/idf_lb must NEVER
change the global top-k under the final rounded ordering, for ANY
distribution of matches across salts and ANY true idf >= idf_lb.

Pure numpy — this pins the math itself, independent of Spark plumbing
(the Spark-path identity is covered by the oracle tests)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from telegram2elastic_spark.query.bm25 import ROUND_GUARD, SCORE_DECIMALS
from telegram2elastic_spark.query.phrase import _phrase_g


def _global_topk(ids: np.ndarray, scores: np.ndarray, k: int):
    rounded = np.round(scores, SCORE_DECIMALS)
    order = np.lexsort((ids, -rounded))[:k]
    return [(int(ids[i]), float(rounded[i])) for i in order]


@settings(max_examples=200, deadline=None)
@given(
    st.data(),
    st.integers(min_value=1, max_value=8),    # salts
    st.integers(min_value=1, max_value=10),   # k
    st.floats(min_value=0.01, max_value=12.0),  # idf lower bound
    st.floats(min_value=1.0, max_value=10.0),   # idf_true / idf_lb ratio
)
def test_band_truncation_preserves_global_topk(data, n_salts, k, idf_lb, ratio):
    idf_true = idf_lb * ratio  # any true idf >= the driver-known bound
    band = (2.0 * 10.0 ** (-SCORE_DECIMALS) + ROUND_GUARD) / idf_lb
    avgdl = 50.0
    rng_docs = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=30),    # phrase_tf
                st.integers(min_value=1, max_value=500),   # dl
            ),
            min_size=0,
            max_size=60,
        )
    )
    if not rng_docs:
        return
    n = len(rng_docs)
    ids = np.arange(n, dtype=np.int64)
    salts = ids % n_salts
    tf = np.array([t for t, _ in rng_docs], dtype=np.int64)
    dl = np.array([d for _, d in rng_docs], dtype=np.int64)
    g = _phrase_g(tf, dl, avgdl)
    scores = idf_true * g

    # exact global top-k over ALL matches
    want = _global_topk(ids, scores, k)

    # per-salt band truncation (the kernel's emission rule), then the
    # same global selection over only the emitted rows
    kept = np.zeros(n, dtype=bool)
    for s in range(n_salts):
        m = salts == s
        if m.sum() <= k:
            kept |= m
            continue
        gs = g[m]
        idx = np.nonzero(m)[0]
        order = np.lexsort((ids[idx], -gs))
        kth_g = gs[order[k - 1]]
        kept[idx[order[gs[order] >= kth_g - band]]] = True
    got = _global_topk(ids[kept], scores[kept], k)
    assert got == want
