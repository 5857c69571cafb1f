"""Property test: the vectorized greedy chain in query/intervals.py is an
EXACT existence test for the ordered-interval match.

Brute-force oracle: an anchor p (occurrence of the first term) matches
iff SOME strictly-increasing choice of occurrences of the remaining
terms starting after p ends within p + m - 1 + max_gaps.  Greedy
(earliest-next) provably minimizes the chain end, but this pins the
claim against random data rather than trusting the proof."""

from itertools import product

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from telegram2elastic_spark.query.intervals import _ordered_anchor_tf
from telegram2elastic_spark.query.phrase import _DOC_KEY


def _brute_anchors(doc_toks: list[list[str]], terms: list[str], max_gaps: int):
    """Set of (doc_idx, pos) anchors with a qualifying ordered chain."""
    out = set()
    m = len(terms)
    for d, toks in enumerate(doc_toks):
        occ = {t: [i for i, x in enumerate(toks) if x == t] for t in set(terms)}
        for p in occ.get(terms[0], []):
            # DFS over occurrence choices (docs are tiny in this test)
            def ok(i, prev):
                if i == m:
                    return prev - p <= m - 1 + max_gaps
                return any(
                    ok(i + 1, q) for q in occ.get(terms[i], []) if q > prev
                )
            if ok(1, p):
                out.add((d, p))
    return out


@settings(max_examples=150, deadline=None)
@given(
    data=st.lists(  # up to 4 docs of up to 18 tokens over a 3-letter alphabet
        st.lists(st.sampled_from("abc"), min_size=1, max_size=18),
        min_size=1, max_size=4,
    ),
    terms=st.lists(st.sampled_from("abc"), min_size=2, max_size=3),
    max_gaps=st.integers(min_value=0, max_value=4),
)
def test_greedy_chain_matches_bruteforce(data, terms, max_gaps):
    docs = [list(d) for d in data]
    # keyed position arrays over candidate slots = docs containing ALL terms
    cands = [
        i for i, d in enumerate(docs) if all(t in d for t in set(terms))
    ]
    if not cands:
        return
    keyed = {}
    for t in set(terms):
        ks = []
        for slot, i in enumerate(cands):
            ks.extend(
                slot * _DOC_KEY + p for p, x in enumerate(docs[i]) if x == t
            )
        keyed[t] = np.array(sorted(ks), dtype=np.int64)
    got = _ordered_anchor_tf(keyed, list(terms), max_gaps)
    got_set = {
        (cands[int(a // _DOC_KEY)], int(a % _DOC_KEY)) for a in got
    }
    want = {
        (d, p)
        for d, p in _brute_anchors(docs, list(terms), max_gaps)
        if d in cands
    }
    assert got_set == want
