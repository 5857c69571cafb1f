"""Margin-based bitext mining (Artetxe & Schwenk 2019 ratio margin):
oracle parity, independent numpy recompute, hub penalization."""

import numpy as np
import pytest

from telegram2elastic_spark.corpus import load_embeddings
from telegram2elastic_spark.operators import similarity as sim

from .oracle import assert_same


@pytest.mark.parametrize("ga,gb,knn", [(0, 1, 4), (2, 3, 2)])
def test_bitext_margin_vs_oracle(spark, duck, sf_dir, ga, gb, knn):
    got = sim.bitext_margin_topk(
        load_embeddings(spark, sf_dir), ga, gb, knn=knn, k=10
    )
    want = duck.execute(
        sim.bitext_margin_topk_sql(ga, gb, knn=knn, k=10)
    ).df()
    assert_same(got, want)


def _py_margin(A, B, knn):
    """Pure-numpy recompute of the integer-scaled ratio margin."""
    c5 = {}
    for ai, va in A.items():
        for bi, vb in B.items():
            cos = float(np.dot(va, vb) / (np.linalg.norm(va) * np.linalg.norm(vb)))
            c5[(ai, bi)] = int(round(cos * 100000))
    sa = {
        ai: sum(sorted((c5[(ai, bi)] for bi in B), reverse=True)[:knn])
        for ai in A
    }
    sb = {
        bi: sum(sorted((c5[(ai, bi)] for ai in A), reverse=True)[:knn])
        for bi in B
    }
    return {
        (ai, bi): round(2.0 * knn * v / (sa[ai] + sb[bi]), 5)
        for (ai, bi), v in c5.items()
        if sa[ai] + sb[bi] != 0
    }


def test_bitext_margin_matches_numpy(spark):
    rng_a = {i: np.array([(i * 7 + d * 3) % 11 - 5.0 for d in range(8)]) for i in range(6)}
    rng_b = {
        100 + i: np.array([(i * 5 + d * 2) % 13 - 6.0 for d in range(8)])
        for i in range(6)
    }
    rows = [
        (vid, [float(x) for x in v], 0) for vid, v in rng_a.items()
    ] + [(vid, [float(x) for x in v], 1) for vid, v in rng_b.items()]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    got = {
        (r["a_id"], r["b_id"]): r["margin"]
        for r in sim.bitext_margin_topk(emb, 0, 1, knn=3, k=1000).collect()
    }
    want = _py_margin(rng_a, rng_b, knn=3)
    for key, m in got.items():
        assert m == pytest.approx(want[key], abs=1e-9)
    # top pair agrees
    assert max(got, key=got.get) == max(want, key=want.get)


def test_bitext_margin_penalizes_hubs(spark):
    """A hub vector close to EVERYTHING gets margin ~1 even at high
    cosine; a distinctive mutual pair with lower absolute cosine
    out-margins it — the raison d'être of the ratio criterion."""
    base = [1.0, 0.0, 0.0, 0.0]
    hub_neighbors = [
        (i, [1.0, 0.01 * (i + 1), 0.0, 0.0], 0) for i in range(4)
    ]  # group A: four near-identical vectors all close to the hub
    distinct_a = (10, [0.0, 0.0, 1.0, 0.2], 0)
    hub = (100, base, 1)
    distinct_b = (101, [0.0, 0.0, 1.0, 0.25], 1)
    fill_b = [(102 + i, [0.5, 0.5 * (i + 1), 0.1, 0.0], 1) for i in range(2)]
    emb = spark.createDataFrame(
        hub_neighbors + [distinct_a, hub, distinct_b] + fill_b,
        "vec_id long, embedding array<double>, label int",
    )
    rows = sim.bitext_margin_topk(emb, 0, 1, knn=2, k=100).collect()
    margins = {(r["a_id"], r["b_id"]): r["margin"] for r in rows}
    cosines = {(r["a_id"], r["b_id"]): r["cosine"] for r in rows}
    hub_pairs = [m for (a, b), m in margins.items() if b == 100]
    assert cosines[(0, 100)] > cosines[(10, 101)] * 0.99  # hub cosine is high
    assert margins[(10, 101)] > max(hub_pairs)  # but the distinctive pair wins


def test_bitext_margin_rejects_bad_knn(spark, sf_dir):
    with pytest.raises(ValueError):
        sim.bitext_margin_topk(load_embeddings(spark, sf_dir), 0, 1, knn=0)
