"""Session-23 ops: Bloom membership sketch, distance-based outlier
detection, MMR diversification rerank — oracle parity, independent
recomputes, and the sketch/selection invariants."""

import numpy as np
import pytest

from telegram2elastic_spark.corpus import load_corpus, load_embeddings
from telegram2elastic_spark.operators import similarity as sim
from telegram2elastic_spark.operators import sketches as sk

from .oracle import assert_same

PROBES = [
    "batch batch batch", "spark group query", "merge sort join",
    "zz yy xx", "quantum flux capacitor",
]


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_corpus(spark, sf_dir)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_embeddings(spark, sf_dir)


# --- Bloom --------------------------------------------------------------------

def test_bloom_probe_vs_oracle(corpus, duck):
    got = sim_df = sk.bloom_probe(corpus, PROBES, m=1 << 22, k=5)
    want = duck.execute(sk.bloom_probe_sql(PROBES, m=1 << 22, k=5)).df()
    assert_same(got, want)


def test_bloom_no_false_negatives_even_tiny(corpus):
    """Present shingles MUST hit at any filter size (the Bloom guarantee);
    with m=64 the filter saturates and the absent probes turn into
    (visible) false positives — never the other way."""
    rows = {
        r["probe"]: r
        for r in sk.bloom_probe(corpus, PROBES, m=64, k=3).collect()
    }
    for p, r in rows.items():
        if r["present"]:
            assert r["bloom_hit"], p
        assert r["false_pos"] == (r["bloom_hit"] and not r["present"])


def test_bloom_truth_matches_exact_shingles(corpus, duck):
    """The `present` column equals exact membership in the distinct
    3-gram shingle relation (the decontaminate-style truth)."""
    got = {
        r["probe"]: r["present"]
        for r in sk.bloom_probe(corpus, PROBES, m=1 << 22, k=5).collect()
    }
    shing = {
        s
        for (s,) in sk._corpus_shingles(corpus, 3)
        .select("shingle")
        .collect()
    }
    for p in PROBES:
        assert got[p] == (p in shing), p


def test_bloom_bits_bounded_and_mergeable(corpus):
    m = 1 << 10
    bits = sk.bloom_bits(corpus, m=m, k=4)
    vals = [r["bit"] for r in bits.collect()]
    assert len(vals) == len(set(vals)) <= m
    assert all(0 <= v < m for v in vals)
    # mergeability: filter of a 2-split union == union of split filters
    half1 = corpus.limit(200)
    ids = {r["doc_id"] for r in half1.select("doc_id").collect()}
    from pyspark.sql import functions as F

    half2 = corpus.filter(~F.col("doc_id").isin(list(ids)))
    merged = {
        r["bit"]
        for r in sk.bloom_bits(half1, m=m, k=4)
        .union(sk.bloom_bits(half2, m=m, k=4))
        .distinct()
        .collect()
    }
    assert merged == set(vals)


def test_bloom_arg_validation(corpus):
    with pytest.raises(ValueError):
        sk.bloom_probe(corpus, [], m=64, k=3)
    with pytest.raises(ValueError):
        sk.bloom_bits(corpus, m=64, k=0)
    with pytest.raises(ValueError):
        sk.bloom_bits(corpus, m=1, k=3)
    with pytest.raises(ValueError):
        sk.bloom_probe_sql(PROBES, n=4)


# --- outlier detection ----------------------------------------------------------

@pytest.mark.parametrize("knn", [3, 5])
def test_outlier_vs_oracle(emb, duck, knn):
    got = sim.outlier_knn_scores(emb, knn=knn, k=10)
    want = duck.execute(sim.outlier_knn_scores_sql(knn=knn, k=10)).df()
    assert_same(got, want)


def test_outlier_numpy_recompute(emb):
    """Independent numpy recompute of the integer-scaled knn distances."""
    rows = emb.select("vec_id", "embedding").collect()
    V = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
         for r in rows}
    knn = 5
    d5 = {}
    for a, va in V.items():
        na = np.linalg.norm(va)
        ds = []
        for b, vb in V.items():
            if a == b:
                continue
            c5 = int(round(float(np.dot(va, vb)) / (na * np.linalg.norm(vb))
                           * 100000))
            ds.append((100000 - c5, b))
        ds.sort()
        top = ds[:knn]
        d5[a] = (top[-1][0], sum(d for d, _ in top))
    gmax = max(dk for dk, _ in d5.values())
    exp = sorted(
        ((round(dk / gmax, 5), a) for a, (dk, _) in d5.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    got = sim.outlier_knn_scores(emb, knn=knn, k=10).collect()
    assert [(r["outlier_score"], r["vec_id"]) for r in got] == exp


def test_outlier_planted_outlier_tops(spark):
    """A vector orthogonal to a tight cluster must win outlier_score 1."""
    base = np.ones(8)
    rows = []
    for i in range(9):
        v = base + 0.01 * np.arange(8) * (i + 1) / 9.0
        rows.append((i, [float(x) for x in v], 0))
    rows.append((99, [1.0, -1.0] * 4, 0))  # orthogonal-ish outlier
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    top = sim.outlier_knn_scores(df, knn=3, k=1).collect()[0]
    assert top["vec_id"] == 99 and top["outlier_score"] == 1.0


def test_outlier_arg_validation(emb):
    with pytest.raises(ValueError):
        sim.outlier_knn_scores(emb, knn=0)


# --- MMR -----------------------------------------------------------------------

@pytest.mark.parametrize("qid,pool,k,ln,ld", [(0, 20, 5, 7, 10),
                                              (3, 12, 4, 1, 2)])
def test_mmr_vs_oracle(emb, duck, qid, pool, k, ln, ld):
    got = sim.mmr_rerank(emb, query_vec_id=qid, pool=pool, k=k,
                         lam_num=ln, lam_den=ld)
    want = duck.execute(
        sim.mmr_rerank_sql(query_vec_id=qid, pool=pool, k=k,
                           lam_num=ln, lam_den=ld)
    ).df()
    assert_same(got, want)


def test_mmr_lambda_one_is_pure_relevance(emb):
    """lam = 1 removes the diversity term: selection must equal the
    relevance order of the pool."""
    got = sim.mmr_rerank(emb, query_vec_id=0, pool=15, k=6,
                         lam_num=1, lam_den=1).collect()
    rels = [r["relevance"] for r in got]
    assert rels == sorted(rels, reverse=True)
    assert [r["mmr_score"] for r in got] == rels


def test_mmr_python_recompute(emb):
    """Greedy integer MMR recomputed independently in pure Python."""
    qid, pool, k, ln, ld = 0, 10, 4, 7, 10
    rows = emb.select("vec_id", "embedding").collect()
    V = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
         for r in rows}

    def c5(a, b):
        return int(round(float(np.dot(V[a], V[b]))
                         / (np.linalg.norm(V[a]) * np.linalg.norm(V[b]))
                         * 100000))

    rel = {i: c5(i, qid) for i in V if i != qid}
    cands = sorted(rel, key=lambda i: (-rel[i], i))[:pool]
    sel, out = [], []
    for pos in range(1, k + 1):
        best = None
        for c in sorted(cands):
            if c in sel:
                continue
            ms = max((c5(c, s) for s in sel), default=0)
            sc = ln * rel[c] - (ld - ln) * ms
            if best is None or (-sc, c) < best[0]:
                best = ((-sc, c), c)
        sel.append(best[1])
        out.append((pos, best[1]))
    got = sim.mmr_rerank(emb, query_vec_id=qid, pool=pool, k=k,
                         lam_num=ln, lam_den=ld).collect()
    assert [(r["pos"], r["vec_id"]) for r in got] == out


def test_mmr_diversifies_duplicates(spark):
    """Two near-identical top candidates: MMR must not pick both
    back-to-back when a dissimilar alternative exists."""
    q = [1.0] * 8
    a = [1.0] * 7 + [0.9]          # top relevance
    a2 = [1.0] * 7 + [0.89]        # its near-duplicate
    b = [1.0, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0]  # diverse, lower rel
    df = spark.createDataFrame(
        [(0, q, 0), (1, a, 0), (2, a2, 0), (3, b, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    got = sim.mmr_rerank(df, query_vec_id=0, pool=3, k=2,
                         lam_num=1, lam_den=10).collect()
    assert [r["vec_id"] for r in got] == [1, 3]


def test_mmr_arg_validation(emb):
    with pytest.raises(ValueError):
        sim.mmr_rerank(emb, pool=1)
    with pytest.raises(ValueError):
        sim.mmr_rerank(emb, pool=5, k=6)
    with pytest.raises(ValueError):
        sim.mmr_rerank(emb, lam_num=11, lam_den=10)
