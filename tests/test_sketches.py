"""Mergeable frequency sketches: MG guarantee, CMS bounds, oracle parity."""

from collections import Counter

import pytest
import pyspark.sql.functions as F

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.functions.tokenizer import py_tokenize, tokens
from telegram2elastic_spark.operators import sketches as sk


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_corpus(spark, sf_dir)


@pytest.fixture(scope="module")
def true_counts(spark, sf_dir):
    import pandas as pd

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    c = Counter()
    for t in docs["text"]:
        c.update(py_tokenize(t))
    return c


def test_mg_exact_regime_parity(spark, corpus, duck):
    nd = corpus.select(
        F.explode(tokens("text")).alias("t")
    ).distinct().count()
    got = sk.heavy_hitters_sketch(corpus, capacity=nd + 5, k=12).toPandas()
    want = duck.execute(sk.heavy_hitters_sql(k=12)).fetchdf()
    assert got.values.tolist() == want.values.tolist()


def test_mg_guarantee_lossy(corpus, true_counts):
    # genuinely lossy capacity (vocab is 31 terms, so compactions fire):
    # every term above N/(capacity+1) must be retained, estimates never
    # overshoot, undercount bounded
    capacity = 8
    n = sum(true_counts.values())
    bound = n / (capacity + 1)
    est = dict(
        sk.heavy_hitters_sketch(corpus, capacity=capacity, k=capacity)
        .collect()
    )
    for term, cnt in true_counts.items():
        if cnt > bound:
            assert term in est, f"heavy hitter {term!r} lost (cnt={cnt})"
    for term, e in est.items():
        t = true_counts[term]
        assert e <= t, f"{term}: est {e} > true {t}"
        assert t - e <= bound, f"{term}: undercount {t - e} > bound {bound}"


def test_mg_args():
    with pytest.raises(ValueError):
        sk.heavy_hitters_sketch(None, capacity=0)
    with pytest.raises(ValueError):
        sk.heavy_hitters_sketch(None, capacity=5, k=9)


def test_cms_parity(spark, corpus, duck):
    terms = ["spark", "merge", "the", "zzzmissing"]
    got = sk.cms_probe(corpus, terms, depth=4, width=512).toPandas()
    want = duck.execute(
        sk.cms_probe_sql(terms, depth=4, width=512)
    ).fetchdf()
    assert got.values.tolist() == want.values.tolist()


def test_cms_never_underestimates(corpus, true_counts):
    # tiny width forces collisions: est >= true for every probed term,
    # and at least one probe actually collides (est > true) — the sketch
    # is lossy, not a disguised exact count
    terms = sorted(true_counts)[:40]
    rows = sk.cms_probe(corpus, terms, depth=2, width=16).collect()
    assert all(r.est >= r.true_cnt for r in rows)
    assert any(r.est > r.true_cnt for r in rows)


def test_cms_exactness_at_depth(corpus, true_counts):
    # generous width: the probed Zipf head estimates exactly
    head = [t for t, _ in Counter(true_counts).most_common(5)]
    rows = sk.cms_probe(corpus, head, depth=4, width=4096).collect()
    for r in rows:
        assert r.true_cnt == true_counts[r.term]
        assert r.est - r.true_cnt <= 2 * sum(true_counts.values()) / 4096


def test_cms_probe_args(corpus):
    with pytest.raises(ValueError):
        sk.cms_probe(corpus, [])
    with pytest.raises(ValueError):
        sk.cms_probe_sql([])


# ------------------------------------------------------------- HLL


def test_hll_parity(spark, corpus, duck):
    got = sk.hll_cardinality(corpus).toPandas()
    want = duck.execute(sk.hll_cardinality_sql()).fetchdf()
    assert got.values.tolist() == want.values.tolist()


def test_hll_error_band(corpus):
    """HLL standard error at p=12 is 1.04/sqrt(4096) ~ 1.6%; small groups
    ride the linear-counting branch which is tighter still — pin a 5%
    band (3 sigma) per group."""
    out = sk.hll_cardinality(corpus).collect()
    assert out
    for r in out:
        assert r["exact"] > 0
        assert abs(r["est"] - r["exact"]) / r["exact"] < 0.05, dict(r.asDict())


def test_hll_partitioning_invariant(spark, corpus):
    """Register maxima commute with any layout — the mergeability claim."""
    a = sk.hll_cardinality(corpus).collect()
    b = sk.hll_cardinality(corpus.repartition(13, "doc_id")).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_hll_python_recompute(spark, corpus):
    """Independent pure-Python HLL (same md5 hashes, same formula)."""
    import hashlib
    import math

    rows = corpus.select("lang", "url").collect()
    regs: dict[str, dict[int, int]] = {}
    for r in rows:
        h = int(hashlib.md5(r["url"].encode()).hexdigest()[:15], 16)
        reg, w = h % sk.HLL_M, h // sk.HLL_M
        rank_max = 60 - sk.HLL_P + 1
        rho = rank_max if w == 0 else rank_max - w.bit_length()
        g = regs.setdefault(r["lang"], {})
        g[reg] = max(g.get(reg, 0), rho)
    out = {r["lang"]: r["est"] for r in sk.hll_cardinality(corpus).collect()}
    rank_max = 60 - sk.HLL_P + 1
    for lang, g in regs.items():
        s = sum(1 << (rank_max - m) for m in g.values())
        s += (sk.HLL_M - len(g)) * (1 << rank_max)
        est = sk._HLL_NUM / float(s)
        v = sk.HLL_M - len(g)
        if est <= 2.5 * sk.HLL_M and v > 0:
            est = float(sk.HLL_M) * math.log(float(sk.HLL_M) / float(v))
        assert out[lang] == round(est, 4), lang
