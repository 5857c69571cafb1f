"""Graph-ranking ops: TextRank over the term co-occurrence graph and
HITS over the doc-term bipartite graph — exact-integer determinism,
oracle parity, independent pure-Python recompute."""

from collections import Counter, defaultdict

import pytest

from telegram2elastic_spark.corpus import as_corpus, load_corpus
from telegram2elastic_spark.functions.tokenizer import py_tokenize
from telegram2elastic_spark.operators import graph

from .oracle import assert_same


# --- oracle parity -----------------------------------------------------------

@pytest.mark.parametrize("window,iters", [(2, 3), (1, 2), (3, 1)])
def test_textrank_vs_oracle(spark, duck, sf_dir, window, iters):
    got = graph.textrank_terms(
        load_corpus(spark, sf_dir), window=window, iters=iters, k=20
    )
    want = duck.execute(
        graph.textrank_terms_sql(window=window, iters=iters, k=20)
    ).df()
    assert_same(got, want)


@pytest.mark.parametrize("iters", [1, 2])
def test_hits_vs_oracle(spark, duck, sf_dir, iters):
    got = graph.hits_authorities(load_corpus(spark, sf_dir), iters=iters, k=20)
    want = duck.execute(graph.hits_authorities_sql(iters=iters, k=20)).df()
    assert_same(got, want)


# --- independent pure-Python recompute ---------------------------------------

def _py_textrank(texts, window, iters):
    und = Counter()
    for t in texts:
        toks = py_tokenize(t)
        for off in range(1, window + 1):
            for a, b in zip(toks, toks[off:]):
                if a != b:
                    und[(min(a, b), max(a, b))] += 1
    edges = defaultdict(list)  # src -> [(dst, w)]
    for (a, b), w in und.items():
        edges[a].append((b, w))
        edges[b].append((a, w))
    outw = {s: sum(w for _, w in es) for s, es in edges.items()}
    rank = {s: graph.UNIT for s in edges}
    for _ in range(iters):
        nxt = defaultdict(int)
        for s, es in edges.items():
            for d, w in es:
                nxt[d] += rank[s] * w // outw[s]
        rank = {
            d: graph.BASE + graph.DAMP_NUM * s_ // graph.DAMP_DEN
            for d, s_ in nxt.items()
        }
    return rank


def _corpus_from_texts(spark, texts):
    docs = spark.createDataFrame(
        [(i, t, "en", "crafted", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return as_corpus(docs)


CRAFTED = [
    "spark shuffle join shuffle spark",
    "join plan join spark plan",
    "solo",
    "aa aa aa",  # constant-token doc: self-pairs only -> isolated
    "",
    "shuffle plan spark",
]


def test_textrank_matches_pure_python(spark):
    corpus = _corpus_from_texts(spark, CRAFTED)
    got = {
        r["term"]: r["rank"]
        for r in graph.textrank_terms(corpus, window=2, iters=3, k=100).collect()
    }
    want = _py_textrank(CRAFTED, window=2, iters=3)
    assert got == want


def test_textrank_excludes_isolated_terms(spark):
    """'solo' and 'aa' never co-occur with a different token — no node."""
    corpus = _corpus_from_texts(spark, CRAFTED)
    terms = {
        r["term"]
        for r in graph.textrank_terms(corpus, window=2, iters=1, k=100).collect()
    }
    assert "solo" not in terms and "aa" not in terms
    assert "spark" in terms


def test_textrank_mass_bound(spark):
    """Total rank mass never exceeds n_nodes * UNIT (the BIGINT-safety
    invariant the docstring claims)."""
    corpus = _corpus_from_texts(spark, CRAFTED)
    rows = graph.textrank_terms(corpus, window=2, iters=4, k=100).collect()
    assert sum(r["rank"] for r in rows) <= len(rows) * graph.UNIT
    assert all(r["rank"] >= graph.BASE for r in rows)


def test_textrank_partitioning_invariant(spark, sf_dir):
    """Integer arithmetic => identical ranks under any repartitioning."""
    corpus = load_corpus(spark, sf_dir)
    a = graph.textrank_terms(corpus, window=2, iters=2, k=15).collect()
    b = graph.textrank_terms(corpus.repartition(7), window=2, iters=2, k=15).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_textrank_rejects_bad_args(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    with pytest.raises(ValueError):
        graph.textrank_terms(corpus, window=0)
    with pytest.raises(ValueError):
        graph.textrank_terms(corpus, iters=0)


# --- HITS --------------------------------------------------------------------

def _py_hits(texts, iters):
    pres = set()
    for i, t in enumerate(texts):
        for term in set(py_tokenize(t)):
            pres.add((i, term))
    terms = {term for _, term in pres}
    auth = {t: graph.UNIT for t in terms}
    for _ in range(iters):
        hub = defaultdict(int)
        for d, t in pres:
            hub[d] += auth[t]
        hmax = max(hub.values())
        hubn = {d: h * graph.UNIT // hmax for d, h in hub.items()}
        araw = defaultdict(int)
        for d, t in pres:
            araw[t] += hubn[d]
        amax = max(araw.values())
        auth = {t: a * graph.UNIT // amax for t, a in araw.items()}
    return auth


def test_hits_matches_pure_python(spark):
    corpus = _corpus_from_texts(spark, CRAFTED)
    got = {
        r["term"]: r["auth"]
        for r in graph.hits_authorities(corpus, iters=2, k=100).collect()
    }
    assert got == _py_hits(CRAFTED, iters=2)


def test_hits_top_authority_is_unit(spark, sf_dir):
    """Max-normalization pins the best authority at exactly UNIT."""
    rows = graph.hits_authorities(load_corpus(spark, sf_dir), iters=2, k=5).collect()
    assert rows[0]["auth"] == graph.UNIT
    assert all(0 < r["auth"] <= graph.UNIT for r in rows)


def test_hits_rejects_bad_args(spark, sf_dir):
    with pytest.raises(ValueError):
        graph.hits_authorities(load_corpus(spark, sf_dir), iters=0)


# --- personalized PageRank (seeded TextRank) ----------------------------------

@pytest.mark.parametrize("seeds", [["spark", "merge"], ["window"]])
def test_textrank_seeded_vs_oracle(spark, duck, sf_dir, seeds):
    got = graph.textrank_seeded(
        load_corpus(spark, sf_dir), seeds, window=2, iters=3, k=20
    )
    want = duck.execute(
        graph.textrank_seeded_sql(seeds, window=2, iters=3, k=20)
    ).df()
    assert_same(got, want)


def _py_textrank_seeded(texts, seeds, window, iters):
    und = Counter()
    for t in texts:
        toks = py_tokenize(t)
        for off in range(1, window + 1):
            for a, b in zip(toks, toks[off:]):
                if a != b:
                    und[(min(a, b), max(a, b))] += 1
    edges = defaultdict(list)
    for (a, b), w in und.items():
        edges[a].append((b, w))
        edges[b].append((a, w))
    outw = {s: sum(w for _, w in es) for s, es in edges.items()}
    nn = len(edges)
    surv = [s for s in seeds if s in edges]
    base = (
        (graph.DAMP_DEN - graph.DAMP_NUM) * graph.UNIT * nn
    ) // (graph.DAMP_DEN * len(surv))
    rank = {s: (base if s in surv else 0) for s in edges}
    for _ in range(iters):
        nxt = defaultdict(int)
        for s, es in edges.items():
            for d, w in es:
                nxt[d] += rank[s] * w // outw[s]
        rank = {
            d: (base if d in surv else 0)
            + graph.DAMP_NUM * s_ // graph.DAMP_DEN
            for d, s_ in nxt.items()
        }
    return rank


def test_textrank_seeded_matches_pure_python(spark):
    corpus = _corpus_from_texts(spark, CRAFTED)
    got = {
        r["term"]: r["rank"]
        for r in graph.textrank_seeded(
            corpus, ["spark"], window=2, iters=3, k=100
        ).collect()
    }
    assert got == _py_textrank_seeded(CRAFTED, ["spark"], window=2, iters=3)


def test_textrank_seeded_proximity(spark):
    """In a chain a-b-c-d-e seeded at 'a', rank decays with distance."""
    corpus = _corpus_from_texts(spark, ["aa bb cc dd ee"] * 3)
    got = {
        r["term"]: r["rank"]
        for r in graph.textrank_seeded(
            corpus, ["aa"], window=1, iters=3, k=100
        ).collect()
    }
    assert got["aa"] > got["bb"] > got["cc"] > got["dd"] >= got["ee"]


def test_textrank_seeded_absent_seed_ignored(spark):
    """A seed missing from the graph redistributes mass to the rest."""
    corpus = _corpus_from_texts(spark, CRAFTED)
    both = {
        r["term"]: r["rank"]
        for r in graph.textrank_seeded(
            corpus, ["spark", "zzznotaterm"], window=2, iters=2, k=100
        ).collect()
    }
    only = {
        r["term"]: r["rank"]
        for r in graph.textrank_seeded(
            corpus, ["spark"], window=2, iters=2, k=100
        ).collect()
    }
    assert both == only


def test_textrank_seeded_rejects_bad_args(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    with pytest.raises(ValueError):
        graph.textrank_seeded(corpus, [])
    with pytest.raises(ValueError):
        graph.textrank_seeded(corpus, ["zzznotaterm"])


# ------------------------- triangle counting (oriented wedge join) --------


def _tri_corpus(spark, texts):
    from telegram2elastic_spark.corpus import as_corpus

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    ).selectExpr("doc_id", "text", "'en' lang", "'x' source",
                 "length(text) n_chars")
    return as_corpus(docs)


def test_triangle_counts_oracle_parity(spark, sf_dir, duck):
    from telegram2elastic_spark.operators import graph as g

    c = load_corpus(spark, sf_dir)
    for w in (2, 3):
        df = g.triangle_counts(c, window=w, k=20)
        assert_same(df, duck.execute(g.triangle_counts_sql(window=w, k=20)).fetchdf())


def test_triangle_counts_matches_bruteforce(spark, sf_dir):
    """Independent Python recompute: undirected distinct edges from the
    same window rule, triangles by brute-force edge-set intersection."""
    import itertools

    from telegram2elastic_spark.functions.tokenizer import py_tokenize
    from telegram2elastic_spark.operators import graph as g

    c = load_corpus(spark, sf_dir)
    edges = set()
    for r in c.select("text").collect():
        toks = py_tokenize(r.text)
        for off in (1, 2):
            for a, b in zip(toks, toks[off:]):
                if a != b:
                    edges.add((min(a, b), max(a, b)))
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    counts = {}
    for a, b in edges:
        for ccommon in nbrs[a] & nbrs[b]:
            for v in (a, b, ccommon):
                counts[v] = counts.get(v, 0) + 1
    # every triangle visited 3x (once per edge)
    expected = sorted(
        ((t, n // 3) for t, n in counts.items()), key=lambda r: (-r[1], r[0])
    )[:20]
    got = [
        (r.term, r.triangles)
        for r in g.triangle_counts(c, window=2, k=20).collect()
    ]
    assert got == expected and len(got) > 0
    assert len({t for t, _ in expected}) == len(expected)  # sanity


def test_triangle_k4_and_path(spark):
    from telegram2elastic_spark.operators import graph as g

    # K4 via all-pairs adjacency: every node in C(3,2)=3 triangles
    k4 = _tri_corpus(spark, [
        "a b", "a c", "a d", "b c", "b d", "c d",
    ])
    got = {(r.term, r.triangles) for r in g.triangle_counts(k4, 2, 10).collect()}
    assert got == {("a", 3), ("b", 3), ("c", 3), ("d", 3)}
    # path graph: zero triangles
    path = _tri_corpus(spark, ["a b", "b c", "c d"])
    assert g.triangle_counts(path, 2, 10).count() == 0


def test_triangle_partitioning_invariance(spark, sf_dir):
    from telegram2elastic_spark.operators import graph as g

    c = load_corpus(spark, sf_dir)
    a = g.triangle_counts(c, 2, 20).collect()
    b = g.triangle_counts(c.repartition(13), 2, 20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
