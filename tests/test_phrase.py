"""Phrase queries over positional postings vs DuckDB tokenized-adjacency
oracle."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query.phrase import phrase_topk, phrase_topk_sql

from .oracle import assert_same


@pytest.fixture(scope="module")
def pindex(spark, sf_dir):
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4, positions=True)
    for nm in ("doc_map", "term_dict", "postings", "stats"):
        idx[nm] = idx[nm].cache()
        idx[nm].count()
    return idx


PHRASES = [
    ["the", "fast"],
    ["merge", "part"],
    ["table", "scan", "merge"],
    ["spark", "zzzznotaterm"],   # no match
    ["batch", "batch"],          # repeated-term phrase
]


@pytest.mark.parametrize("phrase", PHRASES)
def test_phrase_vs_duckdb(spark, duck, sf_dir, pindex, phrase):
    got = phrase_topk(pindex, phrase, k=10)
    want = duck.execute(phrase_topk_sql(phrase, k=10)).df()
    assert_same(got, want)


def test_phrase_positions_roundtrip(spark, pindex):
    """Every phrase hit really contains the adjacent tokens."""
    from telegram2elastic_spark.functions.tokenizer import py_tokenize

    corpus = {r["doc_id"]: r["text"] for r in
              load_corpus(spark, "/root/testdata/sf0.001").collect()}
    hits = phrase_topk(pindex, ["the", "fast"], k=50).collect()
    assert hits
    for r in hits:
        toks = py_tokenize(corpus[r["doc_id"]])
        assert any(
            toks[i] == "the" and toks[i + 1] == "fast"
            for i in range(len(toks) - 1)
        ), r["doc_id"]


def test_phrase_over_incremental_segments_and_compaction(spark, sf_dir, tmp_path):
    """Positional incremental indexing: phrase results over a segmented
    index (positions=True) match the one-shot positional build; an upsert
    that removes the phrase tombstones the old generation out of phrase
    results; physical compaction preserves positions."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.streaming.ingest import IncrementalIndexer

    corpus = load_corpus(spark, sf_dir).filter("doc_id < 120")
    ix = IncrementalIndexer(
        spark, str(tmp_path / "pix"), n_doc_parts=4, positions=True
    )
    ix.ingest_batch(corpus.filter("doc_id < 60"), "b0")
    ix.ingest_batch(corpus.filter("doc_id >= 60"), "b1")

    def rows(idx):
        return [
            (r["doc_id"], r["score"])
            for r in phrase_topk(idx, ["the", "fast"], k=10).collect()
        ]

    want = rows(build_index(corpus, n_doc_parts=4, positions=True))
    assert rows(ix.as_index()) == want and want

    # edit the top phrase hit so it no longer contains the phrase
    top_doc = want[0][0]
    edited = corpus.filter(F.col("doc_id") == top_doc).withColumn(
        "text", F.lit("nothing matching here")
    )
    ix.upsert_batch(edited, "b2")
    after = rows(ix.as_index())
    assert all(d != top_doc for d, _ in after)

    # physical compaction keeps positional phrase results identical
    ix.compact([e["segment_id"] for e in ix.manifest()])
    assert len(ix.manifest()) == 1
    assert rows(ix.as_index()) == after


def test_phrase_conjunctive_block_pruning(spark):
    """Rarest-first conjunctive pruning must skip decoding Zipf-head blocks
    whose doc-id range holds no candidate — blocks_decoded < blocks_total —
    while matching the unpruned result exactly."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.corpus import as_corpus
    from telegram2elastic_spark.query.phrase import _phrase_counts_group

    # 2000 docs all containing "common"; only docs 0..9 contain the full
    # phrase "rareword common" — the common term spans ~16 blocks, of which
    # only the first overlaps the candidate set.
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 10, F.lit("rareword common filler end"))
        .otherwise(F.lit("plain common filler end"))
        .alias("text"),
        F.lit("en").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.lit(30).cast("long").alias("n_chars"),
    )
    idx = build_index(as_corpus(docs), n_doc_parts=1, positions=True)
    pdf = (
        idx["postings"]
        .filter(F.col("term").isin(["rareword", "common"]))
        .toPandas()
    )
    stats: dict = {}
    got = _phrase_counts_group(pdf, ["rareword", "common"], stats=stats)
    assert sorted(got["doc_id"]) == list(range(10))
    assert (got["phrase_tf"] == 1).all()
    assert stats["blocks_decoded"] < stats["blocks_total"], stats
    # the common term contributes 2000/128 ≈ 16 blocks; only 1 should decode
    assert stats["blocks_total"] >= 16
    assert stats["blocks_decoded"] <= 3


def test_phrase_topk_local_matches_distributed(pindex):
    from telegram2elastic_spark.query.phrase import phrase_topk_local

    for phrase in PHRASES:
        want = [
            (r["doc_id"], r["score"])
            for r in phrase_topk(pindex, phrase, k=10).collect()
        ]
        got = phrase_topk_local(pindex, phrase, k=10)
        assert got == want, phrase
    # cache hit path returns the same
    assert phrase_topk_local(pindex, ["the", "fast"], k=10) == [
        (r["doc_id"], r["score"])
        for r in phrase_topk(pindex, ["the", "fast"], k=10).collect()
    ]


def test_phrase_local_decoded_cache_eviction_identity(pindex, monkeypatch):
    """Results are identical with the decoded-positions cache forced to
    evict on every query (cap=0 keeps exactly one entry), fully warm, and
    cleared — the cache is a pure memo."""
    from telegram2elastic_spark.query import phrase as ph

    want = {
        tuple(p): ph.phrase_topk_local(pindex, p, k=10) for p in PHRASES
    }
    monkeypatch.setattr(ph, "_LOCAL_POS_DECODE_CAP", 0)
    pindex.pop("_local_pos_decoded", None)
    pindex.pop("_local_pos_decoded_sz", None)
    for p in PHRASES:
        assert ph.phrase_topk_local(pindex, p, k=10) == want[tuple(p)], p
        assert len(pindex["_local_pos_decoded"]) <= max(1, len(set(p)))
    monkeypatch.undo()
    pindex.pop("_local_pos_decoded", None)
    pindex.pop("_local_pos_decoded_sz", None)
    for p in PHRASES:  # cold again, then warm twice
        assert ph.phrase_topk_local(pindex, p, k=10) == want[tuple(p)], p
        assert ph.phrase_topk_local(pindex, p, k=10) == want[tuple(p)], p


SLOPPY = [
    (["merge", "batch"], 1),
    (["fast", "batch"], 2),
    (["table", "scan", "merge"], 2),   # 3-term greedy chain
    (["batch", "batch"], 1),           # repeated-term phrase with slop
]


@pytest.mark.parametrize("phrase,slop", SLOPPY)
def test_sloppy_phrase_vs_duckdb(spark, duck, sf_dir, pindex, phrase, slop):
    """Ordered proximity (match_phrase slop): greedy kernel chain ==
    greedy nested-lambda SQL chain, scores included."""
    got = phrase_topk(pindex, phrase, k=10, slop=slop)
    want = duck.execute(phrase_topk_sql(phrase, k=10, slop=slop)).df()
    assert_same(got, want)


def test_slop_zero_is_exact_adjacency(spark, duck, sf_dir, pindex):
    """slop=0 through the greedy SQL path == the adjacency SQL path, and
    the kernel agrees with both (the two formulations are equivalent)."""
    ph = ["merge", "part"]
    a = duck.execute(phrase_topk_sql(ph, k=50, slop=0)).df()
    got = phrase_topk(pindex, ph, k=50, slop=0)
    assert_same(got, a)


def test_slop_widens_matches(spark, pindex):
    """Every exact match is a sloppy match; slop only adds docs (on a
    fixed candidate set, phrase_tf is monotone in slop)."""
    ph = ["merge", "batch"]
    exact = {r["doc_id"] for r in phrase_topk(pindex, ph, k=10_000).collect()}
    sloppy = {
        r["doc_id"]
        for r in phrase_topk(pindex, ph, k=10_000, slop=2).collect()
    }
    assert exact <= sloppy
    assert len(sloppy) > len(exact)  # corpus has non-adjacent co-occurrences


def test_sloppy_local_matches_distributed(pindex):
    from telegram2elastic_spark.query.phrase import phrase_topk_local

    ph, slop = ["table", "scan", "merge"], 2
    dist = [
        (r["doc_id"], r["score"])
        for r in phrase_topk(pindex, ph, k=10, slop=slop).collect()
    ]
    loc = phrase_topk_local(pindex, ph, k=10, slop=slop)
    assert [(d, round(s, 5)) for d, s in loc] == dist


def _brute_sloppy_tf(toks, phrase, slop):
    """Exhaustive reference: start p0 matches iff positions
    p0 < q_1 < ... < q_{m-1} exist with q_i <= p0 + i + slop (DFS over all
    choices — no greedy assumption)."""
    pos = {}
    for t in set(phrase):
        pos[t] = [i for i, x in enumerate(toks) if x == t]

    def extend(i, prev, p0):
        if i == len(phrase):
            return True
        return any(
            extend(i + 1, q, p0)
            for q in pos[phrase[i]]
            if prev < q <= p0 + i + slop
        )

    return sum(1 for p0 in pos.get(phrase[0], []) if extend(1, p0, p0))


def test_sloppy_greedy_matches_exhaustive(spark, sf_dir, pindex):
    """Randomized differential check of the greedy chain: for many random
    phrases/slops over real corpus docs, the kernel's phrase_tf equals the
    exhaustive DFS count (greedy-minimal is claimed optimal — verify)."""
    import random

    from telegram2elastic_spark.functions.tokenizer import py_tokenize
    from telegram2elastic_spark.query.phrase import (
        _local_pos_blocks,
        _phrase_counts_group,
    )

    corpus = load_corpus(spark, sf_dir)
    docs = {
        r["doc_id"]: py_tokenize(r["text"])
        for r in corpus.select("doc_id", "text").limit(200).collect()
    }
    vocab = ["the", "fast", "merge", "batch", "table", "scan", "value", "a"]
    rng = random.Random(1234)
    checked = 0
    for _ in range(40):
        m = rng.choice([2, 2, 3, 3, 4])
        phrase = [rng.choice(vocab) for _ in range(m)]
        slop = rng.choice([1, 2, 3, 5])
        pdf = _local_pos_blocks(pindex, phrase)
        if pdf is None:
            continue
        counts = _phrase_counts_group(pdf, phrase, slop=slop)
        got = dict(zip(counts["doc_id"], counts["phrase_tf"]))
        for did, toks in docs.items():
            want = _brute_sloppy_tf(toks, phrase, slop)
            assert got.get(did, 0) == want, (phrase, slop, did)
            checked += 1
    assert checked > 0


def test_phrase_kernel_emits_bounded_rows(spark, sf_dir, pindex):
    """The partial kernel must emit O(k + tie band) rows per salt plus one
    sentinel — never every matching doc (a Zipf-head one-term phrase
    matches most of the corpus).  df_p stays exact via the sentinel."""
    from pyspark.sql import functions as F

    from telegram2elastic_spark.query.phrase import (
        _phrase_counts_group,
        _phrase_partial_group,
    )
    from telegram2elastic_spark.query.wand import _collect_idfs

    phrase, k = ["the"], 10
    idfs, avgdl = _collect_idfs(pindex, phrase)
    pdf = (
        pindex["postings"]
        .filter(F.col("term").isin(phrase))
        .filter(F.col("salt") == 0)
        .toPandas()
    )
    n_matching = len(_phrase_counts_group(pdf, phrase))
    band = 2.1e-5 / max(idfs.values())
    out = _phrase_partial_group(pdf, phrase, k, band, float(avgdl))
    assert n_matching > 4 * k  # the premise: far more matches than k
    assert len(out) < n_matching / 2
    # sentinel carries the exact salt-local match count
    assert int(out.loc[out["doc_id"] == -1, "dfp_part"].sum()) == n_matching


def test_phrase_batch_matches_single(spark, sf_dir, pindex):
    """phrase_topk_batch == per-query phrase_topk, including slop
    variants, dead-term queries, and the shared decode memo."""
    from telegram2elastic_spark.query.phrase import phrase_topk_batch

    queries = {
        0: ["the", "fast"],
        1: ["merge", "batch"],
        2: ["table", "scan", "merge"],
        3: ["the", "zzznothere"],   # dead term: no rows
        4: ["merge", "batch"],      # duplicate phrase: decode memo reuse
    }
    slops = {1: 1, 2: 2}
    batch = phrase_topk_batch(pindex, queries, k=10, slop=slops).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["url"], r["score"])
        )
    for qid, ph in queries.items():
        want = [
            (r["doc_id"], r["url"], r["score"])
            for r in phrase_topk(
                pindex, ph, k=10, slop=slops.get(qid, 0)
            ).collect()
        ]
        assert by_q.get(qid, []) == want, qid


def test_phrase_doc_filter_matches_compound_phrase_only(spark, sf_dir, pindex):
    """ES filter context on match_phrase: phrase_topk(doc_filter=) must
    equal the (already oracle-verified) phrase-only compound under the
    same filter — global df_p, filtered hits; local path identical."""
    from telegram2elastic_spark.query.compound import compound_topk
    from telegram2elastic_spark.query.phrase import phrase_topk_local

    for ph, flt, slop in (
        (["the", "fast"], "lang = 'en'", 0),
        (["merge", "batch"], "lang = 'fr'", 1),
    ):
        want = [
            (r["doc_id"], r["url"], r["score"])
            for r in compound_topk(
                pindex, [], ph, k=10, doc_filter=flt, slop=slop
            ).collect()
        ]
        got = [
            (r["doc_id"], r["url"], r["score"])
            for r in phrase_topk(
                pindex, ph, k=10, doc_filter=flt, slop=slop
            ).collect()
        ]
        assert got == want, (ph, flt)
        local = phrase_topk_local(pindex, ph, k=10, doc_filter=flt, slop=slop)
        assert local == [(d, s) for d, _, s in want], (ph, flt)


def test_phrase_batch_multi_segment_block_identity(spark, sf_dir, tmp_path):
    """Batch block-decode cache must key blocks by identity, not block_id:
    multi-segment views union per-segment postings whose block_id restarts
    at 0 per segment, so one salt group holds distinct blocks sharing a
    block_id (ADVICE r5, high).  Batch results over a segmented index must
    equal the per-query (uncached-path) results."""
    from telegram2elastic_spark.query.phrase import phrase_topk, phrase_topk_batch
    from telegram2elastic_spark.streaming.ingest import IncrementalIndexer

    corpus = load_corpus(spark, sf_dir)
    ix = IncrementalIndexer(
        spark, str(tmp_path / "mseg"), n_doc_parts=4, positions=True
    )
    # even/odd split => every segment's doc ranges interleave, so same-id
    # blocks from different segments cover overlapping doc-id ranges
    ix.ingest_batch(corpus.filter("doc_id % 2 = 0"), "s0")
    ix.ingest_batch(corpus.filter("doc_id % 2 = 1"), "s1")
    idx = ix.as_index()
    queries = {0: ["the", "fast"], 1: ["merge", "part"], 2: ["the", "fast"]}
    by_q: dict[int, list] = {}
    for r in phrase_topk_batch(idx, queries, k=10).collect():
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, ph in queries.items():
        want = [
            (r["doc_id"], r["score"])
            for r in phrase_topk(idx, ph, k=10).collect()
        ]
        assert want, f"query {qid} found no phrase hits (bad fixture)"
        assert by_q.get(qid, []) == want, f"query {qid} diverged"


def test_block_cache_keys_by_block_identity():
    """_decode_blocks_block_cached on a salt group holding two distinct
    blocks with the SAME block_id (multi-segment union: block_id restarts
    per segment) must decode both, not serve one block's payload for the
    other (ADVICE r5, high: old key was block_id alone -> [10,10,11,11])."""
    import numpy as np
    import pandas as pd

    from telegram2elastic_spark.index.codec import (
        delta_encode,
        encode_positions,
        varbyte_encode,
    )
    from telegram2elastic_spark.query.phrase import _decode_blocks_block_cached

    def block_row(ids, block_id):
        ids = np.asarray(ids, dtype=np.uint64)
        tfs = np.ones(ids.size, dtype=np.uint64)
        dls = np.full(ids.size, 5, dtype=np.uint64)
        pos = [np.array([0], dtype=np.int64)] * ids.size
        return {
            "block_id": block_id,
            "n_docs": int(ids.size),
            "first_doc_id": int(ids[0]),
            "last_doc_id": int(ids[-1]),
            "doc_gaps": varbyte_encode(delta_encode(ids)),
            "tf_bytes": varbyte_encode(tfs),
            "dl_bytes": varbyte_encode(dls),
            "pos_bytes": encode_positions(pos),
        }

    # segment A block 0 holds docs [1, 2]; segment B block 0 holds [10, 11]
    g = pd.DataFrame([block_row([1, 2], 0), block_row([10, 11], 0)])
    ids, dls, pos = _decode_blocks_block_cached("t", g, {})
    assert ids.tolist() == [1, 2, 10, 11], ids.tolist()
    assert dls.tolist() == [5, 5, 5, 5]
    assert len(pos) == 4
