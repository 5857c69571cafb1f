"""Session-14 ops: Unicode script profiling, tokenizer fertility stats,
and ES 8.15 chunked semantic_text retrieval (max-sim over chunk
embeddings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import as_corpus, load_corpus
from telegram2elastic_spark.functions.text_quality import (
    FERTILITY_SQL,
    fertility_stats,
    script_profile,
    script_profile_sql,
)
from telegram2elastic_spark.query import semantic as sem

from .oracle import assert_same


def _mini_corpus(spark, rows):
    """Corpus-shaped frame from (doc_id, text, lang) rows."""
    df = spark.createDataFrame(
        [(i, t, lang, "crafted", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    return as_corpus(df)


# --- script_profile -----------------------------------------------------------


def test_script_profile_counts_and_dominance(spark):
    c = _mini_corpus(
        spark,
        [
            (0, "hello world 42", "en"),
            (1, "Привет abc", "ru"),  # Привет abc
            (2, "αβγ", "el"),  # αβγ
            (3, "中文カタ한", "zh"),  # Han+Kana+Hangul
            (4, "مرحبا", "ar"),  # مرحبا
            (5, "12345", "en"),
            (6, "", "en"),
        ],
    )
    rows = {r["doc_id"]: r.asDict() for r in script_profile(c).collect()}
    assert rows[0]["n_latin"] == 10 and rows[0]["n_digit"] == 2
    assert rows[0]["dominant"] == "latin" and rows[0]["frac_dominant"] == 1.0
    # Cyrillic 6 vs Latin 3 -> cyrillic dominant, frac 6/9
    assert rows[1]["n_cyrillic"] == 6 and rows[1]["n_latin"] == 3
    assert rows[1]["dominant"] == "cyrillic"
    assert rows[1]["frac_dominant"] == pytest.approx(round(6 / 9, 5))
    assert rows[2]["n_greek"] == 3 and rows[2]["dominant"] == "greek"
    assert rows[3]["n_cjk"] == 5 and rows[3]["dominant"] == "cjk"
    assert rows[4]["n_arabic"] == 5 and rows[4]["dominant"] == "arabic"
    # digits only: no script chars -> 'none', frac 0.0
    assert rows[5]["dominant"] == "none" and rows[5]["frac_dominant"] == 0.0
    assert rows[5]["n_digit"] == 5
    assert rows[6]["n_chars"] == 0 and rows[6]["dominant"] == "none"


def test_script_profile_tie_breaks_alphabetical(spark):
    # 2 Cyrillic + 2 Greek -> tie; 'cyrillic' < 'greek' wins
    c = _mini_corpus(spark, [(0, "АБ ΑΒ", "x")])
    r = script_profile(c).collect()[0]
    assert r["n_cyrillic"] == 2 and r["n_greek"] == 2
    assert r["dominant"] == "cyrillic"
    assert r["frac_dominant"] == 0.5


def test_script_profile_oracle_parity(spark, duck, sf_dir):
    assert_same(
        script_profile(load_corpus(spark, sf_dir)),
        duck.execute(script_profile_sql()).df(),
    )


# --- fertility_stats ----------------------------------------------------------


def test_fertility_hand_computed(spark):
    # "don't stop" -> ws 2; bpeish: don / ' / t / stop = 4; bytes 10
    c = _mini_corpus(spark, [(0, "don't stop", "en"), (1, "", "de")])
    rows = {r["lang"]: r.asDict() for r in fertility_stats(c).collect()}
    en = rows["en"]
    assert en["ws_tokens"] == 2 and en["bpeish_tokens"] == 4
    assert en["n_bytes"] == 10
    assert en["fertility"] == 2.0
    assert en["bytes_per_token"] == 2.5
    de = rows["de"]  # empty doc: zero denominators -> 0.0, not NULL/NaN
    assert de["n_docs"] == 1 and de["ws_tokens"] == 0
    assert de["fertility"] == 0.0 and de["bytes_per_token"] == 0.0


def test_fertility_multibyte_bytes(spark):
    # 6 Cyrillic codepoints = 12 UTF-8 bytes, 1 ws token, 1 bpeish token
    c = _mini_corpus(spark, [(0, "Привет", "ru")])
    r = fertility_stats(c).collect()[0]
    assert r["n_bytes"] == 12
    assert r["bpeish_tokens"] == 1
    assert r["bytes_per_token"] == 12.0


def test_fertility_oracle_parity(spark, duck, sf_dir):
    assert_same(
        fertility_stats(load_corpus(spark, sf_dir)),
        duck.execute(FERTILITY_SQL).df(),
    )


# --- semantic_chunked_topk ----------------------------------------------------


def test_chunked_single_window_is_whole_doc_identity(spark, sf_dir):
    """window >= every doc length -> one chunk per doc == the whole doc,
    so chunked retrieval must equal semantic_topk exactly (chunk_id 0)."""
    corpus = load_corpus(spark, sf_dir)
    q = "merge vector batch"
    whole = sem.semantic_topk(corpus, q, k=10)
    chunked = sem.semantic_chunked_topk(
        corpus, q, k=10, window=10**6, stride=10**6
    )
    got = chunked.collect()
    assert all(r["chunk_id"] == 0 for r in got)
    assert [(r["doc_id"], r["cosine"]) for r in got] == [
        (r["doc_id"], r["cosine"]) for r in whole.collect()
    ]


def test_chunked_concentration_beats_dilution(spark):
    """Max-sim over chunks: a doc whose relevant span is one chunk must
    outrank a doc that scatters the same terms among junk (the reason ES
    chunks long semantic_text values at all)."""
    q = "alpha beta gamma"
    pad = ["junk%d" % i for i in range(60)]
    concentrated = "alpha beta gamma " + " ".join(pad)
    spread = []
    terms = ["alpha", "beta", "gamma"]
    for i, p in enumerate(pad):
        spread.append(p)
        if i % 20 == 0 and terms:
            spread.append(terms.pop(0))
    diluted = " ".join(spread)
    c = _mini_corpus(spark, [(0, diluted, "en"), (1, concentrated, "en")])
    got = sem.semantic_chunked_topk(c, q, k=2, window=8, stride=8).collect()
    assert got[0]["doc_id"] == 1 and got[0]["chunk_id"] == 0
    assert got[0]["cosine"] > (got[1]["cosine"] if len(got) > 1 else -1.0)


def test_chunked_empty_doc_and_no_overlap(spark):
    c = _mini_corpus(
        spark, [(0, "", "en"), (1, "totally unrelated words", "en")]
    )
    got = sem.semantic_chunked_topk(c, "alpha beta", k=5).collect()
    # doc 0 has no chunks, doc 1 shares no bucket terms with the query's
    # tokens only by accident of hashing -- just assert no crash and no
    # chunk from the empty doc
    assert all(r["doc_id"] != 0 for r in got)


def test_chunked_store_identity(spark, sf_dir):
    """Serving from the index-time chunk-embedding store must equal the
    inline computation (the per-query plan never re-tokenizes)."""
    corpus = load_corpus(spark, sf_dir)
    store = sem.chunk_embeddings(corpus).persist()
    try:
        a = sem.semantic_chunked_topk(corpus, "merge batch", k=10)
        b = sem.semantic_chunked_topk(corpus, "merge batch", k=10, store=store)
        assert [r.asDict() for r in a.collect()] == [
            r.asDict() for r in b.collect()
        ]
    finally:
        store.unpersist()


def test_chunked_oracle_parity(spark, duck, sf_dir):
    q = "merge vector batch"
    assert_same(
        sem.semantic_chunked_topk(load_corpus(spark, sf_dir), q, k=10),
        duck.execute(sem.semantic_chunked_topk_sql(q, k=10)).df(),
    )


def test_chunk_embeddings_chunk_count(spark):
    """Chunk arithmetic: 80 tokens at window 32 / stride 24 -> starts 0,
    24, 48 (48+32 = 80 covers the tail exactly) = 3 chunks; 81 tokens
    need a fourth start at 72; 10 tokens -> 1 chunk."""
    text80 = " ".join("w%d" % i for i in range(80))
    text81 = " ".join("u%d" % i for i in range(81))
    text10 = " ".join("v%d" % i for i in range(10))
    c = _mini_corpus(
        spark, [(0, text80, "en"), (1, text10, "en"), (2, text81, "en")]
    )
    emb = sem.chunk_embeddings(c)
    got = (
        emb.groupBy("doc_id")
        .agg(F.countDistinct("chunk_id").alias("nch"),
             F.max("chunk_id").alias("mx"))
        .collect()
    )
    by = {r["doc_id"]: r for r in got}
    assert by[0]["nch"] == 3 and by[0]["mx"] == 2
    assert by[1]["nch"] == 1 and by[1]["mx"] == 0
    assert by[2]["nch"] == 4 and by[2]["mx"] == 3


def test_chunked_local_twin_identity(spark, sf_dir, tmp_path):
    """semantic_chunked_topk_local over the chunk store must be
    rank-identical (doc, chunk, cosine) to the Spark path."""
    corpus = load_corpus(spark, sf_dir)
    d = str(tmp_path / "chunkstore")
    sem.write_semantic_chunk_store(corpus, d)
    for q in ("merge vector batch", "spark", "zzz-no-such-term"):
        want = [
            (r["doc_id"], r["chunk_id"], r["cosine"])
            for r in sem.semantic_chunked_topk(corpus, q, k=10).collect()
        ]
        got = sem.semantic_chunked_topk_local(d, q, k=10)
        assert got == want, q


def test_chunked_local_cache_reuse(spark, sf_dir, tmp_path):
    corpus = load_corpus(spark, sf_dir)
    d = str(tmp_path / "chunkstore2")
    sem.write_semantic_chunk_store(corpus, d)
    cache: dict = {}
    a = sem.semantic_chunked_topk_local(d, "merge batch", k=5, cache=cache)
    assert "norms" in cache
    b = sem.semantic_chunked_topk_local(d, "merge batch", k=5, cache=cache)
    assert a == b and len(a) > 0


# --- agg_ip_prefix / sampler_agg ------------------------------------------------


def test_ip_prefix_hand_computed(spark):
    import ipaddress

    c = _mini_corpus(spark, [(i, "x", "en") for i in range(16)])
    from telegram2elastic_spark.operators.aggregates import agg_ip_prefix

    got = [(r["prefix"], r["doc_count"]) for r in agg_ip_prefix(c, 8).collect()]
    # independent recompute: Knuth ip, /8 network via the ipaddress module
    from collections import Counter

    nets = Counter()
    for i in range(16):
        ip = (i * 2654435761) % (2**32)
        net = ipaddress.ip_network((ip, 8), strict=False)
        nets[str(net)] += 1
    want = sorted(
        nets.items(), key=lambda kv: int(ipaddress.ip_network(kv[0])[0])
    )
    assert got == [(k, v) for k, v in want]


def test_ip_prefix_min_doc_count_and_validation(spark):
    import pytest as _pt

    from telegram2elastic_spark.operators.aggregates import agg_ip_prefix

    c = _mini_corpus(spark, [(i, "x", "en") for i in range(64)])
    all_rows = agg_ip_prefix(c, 2).collect()
    assert sum(r["doc_count"] for r in all_rows) == 64
    filtered = agg_ip_prefix(c, 2, min_doc_count=20).collect()
    assert all(r["doc_count"] >= 20 for r in filtered)
    assert len(filtered) < len(all_rows) or all(
        r["doc_count"] >= 20 for r in all_rows
    )
    with _pt.raises(ValueError):
        agg_ip_prefix(c, 33)


def test_ip_prefix_oracle_parity(spark, duck, sf_dir):
    from telegram2elastic_spark.operators.aggregates import (
        agg_ip_prefix,
        agg_ip_prefix_sql,
    )

    assert_same(
        agg_ip_prefix(load_corpus(spark, sf_dir), 4),
        duck.execute(agg_ip_prefix_sql(4)).df(),
    )


def test_sampler_is_uncapped_diversified(spark, sf_dir):
    """sampler == diversified_sampler with an unreachable per-key cap."""
    from telegram2elastic_spark.query.facets import (
        sampler_agg,
        sampler_diversified,
    )

    corpus = load_corpus(spark, sf_dir)
    a = [r.asDict() for r in sampler_agg(corpus, "merge", 50).collect()]
    b = [
        r.asDict()
        for r in sampler_diversified(
            corpus, "merge", shard_size=50, max_per_lang=10**6
        ).collect()
    ]
    assert a == b
    assert sum(r["cnt"] for r in a) <= 50


def test_sampler_oracle_parity(spark, duck, sf_dir):
    from telegram2elastic_spark.query.facets import sampler_agg, sampler_agg_sql

    assert_same(
        sampler_agg(load_corpus(spark, sf_dir), "merge", 60),
        duck.execute(sampler_agg_sql("merge", 60)).df(),
    )
