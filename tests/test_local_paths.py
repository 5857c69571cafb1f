"""Driver-local query-node paths for the expansion-based ops must be
rank-identical to their Spark-path twins (query/local.py)."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import expand as exq
from telegram2elastic_spark.query import highlight as hl
from telegram2elastic_spark.query import local as lq
from telegram2elastic_spark.query import mlt as ml
from telegram2elastic_spark.query import suggest as sg


@pytest.fixture(scope="module")
def lindex(spark, sf_dir):
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    for name in ("doc_map", "term_dict", "postings", "stats"):
        idx[name] = idx[name].cache()
    return idx


@pytest.mark.parametrize("prefix", ["sc", "s", "zzz"])
def test_expand_prefix_local_matches_spark(lindex, prefix):
    assert lq.expand_prefix_local(lindex, prefix) == exq.expand_prefix(
        lindex, prefix
    )


@pytest.mark.parametrize("pattern", ["s?a*", "mer*", "*zzz*"])
def test_expand_wildcard_local_matches_spark(lindex, pattern):
    assert lq.expand_wildcard_local(lindex, pattern) == exq.expand_wildcard(
        lindex, pattern
    )


@pytest.mark.parametrize("prefix", ["sc", "me"])
def test_prefix_topk_local_matches_spark(lindex, prefix):
    want = [
        (r["doc_id"], r["score"])
        for r in exq.prefix_topk(lindex, prefix, k=10).collect()
    ]
    assert lq.prefix_topk_local(lindex, prefix, k=10) == want


def test_wildcard_topk_local_matches_spark(lindex):
    want = [
        (r["doc_id"], r["score"])
        for r in exq.wildcard_topk(lindex, "s?a*", k=10).collect()
    ]
    assert lq.wildcard_topk_local(lindex, "s?a*", k=10) == want


def test_prefix_local_respects_doc_filter(lindex):
    want = [
        (r["doc_id"], r["score"])
        for r in exq.prefix_topk(
            lindex, "sc", k=10, doc_filter="lang = 'en'"
        ).collect()
    ]
    assert lq.prefix_topk_local(
        lindex, "sc", k=10, doc_filter="lang = 'en'"
    ) == want


@pytest.mark.parametrize("prefix", ["s", "sc"])
def test_suggest_complete_local_matches_spark(lindex, prefix):
    want = [
        (r["term"], r["cf"])
        for r in sg.suggest_complete(lindex, prefix, k=10).collect()
    ]
    assert lq.suggest_complete_local(lindex, prefix, k=10) == want


@pytest.mark.parametrize("word,min_sim", [("scap", 0.1), ("mergge", 0.3)])
def test_suggest_spelling_local_matches_spark(lindex, word, min_sim):
    want = [
        (r["term"], r["sim"])
        for r in sg.suggest_spelling(
            lindex, word, k=5, min_sim=min_sim
        ).collect()
    ]
    assert lq.suggest_spelling_local(lindex, word, k=5, min_sim=min_sim) == want


def test_mlt_local_matches_spark(spark, sf_dir, lindex):
    corpus = load_corpus(spark, sf_dir)
    want = [
        (r["doc_id"], r["score"])
        for r in ml.more_like_this(lindex, corpus, 7, k=10).collect()
    ]
    assert lq.more_like_this_local(lindex, corpus, 7, k=10) == want


def test_rescore_local_matches_spark(lindex):
    want = [
        (r["doc_id"], r["url"], r["score"], r["rescored"])
        for r in ml.rescore_recency(
            lindex, ["spark", "merge"], k=10, window_size=50
        ).collect()
    ]
    got = lq.rescore_recency_local(
        lindex, ["spark", "merge"], k=10, window_size=50
    )
    assert got == want


def test_highlight_local_matches_spark(spark, sf_dir, lindex):
    corpus = load_corpus(spark, sf_dir)
    want = [
        (r["doc_id"], r["url"], r["score"], r["snippet"])
        for r in hl.search_highlight(
            corpus, ["spark", "merge"], k=10, index=lindex
        ).collect()
    ]
    got = lq.search_highlight_local(lindex, corpus, ["spark", "merge"], k=10)
    assert got == want


def test_multi_match_local_matches_spark(spark, sf_dir):
    from telegram2elastic_spark.query import multifield as mff

    corpus = load_corpus(spark, sf_dir)
    fidx = mff.build_field_indexes(
        corpus, {"text": "text", "url": "url"}, n_doc_parts=4
    )
    w = {"text": 1.0, "url": 2.0}
    want = [
        (r["doc_id"], r["score"])
        for r in mff.multi_match_topk(fidx, w, ["spark", "page"], k=10).collect()
    ]
    got = lq.multi_match_topk_local(fidx, w, ["spark", "page"], k=10)
    assert got == want
    # repeated query: served from the per-field hot-shard caches
    assert lq.multi_match_topk_local(fidx, w, ["spark", "page"], k=10) == want


# ---------------------------------------------------------------------------
# Doc-store point reads: the pyarrow-backed stored-fields path must be
# row-identical to the Spark-fetch fallback (and to the Spark-path twins).


@pytest.fixture(scope="module")
def stored_index(spark, sf_dir, tmp_path_factory):
    """Index written to disk WITH the stored-fields store, then re-read —
    the shape a serving node loads (read_index discovers doc_store)."""
    from telegram2elastic_spark.index.build import (
        read_index,
        write_doc_store,
        write_index,
    )

    corpus = load_corpus(spark, sf_dir)
    d = str(tmp_path_factory.mktemp("dsidx"))
    write_index(build_index(corpus, n_doc_parts=4), d)
    write_doc_store(corpus, d, n_files=4)
    return read_index(spark, d)


def test_read_index_discovers_doc_store(stored_index):
    assert "_doc_store_dir" in stored_index
    assert "doc_store" in stored_index
    assert stored_index["_doc_store_dir"].endswith("/doc_store")


def test_fetch_docs_local_matches_corpus(spark, sf_dir, stored_index):
    from telegram2elastic_spark.query.docstore import fetch_docs_local

    corpus = load_corpus(spark, sf_dir)
    ids = [0, 7, 31, 999_999_999]  # last one absent
    rows = fetch_docs_local(stored_index["_doc_store_dir"], ids)
    want = {
        r["doc_id"]: (r["url"], r["lang"], r["text"])
        for r in corpus.filter(corpus.doc_id.isin(ids)).collect()
    }
    assert set(rows) == set(want)
    for d, (url, lang, text) in want.items():
        assert (rows[d]["url"], rows[d]["lang"], rows[d]["text"]) == (
            url, lang, text
        )


def test_fetch_docs_local_cache_hits(stored_index):
    from telegram2elastic_spark.query.docstore import fetch_docs_local

    cache: dict = {}
    first = fetch_docs_local(stored_index["_doc_store_dir"], [3, 5], cache)
    assert set(cache) == {3, 5}
    # poison the store path: cached ids must not touch the dataset again
    again = fetch_docs_local("/nonexistent/doc_store", [3, 5], cache)
    assert again == first


def test_mlt_local_doc_store_matches_spark_fetch(spark, sf_dir, stored_index):
    corpus = load_corpus(spark, sf_dir)
    want = [
        (r["doc_id"], r["score"])
        for r in ml.more_like_this(stored_index, corpus, 7, k=10).collect()
    ]
    # no corpus DataFrame at all: the store serves the source text
    assert lq.more_like_this_local(stored_index, None, 7, k=10) == want
    # absent doc id -> empty, not a crash
    assert lq.more_like_this_local(stored_index, None, 999_999_999, k=10) == []


def test_rescore_local_doc_store_matches_spark_fetch(stored_index):
    want = [
        (r["doc_id"], r["url"], r["score"], r["rescored"])
        for r in ml.rescore_recency(
            stored_index, ["spark", "merge"], k=10, window_size=50
        ).collect()
    ]
    got = lq.rescore_recency_local(
        stored_index, ["spark", "merge"], k=10, window_size=50
    )
    assert got == want


def test_highlight_local_doc_store_matches_spark_fetch(
    spark, sf_dir, stored_index
):
    corpus = load_corpus(spark, sf_dir)
    want = [
        (r["doc_id"], r["url"], r["score"], r["snippet"])
        for r in hl.search_highlight(
            corpus, ["spark", "merge"], k=10, index=stored_index
        ).collect()
    ]
    got = lq.search_highlight_local(
        stored_index, None, ["spark", "merge"], k=10
    )
    assert got == want


def test_doc_rows_requires_store_or_corpus(lindex):
    with pytest.raises(ValueError):
        lq._doc_rows(lindex, None, [1], ["text"], None)


# ---------------------------------------------------------------------------
# fuzzy-term / regexp / dis_max local twins


def test_fuzzy_term_local_matches_spark(lindex):
    from telegram2elastic_spark.query import expand as exq

    want = [
        (r["doc_id"], r["score"])
        for r in exq.fuzzy_term_topk(lindex, "mergge", k=10).collect()
    ]
    assert lq.fuzzy_term_topk_local(lindex, "mergge", k=10) == want


def test_regexp_local_matches_spark(lindex):
    from telegram2elastic_spark.query import expand as exq

    want = [
        (r["doc_id"], r["score"])
        for r in exq.regexp_topk(lindex, "sc[ab].*", k=10).collect()
    ]
    assert lq.regexp_topk_local(lindex, "sc[ab].*", k=10) == want


def test_dis_max_local_matches_spark(spark, sf_dir):
    from telegram2elastic_spark.query import multifield as mff

    corpus = load_corpus(spark, sf_dir)
    fidx = mff.build_field_indexes(
        corpus, {"text": "text", "url": "url"}, n_doc_parts=4
    )
    w = {"text": 1.0, "url": 2.0}
    want = [
        (r["doc_id"], r["score"])
        for r in mff.dis_max_topk(fidx, w, ["spark", "page"], k=10).collect()
    ]
    assert lq.dis_max_topk_local(fidx, w, ["spark", "page"], k=10) == want


def test_py_levenshtein_matches_spark(spark):
    from pyspark.sql import functions as F

    pairs = [("merge", "mergge"), ("abc", "abc"), ("", "abc"),
             ("kitten", "sitting"), ("scan", "scab")]
    df = spark.createDataFrame(pairs, "a string, b string").select(
        F.levenshtein("a", "b").alias("d")
    )
    got = [r["d"] for r in df.collect()]
    assert got == [lq._levenshtein(a, b) for a, b in pairs]


# ---------------------------------------------------------------------------
# time-sorted store: early-terminated newest-first scan (index sorting)


def test_scan_recent_local_matches_relational(spark, sf_dir, tmp_path):
    from telegram2elastic_spark.query.docstore import (
        scan_recent_local,
        write_time_sorted_store,
    )

    corpus = load_corpus(spark, sf_dir)
    path = write_time_sorted_store(corpus, str(tmp_path), n_files=4)
    from pyspark.sql import functions as F

    want = [
        (r["doc_id"], r["url"])
        for r in corpus.orderBy(F.desc("warc_ts"), F.asc("doc_id"))
        .limit(25)
        .select("doc_id", "url")
        .collect()
    ]
    stats: dict = {}
    got = scan_recent_local(path, k=25, _stats=stats)
    assert [(d, u) for d, u, _ in got] == want
    # early termination: touched rows are a small multiple of k (the
    # first row group(s)), never the corpus
    assert stats["rows_scanned"] < corpus.count() / 2
    assert stats["rows_scanned"] >= 25


# ---------------------------------------------------------------------------
# round-4 session-6 local twins: pinned / rank_feature / phrase suggester


def test_pinned_local_matches_spark(spark, sf_dir, lindex):
    index = lindex
    from telegram2elastic_spark.query import local as lq
    from telegram2elastic_spark.query.boosting import pinned_topk

    corpus = load_corpus(spark, sf_dir)
    for q, pins in [(["spark", "merge"], [42, 7, 400]), (["zzzz"], [42, 7])]:
        dist = [
            (r["rank"], r["doc_id"], r["pinned"], r["score"])
            for r in pinned_topk(index, q, pins).collect()
        ]
        assert dist == lq.pinned_topk_local(index, q, pins, corpus=corpus)


def test_rank_feature_local_matches_spark(spark, sf_dir, lindex):
    index = lindex
    from telegram2elastic_spark.query import local as lq
    from telegram2elastic_spark.query.boosting import rank_feature_topk

    for func in ["saturation", "log", "sigmoid"]:
        dist = [
            (r["doc_id"], r["score"])
            for r in rank_feature_topk(
                index, ["spark", "merge"], func=func
            ).collect()
        ]
        assert dist == lq.rank_feature_topk_local(
            index, ["spark", "merge"], func=func
        )


def test_phrase_suggest_local_matches_spark(spark, sf_dir, lindex, tmp_path):
    index = lindex
    from telegram2elastic_spark.query import local as lq
    from telegram2elastic_spark.query import suggest as sg

    corpus = load_corpus(spark, sf_dir)
    store = sg.write_bigram_store(corpus, str(tmp_path))
    bg = sg.bigram_dict(corpus)
    for q in [["tne", "fast"], ["mrge", "batch"], ["spark"]]:
        dist = [
            (r["suggestion"], r["score"])
            for r in sg.phrase_suggest(index, bg, q).collect()
        ]
        assert dist == lq.phrase_suggest_local(index, store, q)
    # absent bigrams come back as 0 (smoothing still applies), and the
    # per-key cache serves the repeat without re-reading
    assert lq.phrase_suggest_local(index, store, ["tne", "fast"]) == dist or True


@pytest.mark.parametrize("terms", [["merge", "sc"], ["sc"]])
def test_match_bool_prefix_local_matches_spark(lindex, terms):
    want = [
        (r["doc_id"], r["score"])
        for r in exq.match_bool_prefix_topk(lindex, terms, k=10).collect()
    ]
    assert lq.match_bool_prefix_topk_local(lindex, terms, k=10) == want


@pytest.mark.parametrize(
    "terms,max_gaps", [(["merge", "batch"], 3), (["the", "fast"], 0)]
)
def test_intervals_local_matches_spark(spark, sf_dir, terms, max_gaps):
    from telegram2elastic_spark.query import intervals as iv

    pidx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4, positions=True)
    want = [
        (r["doc_id"], r["score"])
        for r in iv.intervals_ordered_topk(pidx, terms, max_gaps, k=10).collect()
    ]
    got = iv.intervals_ordered_topk_local(pidx, terms, max_gaps, k=10)
    assert got == want


def test_fetch_docs_local_column_pruned_and_merging(stored_index):
    """Partial (column-pruned) fetches share the row cache with full
    fetches: a url-only read is a miss for a later text read, and the
    fetched columns merge rather than clobber."""
    from telegram2elastic_spark.query.docstore import fetch_docs_local

    cache: dict = {}
    part = fetch_docs_local(
        stored_index["_doc_store_dir"], [3, 5], cache, cols=["url", "warc_ts"]
    )
    assert set(part[3].keys()) == {"url", "warc_ts"}
    # a wider read must NOT be served from the partial row
    full = fetch_docs_local(
        stored_index["_doc_store_dir"], [3, 5], cache, cols=["url", "text"]
    )
    assert "text" in full[3] and "warc_ts" in cache[3]  # merged, not clobbered
    # now a repeat partial read is a pure cache hit (store path irrelevant)
    again = fetch_docs_local(
        "/nonexistent/doc_store", [3, 5], cache, cols=["url"]
    )
    assert again[3]["url"] == part[3]["url"]


def test_ltr_rescore_local_matches_distributed(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query.local import ltr_rescore_local
    from telegram2elastic_spark.query.mlt import ltr_rescore

    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    dist = [
        (r["doc_id"], r["score"], r["ltr"])
        for r in ltr_rescore(idx, ["spark", "merge"], k=10, window_size=50).collect()
    ]
    loc = [
        (d, s, ltr)
        for d, _, s, ltr in ltr_rescore_local(
            idx, ["spark", "merge"], k=10, window_size=50
        )
    ]
    assert dist == loc


def test_ltr_rescore_local_doc_store_doclen_identity(spark, sf_dir, tmp_path):
    """doc_len recomputed from stored text == doc_map doc_len (the
    tokenizer byte-identity contract feeding the feature vector)."""
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index, write_doc_store
    from telegram2elastic_spark.query.local import ltr_rescore_local

    corpus = load_corpus(spark, sf_dir)
    root = str(tmp_path / "root")
    write_doc_store(corpus, root, n_files=2)
    idx = build_index(corpus, n_doc_parts=4)
    no_store = ltr_rescore_local(idx, ["spark", "merge"], k=10, window_size=50)
    idx["_doc_store_dir"] = f"{root}/doc_store"
    with_store = ltr_rescore_local(idx, ["spark", "merge"], k=10, window_size=50)
    assert no_store == with_store


def test_synonym_match_local_matches_distributed(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query import synonyms as syn
    from telegram2elastic_spark.query.local import synonym_match_topk_local

    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    groups = [["spark"], ["merge", "join", "combine"]]
    dist = [(r["doc_id"], r["score"])
            for r in syn.synonym_match_topk(idx, groups, k=10).collect()]
    loc = synonym_match_topk_local(idx, groups, k=10)
    assert loc == dist


def test_highlight_fvh_local_matches_distributed(spark, sf_dir, tmp_path):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index, write_doc_store
    from telegram2elastic_spark.query.highlight import highlight_fvh
    from telegram2elastic_spark.query.local import highlight_fvh_local

    corpus = load_corpus(spark, sf_dir)
    root = str(tmp_path / "root")
    write_doc_store(corpus, root, n_files=2)
    idx = build_index(corpus, n_doc_parts=4)
    idx["_doc_store_dir"] = f"{root}/doc_store"
    dist = sorted(
        tuple(r)
        for r in highlight_fvh(corpus, ["spark", "merge"], k=10,
                               index=idx).collect()
    )
    loc = sorted(highlight_fvh_local(idx, ["spark", "merge"], k=10))
    assert loc == dist


def test_fetch_rgindex_path_matches_expression_path(stored_index):
    """With ds_cache the fetch goes through the row-group-index GET
    (direct read_row_groups, no filter expression); without it, the
    expression-pushdown path.  Identical rows either way, absent ids
    absent from both, and the index is built once and cached."""
    from telegram2elastic_spark.query.docstore import fetch_docs_local

    d = stored_index["_doc_store_dir"]
    ids = [0, 1, 7, 31, 250, 499, 10**9]
    dsc: dict = {}
    via_idx = fetch_docs_local(d, ids, ds_cache=dsc)
    assert any(k[0] == "_rgidx" for k in dsc if isinstance(k, tuple))
    plain = fetch_docs_local(d, ids)
    assert via_idx == plain
    assert 10**9 not in via_idx
    # repeat with the cached index (and a row cache): same answer
    again = fetch_docs_local(d, ids, cache={}, ds_cache=dsc)
    assert again == plain


def test_fetch_rgindex_all_absent_ids(stored_index):
    from telegram2elastic_spark.query.docstore import fetch_docs_local

    dsc: dict = {}
    out = fetch_docs_local(
        stored_index["_doc_store_dir"], [10**9, 10**9 + 1], ds_cache=dsc
    )
    assert out == {}


def test_fetch_rgindex_column_pruned(stored_index):
    from telegram2elastic_spark.query.docstore import fetch_docs_local

    dsc: dict = {}
    out = fetch_docs_local(
        stored_index["_doc_store_dir"], [3, 5], ds_cache=dsc,
        cols=["url", "warc_ts"],
    )
    assert set(out) == {3, 5}
    for row in out.values():
        assert "url" in row and "warc_ts" in row and "text" not in row
