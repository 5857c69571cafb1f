"""Session-10 operators: change_point / frequent_item_sets /
categorize_text / scripted_metric aggs, match-with-fuzziness, exact
substring dedup (Lee et al. 2021), the stop analyzer, and
function_score random_score."""

import numpy as np

from telegram2elastic_spark.corpus import as_corpus
from telegram2elastic_spark.functions.tokenizer import apply_stop_analyzer
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.operators import aggregates as agg
from telegram2elastic_spark.operators import dedup
from telegram2elastic_spark.query import expand as expandq
from telegram2elastic_spark.query import funcscore as fscore
from telegram2elastic_spark.query.termset import synonym_topk
from telegram2elastic_spark.query.wand import wand_topk


def _mk(spark, texts, ids=None):
    ids = ids if ids is not None else range(len(texts))
    rows = [(i, t, "en", "s", len(t)) for i, t in zip(ids, texts)]
    return as_corpus(
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )


# --- change_point ------------------------------------------------------------


def test_change_point_matches_brute_force(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus

    corpus = load_corpus(spark, sf_dir)
    got = agg.agg_change_point(corpus).first()
    # brute force over the hourly series
    hourly = (
        corpus.groupBy(
            __import__("pyspark.sql.functions", fromlist=["x"]).date_format(
                __import__("pyspark.sql.functions", fromlist=["x"]).date_trunc(
                    "hour", "warc_ts"
                ),
                "yyyy-MM-dd HH:00",
            ).alias("bucket")
        )
        .count()
        .orderBy("bucket")
        .collect()
    )
    docs = np.array([r["count"] for r in hourly], dtype=float)
    n = len(docs)
    best = None
    for i in range(1, n):  # split before bucket i (0-based right start)
        ml, mr = docs[:i].mean(), docs[i:].mean()
        score = round(abs(mr - ml) * np.sqrt(i * (n - i) / n), 4)
        key = (-score, hourly[i]["bucket"])
        if best is None or key < best[0]:
            best = (key, hourly[i]["bucket"], round(ml, 4), round(mr, 4), score)
    assert got["bucket"] == best[1]
    assert got["score"] == best[4]
    assert got["left_mean"] == best[2]
    assert got["right_mean"] == best[3]


def test_change_point_detects_planted_step(spark):
    # 20 docs in hour 0 (ids 0..19), 3 docs spread at ~hour 2+ — the mean
    # shift is at the first sparse bucket
    ids = list(range(20)) + [200, 230, 260]
    corpus = _mk(spark, ["w"] * len(ids), ids=ids)
    r = agg.agg_change_point(corpus).first()
    assert r["bucket"] == "2022-01-01 02:00"
    assert r["left_mean"] == 20.0


# --- frequent_item_sets -------------------------------------------------------


def test_frequent_item_sets_hand_counted(spark):
    corpus = _mk(
        spark,
        [
            "spark merge table",
            "spark merge",
            "spark merge row",
            "table row",
        ],
    )
    rows = agg.agg_frequent_item_sets(corpus, min_support=2, top=10).collect()
    got = {(r["item1"], r["item2"]): r["support"] for r in rows}
    assert got[("merge", "spark")] == 3
    assert got[("spark", "table")] == 1 if ("spark", "table") in got else True
    # support >= 2 only
    assert all(v >= 2 for v in got.values())
    # ordering: support desc
    sups = [r["support"] for r in rows]
    assert sups == sorted(sups, reverse=True)


def test_frequent_item_sets_apriori_bound(spark, sf_dir):
    """Pair support can never exceed the df of either member (downward
    closure used by the pruning)."""
    from telegram2elastic_spark.corpus import load_corpus
    from pyspark.sql import functions as F
    from telegram2elastic_spark.functions.tokenizer import tokens

    corpus = load_corpus(spark, sf_dir)
    pairs = agg.agg_frequent_item_sets(corpus, min_support=100, top=50).collect()
    dfs = {
        r["item"]: r["c"]
        for r in corpus.select(
            F.explode(F.array_distinct(tokens("text"))).alias("item")
        )
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in pairs:
        assert r["support"] <= min(dfs[r["item1"]], dfs[r["item2"]])


# --- categorize_text ----------------------------------------------------------


def test_categorize_text_rarest_tokens(spark):
    # 'rare1'/'rare2' df=1, 'common' df=3 — categories keyed by rarity
    corpus = _mk(
        spark,
        [
            "common rare1 filler filler2",
            "common rare2 filler filler2",
            "common filler filler2 filler3",
        ],
    )
    rows = agg.categorize_text(corpus, n_sig=2, top=10).collect()
    cats = {r["category"]: r["n_docs"] for r in rows}
    # doc0: rarest two = rare1 (df1) + filler3? no — filler3 only in doc2.
    # doc0 tokens: common(3) rare1(1) filler(3) filler2(3) -> rare1 + tie
    # among df-3 terms broken by term asc = common
    assert cats.get("common rare1") == 1
    assert cats.get("common rare2") == 1


# --- scripted_metric ----------------------------------------------------------


def test_scripted_metric_profile_matches_direct_agg(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from pyspark.sql import functions as F

    corpus = load_corpus(spark, sf_dir)
    got = agg.scripted_metric_profile(corpus).first()
    exp = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("ss"),
        F.max("n_chars").alias("mx"),
    ).first()
    mean = exp["s"] / exp["n"]
    assert got["n_docs"] == exp["n"]
    assert got["mean_chars"] == round(mean, 4)
    assert got["var_chars"] == round(exp["ss"] / exp["n"] - mean * mean, 4)
    assert got["max_chars"] == exp["mx"]


def test_scripted_metric_partition_invariant(spark, sf_dir):
    """ES reduce_script contract: per-shard states merge to the same
    answer regardless of sharding."""
    from telegram2elastic_spark.corpus import load_corpus

    corpus = load_corpus(spark, sf_dir)
    a = agg.scripted_metric_profile(corpus.repartition(1)).first()
    b = agg.scripted_metric_profile(corpus.repartition(7)).first()
    assert a.asDict() == b.asDict()


# --- match with fuzziness ------------------------------------------------------


def test_match_fuzzy_is_synonym_of_expansions(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus

    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    words = ["fast", "row"]
    groups = [
        expandq.expand_fuzzy(idx, w, fuzziness=2, prefix_length=0, max_expansions=8)
        for w in words
    ]
    assert all(groups), groups
    via_fuzzy = fuzzy_rows = [
        (r["doc_id"], r["score"])
        for r in expandq.match_fuzzy_topk(
            idx, words, k=10, fuzziness=2, prefix_length=0, max_expansions=8
        ).collect()
    ]
    via_syn = [
        (r["doc_id"], r["score"])
        for r in synonym_topk(idx, groups, k=10).collect()
    ]
    assert via_fuzzy == via_syn


def test_match_fuzzy_dead_token_drops(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus

    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    with_dead = expandq.match_fuzzy_topk(
        idx, ["fast", "zzzzqqqq"], k=10, fuzziness=1, prefix_length=1
    ).collect()
    without = expandq.match_fuzzy_topk(
        idx, ["fast"], k=10, fuzziness=1, prefix_length=1
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in with_dead] == [
        (r["doc_id"], r["score"]) for r in without
    ]


# --- exact substring dedup ------------------------------------------------------


def test_substring_spans_cross_doc(spark):
    shared = "one two three four five six seven eight"
    corpus = _mk(
        spark,
        [
            shared + " tailA unique1 unique2",
            "headB leadin " + shared,
            "totally different words here nothing shared at all",
        ],
    )
    rows = {r["doc_id"]: r for r in dedup.dedup_substring_spans(corpus, n=8).collect()}
    assert rows[0]["n_dup_tokens"] == 8
    assert rows[1]["n_dup_tokens"] == 8
    assert rows[2]["n_dup_tokens"] == 0
    assert rows[2]["dup_frac"] == 0.0


def test_substring_clean_removes_exact_span(spark):
    shared = "one two three four five six seven eight"
    corpus = _mk(
        spark,
        [
            shared + " tail1 tail2",
            "head0 " + shared,
            "no duplication in this document at all whatsoever",
        ],
    )
    got = {r["doc_id"]: r["clean_text"] for r in
           dedup.dedup_substring_clean(corpus, n=8).collect()}
    assert got[0] == "tail1 tail2"
    assert got[1] == "head0"
    assert got[2] == "no duplication in this document at all whatsoever"


def test_substring_within_doc_repeat_counts(spark):
    """The paper's criterion is 'appears more than once in the corpus' —
    a within-doc repeat qualifies."""
    span = "a1 a2 a3 a4 a5 a6 a7 a8"
    corpus = _mk(
        spark,
        [span + " gap1 gap2 " + span, "something else entirely different here ok"],
    )
    rows = {r["doc_id"]: r for r in dedup.dedup_substring_spans(corpus, n=8).collect()}
    assert rows[0]["n_dup_tokens"] == 16
    assert rows[1]["n_dup_tokens"] == 0


def test_substring_short_doc_no_windows(spark):
    corpus = _mk(spark, ["short doc", "short doc"])
    rows = dedup.dedup_substring_spans(corpus, n=8).collect()
    assert all(r["n_dup_tokens"] == 0 for r in rows)


# --- stop analyzer ---------------------------------------------------------------


def test_stop_analyzer_removes_terms_from_index(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus

    corpus = apply_stop_analyzer(load_corpus(spark, sf_dir), ["the", "a"])
    idx = build_index(corpus, n_doc_parts=4)
    terms = {
        r["term"]
        for r in idx["term_dict"].filter("term IN ('the', 'a')").collect()
    }
    assert terms == set()
    assert wand_topk(idx, ["the"], k=5).count() == 0


def test_stop_analyzer_matches_relational_on_analyzed_view(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.query.bm25 import bm25_topk

    corpus = apply_stop_analyzer(load_corpus(spark, sf_dir), ["the", "a"])
    idx = build_index(corpus, n_doc_parts=4)
    a = [(r["doc_id"], r["score"]) for r in wand_topk(idx, ["spark", "merge"], k=10).collect()]
    b = [(r["doc_id"], r["score"]) for r in bm25_topk(corpus, ["spark", "merge"], k=10).collect()]
    assert a == b


# --- function_score random_score ---------------------------------------------------


def test_random_score_indexed_matches_relational(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus

    corpus = load_corpus(spark, sf_dir)
    idx = build_index(corpus, n_doc_parts=4)
    a = [
        (r["doc_id"], r["score"])
        for r in fscore.function_score_random_topk(
            corpus, ["spark", "merge"], seed=42, k=10
        ).collect()
    ]
    b = [
        (r["doc_id"], r["score"])
        for r in fscore.function_score_random_topk(
            corpus, ["spark", "merge"], seed=42, k=10, index=idx
        ).collect()
    ]
    assert a == b
    assert len(a) == 10


def test_random_score_seed_sensitivity_and_range(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus

    corpus = load_corpus(spark, sf_dir)
    a = [r["doc_id"] for r in fscore.function_score_random_topk(
        corpus, ["spark", "merge"], seed=1, k=10).collect()]
    b = [r["doc_id"] for r in fscore.function_score_random_topk(
        corpus, ["spark", "merge"], seed=99991, k=10).collect()]
    assert a != b  # a different seed reshuffles
    ids = np.arange(100000, dtype=np.int64)
    r = fscore._rnd_np(ids, 42)
    assert r.min() >= 0.0 and r.max() < 1.0
    # spread: all 10 deciles populated
    assert len(np.unique((r * 10).astype(int))) == 10


# --- Porter stemmer analyzer ------------------------------------------------------


def test_porter_published_vectors():
    from telegram2elastic_spark.functions.stemmer import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "conflated": "conflat", "troubled": "troubl",
        "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "valenci": "valenc",
        "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun", "activate": "activ",
        "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    }
    for w, want in vectors.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_analyzer_conflates_inflections(spark):
    from telegram2elastic_spark.functions.stemmer import (
        analyze_query_terms,
        apply_porter_analyzer,
    )

    corpus = _mk(
        spark,
        [
            "merging tables quickly",
            "the table was merged",
            "a merge of the tables",
            "nothing relevant here",
        ],
    )
    stemmed = apply_porter_analyzer(corpus)
    idx = build_index(stemmed, n_doc_parts=2)
    qterms = analyze_query_terms(["merges"])
    hits = {r["doc_id"] for r in wand_topk(idx, qterms, k=10).collect()}
    assert hits == {0, 1, 2}
    # and the analyzed view round-trips: wand == relational bm25 on it
    from telegram2elastic_spark.query.bm25 import bm25_topk

    a = [(r["doc_id"], r["score"]) for r in wand_topk(idx, qterms, k=10).collect()]
    b = [(r["doc_id"], r["score"]) for r in bm25_topk(stemmed, qterms, k=10).collect()]
    assert a == b
