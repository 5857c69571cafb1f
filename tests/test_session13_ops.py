"""Session-13 ops: parent agg, time_series agg, tf-idf keywords,
URL quality filter, token-budget selection, cross-snapshot dedup."""

from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import load_corpus, load_events
from telegram2elastic_spark.operators import aggregates as agg
from telegram2elastic_spark.query import parentchild

from .oracle import assert_same


def test_parent_agg_vs_oracle(spark, duck, sf_dir):
    got = parentchild.parent_agg(load_corpus(spark, sf_dir))
    want = duck.execute(parentchild.parent_agg_sql()).df()
    assert_same(got, want)


def test_parent_agg_counts_each_parent_once_per_bucket(spark, sf_dir):
    """The scope hop dedupes children: a site with many pages in the same
    language contributes its parent attributes exactly once to that
    bucket — the defining difference from a child-scope aggregation."""
    corpus = load_corpus(spark, sf_dir)
    rows = {r["lang"]: r for r in parentchild.parent_agg(corpus).collect()}
    pages = corpus.withColumn(
        "host", F.regexp_extract("url", "^[a-z]+://([^/]+)", 1)
    )
    for lang in list(rows)[:2]:
        hosts = {
            r["host"]
            for r in pages.filter(F.col("lang") == lang)
            .select("host")
            .distinct()
            .collect()
        }
        assert rows[lang]["n_sites"] == len(hosts)
        # parent_pages counts ALL pages of those sites, not just the
        # bucket's own children (parent-scope metric)
        all_pages = pages.filter(F.col("host").isin(list(hosts))).count()
        assert rows[lang]["parent_pages"] == all_pages


def test_time_series_agg_vs_oracle(spark, duck, sf_dir):
    got = agg.time_series_agg(load_events(spark, sf_dir), size=50)
    want = duck.execute(agg.time_series_agg_sql(size=50)).df()
    assert_same(got, want)


def test_time_series_agg_series_semantics(spark, sf_dir):
    """Each bucket is one tsid; last_value is the max-event_id read and
    the time span brackets every row of the series."""
    ev = load_events(spark, sf_dir)
    rows = agg.time_series_agg(ev, size=5).collect()
    assert len(rows) == 5
    keys = [(r["event_type"], r["user_id"]) for r in rows]
    assert keys == sorted(keys)  # tsid-ordered buckets
    r0 = rows[0]
    series = ev.filter(
        (F.col("event_type") == r0["event_type"])
        & (F.col("user_id") == r0["user_id"])
    )
    assert r0["doc_count"] == series.count()
    last = series.orderBy(F.desc("event_id")).select("value").first()[0]
    assert abs(r0["value_last"] - round(last, 5)) < 1e-9
    lo, hi = series.agg(F.min("ts"), F.max("ts")).first()
    assert r0["ts_first"] == lo and r0["ts_last"] == hi


def test_keywords_tfidf_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.functions import text_quality as tq

    got = tq.keywords_tfidf(load_corpus(spark, sf_dir), k=5)
    want = duck.execute(tq.keywords_tfidf_sql(k=5)).df()
    assert_same(got, want)


def test_keywords_tfidf_semantics(spark, sf_dir):
    """Top keyword maximizes tf * ln((N+1)/(df+1)) (independent numpy
    recompute for one doc); empty docs emit empty arrays; scores are
    non-increasing."""
    import math

    from telegram2elastic_spark.functions import text_quality as tq
    from telegram2elastic_spark.functions.tokenizer import tokens

    corpus = load_corpus(spark, sf_dir)
    out = {r["doc_id"]: r for r in tq.keywords_tfidf(corpus, k=5).collect()}
    assert len(out) == corpus.count()  # total: every doc has a row
    for r in out.values():
        assert list(r["scores"]) == sorted(r["scores"], reverse=True)
    # independent recompute for one non-empty doc
    toks = {
        r["doc_id"]: r["t"]
        for r in corpus.select("doc_id", tokens("text").alias("t")).collect()
    }
    n = len(toks)
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    did = next(d for d, ts in sorted(toks.items()) if len(ts) > 10)
    tf = {}
    for t in toks[did]:
        tf[t] = tf.get(t, 0) + 1
    scored = sorted(
        (
            (-round(c * math.log((n + 1.0) / (df[t] + 1.0)) * 100000), t)
            for t, c in tf.items()
        )
    )
    assert list(out[did]["keywords"]) == [t for _, t in scored[:5]]
    empties = [d for d, ts in toks.items() if not ts]
    for d in empties:
        assert list(out[d]["keywords"]) == [] and list(out[d]["scores"]) == []


def test_url_quality_filter_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.operators import training

    got = training.url_quality_filter(load_corpus(spark, sf_dir))
    want = duck.execute(training.url_quality_filter_sql()).df()
    assert_same(got, want)


def test_url_quality_filter_rule_order_and_rules(spark):
    """Crafted URLs exercise every rule (the synthetic corpus never has
    a deep path) and first-match-wins ordering: a blocked host that
    also contains a banned substring reports blocked_host."""
    from telegram2elastic_spark.operators import training

    rows = [
        (1, "https://site666.example/page/1"),        # blocked AND banned
        (2, "https://ok.example/casino/page"),        # banned substring
        (3, "https://ok.example/a/b/c/d/e/f"),        # too deep (6 > 4)
        (4, "https://ok.example/a/b/c/d"),            # exactly max -> keep
        (5, "https://ok.example"),                    # no path -> keep
        (6, "https://ok.example/page/7"),             # keep
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    out = {
        r["doc_id"]: r["verdict"]
        for r in training.url_quality_filter(df).collect()
    }
    assert out == {
        1: "blocked_host",
        2: "banned_substring",
        3: "path_too_deep",
        4: "keep",
        5: "keep",
        6: "keep",
    }


def test_budget_select_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.operators import training

    for budget in (1000, 5000):
        got = training.budget_select(load_corpus(spark, sf_dir), budget)
        want = duck.execute(training.budget_select_sql(budget)).df()
        assert_same(got, want)


def test_budget_select_everything_fits(spark, duck, sf_dir):
    from telegram2elastic_spark.operators import training

    budget = 10_000_000  # cutoff never arms
    got = training.budget_select(load_corpus(spark, sf_dir), budget)
    want = duck.execute(training.budget_select_sql(budget)).df()
    assert_same(got, want)
    # every token-bearing doc selected
    from telegram2elastic_spark.functions.tokenizer import tokens

    n = (
        load_corpus(spark, sf_dir)
        .filter(F.size(tokens("text")) > 0)
        .count()
    )
    assert got.count() == n


def test_budget_select_greedy_prefix_semantics(spark, sf_dir):
    """Selected mass <= budget; the selection is exactly the maximal
    prefix of (q desc, doc_id asc) order (independent recompute)."""
    from telegram2elastic_spark.functions.tokenizer import tokens
    from telegram2elastic_spark.operators import training

    budget = 3000
    corpus = load_corpus(spark, sf_dir)
    sel = training.budget_select(corpus, budget).collect()
    assert sum(r["n_tok"] for r in sel) <= budget
    rows = (
        corpus.select("doc_id", tokens("text").alias("t"))
        .filter(F.size("t") > 0)
        .collect()
    )
    order = sorted(
        (
            (-(1000 * len(set(r["t"])) // len(r["t"])), r["doc_id"], len(r["t"]))
            for r in rows
        )
    )
    cs, expect = 0, []
    for _nq, did, nt in order:
        if cs + nt > budget:
            break
        cs += nt
        expect.append(did)
    assert sorted(r["doc_id"] for r in sel) == sorted(expect)


def test_dedup_cross_snapshot_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.operators import dedup

    got = dedup.dedup_cross_snapshot(load_corpus(spark, sf_dir))
    want = duck.execute(dedup.dedup_cross_snapshot_sql()).df()
    assert len(want) > 0  # the pair is non-trivial on this corpus
    assert_same(got, want)


def test_dedup_cross_snapshot_orientation(spark, sf_dir):
    """Flagged docs are all NEW-snapshot docs, anchors are all PRIOR-
    snapshot docs, and every (new_doc, dup_of) really crosses the
    verified near-dup relation (subset of ngram_jaccard_pairs)."""
    from telegram2elastic_spark.operators import dedup

    corpus = load_corpus(spark, sf_dir)
    out = dedup.dedup_cross_snapshot(corpus).collect()
    assert out
    snap = {
        r["doc_id"]: int(r["source"][3:])
        for r in corpus.select("doc_id", "source").collect()
    }
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(corpus, 0.5).collect()
    }
    for r in out:
        assert snap[r["new_doc"]] >= dedup.SNAPSHOT_SPLIT
        assert snap[r["dup_of"]] < dedup.SNAPSHOT_SPLIT
        a, b = sorted((r["new_doc"], r["dup_of"]))
        assert (a, b) in pairs
        assert r["max_jaccard"] >= 0.5


def test_dedup_cross_snapshot_cap_exact_at_driver_scale(spark, sf_dir):
    """At driver scale every new doc has <= cap candidates, so the
    capped default equals the effectively-uncapped form."""
    from telegram2elastic_spark.operators import dedup

    corpus = load_corpus(spark, sf_dir)
    capped = dedup.dedup_cross_snapshot(corpus).collect()
    uncapped = dedup.dedup_cross_snapshot(
        corpus, max_candidates=1_000_000
    ).collect()
    assert [tuple(r) for r in capped] == [tuple(r) for r in uncapped]


def test_geo_shape_vs_oracle_all_relations(spark, duck, sf_dir):
    from telegram2elastic_spark.query import geo

    for rel in geo.GEO_SHAPE_RELATIONS:
        got = geo.geo_shape_page(load_corpus(spark, sf_dir), relation=rel)
        want = duck.execute(geo.geo_shape_sql(relation=rel)).df()
        assert_same(got, want)


def test_geo_shape_relation_algebra(spark, sf_dir):
    """within => intersects; disjoint is the complement of intersects;
    a tiny query envelope inside a doc's shape is 'contains'-matched by
    that doc (independent recompute of one doc's envelope)."""
    from telegram2elastic_spark.query import geo

    corpus = load_corpus(spark, sf_dir)
    big = 10_000_000
    ids = lambda rel, env=(40.0, 55.0, 0.0, 30.0): {
        r["doc_id"]
        for r in geo.geo_shape_page(corpus, env, rel, k=big).collect()
    }
    inter, within, disj = ids("intersects"), ids("within"), ids("disjoint")
    assert within <= inter
    assert inter.isdisjoint(disj)
    assert len(inter) + len(disj) == corpus.count()
    # derive doc 7's envelope and query a point-ish envelope inside it
    d = 7
    lat_c = (d * 7919) % 18000 - 9000
    lon_c = (d * 104729) % 36000 - 18000
    env = (lat_c / 100.0, lat_c / 100.0 + 0.01,
           lon_c / 100.0, lon_c / 100.0 + 0.01)
    assert d in ids("contains", env)


def test_significant_terms_bg_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.query import facets

    got = facets.significant_terms(
        load_corpus(spark, sf_dir), q="merge", min_score=10.0, k=15,
        background_lang="en",
    )
    want = duck.execute(
        facets.significant_terms_sql(
            q="merge", min_score=10.0, k=15, background_lang="en"
        )
    ).df()
    assert_same(got, want)
    # restricted background really changes the ranking vs the global one
    base = facets.significant_terms(
        load_corpus(spark, sf_dir), q="merge", min_score=10.0, k=15
    ).collect()
    assert [r["term"] for r in got.collect()] != [r["term"] for r in base] or [
        r["jlh"] for r in got.collect()
    ] != [r["jlh"] for r in base]


def test_significant_terms_bg_rejects_index(spark, sf_dir):
    import pytest as _pytest

    from telegram2elastic_spark.query import facets

    with _pytest.raises(ValueError):
        facets.significant_terms(
            load_corpus(spark, sf_dir), q="merge",
            index={"term_dict": None, "stats": None}, background_lang="en",
        )


def test_shard_shuffle_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.operators import training

    got = training.shard_shuffle(load_corpus(spark, sf_dir), 8, epoch=1)
    want = duck.execute(training.shard_shuffle_sql(8, epoch=1)).df()
    assert_same(got, want)


def test_shard_shuffle_properties(spark, sf_dir):
    """Total (every doc exactly once), positions are dense 1..|shard|,
    epochs give different orders but identical shard sizes when the
    same hash seeds differ, and the op is reproducible run-to-run."""
    from telegram2elastic_spark.operators import training

    corpus = load_corpus(spark, sf_dir)
    e0 = training.shard_shuffle(corpus, 8, epoch=0).collect()
    e0b = training.shard_shuffle(corpus, 8, epoch=0).collect()
    assert e0 == e0b  # reproducible, no RNG
    assert len(e0) == corpus.count()
    bys = {}
    for r in e0:
        bys.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in bys.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    e1 = training.shard_shuffle(corpus, 8, epoch=1).collect()
    assert [r["doc_id"] for r in e0] != [r["doc_id"] for r in e1]
