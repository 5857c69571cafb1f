"""ES aggregations alongside hits: grouping-sets facets + significant_terms."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import facets

from .oracle import assert_same


FACET_CASES = [
    {"q": "merge", "min_score": 10.0},
    {"q": None, "min_score": None},        # whole (non-spam) corpus
    {"q": "zzzznotaterm", "min_score": None},  # empty foreground
]


@pytest.mark.parametrize("kw", FACET_CASES)
def test_search_facets_vs_oracle(spark, duck, sf_dir, kw):
    corpus = load_corpus(spark, sf_dir)
    got = facets.search_facets(corpus, **kw)
    want = duck.execute(facets.search_facets_sql(**kw)).df()
    assert_same(got, want)


def test_search_facets_single_pass(spark, sf_dir):
    """All facet dimensions + grand total share one Expand + one shuffle —
    not one aggregation job per dimension."""
    corpus = load_corpus(spark, sf_dir)
    plan = (
        facets.search_facets(corpus, q="merge")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") == 1
    assert "HashAggregate" in plan


def test_facet_totals_consistent(spark, sf_dir):
    """Grand total == sum of lang buckets == sum of source buckets."""
    corpus = load_corpus(spark, sf_dir)
    rows = facets.search_facets(corpus, q="merge").collect()
    total = [r["cnt"] for r in rows if r["lang"] is None and r["source"] is None]
    langs = sum(r["cnt"] for r in rows if r["lang"] is not None)
    sources = sum(r["cnt"] for r in rows if r["source"] is not None)
    assert len(total) == 1 and total[0] == langs == sources


@pytest.mark.parametrize("kw", [
    {"q": "merge", "min_score": 10.0, "k": 15},
    {"q": "spark", "min_score": None, "k": 20, "min_doc_count": 5},
])
def test_significant_terms_vs_oracle(spark, duck, sf_dir, kw):
    corpus = load_corpus(spark, sf_dir)
    got = facets.significant_terms(corpus, **kw)
    want = duck.execute(facets.significant_terms_sql(**kw)).df()
    assert_same(got, want)


def test_significant_terms_foreground_bias(spark, sf_dir):
    """The query term itself must rank as significant: every foreground
    doc contains it, so its fg% is maximal relative to bg%."""
    corpus = load_corpus(spark, sf_dir)
    rows = facets.significant_terms(corpus, q="merge", k=5).collect()
    assert rows[0]["term"] == "merge"
    assert all(r["jlh"] > 0 for r in rows)


def test_significant_terms_index_backed_matches(spark, duck, sf_dir):
    """Background stats from term_dict/stats == the corpus aggregation
    (df is the same quantity by construction), and both == the oracle."""
    from telegram2elastic_spark.index.build import build_index

    corpus = load_corpus(spark, sf_dir)
    idx = build_index(corpus, n_doc_parts=8)
    a = facets.significant_terms(corpus, q="merge", k=15).collect()
    b = facets.significant_terms(corpus, q="merge", k=15, index=idx).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    want = duck.execute(facets.significant_terms_sql(q="merge", k=15)).df()
    assert_same(
        facets.significant_terms(corpus, q="merge", k=15, index=idx), want
    )


# ---------------------------------------------------------------------------
# Composite aggregation (bucket pagination by after-key)


def test_composite_pages_cover_the_full_bucket_stream(spark, sf_dir):
    """Paging with after-cursors reproduces the one-shot bucket order:
    page1 + page2(after=page1[-1]) == first 2*size buckets."""
    corpus = load_corpus(spark, sf_dir)
    all20 = [
        tuple(r) for r in facets.facets_composite(corpus, size=20).collect()
    ]
    p1 = [tuple(r) for r in facets.facets_composite(corpus, size=10).collect()]
    cursor = (p1[-1][0], p1[-1][1])
    p2 = [
        tuple(r)
        for r in facets.facets_composite(corpus, size=10, after=cursor).collect()
    ]
    assert p1 + p2 == all20


def test_composite_matches_oracle(spark, duck, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    want = duck.execute(facets.facets_composite_sql(size=10)).df()
    assert_same(facets.facets_composite(corpus, size=10), want)


def test_composite_after_is_a_pushed_key_predicate(spark, sf_dir):
    """The cursor must reach the parquet scan as a pushed filter (page N
    cost == page 1 cost), not survive as a post-aggregation offset."""
    corpus = load_corpus(spark, sf_dir)
    plan = facets.facets_composite(
        corpus, size=10, after=("en", "src3")
    )._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    # the lang bound appears among the pushed filters, not only post-scan
    assert "GreaterThan(lang,en)" in plan or "lang" in plan.split(
        "PushedFilters"
    )[1][:400]


# ---------------------------------------------------------------------------
# Metric aggs: percentiles + KMV cardinality


def test_percentiles_matches_numpy(spark, sf_dir):
    import numpy as np

    corpus = load_corpus(spark, sf_dir)
    from telegram2elastic_spark.operators import aggregates as agg

    rows = {r["lang"]: r for r in agg.agg_percentiles(corpus).collect()}
    pdf = corpus.select("lang", "n_chars").toPandas()
    for lang, g in pdf.groupby("lang"):
        want = np.percentile(g["n_chars"].to_numpy(), [50, 95, 99])
        got = rows[lang]
        assert abs(got["p50"] - round(float(want[0]), 4)) < 1e-9
        assert abs(got["p95"] - round(float(want[1]), 4)) < 1e-9
        assert abs(got["p99"] - round(float(want[2]), 4)) < 1e-9


def test_cardinality_kmv_estimates_distinct_texts(spark, sf_dir):
    from telegram2elastic_spark.operators import aggregates as agg

    corpus = load_corpus(spark, sf_dir)
    exact = corpus.select("text").distinct().count()
    row = agg.agg_cardinality_kmv(corpus, k=32).collect()[0]
    # KMV with k=32 has ~1/sqrt(k-2) ~ 18% relative error; allow 3 sigma
    assert row["est_distinct"] == pytest.approx(exact, rel=0.55)
    assert row["k"] == 32


def test_cardinality_kmv_small_set_is_exact(spark):
    from telegram2elastic_spark.operators import aggregates as agg

    df = spark.createDataFrame(
        [(i, f"text-{i % 5}") for i in range(40)], "doc_id long, text string"
    )
    row = agg.agg_cardinality_kmv(df, k=32).collect()[0]
    # fewer distinct hashes than k: the sketch degrades to the exact count
    assert row["est_distinct"] == 5.0


# ---------------------------------------------------------------------------
# top_hits + dense date_histogram


def test_top_hits_matches_oracle(spark, duck, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    want = duck.execute(
        facets.facets_top_hits_sql(q="merge", min_score=10.0)
    ).df()
    assert_same(
        facets.facets_top_hits(corpus, q="merge", min_score=10.0), want
    )


def test_top_hits_rank_and_totals(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    rows = facets.facets_top_hits(corpus, q="merge", per_bucket=3).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(r["bucket_total"] >= len(rs) for r in rs)


def test_hourly_dense_matches_oracle(spark, duck, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    want = duck.execute(
        facets.timeline_hourly_dense_sql(q="merge", min_score=10.0)
    ).df()
    assert_same(
        facets.timeline_hourly_dense(corpus, q="merge", min_score=10.0), want
    )


def test_hourly_dense_emits_zero_buckets(spark):
    """min_doc_count=0 semantics: hours between the first and last hit
    with no documents still get a row (synthetic gappy frame — the
    testdata's 37 s stride never leaves an hour empty)."""
    df = spark.createDataFrame(
        [
            (0, "merge alpha", "en", "src0", 400),
            (1, "merge beta", "en", "src0", 400),
            (2, "merge gamma", "en", "src0", 400),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    from telegram2elastic_spark.corpus import as_corpus
    from pyspark.sql import functions as F

    # place hits at hours 0, 0, +3h: hours 1 and 2 must appear with 0
    corpus = as_corpus(df).withColumn(
        "warc_ts",
        F.when(F.col("doc_id") == 2, F.expr("timestamp '2022-01-01 03:30:00'"))
        .otherwise(F.expr("timestamp '2022-01-01 00:10:00'")),
    )
    out = facets.timeline_hourly_dense(corpus, q="merge").collect()
    assert [(r["hour"], r["n_docs"]) for r in out] == [
        ("2022-01-01 00:00", 2),
        ("2022-01-01 01:00", 0),
        ("2022-01-01 02:00", 0),
        ("2022-01-01 03:00", 1),
    ]


def test_hourly_dense_counts_side_is_broadcast(spark, sf_dir):
    """The axis (preserved outer side) must not be the broadcast build
    side; the counts side is.  Guards against the unsupported-hint
    regression (broadcast left of a left join is ignored by Spark)."""
    corpus = load_corpus(spark, sf_dir)
    df = facets.timeline_hourly_dense(corpus, q="merge", min_score=10.0)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_timeline_pipeline_matches_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.operators import aggregates as agg

    corpus = load_corpus(spark, sf_dir)
    want = duck.execute(agg.timeline_pipeline_sql()).df()
    assert_same(agg.timeline_pipeline(corpus), want)


def test_timeline_pipeline_semantics(spark, sf_dir):
    from telegram2elastic_spark.operators import aggregates as agg

    corpus = load_corpus(spark, sf_dir)
    rows = agg.timeline_pipeline(corpus, window=3).collect()
    # cumulative sum telescopes; first derivative is null; moving avg of
    # a full window equals the mean of the last 3 buckets
    total = 0
    for i, r in enumerate(rows):
        total += r["n_docs"]
        assert r["cum_docs"] == total
        if i == 0:
            assert r["deriv"] is None
        else:
            assert r["deriv"] == r["n_docs"] - rows[i - 1]["n_docs"]
        lo = max(0, i - 2)
        win = [x["n_docs"] for x in rows[lo : i + 1]]
        assert abs(r["moving_avg"] - round(sum(win) / len(win), 4)) < 1e-9


# ---------------------------------------------------------------------------
# rare_terms + filters agg


def test_rare_terms_index_matches_relational_and_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.index.build import build_index

    corpus = load_corpus(spark, sf_dir)
    idx = build_index(corpus, n_doc_parts=8)
    a = [tuple(r) for r in facets.rare_terms(corpus, 100, 20).collect()]
    b = [
        tuple(r)
        for r in facets.rare_terms(corpus, 100, 20, index=idx).collect()
    ]
    assert a == b and len(a) >= 1  # the corpus has a genuine tail term
    want = duck.execute(facets.rare_terms_sql(100, 20)).df()
    assert_same(facets.rare_terms(corpus, 100, 20, index=idx), want)


def test_agg_filters_matches_oracle_and_totals(spark, duck, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    want = duck.execute(facets.agg_filters_sql()).df()
    assert_same(facets.agg_filters(corpus), want)
    row = facets.agg_filters(corpus).collect()[0]
    # named buckets may overlap; `other` counts docs matching none
    n = corpus.count()
    assert 0 <= row["other"] <= n
    assert row["english"] + row["other"] <= n + row["long_doc"] + row["short_doc"]


class TestSignificanceHeuristics:
    """ES significant_terms alternative heuristics (mutual_information,
    chi_square) — NXY contingency cells with background_is_superset."""

    def test_chi_square_vs_oracle(self, spark, duck, sf_dir):
        from .oracle import assert_same

        assert_same(
            facets.significant_terms(
                load_corpus(spark, sf_dir), q="merge", min_score=10.0,
                k=15, heuristic="chi_square",
            ),
            duck.execute(
                facets.significant_terms_sql(
                    q="merge", min_score=10.0, k=15, heuristic="chi_square"
                )
            ).df(),
        )

    def test_mutual_information_vs_oracle(self, spark, duck, sf_dir):
        from .oracle import assert_same

        assert_same(
            facets.significant_terms(
                load_corpus(spark, sf_dir), q="merge", min_score=10.0,
                k=15, heuristic="mutual_information",
            ),
            duck.execute(
                facets.significant_terms_sql(
                    q="merge", min_score=10.0, k=15,
                    heuristic="mutual_information",
                )
            ).df(),
        )

    def test_cells_match_independent_python(self, spark, sf_dir):
        """chi2/MI recomputed from the returned counts + set sizes with
        plain Python floats must reproduce the scores."""
        import math

        c = load_corpus(spark, sf_dir)
        from telegram2elastic_spark.query.search import search_filtered

        fg_n = search_filtered(c, "merge", 10.0).count()
        bg_n = c.count()
        for heur in ("chi_square", "mutual_information"):
            rows = facets.significant_terms(
                c, q="merge", min_score=10.0, k=8, heuristic=heur
            ).collect()
            assert rows
            for r in rows:
                f, Fc = float(r["fg_count"]), float(r["bg_count"])
                n, N = float(fg_n), float(bg_n)
                n11, n01, n10 = f, Fc - f, n - f
                n00 = N - Fc - n + f
                if heur == "chi_square":
                    den = (n11 + n01) * (n11 + n10) * (n01 + n00) * (n10 + n00)
                    want = 0.0 if den == 0 else (
                        N * (n11 * n00 - n01 * n10) ** 2 / den
                    )
                else:
                    def cell(nxy, nx, ny):
                        return 0.0 if nxy == 0 else (
                            (nxy / N) * math.log2(N * nxy / (nx * ny))
                        )
                    want = (
                        cell(n11, Fc, n) + cell(n01, Fc, N - n)
                        + cell(n10, N - Fc, n) + cell(n00, N - Fc, N - n)
                    )
                assert abs(r["sig"] - want) < 1e-4, (heur, r)

    def test_gnd_and_percentage_vs_oracle(self, spark, duck, sf_dir):
        from .oracle import assert_same

        for heur in ("gnd", "percentage"):
            assert_same(
                facets.significant_terms(
                    load_corpus(spark, sf_dir), q="merge", min_score=10.0,
                    k=15, heuristic=heur,
                ),
                duck.execute(
                    facets.significant_terms_sql(
                        q="merge", min_score=10.0, k=15, heuristic=heur
                    )
                ).df(),
            )

    def test_gnd_percentage_match_independent_python(self, spark, sf_dir):
        import math

        c = load_corpus(spark, sf_dir)
        from telegram2elastic_spark.query.search import search_filtered

        fg_n = float(search_filtered(c, "merge", 10.0).count())
        bg_n = float(c.count())
        for heur in ("gnd", "percentage"):
            rows = facets.significant_terms(
                c, q="merge", min_score=10.0, k=8, heuristic=heur
            ).collect()
            assert rows
            for r in rows:
                f, Fc = float(r["fg_count"]), float(r["bg_count"])
                if heur == "percentage":
                    want = f / Fc
                    assert 0.0 < r["sig"] <= 1.0
                else:
                    den = math.log(bg_n) - min(math.log(Fc), math.log(fg_n))
                    ngd = (
                        max(math.log(Fc), math.log(fg_n)) - math.log(f)
                    ) / den
                    want = 0.0 if den == 0 else math.exp(-ngd)
                assert abs(r["sig"] - want) < 1e-4, (heur, r)

    def test_rankings_can_differ_from_jlh(self, spark, sf_dir):
        c = load_corpus(spark, sf_dir)
        jlh = [
            r["term"]
            for r in facets.significant_terms(
                c, q="merge", min_score=10.0, k=15
            ).collect()
        ]
        chi = [
            r["term"]
            for r in facets.significant_terms(
                c, q="merge", min_score=10.0, k=15, heuristic="chi_square"
            ).collect()
        ]
        assert jlh and chi  # both produce rankings over the same fg set

    def test_background_filter_rejected_for_nxy(self, spark, sf_dir):
        import pytest

        with pytest.raises(ValueError, match="subset"):
            facets.significant_terms(
                load_corpus(spark, sf_dir), q="merge",
                heuristic="chi_square", background_lang="en",
            )
        with pytest.raises(ValueError, match="unknown"):
            facets.significant_terms(
                load_corpus(spark, sf_dir), q="merge", heuristic="nope"
            )
