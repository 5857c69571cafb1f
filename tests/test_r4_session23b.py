"""Session-23 batch 2: script_fields/script sort, ILM rollover plan,
Heaps-law vocab growth, stream-stream interval join."""

import pytest
from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import load_corpus, load_events
from telegram2elastic_spark.functions import text_quality as tq
from telegram2elastic_spark.index import maintenance as maint
from telegram2elastic_spark.query import scriptscore as ss
from telegram2elastic_spark.streaming import windows as W

from .oracle import assert_same

SCRIPTS = {
    "age_days": "(1700000000 - doc['epoch'].value) / 86400",
    "len_log": "Math.log(doc['doc_len'].value + 1)",
}
SORT = (
    "Math.log(doc['doc_len'].value + 1) * 10 "
    "- (1700000000 - doc['epoch'].value) / 8640000"
)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_corpus(spark, sf_dir)


# --- script_fields ---------------------------------------------------------------

def test_script_fields_sorted_vs_oracle(corpus, duck):
    got = ss.script_fields_page(corpus, SCRIPTS, SORT, k=15)
    want = duck.execute(ss.script_fields_page_sql(SCRIPTS, SORT, k=15)).df()
    assert_same(got, want)


def test_script_fields_unsorted_vs_oracle(corpus, duck):
    got = ss.script_fields_page(corpus, SCRIPTS, k=8)
    want = duck.execute(ss.script_fields_page_sql(SCRIPTS, k=8)).df()
    assert_same(got, want)


def test_script_fields_rejects_score_and_bad_scripts(corpus):
    with pytest.raises(ValueError, match="_score"):
        ss.script_fields_page(corpus, {"x": "_score * 2"})
    with pytest.raises(ValueError, match="_score"):
        ss.script_fields_page(corpus, SCRIPTS, sort_script="_score + 1")
    with pytest.raises(ValueError):
        ss.script_fields_page(corpus, {})
    with pytest.raises(ValueError):  # unknown field -> compile error
        ss.script_fields_page(corpus, {"x": "doc['nope'].value"})


def test_script_fields_plan_is_scan_plus_takeordered(corpus):
    """No shuffle, no UDF: the scripts must compile to native expressions
    over one scan."""
    plan = ss.script_fields_page(
        corpus, SCRIPTS, SORT, k=15
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    for bad in ("Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan


# --- ILM rollover ----------------------------------------------------------------

@pytest.mark.parametrize("md,ma", [(50, 40), (400, 45)])
def test_rollover_vs_oracle(corpus, duck, md, ma):
    got = maint.ilm_rollover(corpus, max_docs=md, max_age_min=ma)
    want = duck.execute(maint.ilm_rollover_sql(max_docs=md, max_age_min=ma)).df()
    assert_same(got, want)


def test_rollover_conditions(corpus):
    """Each condition isolated: a huge max_docs leaves only age rolls;
    a huge max_age leaves only doc-count rolls."""
    n = corpus.count()
    age_only = maint.ilm_rollover(corpus, max_docs=n + 1, max_age_min=60)
    rows = age_only.collect()
    assert sum(r["n_docs"] for r in rows) == n
    # every generation except possibly the last spans >= its age limit's
    # worth of buckets only when the next bucket would breach the limit;
    # invariant: no generation's span exceeds the limit
    import datetime as dt

    f = lambda s: dt.datetime.strptime(s, "%Y-%m-%d %H:%M")
    for r in rows:
        assert (f(r["end_min"]) - f(r["start_min"])).total_seconds() / 60 < 60
    docs_only = maint.ilm_rollover(corpus, max_docs=40, max_age_min=10**6)
    rows = docs_only.collect()
    assert sum(r["n_docs"] for r in rows) == n
    # no generation exceeds max_docs unless it is a single oversized bucket
    for r in rows:
        assert r["n_docs"] <= 40 or r["n_buckets"] == 1


def test_rollover_python_recompute(corpus):
    """Independent pure-Python fold over the minute buckets."""
    import datetime as dt

    buckets = sorted(
        (r["m"], r["n"])
        for r in corpus.groupBy(
            F.date_format(
                F.date_trunc("minute", "warc_ts"), "yyyy-MM-dd HH:mm"
            ).alias("m")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    md, ma = 50, 40
    f = lambda s: dt.datetime.strptime(s, "%Y-%m-%d %H:%M")
    gens = []
    for m, n in buckets:
        if (
            not gens
            or gens[-1][4] + n > md
            or (f(m) - f(gens[-1][1])).total_seconds() // 60 >= ma
        ):
            gens.append([len(gens) + 1, m, m, 1, n])
        else:
            g = gens[-1]
            g[2], g[3], g[4] = m, g[3] + 1, g[4] + n
    got = [
        (r["gen"], r["start_min"], r["end_min"], r["n_buckets"], r["n_docs"])
        for r in maint.ilm_rollover(corpus, max_docs=md, max_age_min=ma)
        .collect()
    ]
    assert got == [tuple(g) for g in gens]


def test_rollover_arg_validation(corpus):
    with pytest.raises(ValueError):
        maint.ilm_rollover(corpus, max_docs=0)


# --- vocab growth ----------------------------------------------------------------

@pytest.mark.parametrize("buckets", [4, 10])
def test_vocab_growth_vs_oracle(corpus, duck, buckets):
    got = tq.vocab_growth(corpus, buckets=buckets)
    want = duck.execute(tq.vocab_growth_sql(buckets=buckets)).df()
    assert_same(got, want)


def test_vocab_growth_monotone_and_total(corpus):
    rows = tq.vocab_growth(corpus, buckets=5).collect()
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4, 5]
    for a, b in zip(rows, rows[1:]):
        assert a["vocab_size"] <= b["vocab_size"]
        assert a["token_count"] < b["token_count"]
        assert a["n_docs"] < b["n_docs"]
    assert rows[-1]["n_docs"] == corpus.count()


def test_vocab_growth_crafted_curve(spark):
    """A corpus whose vocabulary genuinely grows: each doc introduces one
    new term; the curve must be exactly linear in docs."""
    docs = [(i, f"t{i} common word", "en", "src", 10) for i in range(20)]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    )
    from telegram2elastic_spark.corpus import as_corpus

    rows = tq.vocab_growth(as_corpus(df), buckets=4).collect()
    # 5 docs per bucket prefix; vocab = prefix_docs (new term each) + 2 shared
    assert [r["vocab_size"] for r in rows] == [7, 12, 17, 22]


def test_vocab_growth_arg_validation(corpus):
    with pytest.raises(ValueError):
        tq.vocab_growth(corpus, buckets=0)


# --- interval join ---------------------------------------------------------------

def test_interval_join_vs_oracle(spark, duck, sf_dir):
    got = W.purchases_after_signup(load_events(spark, sf_dir), within_min=60)
    want = duck.execute(W.purchases_after_signup_sql(within_min=60)).df()
    assert_same(got, want)


def test_interval_join_bounds(spark, sf_dir):
    rows = W.purchases_after_signup(
        load_events(spark, sf_dir), within_min=60, k=None
    ).collect()
    assert rows, "need at least one qualifying pair in testdata"
    for r in rows:
        assert 0 <= r["lag_sec"] <= 3600


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    """The watermarked stream-stream join must emit exactly the batch
    pairs (several micro-batches via a multi-file staging dir)."""
    epath = str(tmp_path / "events")
    load_events(spark, sf_dir).repartition(4).write.parquet(epath)
    got = [
        tuple(r)
        for r in W.run_interval_join_availablenow(
            spark, epath, str(tmp_path / "ckpt"), within_min=60
        ).collect()
    ]
    want = [
        tuple(r)
        for r in W.purchases_after_signup(
            load_events(spark, sf_dir), within_min=60, k=None
        ).collect()
    ]
    assert got == want and got
