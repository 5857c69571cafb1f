"""Session-23 batch 3: mixture annealing schedule, max_inner_product
kNN, _mget envelope."""

import numpy as np
import pytest

from telegram2elastic_spark.corpus import as_corpus, load_corpus, load_embeddings
from telegram2elastic_spark.operators import similarity as sim
from telegram2elastic_spark.operators import training as trp
from telegram2elastic_spark.query import meta

from .oracle import assert_same

MGET_IDS = [3, 7, 42, 99999]


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_corpus(spark, sf_dir)


# --- mixture schedule -------------------------------------------------------------

@pytest.mark.parametrize("epochs,by", [(4, "lang"), (1, "lang"), (3, "source")])
def test_mixture_vs_oracle(corpus, duck, epochs, by):
    got = trp.mixture_schedule(corpus, epochs=epochs, by=by)
    want = duck.execute(trp.mixture_schedule_sql(epochs=epochs, by=by)).df()
    assert_same(got, want)


def test_mixture_anneal_direction(corpus):
    """The dominant group's share must fall monotonically across epochs,
    and every epoch's shares sum to PPM minus bounded floor drift."""
    rows = trp.mixture_schedule(corpus, epochs=4, by="lang").collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], {})[r["lang"]] = r["ppm"]
    langs = by_epoch[1]
    dominant = max(langs, key=langs.get)
    minority = min(langs, key=langs.get)
    dom = [by_epoch[e][dominant] for e in sorted(by_epoch)]
    mino = [by_epoch[e][minority] for e in sorted(by_epoch)]
    assert dom == sorted(dom, reverse=True) and dom[0] > dom[-1]
    assert mino == sorted(mino) and mino[0] < mino[-1]
    for e, shares in by_epoch.items():
        s = sum(shares.values())
        assert trp.MIX_PPM - len(shares) * 4 <= s <= trp.MIX_PPM


def test_mixture_python_recompute(corpus):
    import math

    hist = {
        r["lang"]: r["c"]
        for r in corpus.groupBy("lang").count().withColumnRenamed(
            "count", "c"
        ).collect()
    }
    C = sum(hist.values())
    S = sum(math.isqrt(c) for c in hist.values())
    E = 4
    exp = {}
    for lang, c in hist.items():
        p1 = c * trp.MIX_PPM // C
        p2 = math.isqrt(c) * trp.MIX_PPM // S
        for e in range(1, E + 1):
            exp[(e, lang)] = ((E - e) * p1 + (e - 1) * p2) // (E - 1)
    got = {
        (r["epoch"], r["lang"]): r["ppm"]
        for r in trp.mixture_schedule(corpus, epochs=E).collect()
    }
    assert got == exp


def test_mixture_arg_validation(corpus):
    with pytest.raises(ValueError):
        trp.mixture_schedule(corpus, epochs=0)
    with pytest.raises(ValueError):
        trp.mixture_schedule(corpus, by="nope")


# --- max_inner_product kNN ---------------------------------------------------------

@pytest.mark.parametrize("qid", [0, 7])
def test_mip_vs_oracle(spark, duck, sf_dir, qid):
    got = sim.knn_mip_topk(load_embeddings(spark, sf_dir), qid, k=10)
    want = duck.execute(sim.knn_mip_topk_sql(qid, k=10)).df()
    assert_same(got, want)


def test_mip_magnitude_matters(spark):
    """Unlike cosine, MIP must prefer the longer vector of two parallel
    ones — and the negative-dot transform keeps scores positive."""
    q = [1.0] * 4
    rows = [
        (0, q, 0),
        (1, [2.0] * 4, 0),         # parallel, long
        (2, [0.5] * 4, 0),         # parallel, short
        (3, [-1.0] * 4, 0),        # anti-parallel
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    got = sim.knn_mip_topk(df, 0, k=3).collect()
    assert [r["vec_id"] for r in got] == [1, 2, 3]
    assert all(r["score"] > 0 for r in got)
    # exact ES transform on the anti-parallel dot (-4): 1/(1-(-4)) = 0.2
    assert got[-1]["score"] == pytest.approx(0.2, abs=1e-9)


# --- _mget --------------------------------------------------------------------------

def test_mget_vs_oracle(corpus, duck):
    got = meta.mget_page(corpus, MGET_IDS)
    want = duck.execute(meta.mget_page_sql(MGET_IDS)).df()
    assert_same(got, want)


def test_mget_envelope(corpus):
    rows = meta.mget_page(corpus, [99999, 42]).collect()
    assert [r["doc_id"] for r in rows] == [42, 99999]
    assert rows[0]["found"] and not rows[1]["found"]
    assert rows[1]["url"] is None


def test_mget_arg_validation(corpus):
    with pytest.raises(ValueError):
        meta.mget_page(corpus, [])
    with pytest.raises(ValueError):
        meta.mget_page_sql([])


# --- serving twins (doc-store point reads) ------------------------------------

@pytest.fixture(scope="module")
def stored_index(spark, sf_dir, tmp_path_factory):
    from telegram2elastic_spark.index.build import (
        build_index, read_index, write_doc_store, write_index,
    )

    corpus = load_corpus(spark, sf_dir)
    d = str(tmp_path_factory.mktemp("s23idx"))
    write_index(build_index(corpus, n_doc_parts=4), d)
    write_doc_store(corpus, d, n_files=4)
    return read_index(spark, d)


def test_mget_local_matches_spark_pair(corpus, stored_index):
    from telegram2elastic_spark.query.docstore import mget_local

    got = mget_local(stored_index["_doc_store_dir"], MGET_IDS)
    want = [
        (r["doc_id"], r["found"], r["url"], r["lang"], r["n_chars"])
        for r in meta.mget_page(corpus, MGET_IDS).collect()
    ]
    assert got == want


def test_script_fields_local_matches_spark(corpus, stored_index):
    from telegram2elastic_spark.query.scriptscore import (
        script_fields_local, script_fields_page,
    )

    scripts = {
        "age_days": "(1700000000 - doc['epoch'].value) / 86400",
        "len_log": "Math.log(doc['doc_len'].value + 1)",
    }
    ids = [3, 7, 42, 999_999_999]  # last absent -> skipped
    got = script_fields_local(stored_index, ids, scripts)
    page = {
        r["doc_id"]: (r["age_days"], r["len_log"])
        for r in script_fields_page(corpus, scripts, k=10**6).collect()
    }
    assert [i for i, *_ in got] == [3, 7, 42]
    for i, age, ll in got:
        assert (age, ll) == page[i]


def test_script_fields_local_needs_store(corpus, spark, sf_dir):
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query.scriptscore import script_fields_local

    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    with pytest.raises(ValueError, match="doc_store"):
        script_fields_local(idx, [1], {"x": "doc['doc_len'].value"})


# --- quality ensemble + SLM retention -----------------------------------------

def test_quality_ensemble_vs_oracle(corpus, duck):
    got = trp.quality_ensemble(corpus)
    want = duck.execute(trp.quality_ensemble_sql()).df()
    assert_same(got, want)


def test_quality_ensemble_precedence(spark):
    """Crafted docs hit each stage in precedence order: a blocked URL
    fails at 'url' even though its text would also fail gopher; a
    repetitive-but-lexically-fine doc fails at 'repetition'."""
    # passes every gopher rule: 43 words, mean len ~6.5, all unique,
    # 3 stop-token hits
    good = "the a data " + " ".join(f"wordy{i:02d}" for i in range(40))
    # passes gopher (uniq 0.66, mean 6.2, stops ok) but the repeated
    # "winter storm" bigram covers ~1/3 of the characters -> repetition
    rep = (
        "the a data "
        + " ".join(f"wordy{i:02d}" for i in range(30))
        + " " + "winter storm " * 10
    )
    rows = [
        (0, good, "en", "src", len(good)),
        (1, good, "en", "src", len(good)),
        (2, rep, "en", "src", len(rep)),
        (3, "tiny", "en", "src", 4),  # gopher: too few words
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    )
    c = as_corpus(df)
    from pyspark.sql import functions as F

    blocked = c.withColumn(
        "url",
        F.when(F.col("doc_id") == 1,
               F.lit("https://site666.example/page/1")).otherwise(
            F.col("url")
        ),
    )
    from telegram2elastic_spark.operators.training import URL_BLOCKED_HOSTS

    assert "site666.example" in URL_BLOCKED_HOSTS
    rows = {r["doc_id"]: r for r in trp.quality_ensemble(blocked).collect()}
    assert rows[0]["keep"] and rows[0]["stage"] is None
    assert rows[1]["stage"] == "url" and rows[1]["reason"] == "blocked_host"
    assert rows[2]["stage"] == "repetition"
    assert rows[3]["stage"] == "gopher"


@pytest.mark.parametrize("exp,mn,mx", [(120, 5, 100), (60, 3, 500)])
def test_slm_vs_oracle(corpus, duck, exp, mn, mx):
    from telegram2elastic_spark.index import maintenance as maint

    got = maint.slm_retention(
        corpus, expire_after_min=exp, min_count=mn, max_count=mx
    )
    want = duck.execute(
        maint.slm_retention_sql(
            expire_after_min=exp, min_count=mn, max_count=mx
        )
    ).df()
    assert_same(got, want)


def test_slm_rule_semantics(corpus):
    from telegram2elastic_spark.index import maintenance as maint

    rows = maint.slm_retention(
        corpus, expire_after_min=120, min_count=5, max_count=100
    ).collect()
    by_rank = {r["rank"]: r for r in rows}
    n = len(rows)
    # min_count newest always kept, even when expired
    for rk in range(1, 6):
        assert by_rank[rk]["action"] == "keep"
    # every kept non-min_count snapshot is younger than expiry AND
    # within max_count; every deletion has a rule reason
    for r in rows:
        if r["action"] == "keep" and r["reason"] == "retained":
            assert r["age_min"] < 120 and r["rank"] <= 100
        if r["action"] == "delete":
            assert r["reason"] in ("expired", "max_count")
            assert r["rank"] > 5
    assert sum(1 for r in rows if r["action"] == "keep") <= max(5, 100)
    with pytest.raises(ValueError):
        maint.slm_retention(corpus, expire_after_min=0)
    with pytest.raises(ValueError):
        maint.slm_retention(corpus, min_count=10, max_count=5)


# --- online LSH dedup ----------------------------------------------------------

def test_lsh_dup_flags_vs_oracle(corpus, duck):
    from telegram2elastic_spark.operators import dedup as ddp

    got = ddp.lsh_dup_flags(corpus)
    want = duck.execute(ddp.lsh_dup_flags_sql()).df()
    assert_same(got, want)


def test_lsh_flags_agree_with_pairs(corpus):
    """Orientation check vs the verified candidate-pair relation: a doc
    is flagged iff it appears as the LATER side of some LSH pair, and
    dup_of is its earliest partner."""
    from telegram2elastic_spark.operators import dedup as ddp

    pairs = ddp.minhash_lsh_pairs(corpus).collect()
    earliest = {}
    for r in pairs:
        b = r["doc_b"]
        earliest[b] = min(earliest.get(b, b), r["doc_a"])
    flags = ddp.lsh_dup_flags(corpus).collect()
    for f in flags:
        if f["is_dup"]:
            assert f["dup_of"] == earliest[f["doc_id"]]
        else:
            assert f["doc_id"] not in earliest


def test_stateless_sig_cols_equal_agg_signatures(corpus):
    from pyspark.sql import functions as F

    from telegram2elastic_spark.functions.tokenizer import tokens
    from telegram2elastic_spark.operators import dedup as ddp

    a = (
        corpus.select("doc_id", tokens("text").alias("toks"))
        .filter(F.size("toks") >= 3)
        .select("doc_id", *ddp.minhash_sig_cols(8))
        .orderBy("doc_id")
        .collect()
    )
    b = ddp.minhash_signatures(corpus, 8).orderBy("doc_id").collect()
    assert a == b


def test_streaming_lsh_dedup_equals_batch(spark, sf_dir, tmp_path):
    """Bucket minima as operator state: in-order micro-batch delivery
    reproduces the batch verdicts exactly (cross-batch state carries the
    earlier buckets)."""
    import os
    import time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from telegram2elastic_spark.operators import dedup as ddp
    from telegram2elastic_spark.streaming import windows as W2

    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    docs = docs.sort_values("doc_id")
    sd = str(tmp_path / "stream")
    os.makedirs(sd)
    n = len(docs)
    step = n // 3 + 1
    for i, lo in enumerate(range(0, n, step)):
        pq.write_table(
            pa.Table.from_pandas(
                docs.iloc[lo:lo + step], preserve_index=False
            ),
            os.path.join(sd, f"b{i}.parquet"),
        )
        time.sleep(1.1)  # distinct mtimes -> in-order triggers
    got = [
        tuple(r)
        for r in W2.run_lsh_dedup_availablenow(
            spark, sd, str(tmp_path / "ck")
        ).collect()
    ]
    want = [
        tuple(r)
        for r in ddp.lsh_dup_flags(load_corpus(spark, sf_dir)).collect()
    ]
    assert got == want and got
