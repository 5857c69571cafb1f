"""Round-4 session-6 additions: block dedup, Gopher rules, stratified
sampling, rank_feature, pinned query, boxplot/t_test aggs, terms lookup."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.operators import aggregates as ag
from telegram2elastic_spark.operators import dedup as dd
from telegram2elastic_spark.operators import enrichment as en
from telegram2elastic_spark.operators import training as tr
from telegram2elastic_spark.query import boosting as bq
from telegram2elastic_spark.query import parentchild as pc

from .oracle import assert_same


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=4)


# --- dedup_blocks -------------------------------------------------------------


def test_dedup_blocks_vs_oracle(spark, duck, sf_dir):
    got = dd.dedup_blocks(load_corpus(spark, sf_dir))
    want = duck.execute(dd.dedup_blocks_sql()).df()
    assert (want.blocks_dropped > 0).any(), "corpus must exercise drops"
    assert_same(got, want)


def test_dedup_blocks_keep_first_semantics(spark, sf_dir):
    """Every doc survives (row per doc), total kept blocks == number of
    DISTINCT blocks in the corpus, and the earliest doc never drops."""
    from pyspark.sql import functions as F

    c = load_corpus(spark, sf_dir)
    out = dd.dedup_blocks(c)
    assert out.count() == c.count()
    first = out.orderBy("doc_id").first()
    assert first["blocks_dropped"] == 0  # doc 0 is globally first
    kept_col = out.agg(F.sum("blocks_kept")).first()[0]
    total = out.agg(
        F.sum(F.col("blocks_kept") + F.col("blocks_dropped"))
    ).first()[0]
    assert 0 < kept_col < total


# --- quality_gopher -----------------------------------------------------------


def test_quality_gopher_vs_oracle(spark, duck, sf_dir):
    got = tr.quality_gopher(load_corpus(spark, sf_dir))
    want = duck.execute(tr.quality_gopher_sql()).df()
    assert want.passes.any() and (~want.passes).any(), "need both verdicts"
    assert_same(got, want)


def test_quality_gopher_reason_order_deterministic(spark, sf_dir):
    """fail_reasons is ordered by rule position, not data order."""
    rows = tr.quality_gopher(load_corpus(spark, sf_dir)).collect()
    order = {"word_count": 0, "mean_word_len": 1, "repetition": 2,
             "stop_tokens": 3}
    for r in rows:
        rs = list(r["fail_reasons"])
        assert rs == sorted(rs, key=order.__getitem__)
        assert r["passes"] == (len(rs) == 0)


# --- stratified_sample --------------------------------------------------------


def test_stratified_sample_vs_oracle(spark, duck, sf_dir):
    got = tr.stratified_sample(load_corpus(spark, sf_dir))
    want = duck.execute(tr.stratified_sample_sql()).df()
    assert_same(got, want)


def test_stratified_sample_rates_monotone(spark, sf_dir):
    """Halving a stratum's rate can only shrink that stratum's sample,
    and the kept set is nested (hash membership is a pure function)."""
    c = load_corpus(spark, sf_dir)
    full = {r["doc_id"] for r in tr.stratified_sample(
        c, rates={"en": 600}, default_rate=400).collect()}
    half = {r["doc_id"] for r in tr.stratified_sample(
        c, rates={"en": 300}, default_rate=200).collect()}
    assert half <= full
    assert len(half) < len(full)


# --- rank_feature -------------------------------------------------------------


@pytest.mark.parametrize("func", ["saturation", "log", "sigmoid"])
def test_rank_feature_vs_oracle(spark, duck, sf_dir, index, func):
    got = bq.rank_feature_topk(index, ["spark", "merge"], func=func)
    want = duck.execute(bq.rank_feature_sql(["spark", "merge"], func=func)).df()
    assert_same(got, want)


def test_rank_feature_bad_func(index):
    with pytest.raises(ValueError):
        bq.rank_feature_topk(index, ["spark"], func="linear")


# --- pinned -------------------------------------------------------------------


def test_pinned_vs_oracle(spark, duck, sf_dir, index):
    got = bq.pinned_topk(index, ["spark", "merge"], [42, 7, 400])
    want = duck.execute(bq.pinned_sql(["spark", "merge"], [42, 7, 400])).df()
    assert_same(got, want)


def test_pinned_empty_pins_is_organic(spark, duck, sf_dir, index):
    got = bq.pinned_topk(index, ["spark", "merge"], [])
    want = duck.execute(bq.pinned_sql(["spark", "merge"], [])).df()
    assert_same(got, want)


def test_pinned_contract(spark, sf_dir, index):
    """Pinned ids lead in the GIVEN order (not id order), are returned
    even when they do not match the organic query, and never reappear in
    the organic tail."""
    pins = [400, 7, 42]
    rows = bq.pinned_topk(index, ["zzznotaterm"], pins, k=10).collect()
    # organic query matches nothing -> exactly the pins, in order
    assert [r["doc_id"] for r in rows] == pins
    assert all(r["pinned"] and r["score"] is None for r in rows)
    rows = bq.pinned_topk(index, ["spark", "merge"], pins, k=10).collect()
    assert [r["doc_id"] for r in rows[:3]] == pins
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    organic = [r["doc_id"] for r in rows[3:]]
    assert not (set(organic) & set(pins))
    assert all(not r["pinned"] for r in rows[3:])


# --- boxplot / t_test ---------------------------------------------------------


def test_agg_boxplot_vs_oracle(spark, duck, sf_dir):
    got = ag.agg_boxplot(load_corpus(spark, sf_dir))
    want = duck.execute(ag.AGG_BOXPLOT_SQL).df()
    assert_same(got, want)


def test_agg_t_test_vs_oracle(spark, duck, sf_dir):
    got = ag.agg_t_test(load_corpus(spark, sf_dir))
    want = duck.execute(ag.agg_t_test_sql()).df()
    assert_same(got, want)


def test_agg_t_test_self_is_zero(spark, sf_dir):
    r = ag.agg_t_test(
        load_corpus(spark, sf_dir),
        filter_a="source = 'src0'",
        filter_b="source = 'src0'",
    ).first()
    assert r["t_value"] == 0.0 and r["n_a"] == r["n_b"]


# --- terms lookup -------------------------------------------------------------


def test_terms_lookup_vs_oracle(spark, duck, sf_dir):
    got = en.terms_lookup_page(load_corpus(spark, sf_dir))
    want = duck.execute(en.terms_lookup_page_sql()).df()
    assert_same(got, want)


def test_terms_lookup_excludes_seed_and_overlaps(spark, sf_dir):
    seed = 7
    rows = en.terms_lookup_page(
        load_corpus(spark, sf_dir), seed_doc_id=seed, limit=1000
    ).collect()
    assert seed not in {r["doc_id"] for r in rows}
    # overlap check against the seed's own topics derivation
    from pyspark.sql import functions as F

    c = load_corpus(spark, sf_dir)
    st = (
        c.filter(F.col("doc_id") == seed)
        .select(en._topics_array().alias("t"))
        .first()["t"]
    )
    for r in rows:
        assert set(r["topics"].split(",")) & set(st)


# --- lm filter / host caps / parent_id / top_metrics --------------------------


def test_lm_cross_entropy_vs_oracle(spark, duck, sf_dir):
    got = tr.lm_cross_entropy(load_corpus(spark, sf_dir))
    want = duck.execute(tr.lm_cross_entropy_sql()).df()
    assert want.keep.any() and (~want.keep).any(), "threshold must split"
    assert_same(got, want)


def test_lm_cross_entropy_scale_invariant_rank(spark, sf_dir):
    """Cross-entropy is a per-token average: replicating the corpus
    (doubled stats) must not change any doc's entropy beyond the Laplace
    smoothing shift — sanity: values are finite, positive, and the keep
    rule matches the threshold exactly."""
    rows = tr.lm_cross_entropy(load_corpus(spark, sf_dir)).collect()
    for r in rows:
        assert 0 < r["cross_entropy"] < 20
        assert r["keep"] == (r["cross_entropy"] < tr.LM_KEEP_BELOW)


def test_cap_per_host_vs_oracle(spark, duck, sf_dir):
    got = tr.cap_per_host(load_corpus(spark, sf_dir))
    want = duck.execute(tr.cap_per_host_sql()).df()
    assert_same(got, want)


def test_cap_per_host_semantics(spark, sf_dir):
    from pyspark.sql import functions as F

    out = tr.cap_per_host(load_corpus(spark, sf_dir), max_per_host=1,
                          limit=None)
    per = out.groupBy("host").count().agg(F.max("count")).first()[0]
    assert per == 1


def test_parent_id_vs_oracle(spark, duck, sf_dir):
    got = pc.parent_id_page(load_corpus(spark, sf_dir))
    want = duck.execute(pc.parent_id_page_sql()).df()
    assert len(want) >= 1
    assert_same(got, want)


def test_agg_top_metrics_vs_oracle(spark, duck, sf_dir):
    got = ag.agg_top_metrics(load_corpus(spark, sf_dir))
    want = duck.execute(ag.agg_top_metrics_sql()).df()
    assert_same(got, want)


# --- multimodal frame sampling / feature extraction ---------------------------


def test_frame_sample_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.operators import multimodal as mm

    got = mm.frame_sample(load_corpus(spark, sf_dir))
    want = duck.execute(mm.frame_sample_sql()).df()
    assert (want.groupby("doc_id").size() > 1).any(), "fan-out must occur"
    assert_same(got, want)


def test_frame_sample_windowing(spark, sf_dir):
    """Every frame's offset is a stride multiple, frame count caps at
    max_frames, and short payloads produce zero frames."""
    from telegram2elastic_spark.operators import multimodal as mm

    rows = mm.frame_sample(
        load_corpus(spark, sf_dir), frame_size=1000, stride=100, max_frames=2
    ).collect()
    per = {}
    for r in rows:
        assert r["off"] % 100 == 0
        per.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(len(v) <= 2 for v in per.values())


def test_feature_extract_vs_oracle(spark, duck, sf_dir):
    from telegram2elastic_spark.operators import multimodal as mm

    got = mm.feature_extract(load_corpus(spark, sf_dir))
    want = duck.execute(mm.feature_extract_sql()).df()
    assert_same(got, want)


def test_feature_extract_dim_validation(spark, sf_dir):
    from telegram2elastic_spark.operators import multimodal as mm

    with pytest.raises(ValueError):
        mm.feature_extract(load_corpus(spark, sf_dir), dim=9)
    rows = mm.feature_extract(load_corpus(spark, sf_dir), dim=3).take(3)
    assert all(len(r["features"]) == 3 for r in rows)
    assert all(0.0 <= f <= 1.0 for r in rows for f in r["features"])
