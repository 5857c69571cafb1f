"""ES function_score: BM25 * gauss recency decay (+ field_value_factor),
relational vs index-backed vs DuckDB oracle."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import funcscore as fs

from .oracle import assert_same

TERMS = ["spark", "merge"]


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=4)


@pytest.mark.parametrize("fvf", [None, 0.5])
def test_relational_vs_oracle(spark, duck, sf_dir, fvf):
    got = fs.function_score_topk(
        load_corpus(spark, sf_dir), TERMS, k=10, fvf_factor=fvf
    )
    want = duck.execute(fs.function_score_sql(TERMS, k=10, fvf_factor=fvf)).df()
    assert_same(got, want)


@pytest.mark.parametrize("fvf", [None, 0.5])
def test_indexed_identical_to_relational(spark, sf_dir, idx, fvf):
    corpus = load_corpus(spark, sf_dir)
    rel = fs.function_score_topk(corpus, TERMS, k=10, fvf_factor=fvf).collect()
    ind = fs.function_score_topk(
        corpus, TERMS, k=10, index=idx, fvf_factor=fvf
    ).collect()
    assert [tuple(r) for r in rel] == [tuple(r) for r in ind]


def test_decay_demotes_old_docs(spark, sf_dir, idx):
    """Pure-BM25 rank vs decayed rank must differ when the corpus spans
    multiple decay scales — and every decayed score is <= its BM25 score
    (gauss multiplier <= 1, multiply boost_mode)."""
    from telegram2elastic_spark.query.wand import wand_topk

    corpus = load_corpus(spark, sf_dir)
    plain = {r["doc_id"]: r["score"] for r in wand_topk(idx, TERMS, k=200).collect()}
    dec = fs.function_score_topk(corpus, TERMS, k=200, index=idx).collect()
    assert all(r["score"] <= plain[r["doc_id"]] + 1e-9 for r in dec if r["doc_id"] in plain)
    # order actually changed somewhere in the ranking
    plain_order = [r for r, _ in sorted(plain.items(), key=lambda kv: (-kv[1], kv[0]))]
    dec_order = [r["doc_id"] for r in dec]
    assert plain_order[: len(dec_order)] != dec_order


def test_no_query_time_tokenize_in_indexed_plan(spark, sf_dir, tmp_path):
    """The serving plan must not re-tokenize the corpus: with a disk
    index, the plan scans postings + doc_map parquet only — no split()
    (the in-memory index's doc_map lineage would carry the build-time
    tokenize; the deployed artifact does not)."""
    from telegram2elastic_spark.index.build import read_index, write_index

    corpus = load_corpus(spark, sf_dir)
    out = str(tmp_path / "fsidx")
    write_index(build_index(corpus, n_doc_parts=4), out)
    disk = read_index(spark, out)
    plan = (
        fs.function_score_topk(corpus, TERMS, k=10, index=disk)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "split(" not in plan.lower()


def test_zero_hit_terms_empty(spark, sf_dir, idx):
    out = fs.function_score_topk(
        load_corpus(spark, sf_dir), ["zzznotaterm"], k=10, index=idx
    )
    assert out.count() == 0


# --------------------------- random_score (seeded, deterministic) ----------


def test_random_score_oracle_parity(spark, sf_dir, duck):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.query import funcscore as fs
    from tests.oracle import assert_same

    c = load_corpus(spark, sf_dir)
    for seed in ("42", "alpha"):
        df = fs.random_score_topk(c, seed=seed, k=15)
        assert_same(df, duck.execute(fs.random_score_sql(seed=seed, k=15)).fetchdf())


def test_random_score_seed_contract(spark, sf_dir):
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.query import funcscore as fs

    c = load_corpus(spark, sf_dir)
    a = [r.doc_id for r in fs.random_score_topk(c, "42", 15).collect()]
    b = [r.doc_id for r in fs.random_score_topk(c.repartition(7), "42", 15).collect()]
    c2 = [r.doc_id for r in fs.random_score_topk(c, "other", 15).collect()]
    assert a == b          # same seed: stable across partitionings
    assert a != c2         # different seed: different sample
    scores = [r.rscore for r in fs.random_score_topk(c, "42", 1000).collect()]
    assert all(0.0 <= s < 1.0 for s in scores)
