"""Physical-plan audits: the optimizations we claim must be visible in
`.explain` output — these tests guard against plan regressions.

(The `.explain(formatted)` review loop the build guide mandates, frozen
into assertions.)"""

import pytest
from pyspark.sql import functions as F

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index, read_index, write_index
from telegram2elastic_spark.query.bm25 import bm25_topk
from telegram2elastic_spark.query.wand import _postings_for_terms, wand_topk


def _plan(df, mode="formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


@pytest.fixture(scope="module")
def disk_index(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ix"))
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    write_index(idx, out)
    return read_index(spark, out)


def test_read_index_derives_doc_parts_without_meta(spark, sf_dir, tmp_path):
    """A pre-meta.json index (n_doc_parts != default) must not silently
    fall back to DEFAULT_DOC_PARTS — the salt modulus is derived from the
    postings so query-time doc filters keep the right per-salt routing."""
    import os

    out = str(tmp_path / "legacy_ix")
    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
    write_index(idx, out)
    os.remove(os.path.join(out, "meta.json"))
    legacy = read_index(spark, out)
    assert legacy["_n_doc_parts"] == 4
    # filtered query (per-salt filter shipping) stays correct
    got = [
        (r["doc_id"], r["score"])
        for r in wand_topk(legacy, ["the", "data"], k=10,
                           doc_filter="lang = 'en'").collect()
    ]
    want = [
        (r["doc_id"], r["score"])
        for r in wand_topk(idx, ["the", "data"], k=10,
                           doc_filter="lang = 'en'").collect()
    ]
    assert got == want and got


def test_corpus_filter_pushdown(spark, sf_dir):
    """lang/doc_id predicates must reach the parquet scan."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        (F.col("lang") == "en") & (F.col("doc_id") > 100)
    )
    plan = _plan(docs)
    assert "PushedFilters" in plan
    assert "IsNotNull(lang)" in plan or "EqualTo(lang,en)" in plan
    assert "GreaterThan(doc_id,100)" in plan


def test_column_pruning(spark, sf_dir):
    """A 2-column projection must not read all 5 columns (ReadSchema)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    plan = _plan(docs)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "text" not in read_schema[0]


def test_postings_scan_prunes_partitions_and_pushes_term(disk_index):
    """Query-side postings scan: term_bucket partition pruning + pushed
    term filter — a k-term query must not list all 64 bucket dirs."""
    post = _postings_for_terms(disk_index, ["spark", "merge"])
    plan = _plan(post)
    assert "PartitionFilters" in plan
    assert "term_bucket" in plan.split("PartitionFilters", 1)[1].split("\n")[0]
    assert "In(term, [merge,spark])" in plan or "In(term" in plan


def test_bm25_uses_codegen_and_broadcasts(spark, sf_dir):
    """Relational BM25 (tokenize-once plan, r6 literal-stats): whole-stage
    codegen, and the scoring pass carries NO join and NO exchange at all —
    the 1-row stats aggregate is collected eagerly and its (n, avgdl,
    df_i) are injected as double literals (r6: the broadcast subtree cost
    3 extra AQE stage-jobs per query; per-term tf remains array-side in
    the same projection — no explode, no per-term hash agg, no
    doc_len/term_df joins)."""
    df = bm25_topk(load_corpus(spark, sf_dir), ["spark", "merge"])
    # hot path must be 100% JVM: no row-Python or Arrow eval nodes anywhere
    # (with AQE the pre-execution plan hides WholeStageCodegen markers, so
    # assert the absence of Python instead — same property)
    simple = _plan(df, "simple")
    assert "BatchEvalPython" not in simple and "ArrowEvalPython" not in simple
    plan = _plan(df)
    # no join of any kind and no shuffle: stats are literals, the scoring
    # pass is scan -> project -> filter -> TakeOrdered
    assert "Join" not in plan
    assert "Exchange" not in plan
    # the corpus is tokenized ONCE: a single InMemoryTableScan feeds both
    # the stats aggregate and the scoring pass
    assert "InMemoryTableScan" in plan
    # top-k must be TakeOrdered (heap), never a global sort of all scores
    assert "TakeOrderedAndProject" in plan


def test_wand_url_join_is_broadcast(disk_index):
    """Top-k url lookup must broadcast the k-row side, never shuffle
    doc_map."""
    plan = _plan(wand_topk(disk_index, ["spark", "merge"], k=10))
    assert "BroadcastHashJoin" in plan
    # doc_map side must not be exchanged by a sort-merge join
    assert "SortMergeJoin" not in plan


def test_search_page_is_take_ordered_not_global_window(spark, sf_dir):
    """Offset pagination must bound the data with TakeOrderedAndProject
    before any ranking — never funnel the whole filtered set through an
    unpartitioned window."""
    from telegram2elastic_spark.query.search import search_page

    df = search_page(load_corpus(spark, sf_dir), q="merge", offset=5, limit=10)
    plan = _plan(df, "simple")
    assert "TakeOrderedAndProject" in plan
    # the only Window operates on the bounded (<= offset+limit) set, keyed
    # by a constant partition — the plan must show a partition spec
    win_lines = [l for l in plan.splitlines() if "Window" in l]
    assert all("partitionBy" not in l or "0" in l for l in win_lines)


def test_search_page_validates_reference_contract(spark, sf_dir):
    from telegram2elastic_spark.query.search import search_page

    corpus = load_corpus(spark, sf_dir)
    with pytest.raises(ValueError, match="limit"):
        search_page(corpus, limit=1001)
    with pytest.raises(ValueError, match="offset"):
        search_page(corpus, offset=-1)


def test_term_dict_lookup_prunes_partitions(disk_index):
    """idf lookups must also prune to the query terms' buckets."""
    from telegram2elastic_spark.query.wand import _bucketed

    td = _bucketed(disk_index, disk_index["term_dict"], ["spark"])
    plan = _plan(td)
    assert "PartitionFilters" in plan
    assert "term_bucket" in plan.split("PartitionFilters", 1)[1].split("\n")[0]


def test_driver_side_xxhash64_matches_spark(spark):
    """The pure-Python XXH64 used for cold-query bucket pruning must be
    bit-identical to Spark's xxhash64 expression (else partition pruning
    would silently scan the WRONG bucket and return no postings)."""
    import random
    import string

    from telegram2elastic_spark.functions.xxhash import xxhash64

    random.seed(7)
    terms = ["", "a", "the", "é", "你好", "x" * 31, "y" * 32, "z" * 100] + [
        "".join(random.choices(string.ascii_lowercase, k=random.randint(1, 48)))
        for _ in range(40)
    ]
    rows = {
        r["term"]: r["h"]
        for r in spark.createDataFrame([(t,) for t in terms], "term string")
        .select("term", F.xxhash64("term").alias("h"))
        .collect()
    }
    assert all(rows[t] == xxhash64(t) for t in terms)
