"""_delete_by_query / _update_by_query / _stats index maintenance."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index import maintenance as mt
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import bm25
from telegram2elastic_spark.query.wand import wand_topk

from .oracle import assert_same

Q = ["the", "data", "row"]


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=4)


def test_delete_by_query_filter_context(spark, duck, sf_dir, idx):
    """Deleting lang <> 'en' serves exactly the lang='en' filter-context
    ranking (stats frozen — Lucene live-docs semantics)."""
    got = wand_topk(mt.delete_by_query(idx, "lang <> 'en'"), Q, k=10)
    want = duck.execute(
        bm25.bm25_topk_sql(Q, k=10, lang="en", global_stats=True)
    ).df()
    assert_same(got, want)


def test_delete_is_copy_on_write(spark, sf_dir, idx):
    before = [tuple(r) for r in wand_topk(idx, Q, k=10).collect()]
    mt.delete_by_query(idx, "lang = 'en'")
    after = [tuple(r) for r in wand_topk(idx, Q, k=10).collect()]
    assert before == after  # input index untouched


def test_deletes_accumulate(spark, sf_dir, idx):
    i2 = mt.delete_by_query(idx, "lang = 'de'")
    i3 = mt.delete_by_query(i2, "lang = 'fr'")
    langs = {
        r["lang"]
        for r in idx["doc_map"]
        .join(
            wand_topk(i3, Q, k=500).select("doc_id"), "doc_id"
        )
        .select("lang")
        .distinct()
        .collect()
    }
    assert "de" not in langs and "fr" not in langs


def test_update_by_query_stored_field(spark, duck, sf_dir, idx):
    i2 = mt.update_by_query(idx, "lang = 'de'", {"lang": "'de-DE'"})
    got = wand_topk(i2, Q, k=10, doc_filter="lang = 'de-DE'")
    want = duck.execute(
        bm25.bm25_topk_sql(Q, k=10, lang="de", global_stats=True)
    ).df()
    assert_same(got, want)
    # old tag is gone from the updated doc_map
    assert i2["doc_map"].filter("lang = 'de'").count() == 0


def test_index_stats_vs_oracle(spark, duck, sf_dir, idx):
    got = mt.index_stats(idx)
    want = duck.execute(mt.index_stats_sql(n_deleted=0)).df()
    assert_same(got, want)


def test_index_stats_counts_tombstones(spark, sf_dir, idx):
    n_de = idx["doc_map"].filter("lang = 'de'").count()
    st = mt.index_stats(mt.delete_by_query(idx, "lang = 'de'")).first()
    assert st["n_deleted"] == n_de
    assert st["n_live"] == st["n_docs"] - n_de


class TestReindex:
    """ES _reindex: doc-store -> fresh build, query filter + script."""

    def _store_and_index(self, spark, sf_dir, tmp_path):
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.index.build import build_index, write_doc_store

        corpus = load_corpus(spark, sf_dir)
        root = str(tmp_path / "idxroot")
        write_doc_store(corpus, root, n_files=4)
        idx = build_index(corpus, n_doc_parts=4)
        idx["_doc_store_dir"] = f"{root}/doc_store"
        return corpus, idx

    def test_full_copy_rank_identity(self, spark, sf_dir, tmp_path):
        from telegram2elastic_spark.index.maintenance import reindex
        from telegram2elastic_spark.query.wand import wand_topk

        _, idx = self._store_and_index(spark, sf_dir, tmp_path)
        new = reindex(idx)
        a = [(r["doc_id"], r["score"])
             for r in wand_topk(idx, ["spark", "merge"], k=10).collect()]
        b = [(r["doc_id"], r["score"])
             for r in wand_topk(new, ["spark", "merge"], k=10).collect()]
        assert a == b

    def test_query_filter_matches_filtered_build(self, spark, sf_dir, tmp_path):
        from telegram2elastic_spark.index.build import build_index
        from telegram2elastic_spark.index.maintenance import reindex
        from telegram2elastic_spark.query.wand import wand_topk

        corpus, idx = self._store_and_index(spark, sf_dir, tmp_path)
        new = reindex(idx, predicate="lang = 'en'")
        direct = build_index(corpus.filter("lang = 'en'"), n_doc_parts=4)
        a = [(r["doc_id"], r["score"])
             for r in wand_topk(new, ["spark", "merge"], k=10).collect()]
        b = [(r["doc_id"], r["score"])
             for r in wand_topk(direct, ["spark", "merge"], k=10).collect()]
        assert a == b

    def test_script_rewrites_text_and_reanalyzes(self, spark, sf_dir, tmp_path):
        from telegram2elastic_spark.index.maintenance import reindex
        from telegram2elastic_spark.query.wand import wand_topk

        _, idx = self._store_and_index(spark, sf_dir, tmp_path)
        new = reindex(
            idx, set_exprs={"text": "concat(text, ' reindexmark')"}
        )
        n_docs = new["stats"].first()["n_docs"]
        hits = wand_topk(new, ["reindexmark"], k=int(n_docs) + 5)
        assert hits.count() == n_docs  # every live doc got the new term

    def test_skips_tombstoned_docs(self, spark, sf_dir, tmp_path):
        from telegram2elastic_spark.index.maintenance import delete_by_query, reindex

        _, idx = self._store_and_index(spark, sf_dir, tmp_path)
        deleted = delete_by_query(idx, "doc_id < 50")
        new = reindex(deleted)
        assert new["doc_map"].filter("doc_id < 50").count() == 0
        assert new["doc_map"].count() == idx["doc_map"].count() - 50

    def test_requires_doc_store(self, spark, sf_dir):
        import pytest
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.index.build import build_index
        from telegram2elastic_spark.index.maintenance import reindex

        idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4)
        with pytest.raises(ValueError):
            reindex(idx)
