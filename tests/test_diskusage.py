"""_disk_usage / _stats over the on-disk index layout."""

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index, write_index
from telegram2elastic_spark.index.diskusage import disk_usage, index_stats


def test_disk_usage_and_stats(spark, sf_dir, tmp_path):
    root = str(tmp_path / "idx")
    corpus = load_corpus(spark, sf_dir)
    idx = build_index(corpus, n_doc_parts=4, positions=True)
    write_index(idx, root)

    du = disk_usage(root)
    assert set(du["tables"]) >= {"doc_map", "postings", "term_dict", "stats"}
    assert du["total_bytes"] == sum(
        t["bytes"] for t in du["tables"].values()
    )
    post = du["tables"]["postings"]
    assert post["n_buckets"] >= 1
    assert post["bucket_bytes_max"] >= post["bucket_bytes_p50"]
    assert post["bucket_skew"] >= 1.0

    st = index_stats(root)
    assert st["n_docs"] == corpus.count()
    n_terms = idx["term_dict"].count()
    assert st["vocabulary"] == n_terms
    assert st["posting_blocks"] == idx["postings"].count()
    assert st["positions"] is True
    assert st["n_doc_parts"] == 4
    assert st["store_bytes"] > 0
    assert abs(
        st["avgdl"]
        - idx["stats"].select("avgdl").first()["avgdl"]
    ) < 1e-9


def test_cat_indices_over_alias_root(spark, sf_dir, tmp_path):
    from telegram2elastic_spark.index import aliases as al
    from telegram2elastic_spark.index.diskusage import cat_indices

    root = str(tmp_path / "cluster")
    corpus = load_corpus(spark, sf_dir)
    gen1 = al.alias_init(root, "web", created_at=0.0)
    write_index(build_index(corpus.limit(60), n_doc_parts=2), gen1)
    rolled, gen2 = al.rollover(
        spark, root, "web", max_docs=10, created_at=1.0
    )
    assert rolled
    write_index(
        build_index(corpus.limit(100), n_doc_parts=2),
        str(tmp_path / "cluster" / gen2),
    )
    rows = cat_indices(root)
    assert [r["index"] for r in rows] == ["web-000001", "web-000002"]
    assert rows[0]["docs"] == 60 and rows[1]["docs"] == 100
    assert rows[0]["is_write_index"] is False
    assert rows[1]["is_write_index"] is True
    assert all(r["store_bytes"] > 0 for r in rows)
