"""Session-12 ops: TSDB downsample, children agg, reverse_nested agg."""

import pytest

from telegram2elastic_spark.corpus import load_corpus, load_events
from telegram2elastic_spark.operators import aggregates as agg
from telegram2elastic_spark.query import nested, parentchild

from .oracle import assert_same


@pytest.mark.parametrize("hours", [1, 6, 24])
def test_downsample_vs_oracle(spark, duck, sf_dir, hours):
    got = agg.downsample(load_events(spark, sf_dir), interval_hours=hours)
    want = duck.execute(agg.downsample_sql(interval_hours=hours)).df()
    assert_same(got, want)


def test_downsample_bucket_alignment_and_mass(spark, sf_dir):
    """Buckets are aligned to the interval, doc_count mass is conserved
    (the _doc_count contract), and last_value picks the max event_id's
    value inside its bucket."""
    ev = load_events(spark, sf_dir)
    out = agg.downsample(ev, interval_hours=6)
    rows = out.collect()
    secs = 6 * 3600
    assert all(r["bucket_epoch"] % secs == 0 for r in rows)
    assert sum(r["doc_count"] for r in rows) == ev.count()
    # spot-check last_value for one (bucket, type) group
    r0 = rows[0]
    from pyspark.sql import functions as F

    grp = ev.filter(
        ((F.floor(F.unix_timestamp("ts") / secs) * secs) == r0["bucket_epoch"])
        & (F.col("event_type") == r0["event_type"])
    )
    last = grp.orderBy(F.desc("event_id")).select("value").first()[0]
    assert abs(r0["value_last"] - round(last, 5)) < 1e-9


def test_children_agg_vs_oracle(spark, duck, sf_dir):
    got = parentchild.children_agg(load_corpus(spark, sf_dir))
    want = duck.execute(parentchild.children_agg_sql()).df()
    assert_same(got, want)


def test_children_agg_partitions_parents(spark, sf_dir):
    """Every site lands in exactly one class and page mass is conserved
    (child-scope counts really are child counts, not parent counts)."""
    corpus = load_corpus(spark, sf_dir)
    rows = parentchild.children_agg(corpus).collect()
    n_hosts = corpus.selectExpr(
        "regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS h"
    ).distinct().count()
    assert sum(r["n_sites"] for r in rows) == n_hosts
    assert sum(r["n_pages"] for r in rows) == corpus.count()
    assert len(rows) >= 2  # thresholds actually split the distribution


def test_reverse_nested_vs_oracle(spark, duck, sf_dir):
    got = nested.reverse_nested_agg(load_corpus(spark, sf_dir))
    want = duck.execute(nested.reverse_nested_agg_sql()).df()
    assert_same(got, want)


def test_reverse_nested_counts_parent_once(spark):
    """The reverse_nested doc count: a parent with the term repeated 5x
    contributes 1 to n_parents (and 5 to total_freq)."""
    from telegram2elastic_spark.corpus import as_corpus

    docs = [
        (1, "merge merge merge merge merge", "en", "srcA", 29),
        (2, "merge once", "en", "srcB", 10),
        (3, "no match here", "en", "srcA", 13),
    ]
    spark_df = as_corpus(
        _spark_docs(docs)
    )
    out = {
        r["term"]: r
        for r in nested.reverse_nested_agg(spark_df, top=100).collect()
    }
    assert out["merge"]["n_parents"] == 2
    assert out["merge"]["total_freq"] == 6
    assert out["merge"]["n_sources"] == 2


def _spark_docs(rows):
    from telegram2elastic_spark.session import get_spark

    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


class TestSynonymAnalyzer:
    """Index-time synonym token filter (contracting form)."""

    GROUPS = {"merge": ["merge", "join", "combine"], "fast": ["fast", "quick"]}

    def test_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.functions import tokenizer as tokzr
        from telegram2elastic_spark.index.build import build_index
        from telegram2elastic_spark.query.bm25 import bm25_topk_sql
        from telegram2elastic_spark.query.wand import wand_topk

        got = wand_topk(
            build_index(
                tokzr.apply_synonym_analyzer(
                    load_corpus(spark, sf_dir), self.GROUPS
                ),
                n_doc_parts=4,
            ),
            ["merge", "data"], k=10,
        )
        want = duck.execute(
            bm25_topk_sql(
                ["merge", "data"], k=10,
                corpus_cte=tokzr.synonym_corpus_cte(self.GROUPS),
            )
        ).df()
        assert_same(got, want)

    def test_members_contract_to_head(self, spark, sf_dir):
        """'join' and 'combine' occurrences become 'merge' in the view;
        the merged df equals the union of member dfs (distinct docs)."""
        from pyspark.sql import functions as F

        from telegram2elastic_spark.functions import tokenizer as tokzr
        from telegram2elastic_spark.functions.tokenizer import tokens

        corpus = load_corpus(spark, sf_dir)
        view = tokzr.apply_synonym_analyzer(corpus, self.GROUPS)
        assert view.filter(
            F.array_contains(tokens("text"), "join")
            | F.array_contains(tokens("text"), "combine")
        ).count() == 0
        df_union = corpus.filter(
            F.arrays_overlap(
                tokens("text"),
                F.array(F.lit("merge"), F.lit("join"), F.lit("combine")),
            )
        ).count()
        df_head = view.filter(
            F.array_contains(tokens("text"), "merge")
        ).count()
        assert df_head == df_union > 0

    def test_rejects_non_token_head(self, spark, sf_dir):
        from telegram2elastic_spark.functions import tokenizer as tokzr

        with pytest.raises(ValueError, match="single token"):
            tokzr.apply_synonym_analyzer(
                load_corpus(spark, sf_dir), {"two words": ["a"]}
            )


class TestTokenEntropy:
    def test_vs_oracle(self, spark, duck, sf_dir):
        from telegram2elastic_spark.functions import text_quality as tq

        got = tq.token_entropy(load_corpus(spark, sf_dir))
        want = duck.execute(tq.TOKEN_ENTROPY_SQL).df()
        assert_same(got, want)

    def test_hand_pinned_values(self):
        from telegram2elastic_spark.functions import text_quality as tq

        docs = [
            (1, "a a b b", "en", "s", 7),        # uniform over 2 -> 1 bit
            (2, "a a a a", "en", "s", 7),        # single token -> 0.0
            (3, "", "en", "s", 0),               # empty -> 0.0, counts 0
            (4, "a b c d", "en", "s", 7),        # uniform over 4 -> 2 bits
        ]
        rows = {
            r["doc_id"]: r
            for r in tq.token_entropy(_spark_docs(docs)).collect()
        }
        assert rows[1]["entropy"] == 1.0 and rows[1]["n_distinct"] == 2
        assert rows[2]["entropy"] == 0.0 and rows[2]["n_tokens"] == 4
        assert rows[3]["entropy"] == 0.0 and rows[3]["n_tokens"] == 0
        assert rows[4]["entropy"] == 2.0
        # html wrapper tokens leak? as_corpus wraps text in html only in
        # the html column; text is untouched — n_distinct confirms
        assert rows[4]["n_distinct"] == 4
