"""ES SQL (`_sql`) surface: parser contract, dispatch identity, oracle
parity for shapes beyond the registered pairs."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import essql
from telegram2elastic_spark.query.wand import wand_topk


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].map(lambda v: v.isoformat())
        elif df[c].dtype == object:
            df[c] = df[c].map(str)
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_corpus(spark, sf_dir)


@pytest.fixture(scope="module")
def index(corpus):
    return build_index(corpus, n_doc_parts=4)


# ------------------------------ parser ---------------------------------

BAD = [
    # (sql, why)
    ("SELECT nope FROM documents", "unknown column"),
    ("SELECT url FROM messages", "unknown index"),
    ("SELECT url FROM documents WHERE lang = 'en' extra", "trailing"),
    ("SELECT url FROM documents WHERE MATCH(lang, 'en')", "text field only"),
    ("SELECT url FROM documents WHERE MATCH(text, 'a') OR lang = 'en'",
     "match under OR"),
    ("SELECT url FROM documents WHERE NOT MATCH(text, 'a')",
     "match under NOT"),
    ("SELECT SCORE() FROM documents WHERE lang = 'en'",
     "score without match"),
    ("SELECT url, COUNT(*) AS c FROM documents", "mixing aggs and cols"),
    ("SELECT lang FROM documents GROUP BY source", "not grouped"),
    ("SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang HAVING SUM(n_chars) > 5",
     "having agg not selected"),
    ("SELECT text, SCORE() FROM documents WHERE MATCH(text, 'a')",
     "match projects doc_id/url/score"),
    ("SELECT COUNT(*) FROM documents HAVING COUNT(*) > 1",
     "having without group by"),
    ("SELECT SUM(*) FROM documents", "sum star"),
    ("SELECT url FROM documents ORDER BY missing_col", "bad order key"),
    ("SELECT url FROM documents WHERE MATCH(text, 'a') ORDER BY SCORE() ASC",
     "score order must be desc"),
    ("SELECT url FROM documents LIMIT 1.5", "integer limit"),
]


@pytest.mark.parametrize("sql", [b[0] for b in BAD])
def test_out_of_subset_raises(sql):
    with pytest.raises(ValueError):
        essql.parse_es_sql(sql)


def test_translate_match():
    d = essql.es_sql_translate(
        "SELECT doc_id, url, SCORE() AS score FROM documents "
        "WHERE MATCH(text, 'Spark MERGE') AND lang = 'en' "
        "ORDER BY SCORE() DESC LIMIT 7"
    )
    assert d["path"] == "wand_topk"
    assert d["terms"] == ["merge", "spark"]
    assert d["doc_filter"] == "(lang = 'en')"
    assert d["k"] == 7
    assert d["projection"] == ["doc_id", "url", "score"]


def test_translate_scan_tiebreak():
    d = essql.es_sql_translate(
        "SELECT url FROM documents WHERE n_chars > 50 "
        "ORDER BY n_chars DESC LIMIT 5"
    )
    assert d["path"] == "scan"
    assert d["order_by"] == [("n_chars", True), ("doc_id", False)]


def test_translate_groupby_tiebreak():
    d = essql.es_sql_translate(
        "SELECT lang, COUNT(*) AS docs FROM documents "
        "GROUP BY lang ORDER BY docs DESC LIMIT 3"
    )
    assert d["path"] == "aggregate"
    assert d["order_by"] == [("docs", True), ("lang", False)]


def test_string_escape_roundtrip():
    d = essql.es_sql_translate(
        "SELECT url FROM documents WHERE url = 'it''s'"
    )
    assert d["where"] == "url = 'it''s'"


# --------------------------- dispatch identity --------------------------


def test_match_path_is_wand(spark, corpus, index):
    got = essql.es_sql_query(
        corpus,
        "SELECT doc_id, url, SCORE() AS score FROM documents "
        "WHERE MATCH(text, 'spark merge') AND lang = 'en' "
        "ORDER BY SCORE() DESC LIMIT 10",
        index=index,
    ).toPandas()
    want = wand_topk(
        index, ["merge", "spark"], k=10, doc_filter="(lang = 'en')"
    ).toPandas()
    assert _norm(got).equals(_norm(want))


def test_match_needs_index(corpus):
    with pytest.raises(ValueError, match="index"):
        essql.es_sql_query(
            corpus, "SELECT url FROM documents WHERE MATCH(text, 'a')"
        )


# ----------------------------- oracle parity ----------------------------

PARITY = [
    "SELECT url, lang FROM documents WHERE lang IN ('en', 'de') "
    "AND NOT n_chars BETWEEN 0 AND 99 ORDER BY n_chars ASC LIMIT 12",
    "SELECT source, COUNT(doc_id) AS docs, MIN(n_chars) AS lo, "
    "SUM(n_chars) AS chars FROM documents WHERE url LIKE '%page/1%' "
    "GROUP BY source ORDER BY chars DESC LIMIT 8",
    "SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang "
    "HAVING COUNT(*) >= 2 AND COUNT(*) < 100000 ORDER BY c DESC",
    "SELECT doc_id, warc_ts FROM documents "
    "WHERE warc_ts >= TIMESTAMP '2022-01-01 00:10:00' "
    "AND lang IS NOT NULL ORDER BY warc_ts ASC LIMIT 9",
    "SELECT COUNT(*) AS total, AVG(n_chars) AS avg_chars FROM documents",
]


@pytest.mark.parametrize("sql", PARITY)
def test_oracle_parity(spark, corpus, duck, sql):
    got = _norm(essql.es_sql_query(corpus, sql).toPandas())
    want = _norm(duck.execute(essql.es_sql_oracle(sql)).fetchdf())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        assert got[c].astype(str).tolist() == want[c].astype(str).tolist(), c


def test_limit_tiebreak_deterministic(spark, corpus, duck):
    # heavy ties on the order key (lang): the doc_id tie-break must make
    # the limited SET identical across engines and partitionings
    sql = "SELECT doc_id, lang FROM documents ORDER BY lang ASC LIMIT 17"
    a = _norm(essql.es_sql_query(corpus, sql).toPandas())
    b = _norm(essql.es_sql_query(corpus.repartition(7), sql).toPandas())
    o = _norm(duck.execute(essql.es_sql_oracle(sql)).fetchdf())
    assert a.equals(b)
    assert a["doc_id"].tolist() == o["doc_id"].tolist()


def test_local_twin_identity(spark, corpus, index):
    sql = (
        "SELECT doc_id, url, SCORE() AS score FROM documents "
        "WHERE MATCH(text, 'spark merge') AND lang = 'en' "
        "ORDER BY SCORE() DESC LIMIT 10"
    )
    via_spark = essql.es_sql_query(corpus, sql, index=index).collect()
    via_local = essql.es_sql_query_local(index, sql)
    assert [(r["doc_id"], r["url"], r["score"]) for r in via_local] == [
        (r.doc_id, r.url, r.score) for r in via_spark
    ]


def test_local_twin_rejects_relational(index):
    with pytest.raises(ValueError, match="MATCH"):
        essql.es_sql_query_local(index, "SELECT url FROM documents")
