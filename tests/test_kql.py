"""KQL (Kibana Query Language): parser contract + dual-rendering parity."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.query import kql


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_corpus(spark, sf_dir)


BAD = [
    "lang:en extra:nope",          # unknown field
    "badfield:x",                  # unknown field
    "lang:en and",                 # dangling operator
    "(lang:en",                    # unbalanced paren
    "lang:(en or de and fr)",      # mixed or/and in a value group
    "text >= 5",                   # range on non-orderable field
    "n_chars >= abc",              # non-numeric range literal
    "warc_ts >= 2022",             # timestamp range needs quoted literal
    "n_chars:abc",                 # numeric field, non-numeric value
    'spark lang:en',               # implicit AND (KQL requires explicit)
    "",                            # empty query
]


@pytest.mark.parametrize("q", BAD)
def test_out_of_subset_raises(q):
    with pytest.raises(ValueError):
        kql.parse_kql(q)


def test_validate_never_raises():
    assert kql.validate_kql("lang:en and spark")["valid"] is True
    bad = kql.validate_kql("lang:(en or de and fr)")
    assert bad["valid"] is False and "mixed" in bad["error"]


def test_bare_words_are_one_match_clause():
    # ES `match` default operator is OR: both words in one clause
    ast = kql.parse_kql("spark merge")
    assert ast == ("bare", ["spark", "merge"], False)


def test_explicit_and_between_bare_and_field():
    ast = kql.parse_kql("spark and lang:en")
    assert ast[0] == "and"


def test_keyword_vs_text_semantics():
    # keyword equality is exact; text matches analyzed tokens
    p = kql.kql_predicate("lang:en", "spark")
    assert p == "lang = 'en'"
    p = kql.kql_predicate("text:Spark", "spark")
    assert "array_contains" in p and "'spark'" in p


def test_wildcards():
    assert "LIKE" in kql.kql_predicate("url:*page/7*", "spark")
    assert "exists(" in kql.kql_predicate("text:sp*", "spark")


PARITY = [
    "lang:en and (spark or merge) and n_chars >= 200",
    '"merge batch" and not source:src2',
    "text:sp* and lang:(en or de)",
    "url:*page/7* or doc_id < 5",
    'lang:* and warc_ts >= "2022-01-01 00:30:00" and text:"the data"',
    "not (lang:en or lang:de) and spark",
]


@pytest.mark.parametrize("q", PARITY)
def test_search_parity(spark, corpus, duck, q):
    got = kql.kql_search(corpus, q, k=15).toPandas()
    want = duck.execute(kql.kql_search_sql(q, k=15)).fetchdf()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["url"].tolist() == want["url"].tolist()
    cnt = kql.kql_count(corpus, q).toPandas().iloc[0, 0]
    ocnt = duck.execute(kql.kql_count_sql(q)).fetchdf().iloc[0, 0]
    assert int(cnt) == int(ocnt)


def test_newest_first_order(spark, corpus):
    rows = kql.kql_search(corpus, "lang:en", k=10).collect()
    ts = [r.warc_ts for r in rows]
    assert ts == sorted(ts, reverse=True)


def test_pushdown_plan(spark, corpus, sf_dir):
    # keyword/range clauses must reach the parquet scan as pushed filters
    from telegram2elastic_spark.corpus import load_documents

    docs = load_documents(spark, sf_dir)
    from telegram2elastic_spark.corpus import as_corpus

    df = kql.kql_search(as_corpus(docs), "lang:en and n_chars >= 200", k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "IsNotNull(lang)" in plan or "EqualTo(lang,en)" in plan
