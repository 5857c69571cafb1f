"""ES|QL compiler — dual-emission parity (DataFrame chain vs DuckDB CTE
chain), command semantics, compile-time error contract, and the plan-shape
guarantee (EVAL/WHERE/KEEP fuse into the scan stage; filters push down)."""

import pytest

from telegram2elastic_spark.query import esql as E


def _same(spark, duck, sf_dir, program, float_tol=1e-9):
    from .oracle import assert_same

    assert_same(
        E.execute_esql(spark, sf_dir, program),
        duck.execute(E.esql_to_duckdb(program)).df(),
        float_tol=float_tol,
    )


# ---------------------------------------------------------------- parity

PROGRAMS = [
    # filter + grouped aggregates + multi-key sort
    'FROM corpus | WHERE lang == "en" AND n_chars > 200 '
    '| STATS n = COUNT(*), avg_len = AVG(n_chars) BY source '
    '| EVAL avg_len = ROUND(avg_len, 4) | SORT n DESC, source ASC',
    # full-text MATCH + date bucketing + LIMIT under total-order SORT
    'FROM corpus | WHERE MATCH(text, "spark index") '
    '| EVAL day = DATE_TRUNC(1 day, warc_ts) '
    '| STATS docs = COUNT(*) BY day | SORT day ASC | LIMIT 30',
    # DISSECT + typed EVAL + KEEP projection
    'FROM corpus | DISSECT url "%{proto}://%{host}/page/%{page_id}" '
    '| EVAL pid = TO_LONG(page_id) | WHERE pid % 100 == 7 '
    '| KEEP doc_id, host, pid | SORT doc_id ASC | LIMIT 20',
    # multivalue expansion + token stats
    'FROM corpus | EVAL toks = SPLIT(text, " ") | MV_EXPAND toks '
    '| EVAL tok = TO_LOWER(toks) | WHERE LENGTH(tok) > 4 '
    '| STATS n = COUNT(*) BY tok | SORT n DESC, tok ASC | LIMIT 15',
    # IN / IS NOT NULL + percentile family (rounded, the engine convention)
    'FROM events | WHERE event_type IN ("click", "view") '
    'AND value IS NOT NULL '
    '| STATS total = SUM(value), p90 = PERCENTILE(value, 90), '
    'med = MEDIAN(value) BY event_type '
    '| EVAL total = ROUND(total, 4), p90 = ROUND(p90, 4), '
    'med = ROUND(med, 4) | SORT event_type ASC',
    # GROK (anchored regex) + RENAME + CASE + NOT IN
    'FROM corpus | GROK text "^%{WORD:first_word}" '
    '| WHERE first_word IS NOT NULL AND NOT (lang IN ("de")) '
    '| RENAME n_chars AS len '
    '| EVAL kind = CASE(len > 1000, "long", len > 300, "mid", "short") '
    '| STATS n = COUNT(*) BY kind, lang | SORT kind ASC, lang ASC',
    # LIKE / RLIKE wildcards, ungrouped aggregates
    'FROM documents | WHERE text LIKE "*merge*" OR '
    'text RLIKE ".*batch [a-z]+.*" '
    '| STATS n = COUNT(*), langs = COUNT_DISTINCT(lang)',
    # DROP + arithmetic EVAL + DATE_EXTRACT
    'FROM events | EVAL hour = DATE_EXTRACT("hour", ts), v2 = value * 2 '
    '| DROP props | WHERE hour >= 6 AND hour < 9 '
    '| STATS n = COUNT(*), vmax = MAX(v2) BY hour '
    '| EVAL vmax = ROUND(vmax, 4) | SORT hour ASC',
    # embeddings table + MV_COUNT
    'FROM embeddings | EVAL dim = MV_COUNT(embedding) '
    '| STATS n = COUNT(*), dims = COUNT_DISTINCT(dim), lmax = MAX(label)',
    # bare row-returning pipe (no STATS): projection + sort + limit
    'FROM corpus | WHERE STARTS_WITH(lang, "e") '
    '| EVAL ulen = LENGTH(url), snippet = SUBSTRING(text, 1, 12) '
    '| KEEP doc_id, lang, ulen, snippet | SORT doc_id DESC | LIMIT 7',
    # ENRICH policy + LOOKUP JOIN chain (broadcast dimensions)
    'FROM events | WHERE event_type == "purchase" '
    '| ENRICH user_customer ON user_id '
    'WITH c_name, c_nationkey, c_mktsegment '
    '| RENAME c_nationkey AS n_nationkey '
    '| LOOKUP JOIN nation ON n_nationkey '
    '| STATS n = COUNT(*), rev = SUM(value) BY c_mktsegment, n_name '
    '| EVAL rev = ROUND(rev, 4) '
    '| SORT rev DESC, c_mktsegment ASC, n_name ASC | LIMIT 20',
    # date scalar vocabulary
    'FROM events | EVAL fmt = DATE_FORMAT("yyyy-MM-dd", ts), '
    'd = DATE_DIFF("hour", DATE_TRUNC(1 day, ts), ts) '
    '| STATS n = COUNT(*), dmax = MAX(d) BY fmt | SORT fmt ASC | LIMIT 40',
    # multivalue folds (element-order left fold in both dialects)
    'FROM embeddings | EVAL s = ROUND(MV_SUM(embedding), 4), '
    'mn = ROUND(MV_MIN(embedding), 4), mx = ROUND(MV_MAX(embedding), 4), '
    'av = ROUND(MV_AVG(embedding), 4) '
    '| KEEP vec_id, s, mn, mx, av | SORT vec_id ASC | LIMIT 25',
    # string/math scalar vocabulary
    'FROM corpus | EVAL t2 = REPLACE(text, "[aeiou]", ""), '
    'pick = GREATEST(n_chars, 500), sm = LEAST(n_chars, 500), '
    'l = LEFT(text, 5), r = RIGHT(text, 5), '
    'p = ROUND(POW(n_chars, 0.5), 4), lg = ROUND(LOG10(n_chars), 4) '
    '| KEEP doc_id, pick, sm, l, r, p, lg | SORT doc_id ASC | LIMIT 6',
    # BUCKET: multi-unit epoch-aligned span, calendar week, numeric width
    'FROM events | EVAL h6 = BUCKET(ts, 6 hours) '
    '| STATS n = COUNT(*) BY h6 | SORT h6 ASC | LIMIT 40',
    'FROM corpus | EVAL w = BUCKET(warc_ts, 1 week), '
    'b = BUCKET(n_chars, 250) | STATS n = COUNT(*) BY w, b '
    '| SORT w ASC, b ASC',
    # INLINESTATS: keyed window aggregates, then a global one as a filter
    'FROM corpus | INLINESTATS lang_avg = AVG(n_chars), '
    'lang_n = COUNT(*) BY lang '
    '| EVAL rel = ROUND(n_chars / lang_avg, 4) '
    '| KEEP doc_id, lang, rel, lang_n | SORT doc_id ASC | LIMIT 12',
    'FROM corpus | INLINESTATS gmax = MAX(n_chars) '
    '| WHERE n_chars == gmax | KEEP doc_id, n_chars | SORT doc_id ASC',
    # ES 8.16 filtered aggregates (`agg WHERE cond`)
    'FROM corpus | STATS en = COUNT(*) WHERE lang == "en", '
    'total = COUNT(*), avg_long = AVG(n_chars) WHERE n_chars > 500, '
    'med_web = MEDIAN(n_chars) WHERE source == "web" BY source '
    '| EVAL avg_long = ROUND(avg_long, 4), med_web = ROUND(med_web, 4) '
    '| SORT source ASC',
    # SAMPLE (8.19): deterministic hash membership, stable across engines
    'FROM corpus | SAMPLE 0.25 | STATS n = COUNT(*), c = SUM(n_chars)',
    'FROM events | SAMPLE 0.5 '
    '| STATS s = SUM(value) WHERE event_type == "click", n = COUNT(*) '
    'BY event_type | SORT event_type ASC',
    # FORK (8.19): branch union + _fork discriminator; NULL-filled columns
    'FROM corpus | FORK (WHERE lang == "en" | STATS n = COUNT(*) BY source) '
    '(STATS n = COUNT(*) BY lang) '
    '| SORT _fork ASC, source ASC NULLS LAST, lang ASC NULLS LAST',
    # FORK branches with their own EVAL/KEEP/SORT/LIMIT chains
    'FROM corpus | FORK '
    '(WHERE lang == "en" | EVAL k = n_chars * 2 | KEEP doc_id, k '
    '| SORT k ASC, doc_id ASC | LIMIT 3) '
    '(WHERE lang == "de" | KEEP doc_id, n_chars '
    '| SORT n_chars DESC, doc_id ASC | LIMIT 3) '
    '| SORT _fork ASC, doc_id ASC',
    # session-15 scalar/mv vocabulary batch
    'FROM embeddings | EVAL s = MV_SORT(embedding, "DESC") '
    '| EVAL f = ROUND(MV_FIRST(embedding), 5), l = ROUND(MV_LAST(embedding), 5), '
    'top = ROUND(MV_FIRST(s), 5), nd = MV_COUNT(MV_DEDUPE(embedding)) '
    '| KEEP vec_id, f, l, top, nd | SORT vec_id ASC | LIMIT 6',
    'FROM corpus | EVAL p = LOCATE(text, "merge"), rv = REVERSE(lang), '
    't2 = LTRIM(RTRIM(lang)) | WHERE p > 0 '
    '| STATS n = COUNT(*), pmax = MAX(p) BY rv, t2 | SORT rv ASC',
    'FROM events | EVAL sg = SIGNUM(value - 50), b = TO_BOOLEAN("true") '
    '| STATS n = COUNT(*) BY sg, b | SORT sg ASC',
    'FROM corpus | EVAL d = DATE_PARSE("yyyy-MM-dd", "2022-03-05") '
    '| STATS n = COUNT(*) BY d',
    'FROM events | STATS sd = STD_DEV(value) '
    'WHERE event_type == "click", n = COUNT(*) BY event_type '
    '| EVAL sd = ROUND(sd, 4) | SORT event_type ASC',
]


@pytest.mark.parametrize("program", PROGRAMS)
def test_parity(spark, duck, sf_dir, program):
    _same(spark, duck, sf_dir, program)


def test_registered_pairs_match_module(spark, duck, sf_dir):
    """The __spark_entry__ ESQL_PROGRAMS pairs stay green end-to-end."""
    import __spark_entry__ as entry

    for name, prog in entry.ESQL_PROGRAMS.items():
        _same(spark, duck, sf_dir, prog)


# ------------------------------------------------------------- semantics


def test_eval_later_items_see_earlier(spark, sf_dir):
    df = E.execute_esql(
        spark, sf_dir,
        "FROM corpus | EVAL a = n_chars + 1, b = a * 2 "
        "| KEEP doc_id, a, b | SORT doc_id ASC | LIMIT 3",
    )
    rows = df.collect()
    assert all(r.b == 2 * r.a for r in rows)


def test_eval_replaces_existing_column(spark, sf_dir):
    df = E.execute_esql(
        spark, sf_dir,
        "FROM corpus | EVAL n_chars = n_chars * 10 "
        "| KEEP doc_id, n_chars | SORT doc_id ASC | LIMIT 1",
    )
    base = E.execute_esql(
        spark, sf_dir,
        "FROM corpus | KEEP doc_id, n_chars | SORT doc_id ASC | LIMIT 1",
    )
    assert df.first().n_chars == 10 * base.first().n_chars
    # duck emitter uses * REPLACE for the overwrite — no duplicate column
    assert "REPLACE" in E.esql_to_duckdb(
        "FROM corpus | EVAL n_chars = n_chars * 10"
    )


def test_division_is_float_in_both_dialects(spark, duck, sf_dir):
    prog = (
        "FROM corpus | EVAL r = n_chars / 7 | KEEP doc_id, r "
        "| SORT doc_id ASC | LIMIT 5"
    )
    sdf = E.execute_esql(spark, sf_dir, prog)
    assert dict(sdf.dtypes)["r"] == "double"
    vals = [r.r for r in sdf.collect()]
    assert any(v != int(v) for v in vals)  # genuinely fractional
    _same(spark, duck, sf_dir, prog)


def test_grok_anchor_is_regex_not_literal(spark, sf_dir):
    """`^` in grok surrounding text anchors (ES semantics) — the r4 fix."""
    df = E.execute_esql(
        spark, sf_dir,
        'FROM corpus | GROK text "^%{WORD:w}" | WHERE w IS NOT NULL '
        "| STATS n = COUNT(*)",
    )
    assert df.first().n > 0


def test_mv_expand_multiplies_rows(spark, sf_dir):
    one = E.execute_esql(
        spark, sf_dir,
        'FROM corpus | WHERE doc_id == 0 | EVAL toks = SPLIT(text, " ") '
        "| MV_EXPAND toks | STATS n = COUNT(*)",
    ).first().n
    ntoks = E.execute_esql(
        spark, sf_dir,
        'FROM corpus | WHERE doc_id == 0 '
        '| EVAL n = MV_COUNT(SPLIT(text, " ")) | KEEP n',
    ).first().n
    assert one == ntoks > 1


def test_sample_is_deterministic_subset(spark, sf_dir):
    full = {
        r.doc_id
        for r in E.execute_esql(
            spark, sf_dir, "FROM corpus | KEEP doc_id"
        ).collect()
    }
    prog = "FROM corpus | SAMPLE 0.3 | KEEP doc_id"
    s1 = {r.doc_id for r in E.execute_esql(spark, sf_dir, prog).collect()}
    s2 = {r.doc_id for r in E.execute_esql(spark, sf_dir, prog).collect()}
    assert s1 == s2  # RNG-free: identical membership on re-run
    assert s1 < full  # proper subset
    # roughly the requested rate (hash-uniform; generous band)
    assert 0.15 < len(s1) / len(full) < 0.45


def test_stats_where_equals_prefiltered(spark, sf_dir):
    filtered = E.execute_esql(
        spark, sf_dir,
        'FROM corpus | STATS en = COUNT(*) WHERE lang == "en"',
    ).collect()[0].en
    pre = E.execute_esql(
        spark, sf_dir,
        'FROM corpus | WHERE lang == "en" | STATS en = COUNT(*)',
    ).collect()[0].en
    assert filtered == pre > 0


def test_fork_null_fill_and_labels(spark, sf_dir):
    df = E.execute_esql(
        spark, sf_dir,
        "FROM corpus | FORK "
        "(STATS n = COUNT(*) BY lang) "
        "(STATS n = COUNT(*))",
    )
    rows = df.collect()
    assert set(df.columns) == {"lang", "n", "_fork"}
    f1 = [r for r in rows if r._fork == "fork1"]
    f2 = [r for r in rows if r._fork == "fork2"]
    assert f1 and len(f2) == 1
    assert all(r.lang is not None for r in f1)
    assert f2[0].lang is None  # missing column NULL-filled
    assert f2[0].n == sum(r.n for r in f1)


def test_limit_without_sort_is_bounded(spark, sf_dir):
    df = E.execute_esql(spark, sf_dir, "FROM corpus | LIMIT 4")
    assert df.count() == 4


# ---------------------------------------------------- compile-time errors

BAD = [
    "FROM nope | LIMIT 1",                            # unknown table
    "FROM corpus | WHERE nope == 1",                  # unknown column
    "FROM corpus | FROBNICATE x",                     # unknown command
    "FROM corpus | EVAL x = NOPEFN(text)",            # unknown function
    "FROM corpus | WHERE n_chars",                    # WHERE not boolean
    "FROM corpus | STATS x = n_chars + 1",            # STATS non-aggregate
    "FROM corpus | STATS n = COUNT(*) BY nope",       # unknown BY key
    "FROM corpus | KEEP doc_id, nope",                # unknown KEEP column
    "FROM corpus | MV_EXPAND text",                   # non-multivalue
    "FROM corpus | EVAL d = DATE_TRUNC(2 day, warc_ts)",   # non-1 span
    "FROM corpus | EVAL x = ABS(1 day)",              # span outside trunc
    'FROM corpus | WHERE MATCH(text, "")',            # empty MATCH query
    "FROM corpus | GROK text \"%{NOPE:x}\"",          # unknown grok pattern
    "FROM corpus | WHERE lang ==",                    # truncated expr
    "FROM corpus | LIMIT 3 extra",                    # trailing tokens
    "FROM events | ENRICH nope ON user_id",           # unknown policy
    "FROM events | ENRICH user_customer ON user_id WITH c_phone",
    "FROM events | ENRICH user_customer ON user_id "
    "| ENRICH user_customer ON user_id",              # field collision
    "FROM events | LOOKUP JOIN nation ON user_id",    # name not in lookup
    "FROM events | LOOKUP JOIN nope ON user_id",      # unknown lookup tbl
    'FROM events | EVAL d = DATE_DIFF("month", ts, ts)',   # bad unit
    'FROM events | EVAL f = DATE_FORMAT("QQ", ts)',   # bad format token
    "FROM events | EVAL b = BUCKET(ts, 2 weeks)",     # non-fixed multi-span
    "FROM corpus | EVAL b = BUCKET(n_chars, 0)",      # non-positive width
    "FROM corpus | EVAL b = BUCKET(n_chars, lang)",   # non-literal width
    "FROM corpus | INLINESTATS m = MEDIAN(n_chars)",  # unsupported inline
    "FROM corpus | STATS n = COUNT(*) WHERE n_chars",  # non-bool agg filter
    "FROM corpus | SAMPLE 1.5",                        # probability > 1
    "FROM corpus | SAMPLE 0.0001",                     # below 1 permille
    "FROM corpus | KEEP text | SAMPLE 0.2",            # identity col gone
    "FROM corpus | FORK (LIMIT 5)",                    # one branch
    'FROM corpus | FORK (EVAL x = 1) (EVAL x = "a")',  # branch type clash
    "FROM corpus | FORK (FORK (LIMIT 1) (LIMIT 2)) (LIMIT 3)",  # nested
    'FROM corpus | FORK (EVAL _fork = "x") (LIMIT 1)',  # reserved _fork
]


@pytest.mark.parametrize("program", BAD)
def test_compile_errors(program):
    with pytest.raises(ValueError):
        E.EsqlPlan(program)
    v = E.validate_esql(program)
    assert v["valid"] is False and v["error"]


def test_validate_reports_stages_and_schema():
    v = E.validate_esql(
        "FROM corpus | WHERE n_chars > 0 "
        "| STATS n = COUNT(*) BY lang | SORT n DESC | LIMIT 5"
    )
    assert v["valid"] and v["source"] == "corpus"
    assert v["stages"] == ["where", "stats", "sort", "limit"]
    assert set(v["columns"]) == {"lang", "n"}


# ------------------------------------------------------------ plan shape


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    """WHERE on a raw documents column lands in PushedFilters — the scan
    reads only matching row groups at 100 TB."""
    df = E.execute_esql(
        spark, sf_dir,
        'FROM documents | WHERE lang == "en" | STATS n = COUNT(*)',
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "lang" in plan.split(
        "PushedFilters"
    )[1][:120]


def test_enrich_lookup_joins_are_broadcast(spark, sf_dir):
    """ENRICH / LOOKUP JOIN dimensions stay on the build side of a
    broadcast join — no shuffle join at any fact-table size."""
    df = E.execute_esql(
        spark, sf_dir,
        "FROM events | ENRICH user_customer ON user_id WITH c_nationkey "
        "| RENAME c_nationkey AS n_nationkey "
        "| LOOKUP JOIN nation ON n_nationkey "
        "| STATS n = COUNT(*) BY n_name",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_enrich_no_match_yields_null(spark, sf_dir):
    df = E.execute_esql(
        spark, sf_dir,
        "FROM events | EVAL big = user_id + 1000000 "
        "| ENRICH user_customer ON big WITH c_name "
        "| STATS n = COUNT(*), matched = COUNT(c_name)",
    )
    r = df.first()
    assert r.n > 0 and r.matched == 0  # LEFT join: rows kept, fields null


def test_stages_fuse_into_single_agg_plan(spark, sf_dir):
    """EVAL/WHERE/KEEP collapse into scan->project->one hash agg — no
    shuffle beyond the aggregate exchange."""
    df = E.execute_esql(
        spark, sf_dir,
        'FROM documents | WHERE lang == "en" | EVAL b = n_chars * 2 '
        "| KEEP b | STATS s = SUM(b)",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 1  # only the agg's exchange


class TestRow:
    """ES|QL ROW literal source."""

    def test_row_vs_oracle(self, spark, duck, sf_dir):
        _same(spark, duck, sf_dir,
              'ROW a = 1, label = "probe", x = 10 '
              '| EVAL y = a + x * 2, ok = y > 5 | KEEP label, y, ok')

    def test_row_where_can_drop_the_row(self, spark, sf_dir):
        q = 'ROW n = 5 | WHERE n > 100'
        assert E.execute_esql(spark, sf_dir, q).count() == 0

    def test_row_rejects_columns(self):
        with pytest.raises(ValueError, match="unknown column"):
            E.EsqlPlan('ROW a = doc_id')

    def test_row_rejects_empty_and_trailing(self):
        with pytest.raises(ValueError):
            E.EsqlPlan('ROW | LIMIT 1')
        with pytest.raises(ValueError):
            E.EsqlPlan('ROW a = 1 b')


class TestChangePoint:
    """ES|QL 8.18 CHANGE_POINT processing command."""

    def test_vs_oracle(self, spark, duck, sf_dir):
        _same(spark, duck, sf_dir,
              'FROM events | EVAL day = DATE_TRUNC(1 day, ts) '
              '| STATS docs = COUNT(*) BY day '
              '| CHANGE_POINT docs ON day | SORT day ASC | LIMIT 40')

    def test_custom_names_and_single_marked_row(self, spark, sf_dir):
        rows = E.execute_esql(
            spark, sf_dir,
            'FROM events | EVAL day = DATE_TRUNC(1 day, ts) '
            '| STATS docs = COUNT(*) BY day '
            '| CHANGE_POINT docs ON day AS cp_kind, cp_score '
            '| SORT day ASC',
        ).collect()
        marked = [r for r in rows if r["cp_kind"] is not None]
        assert len(marked) == 1
        assert marked[0]["cp_kind"] == "step_change"
        assert marked[0]["cp_score"] is not None
        assert all(r["cp_score"] is None for r in rows if r is not marked[0])

    def test_matches_agg_change_point_bucket(self, spark, sf_dir):
        """The command agrees with the dedicated agg_change_point
        operator on the corpus hourly series (same statistic)."""
        from telegram2elastic_spark.corpus import load_corpus
        from telegram2elastic_spark.operators import aggregates as agg

        want = agg.agg_change_point(load_corpus(spark, sf_dir)).first()
        rows = E.execute_esql(
            spark, sf_dir,
            'FROM corpus '
            '| EVAL bucket = DATE_TRUNC(1 hour, warc_ts) '
            '| STATS docs = COUNT(*) BY bucket '
            '| CHANGE_POINT docs ON bucket | SORT bucket ASC',
        ).collect()
        marked = [r for r in rows if r["type"] is not None]
        assert len(marked) == 1
        assert marked[0]["bucket"].strftime("%Y-%m-%d %H:00") == want["bucket"]
        assert abs(marked[0]["pvalue"] - want["score"]) < 1e-9

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError, match="numeric"):
            E.EsqlPlan('FROM corpus | CHANGE_POINT lang ON doc_id')
        with pytest.raises(ValueError, match="unknown column"):
            E.EsqlPlan('FROM corpus | CHANGE_POINT n_chars ON nope')


class TestInferenceCommands:
    """ES|QL 8.19 COMPLETION / RERANK (deterministic stub endpoints)."""

    def test_rerank_vs_oracle(self, spark, duck, sf_dir):
        _same(spark, duck, sf_dir,
              'FROM corpus | WHERE MATCH(text, "spark merge") '
              '| RERANK "spark merge batch" ON text '
              '| SORT _score DESC, doc_id ASC | KEEP doc_id, _score '
              '| LIMIT 10')

    def test_completion_vs_oracle(self, spark, duck, sf_dir):
        _same(spark, duck, sf_dir,
              'FROM corpus | WHERE doc_id % 100 == 7 '
              '| COMPLETION summary = text WITH stub_lm '
              '| KEEP doc_id, summary | SORT doc_id ASC | LIMIT 20')

    def test_rerank_matches_semantic_dot(self, spark, sf_dir):
        """_score equals the integer dot of embed_query and the doc's
        hashing-trick embedding (recomputed independently in Python)."""
        from collections import Counter

        from telegram2elastic_spark.functions.tokenizer import py_tokenize
        from telegram2elastic_spark.query.semantic import (
            SEM_DIM, _py_h64, embed_query,
        )

        q = "spark merge batch"
        qv = embed_query(q)
        rows = E.execute_esql(
            spark, sf_dir,
            'FROM corpus | WHERE doc_id < 30 '
            f'| RERANK "{q}" ON text '
            '| KEEP doc_id, text, _score | SORT doc_id ASC',
        ).collect()
        assert rows
        for r in rows:
            dot = 0
            for t, tf in Counter(py_tokenize(r["text"])).items():
                sgn = 1 if _py_h64("s:" + t) % 2 == 0 else -1
                dot += sgn * tf * qv.get(_py_h64(t) % SEM_DIM, 0)
            assert r["_score"] == dot

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError, match="string column"):
            E.EsqlPlan('FROM corpus | RERANK "q" ON doc_id')
        with pytest.raises(ValueError, match="string"):
            E.EsqlPlan('FROM corpus | COMPLETION c = n_chars WITH m')


# ---------------------------------------------------------------- FUSE

FUSE_PROG = (
    "FROM events | KEEP event_id, event_type, value | FORK "
    '(WHERE event_type == "click" | EVAL _score = value) '
    "(WHERE value > 50 | EVAL _score = value * 2) "
    "| FUSE | SORT _score DESC, event_id ASC | LIMIT 15"
)


def test_fuse_rrf_parity(spark, duck, sf_dir):
    _same(spark, duck, sf_dir, FUSE_PROG)


def test_fuse_linear_parity(spark, duck, sf_dir):
    _same(spark, duck, sf_dir, FUSE_PROG.replace("| FUSE |", "| FUSE LINEAR |"))


def test_fuse_merges_dupes_and_scores_rrf(spark, sf_dir):
    """A row matching both branches gets 1/(60+r1) + 1/(60+r2); a
    single-branch row gets one term; _fork is gone from the schema."""
    out = E.execute_esql(spark, sf_dir, FUSE_PROG).toPandas()
    assert "_fork" not in out.columns
    assert list(out.columns) == ["event_id", "event_type", "value", "_score"]
    # every fused score is a sum of at most 2 rrf terms, each <= 1/61
    assert (out["_score"] <= 2 / 61 + 1e-12).all()
    assert (out["_score"] > 0).all()
    # the winning rows (top of both branches) must carry two terms:
    # strictly more than the single-branch maximum 1/61
    assert out["_score"].iloc[0] > 1 / 61 + 1e-12


def test_fuse_errors():
    with pytest.raises(ValueError, match="immediately follow FORK"):
        E.EsqlPlan("FROM events | EVAL _score = value | FUSE")
    with pytest.raises(ValueError, match="numeric _score"):
        E.EsqlPlan(
            "FROM events | FORK (WHERE value > 1) (WHERE value > 2) | FUSE"
        )
    with pytest.raises(ValueError, match="inside a FORK branch"):
        E.EsqlPlan(
            "FROM events | FORK (WHERE value > 1 | FUSE) (WHERE value > 2)"
        )
    # LIMIT between FORK and FUSE breaks the contract
    with pytest.raises(ValueError, match="immediately follow FORK"):
        E.EsqlPlan(
            "FROM events | FORK (EVAL _score = value) (EVAL _score = value) "
            "| LIMIT 5 | FUSE"
        )
    # validate_esql reports (never raises)
    v = E.validate_esql("FROM events | EVAL _score = value | FUSE")
    assert v["valid"] is False and "FORK" in v["error"]


# ------------------------------------------------- MATCH_PHRASE / TERM

def test_match_phrase_parity(spark, duck, sf_dir):
    _same(
        spark, duck, sf_dir,
        'FROM corpus | WHERE MATCH_PHRASE(text, "merge batch") '
        "| STATS n = COUNT(*) BY lang | SORT lang ASC",
    )


def test_match_phrase_requires_adjacency(spark, sf_dir):
    """Phrase count <= both-terms count; and the phrase docs agree with
    the engine's positional machinery (phrase_topk's matching set)."""
    both = E.execute_esql(
        spark, sf_dir,
        'FROM corpus | WHERE MATCH(text, "merge") AND MATCH(text, "batch") '
        "| STATS n = COUNT(*)",
    ).collect()[0]["n"]
    phrase = E.execute_esql(
        spark, sf_dir,
        'FROM corpus | WHERE MATCH_PHRASE(text, "merge batch") '
        "| STATS n = COUNT(*)",
    ).collect()[0]["n"]
    assert 0 < phrase <= both
    from telegram2elastic_spark.corpus import load_corpus
    from telegram2elastic_spark.index.build import build_index
    from telegram2elastic_spark.query.phrase import phrase_topk

    idx = build_index(load_corpus(spark, sf_dir), n_doc_parts=4, positions=True)
    hits = phrase_topk(idx, ["merge", "batch"], k=10_000).count()
    assert hits == phrase


def test_term_is_unanalyzed(spark, duck, sf_dir):
    # lowercase literal hits; the cased literal misses (ES term contract)
    _same(
        spark, duck, sf_dir,
        'FROM corpus | WHERE TERM(text, "spark") | STATS n = COUNT(*)',
    )
    n = E.execute_esql(
        spark, sf_dir,
        'FROM corpus | WHERE TERM(text, "Spark") | STATS n = COUNT(*)',
    ).collect()[0]["n"]
    assert n == 0


def test_match_phrase_errors():
    with pytest.raises(ValueError, match="string literal"):
        E.EsqlPlan("FROM corpus | WHERE MATCH_PHRASE(text, n_chars)")
    with pytest.raises(ValueError, match="empty query"):
        E.EsqlPlan('FROM corpus | WHERE MATCH_PHRASE(text, "  ")')
    with pytest.raises(ValueError, match="string literal"):
        E.EsqlPlan("FROM corpus | WHERE TERM(text, 3)")


# ------------------------------------------------------- TS (9.1) command


class TestTsCommand:
    """TS time-series source: two-level STATS (inner per series, outer
    across series), counter/gauge enforcement, rate semantics."""

    def test_parity_full_surface(self, spark, duck, sf_dir):
        _same(
            spark, duck, sf_dir,
            'TS events | WHERE value IS NOT NULL '
            '| EVAL hour = DATE_TRUNC(1 hour, ts) '
            '| STATS mr = MAX(RATE(event_id)), '
            'av = AVG(AVG_OVER_TIME(value)), '
            'fst = MIN(FIRST_OVER_TIME(value)), '
            'lst = MAX(LAST_OVER_TIME(value)), '
            'tot = SUM(SUM_OVER_TIME(value)), '
            'ns = COUNT(COUNT_OVER_TIME(value)) '
            'BY hour, event_type '
            '| EVAL mr = ROUND(mr, 4), av = ROUND(av, 4), '
            'fst = ROUND(fst, 4), lst = ROUND(lst, 4), '
            'tot = ROUND(tot, 4) '
            '| SORT hour ASC, event_type ASC | LIMIT 40',
            float_tol=1e-6,
        )

    def test_parity_no_by(self, spark, duck, sf_dir):
        _same(
            spark, duck, sf_dir,
            'TS events | STATS n = COUNT(COUNT_OVER_TIME(value)), '
            'mx = MAX(MAX_OVER_TIME(value)) '
            '| EVAL mx = ROUND(mx, 4)',
        )

    def test_rate_semantics_hand_computed(self, spark, sf_dir):
        """Reset-compensated increase / observed seconds, per series per
        bucket — pinned on a crafted 2-series frame."""
        rows = [
            # series A: 0->5->3 (reset! +3) over 20 s: (5+3)/20 = 0.4
            (0, "2024-01-01 00:00:00", 1, "a", 1.0, ""),
            (5, "2024-01-01 00:00:10", 1, "a", 1.0, ""),
            (3, "2024-01-01 00:00:20", 1, "a", 1.0, ""),
            # series B: single sample -> NULL rate (dropped by MAX)
            (7, "2024-01-01 00:00:05", 2, "a", 1.0, ""),
        ]
        df = spark.createDataFrame(
            [(i, __import__("datetime").datetime.fromisoformat(t), u, e, v, p)
             for i, t, u, e, v, p in rows],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        plan = E.EsqlPlan(
            "TS events | STATS r = MAX(RATE(event_id)) BY event_type"
        )
        out = plan.dataframe(spark, "unused", tables={"events": df}).collect()
        assert len(out) == 1
        assert abs(out[0]["r"] - 0.4) < 1e-12

    def test_errors(self):
        cases = [
            ("TS corpus | LIMIT 1", "not a time-series"),
            ("TS events | STATS x = MAX(RATE(value))", "counter field"),
            ("TS events | STATS x = AVG(SUM_OVER_TIME(event_id))",
             "only supports RATE"),
            ("TS events | STATS x = MEDIAN(RATE(event_id))",
             "outer aggregate"),
            ("TS events | STATS x = MAX(SUM(value))", "inner function"),
            ("TS events | DROP ts | STATS x = MAX(RATE(event_id))",
             "needs column"),
            ("TS events | STATS x = MAX(RATE(props))", "counter field"),
        ]
        for prog, msg in cases:
            with pytest.raises(ValueError, match=msg):
                E.EsqlPlan(prog)
        # over-time functions are TS-only: plain FROM rejects them
        with pytest.raises(ValueError):
            E.EsqlPlan("FROM events | STATS x = MAX(RATE(event_id))")

    def test_ts_column_still_a_name(self, spark, duck, sf_dir):
        """Adding the TS command must not break `ts` as a column name."""
        _same(
            spark, duck, sf_dir,
            "FROM events | EVAL day = DATE_TRUNC(1 day, ts) "
            "| STATS n = COUNT(*) BY day | SORT day ASC | LIMIT 5",
        )

    def test_stats_after_ts_stats_is_plain(self, spark, duck, sf_dir):
        """After the TS aggregation the relation is ordinary rows — a
        second STATS is the normal one."""
        _same(
            spark, duck, sf_dir,
            'TS events | EVAL day = DATE_TRUNC(1 day, ts) '
            '| STATS n = COUNT(COUNT_OVER_TIME(value)) BY day, event_type '
            '| STATS buckets = COUNT(*), total = SUM(n) BY event_type '
            '| SORT event_type ASC',
        )


# ------------------------------------------------------- ES|QL 9.2 KNN

_KNN_VEC = [((i * 37) % 19 - 9) / 10.0 for i in range(64)]
_KNN_LIT = "[" + ", ".join(repr(v) for v in _KNN_VEC) + "]"
KNN_PROG = (
    "FROM embeddings "
    f"| WHERE KNN(embedding, {_KNN_LIT}, 10) "
    "| KEEP vec_id, label, _score "
    "| SORT _score DESC, vec_id ASC"
)


def test_knn_parity(spark, duck, sf_dir):
    _same(spark, duck, sf_dir, KNN_PROG)


def test_knn_then_stats_parity(spark, duck, sf_dir):
    prog = (
        "FROM embeddings "
        f"| WHERE KNN(embedding, {_KNN_LIT}, 25) "
        "| STATS n = COUNT(*), best = MAX(_score) BY label "
        "| SORT label ASC"
    )
    _same(spark, duck, sf_dir, prog)


def test_knn_k_and_order(spark, sf_dir):
    out = E.execute_esql(spark, sf_dir, KNN_PROG).toPandas()
    assert len(out) == 10
    assert list(out.columns) == ["vec_id", "label", "_score"]
    s = out["_score"].tolist()
    assert s == sorted(s, reverse=True)
    # exactness cross-check: numpy full-scan cosine agrees on the set
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    m = np.stack(t["embedding"].to_numpy())
    q = np.array(_KNN_VEC)
    cos = np.round(
        m @ q / (np.sqrt((m * m).sum(axis=1)) * np.sqrt((q * q).sum())), 5
    )
    order = np.lexsort((t["vec_id"].to_numpy(), -cos))[:10]
    assert set(out["vec_id"]) == set(t["vec_id"].to_numpy()[order])


def test_knn_errors():
    with pytest.raises(ValueError, match="only expression"):
        E.EsqlPlan(
            f"FROM embeddings | WHERE KNN(embedding, {_KNN_LIT}, 5)"
            " AND label > 0"
        )
    with pytest.raises(ValueError, match="array<double> column"):
        E.EsqlPlan(f"FROM embeddings | WHERE KNN(label, {_KNN_LIT}, 5)")
    with pytest.raises(ValueError, match="positive integer"):
        E.EsqlPlan(f"FROM embeddings | WHERE KNN(embedding, {_KNN_LIT}, 0)")
    with pytest.raises(ValueError, match="non-empty array"):
        E.EsqlPlan("FROM embeddings | WHERE KNN(embedding, [], 5)")
    with pytest.raises(ValueError, match="KNN"):
        E.EsqlPlan("FROM embeddings | WHERE KNN(embedding)")


def test_array_literal_outside_knn_rejected():
    plan = E.EsqlPlan("FROM embeddings | EVAL x = [1.0, 2.0] | LIMIT 1")
    with pytest.raises(ValueError, match="KNN query vector"):
        E.esql_to_duckdb(
            "FROM embeddings | EVAL x = [1.0, 2.0] | LIMIT 1"
        )
    del plan


# ------------------------------------------------- CATEGORIZE function

CAT_PROG = (
    "FROM corpus | EVAL cat = CATEGORIZE(text) "
    "| STATS n = COUNT(*) BY cat | SORT n DESC, cat ASC | LIMIT 15"
)


def test_categorize_parity(spark, duck, sf_dir):
    _same(spark, duck, sf_dir, CAT_PROG)


def test_categorize_drops_digit_tokens(spark, sf_dir):
    out = E.execute_esql(
        spark, sf_dir,
        "FROM corpus | EVAL cat = CATEGORIZE(text) "
        "| KEEP cat | LIMIT 200",
    ).toPandas()
    for c in out["cat"]:
        toks = c.split(" ") if c else []
        assert len(toks) <= 4
        assert all(not any(ch.isdigit() for ch in t) for t in toks)


TE_PROG = (
    "FROM embeddings "
    '| WHERE KNN(embedding, TEXT_EMBEDDING("spark merge batch"), 10) '
    "| KEEP vec_id, _score | SORT _score DESC, vec_id ASC"
)


def test_knn_text_embedding_parity(spark, duck, sf_dir):
    _same(spark, duck, sf_dir, TE_PROG)


def test_knn_text_embedding_matches_explicit_vector(spark, sf_dir):
    from telegram2elastic_spark.query.semantic import SEM_DIM, embed_query

    sparse = embed_query("spark merge batch")
    lit = "[" + ", ".join(
        repr(float(sparse.get(b, 0))) for b in range(SEM_DIM)
    ) + "]"
    explicit = (
        f"FROM embeddings | WHERE KNN(embedding, {lit}, 10) "
        "| KEEP vec_id, _score | SORT _score DESC, vec_id ASC"
    )
    a = E.execute_esql(spark, sf_dir, TE_PROG).toPandas()
    b = E.execute_esql(spark, sf_dir, explicit).toPandas()
    assert a.values.tolist() == b.values.tolist()


def test_text_embedding_errors():
    with pytest.raises(ValueError, match="string literal"):
        E.EsqlPlan(
            "FROM embeddings | WHERE KNN(embedding, TEXT_EMBEDDING(), 5)"
        )
    with pytest.raises(ValueError, match="only supported as the KNN"):
        E.EsqlPlan(
            'FROM embeddings | EVAL v = TEXT_EMBEDDING("x") | LIMIT 1'
        )


def test_knn_fork_fuse_hybrid(spark, duck, sf_dir):
    """The ES|QL 9.2 flagship hybrid pattern: a KNN branch fused with a
    lexical MATCH branch via RRF — KNN supplies _score inside its FORK
    branch, composition needs no special casing in either emitter."""
    prog = (
        "FROM embeddings | FORK "
        f'(WHERE KNN(embedding, TEXT_EMBEDDING("spark merge"), 15)) '
        "(WHERE label >= 0 | EVAL _score = 1.0 / (1 + label) "
        " | SORT _score DESC, vec_id ASC | LIMIT 15) "
        "| FUSE | EVAL _score = ROUND(_score, 6) "
        "| KEEP vec_id, label, _score "
        "| SORT _score DESC, vec_id ASC | LIMIT 10"
    )
    _same(spark, duck, sf_dir, prog)
