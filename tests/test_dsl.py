"""ES _search body DSL + search templates over the verified paths."""

import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import dsl

from .oracle import assert_same


def _idx(spark, sf_dir, positions=False):
    return build_index(
        load_corpus(spark, sf_dir), n_doc_parts=4, positions=positions
    )


BOOL_BODY = {
    "query": {
        "bool": {
            "must": [{"match": {"text": "the data row"}}],
            "must_not": [{"match": {"text": "vector"}}],
            "filter": [{"term": {"lang": "en"}}],
        }
    },
    "size": 10,
}


class TestExecuteDsl:
    def test_bool_vs_oracle(self, spark, duck, sf_dir):
        got = dsl.execute_dsl(_idx(spark, sf_dir), BOOL_BODY)
        want = duck.execute(dsl.dsl_sql(BOOL_BODY)).df()
        assert_same(got, want)

    def test_match_msm_vs_oracle(self, spark, duck, sf_dir):
        body = {"query": {"match": {"text": {
            "query": "the data row", "minimum_should_match": 2}}}, "size": 10}
        got = dsl.execute_dsl(_idx(spark, sf_dir), body)
        assert_same(got, duck.execute(dsl.dsl_sql(body)).df())

    def test_phrase_vs_oracle(self, spark, duck, sf_dir):
        body = {"query": {"match_phrase": {"text": {
            "query": "merge batch", "slop": 1}}}, "size": 10}
        got = dsl.execute_dsl(_idx(spark, sf_dir, positions=True), body)
        assert_same(got, duck.execute(dsl.dsl_sql(body)).df())

    def test_sparse_vector_dispatch(self, spark, sf_dir):
        from telegram2elastic_spark.query import sparse as sv

        body = {"query": {"sparse_vector": {
            "field": "text",
            "query_vector": {"spark": 2.1, "merge": 1.4}}}, "size": 8}
        idx = _idx(spark, sf_dir)
        got = [tuple(r) for r in dsl.execute_dsl(idx, body).collect()]
        want = [tuple(r) for r in sv.sparse_vector_topk(
            idx, {"spark": 2.1, "merge": 1.4}, k=8).collect()]
        assert got == want

    def test_range_filter_vs_oracle(self, spark, duck, sf_dir):
        body = {"query": {"bool": {
            "must": [{"match": {"text": "spark merge"}}],
            "filter": [{"range": {"doc_id": {"gte": 50, "lt": 400}}}],
        }}, "size": 10}
        got = dsl.execute_dsl(_idx(spark, sf_dir), body)
        want = duck.execute(dsl.dsl_sql(body)).df()
        assert_same(got, want)
        for r in got.collect():
            assert 50 <= r["doc_id"] < 400

    @pytest.mark.parametrize("bad", [
        {"query": {"match_all": {}}},
        {"query": {"match": {"title": "x"}}},
        {"query": {"bool": {"should": []}}},
        {"query": {"match": {"text": "x"}}, "aggs": {}},
        {"query": {"bool": {"filter": [{"term": {"html": "x"}}]}}},
    ])
    def test_out_of_subset_raises(self, bad):
        with pytest.raises(ValueError):
            dsl.parse_dsl(bad)


class TestTemplates:
    SRC = (
        '{"query": {"bool": {'
        '"must": [{"match": {"text": "{{q}}"}}],'
        '"filter": {{#toJson}}filters{{/toJson}}}},'
        '"size": {{k}}}'
    )

    def test_render(self):
        body = dsl.render_template(
            self.SRC,
            {"q": "the data", "k": 5,
             "filters": [{"term": {"lang": "en"}}]},
        )
        assert body["size"] == 5
        assert body["query"]["bool"]["must"][0]["match"]["text"] == "the data"

    def test_template_vs_oracle(self, spark, duck, sf_dir):
        params = {"q": "the data row", "k": 10,
                  "filters": [{"term": {"lang": "en"}}]}
        got = dsl.search_template_topk(_idx(spark, sf_dir), self.SRC, params)
        want = duck.execute(dsl.search_template_sql(self.SRC, params)).df()
        assert_same(got, want)

    def test_string_param_escaping(self):
        body = dsl.render_template(
            '{"query": {"match": {"text": "{{q}}"}}}',
            {"q": 'he said "hi"\\n'},
        )
        assert body["query"]["match"]["text"] == 'he said "hi"\\n'

    def test_missing_param_raises(self):
        with pytest.raises(ValueError, match="missing template param"):
            dsl.render_template('{"query": {"match": {"text": "{{q}}"}}}', {})


class TestLocalTwin:
    @pytest.mark.parametrize("body", [
        BOOL_BODY,
        {"query": {"match": {"text": {"query": "the data row",
                                      "minimum_should_match": 2}}}},
        {"query": {"sparse_vector": {"field": "text",
                                     "query_vector": {"spark": 2.1,
                                                      "merge": 1.4}}}},
        {"query": {"prefix": {"text": "sc"}}},
    ])
    def test_local_matches_distributed(self, spark, sf_dir, body):
        idx = _idx(spark, sf_dir)
        want = [
            (r["doc_id"], r["score"])
            for r in dsl.execute_dsl(idx, body).collect()
        ]
        got = [(d, s) for d, s in dsl.execute_dsl_local(idx, body)]
        assert got == want

    def test_local_phrase_matches(self, spark, sf_dir):
        idx = _idx(spark, sf_dir, positions=True)
        body = {"query": {"match_phrase": {"text": {"query": "merge batch",
                                                    "slop": 1}}}}
        want = [
            (r["doc_id"], r["score"])
            for r in dsl.execute_dsl(idx, body).collect()
        ]
        got = [(d, s) for d, s in dsl.execute_dsl_local(idx, body)]
        assert got == want


class TestTermsEnum:
    def test_vs_oracle_and_paging(self, spark, duck, sf_dir):
        from telegram2elastic_spark.query import expand as ex

        idx = _idx(spark, sf_dir)
        got = ex.terms_enum(idx, prefix="s", size=8)
        want = duck.execute(ex.terms_enum_sql(prefix="s", size=8)).df()
        assert_same(got, want)
        # keyset page 2 == rows [8, 16) of the full enumeration
        p1 = [r["term"] for r in got.collect()]
        p2 = [
            r["term"]
            for r in ex.terms_enum(
                idx, prefix="s", search_after=p1[-1], size=8
            ).collect()
        ]
        full = [
            r["term"]
            for r in ex.terms_enum(idx, prefix="s", size=16).collect()
        ]
        assert p1 + p2 == full


class TestDslExtensions:
    """Session-10 subset additions: ids / wrapper / exists / fuzziness."""

    def test_ids_query_vs_oracle(self, spark, duck, sf_dir):
        body = {"query": {"ids": {"values": [7, 3, 9999999, 12]}}, "size": 10}
        got = dsl.execute_dsl(_idx(spark, sf_dir), body)
        assert_same(got, duck.execute(dsl.dsl_sql(body)).df())
        rows = got.collect()
        assert [r["doc_id"] for r in rows] == [3, 7, 12]  # missing id drops
        assert all(r["score"] == 1.0 for r in rows)

    def test_wrapper_is_identity_with_inner(self, spark, sf_dir):
        import base64
        import json

        idx = _idx(spark, sf_dir)
        inner = {"match": {"text": "the data row"}}
        wrapped = {
            "query": {"wrapper": {"query": base64.b64encode(
                json.dumps(inner).encode()).decode()}},
            "size": 10,
        }
        a = dsl.execute_dsl(idx, wrapped).collect()
        b = dsl.execute_dsl(idx, {"query": inner, "size": 10}).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_ids_and_exists_filters(self, spark, sf_dir):
        idx = _idx(spark, sf_dir)
        body = {
            "query": {"bool": {
                "must": [{"match": {"text": "the data row"}}],
                "filter": [
                    {"ids": {"values": list(range(0, 300))}},
                    {"exists": {"field": "lang"}},
                ],
            }},
            "size": 10,
        }
        rows = dsl.execute_dsl(idx, body).collect()
        assert rows and all(r["doc_id"] < 300 for r in rows)

    def test_fuzzy_match_routes_to_blended(self, spark, sf_dir):
        from telegram2elastic_spark.query.expand import match_fuzzy_topk

        idx = _idx(spark, sf_dir)
        body = {"query": {"match": {"text": {
            "query": "fast row", "fuzziness": 2}}}, "size": 10}
        a = dsl.execute_dsl(idx, body).collect()
        b = match_fuzzy_topk(idx, ["fast", "row"], k=10, fuzziness=2).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_fuzzy_match_vs_oracle(self, spark, duck, sf_dir):
        body = {"query": {"match": {"text": {
            "query": "fast row", "fuzziness": 2}}}, "size": 10}
        got = dsl.execute_dsl(_idx(spark, sf_dir), body)
        assert_same(got, duck.execute(dsl.dsl_sql(body)).df())

    def test_rejections(self, spark, sf_dir):
        idx = _idx(spark, sf_dir)
        for bad in [
            {"query": {"ids": {"values": []}}},
            {"query": {"wrapper": {"q": "x"}}},
            {"query": {"bool": {"filter": [{"exists": {"field": "nope"}}]}}},
            {"query": {"match": {"text": {
                "query": "x", "fuzziness": 1, "boost": 2}}}},
        ]:
            with pytest.raises(ValueError):
                dsl.execute_dsl(idx, bad)


class TestValidateQuery:
    def test_valid_bodies_describe_dispatch(self):
        r = dsl.validate_query(BOOL_BODY)
        assert r["valid"] and "wand" in r["explanation"]
        r = dsl.validate_query(
            {"query": {"match_phrase": {"text": "merge batch"}}})
        assert r["valid"] and "phrase" in r["explanation"]

    def test_invalid_bodies_never_raise(self):
        for bad in [
            {"query": {"nope": {}}},
            {"query": {"bool": {"boost": 2}}},
            {"query": {"ids": {"values": []}}},
            {"q": 1},
            "not a dict",
        ]:
            r = dsl.validate_query(bad)
            assert r["valid"] is False and r["explanation"]

    def test_validate_agrees_with_execute(self, spark, sf_dir):
        idx = _idx(spark, sf_dir)
        body = {"query": {"match": {"text": "spark merge"}}, "size": 5}
        assert dsl.validate_query(body)["valid"]
        assert dsl.execute_dsl(idx, body).count() == 5
        bad = {"query": {"terms_set": {}}}
        assert not dsl.validate_query(bad)["valid"]
        with pytest.raises(ValueError):
            dsl.execute_dsl(idx, bad)


class TestMsearch:
    """ES _msearch: batch routing onto the batch kernels."""

    BODIES = [
        BOOL_BODY,
        {"query": {"match": {"text": {
            "query": "spark merge batch", "minimum_should_match": 2}}},
         "size": 8},
        {"query": {"match_phrase": {"text": {
            "query": "merge batch", "slop": 1}}}, "size": 6},
        {"query": {"bool": {"must": [
            {"match": {"text": "spark"}},
            {"match_phrase": {"text": "the fast"}}]}}, "size": 4},
    ]

    def test_msearch_vs_oracle(self, spark, duck, sf_dir):
        got = dsl.msearch(_idx(spark, sf_dir, positions=True), self.BODIES)
        want = duck.execute(dsl.msearch_sql(self.BODIES)).df()
        assert_same(got, want)

    def test_msearch_identity_with_single_dispatch(self, spark, sf_dir):
        """Each body's slice of the msearch result equals its own
        execute_dsl run (same rounding, same tie-breaks, same size)."""
        idx = _idx(spark, sf_dir, positions=True)
        rows = dsl.msearch(idx, self.BODIES).collect()
        for qid, body in enumerate(self.BODIES):
            mine = [(r["doc_id"], r["score"]) for r in rows
                    if r["query_id"] == qid]
            solo = [(r["doc_id"], r["score"])
                    for r in dsl.execute_dsl(idx, body).collect()]
            assert mine == solo, f"body {qid} diverges"

    def test_msearch_local_twin(self, spark, sf_dir):
        idx = _idx(spark, sf_dir, positions=True)
        got = [(r["query_id"], r["doc_id"], round(r["score"], 6))
               for r in dsl.msearch(idx, self.BODIES).collect()]
        lcl = [(q, d, round(s, 6))
               for q, d, s in dsl.msearch_local(idx, self.BODIES)]
        assert got == lcl

    def test_msearch_single_leg_kinds(self, spark, sf_dir):
        """ids / prefix bodies ride the singles leg and still come back
        tagged and size-trimmed."""
        idx = _idx(spark, sf_dir)
        bodies = [
            {"query": {"ids": {"values": [3, 1, 2]}}, "size": 2},
            {"query": {"match": {"text": "spark merge"}}, "size": 3},
        ]
        rows = dsl.msearch(idx, bodies).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        assert [r["doc_id"] for r in by_q[0]] == [1, 2]
        assert len(by_q[1]) == 3

    def test_msearch_empty_raises(self, spark, sf_dir):
        with pytest.raises(ValueError):
            dsl.msearch(_idx(spark, sf_dir), [])


SS_BODY = {
    "query": {
        "script_score": {
            "query": {"match": {"text": "spark merge"}},
            "script": {
                "source": "saturation(_score, 2)"
                          " * Math.log(1 + doc['doc_len'].value)"
            },
        }
    },
    "size": 10,
}


class TestScriptScoreBody:
    def test_vs_oracle(self, spark, duck, sf_dir):
        got = dsl.execute_dsl(_idx(spark, sf_dir), SS_BODY)
        assert_same(got, duck.execute(dsl.dsl_sql(SS_BODY)).df())

    def test_min_score_vs_oracle(self, spark, duck, sf_dir):
        body = {"query": {"script_score": {
            **SS_BODY["query"]["script_score"], "min_score": 0.5}},
            "size": 20}
        got = dsl.execute_dsl(_idx(spark, sf_dir), body)
        assert_same(got, duck.execute(dsl.dsl_sql(body)).df())

    def test_local_twin_identity(self, spark, sf_dir):
        idx = _idx(spark, sf_dir)
        dist = [
            (r["doc_id"], r["score"])
            for r in dsl.execute_dsl(idx, SS_BODY).collect()
        ]
        assert dsl.execute_dsl_local(idx, SS_BODY) == dist

    def test_msearch_mixes_script_body(self, spark, sf_dir):
        idx = _idx(spark, sf_dir)
        bodies = [
            {"query": {"match": {"text": "spark merge"}}, "size": 5},
            SS_BODY,
        ]
        got = dsl.msearch(idx, bodies).collect()
        single0 = dsl.execute_dsl(idx, bodies[0]).collect()
        single1 = dsl.execute_dsl(idx, bodies[1]).collect()
        by_q = {0: [], 1: []}
        for r in got:
            by_q[r["query_id"]].append((r["doc_id"], r["score"]))
        assert by_q[0] == [(r["doc_id"], r["score"]) for r in single0]
        assert by_q[1] == [(r["doc_id"], r["score"]) for r in single1]

    def test_validate_describes_script(self):
        v = dsl.validate_query(SS_BODY)
        assert v["valid"] and "script_score" in v["explanation"]
        bad = {"query": {"script_score": {
            "query": {"match": {"text": "x"}},
            "script": {"source": "Math.tan(_score)"}}}}
        v = dsl.validate_query(bad)
        assert not v["valid"] and "Math.tan" in v["explanation"]

    @pytest.mark.parametrize("bad", [
        # inner query must be a plain match
        {"query": {"script_score": {
            "query": {"match_phrase": {"text": "merge batch"}},
            "script": {"source": "_score"}}}},
        # missing script.source
        {"query": {"script_score": {
            "query": {"match": {"text": "x"}}, "script": {}}}},
        # nested script_score
        {"query": {"script_score": {
            "query": {"script_score": {
                "query": {"match": {"text": "x"}},
                "script": {"source": "_score"}}},
            "script": {"source": "_score"}}}},
        # unknown key
        {"query": {"script_score": {
            "query": {"match": {"text": "x"}},
            "script": {"source": "_score"}, "boost_mode": "sum"}}},
    ])
    def test_rejections(self, bad):
        with pytest.raises(ValueError):
            dsl.parse_dsl(bad)
