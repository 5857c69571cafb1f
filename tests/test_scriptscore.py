"""ES script_score: Painless-subset compiler, relational vs index-backed
vs DuckDB oracle."""

import numpy as np
import pytest

from telegram2elastic_spark.corpus import load_corpus
from telegram2elastic_spark.index.build import build_index
from telegram2elastic_spark.query import scriptscore as ss

from .oracle import assert_same

TERMS = ["spark", "merge"]

SCRIPTS = [
    "saturation(_score, 2) * Math.log(1 + doc['doc_len'].value)",
    "_score / (1.0 + Math.sqrt(doc['doc_len'].value))",
    "Math.max(0, 10 - _score) + sigmoid(doc['doc_len'].value, 50, 2)",
]


@pytest.fixture(scope="module")
def idx(spark, sf_dir):
    return build_index(load_corpus(spark, sf_dir), n_doc_parts=4)


# --- parser ---------------------------------------------------------------


def _py_eval(node, score, fields):
    """Independent pure-Python recursive evaluator (not an emitter)."""
    import math

    t = node[0]
    if t == "num":
        return node[1]
    if t == "score":
        return score
    if t == "field":
        return fields[node[1]]
    if t == "neg":
        return -_py_eval(node[1], score, fields)
    if t == "bin":
        a = _py_eval(node[2], score, fields)
        b = _py_eval(node[3], score, fields)
        if node[1] == "+":
            return a + b
        if node[1] == "-":
            return a - b
        if node[1] == "*":
            return a * b
        return a / b
    fn = {
        "log": math.log, "log10": math.log10, "exp": math.exp,
        "sqrt": math.sqrt, "abs": abs, "max": max, "min": min,
        "pow": math.pow,
    }[node[1]]
    return fn(*[_py_eval(a, score, fields) for a in node[2]])


@pytest.mark.parametrize("script", SCRIPTS)
def test_numpy_emitter_matches_pure_python(script):
    ast = ss.parse_script(script)
    for score, dl, ep in [(3.7, 12, 1640995300), (0.0, 1, 1640995200),
                          (15.25, 400, 1641000000)]:
        fields = {"doc_len": float(dl), "epoch": float(ep)}
        want = _py_eval(ast, score, fields)
        got = ss.to_numpy(
            ast, np.array([score]),
            {k: np.array([v]) for k, v in fields.items()},
        )[0]
        assert got == pytest.approx(want, rel=1e-12)


def test_sugar_expansion_values():
    sat = ss.parse_script("saturation(_score, 2)")
    assert _py_eval(sat, 6.0, {}) == pytest.approx(6.0 / 8.0)
    sig = ss.parse_script("sigmoid(_score, 2, 3)")
    assert _py_eval(sig, 4.0, {}) == pytest.approx(64.0 / (8.0 + 64.0))


def test_precedence_and_unary():
    ast = ss.parse_script("1 + 2 * 3 - -4")
    assert _py_eval(ast, 0.0, {}) == 11.0
    ast = ss.parse_script("(1 + 2) * 3")
    assert _py_eval(ast, 0.0, {}) == 9.0


@pytest.mark.parametrize("bad", [
    "doc['nope'].value",            # unknown field
    "Math.tan(_score)",             # unknown Math fn
    "frob(_score)",                 # unknown identifier
    "Math.max(_score)",             # wrong arity
    "_score + ",                    # dangling operator
    "_score 2",                     # trailing tokens
    "doc['doc_len']",               # missing .value
    "_score @ 2",                   # bad token
])
def test_parse_errors(bad):
    with pytest.raises(ValueError):
        ss.parse_script(bad)


# --- engines --------------------------------------------------------------


@pytest.mark.parametrize("script", SCRIPTS)
def test_relational_vs_oracle(spark, duck, sf_dir, script):
    got = ss.script_score_topk(load_corpus(spark, sf_dir), TERMS, script, k=10)
    want = duck.execute(ss.script_score_sql(TERMS, script, k=10)).df()
    assert_same(got, want)


@pytest.mark.parametrize("script", SCRIPTS)
def test_indexed_identical_to_relational(spark, sf_dir, idx, script):
    corpus = load_corpus(spark, sf_dir)
    rel = ss.script_score_topk(corpus, TERMS, script, k=10).collect()
    ind = ss.script_score_topk(corpus, TERMS, script, k=10, index=idx).collect()
    assert [tuple(r) for r in rel] == [tuple(r) for r in ind]


def test_min_score_filters_both_paths(spark, duck, sf_dir, idx):
    corpus = load_corpus(spark, sf_dir)
    script = SCRIPTS[0]
    full = ss.script_score_topk(corpus, TERMS, script, k=50).collect()
    cut = sorted(r["score"] for r in full)[len(full) // 2]
    rel = ss.script_score_topk(
        corpus, TERMS, script, k=50, min_score=cut
    ).collect()
    assert rel and all(r["score"] >= cut for r in rel)
    ind = ss.script_score_topk(
        corpus, TERMS, script, k=50, min_score=cut, index=idx
    ).collect()
    assert [tuple(r) for r in rel] == [tuple(r) for r in ind]
    want = duck.execute(
        ss.script_score_sql(TERMS, script, k=50, min_score=cut)
    ).df()
    assert_same(
        ss.script_score_topk(corpus, TERMS, script, k=50, min_score=cut), want
    )


def test_script_actually_reranks(spark, sf_dir, idx):
    """An inverse-ish script must change the order vs plain BM25."""
    from telegram2elastic_spark.query.wand import wand_topk

    corpus = load_corpus(spark, sf_dir)
    plain = [r["doc_id"] for r in wand_topk(idx, TERMS, k=20).collect()]
    re = [
        r["doc_id"]
        for r in ss.script_score_topk(
            corpus, TERMS, "Math.max(0, 10 - _score)", k=20, index=idx
        ).collect()
    ]
    assert plain != re


def test_no_query_time_tokenize_in_indexed_plan(spark, sf_dir, tmp_path):
    from telegram2elastic_spark.index.build import read_index, write_index

    corpus = load_corpus(spark, sf_dir)
    write_index(build_index(corpus, n_doc_parts=4), str(tmp_path / "idx"))
    disk = read_index(spark, str(tmp_path / "idx"))
    df = ss.script_score_topk(corpus, TERMS, SCRIPTS[0], k=10, index=disk)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "split(" not in plan and "explode" not in plan


def test_local_twin_identical_to_indexed(spark, sf_dir, idx):
    corpus = load_corpus(spark, sf_dir)
    scripts = SCRIPTS + [
        "_score * saturation(doc['epoch'].value - 1640995200, 600)",
        "_score + 1",          # field-free script
    ]
    for script in scripts:
        ind = [
            (r["doc_id"], r["score"])
            for r in ss.script_score_topk(
                corpus, TERMS, script, k=10, index=idx
            ).collect()
        ]
        loc = ss.script_score_topk_local(idx, TERMS, script, k=10)
        assert loc == ind, script


def test_local_twin_min_score(spark, sf_dir, idx):
    script = SCRIPTS[0]
    full = ss.script_score_topk_local(idx, TERMS, script, k=50)
    cut = sorted(s for _, s in full)[len(full) // 2]
    got = ss.script_score_topk_local(idx, TERMS, script, k=50, min_score=cut)
    assert got and all(s >= cut for _, s in got)
    assert got == [(d, s) for d, s in full if s >= cut]
