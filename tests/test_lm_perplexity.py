"""CCNet-style bigram-LM perplexity — oracle parity, full-model Python
recompute, fluency ordering, short-doc exclusion."""

import math

from telegram2elastic_spark.corpus import as_corpus, load_corpus
from telegram2elastic_spark.functions.tokenizer import py_tokenize
from telegram2elastic_spark.operators import training as tr
from tests.oracle import assert_same

_SCALE = 1_000_000


def test_oracle_parity(spark, sf_dir, duck):
    df = tr.lm_perplexity(load_corpus(spark, sf_dir), "en", k=20)
    assert_same(df, duck.execute(tr.lm_perplexity_sql("en", k=20)).fetchdf())
    assert df.count() == 20


def _py_lm(docs, train_lang):
    """(doc_id, text, lang) -> {doc_id: (nb, ce, ppx)} — independent
    recompute of the whole train+score path."""
    c1, c2, vocab = {}, {}, set()
    for _, text, lang in docs:
        toksd = py_tokenize(text)
        if lang == train_lang:
            vocab.update(toksd)
            for a, b in zip(toksd, toksd[1:]):
                c1[a] = c1.get(a, 0) + 1
                c2[(a, b)] = c2.get((a, b), 0) + 1
    v = len(vocab)
    out = {}
    for did, text, _ in docs:
        toksd = py_tokenize(text)
        if len(toksd) < 2:
            continue
        s, nb = 0, 0
        for a, b in zip(toksd, toksd[1:]):
            p = (c2.get((a, b), 0) + 1) / (c1.get(a, 0) + v)
            s += round(math.log(p) * _SCALE)
            nb += 1
        ce = round(-s / (nb * float(_SCALE)), 5)
        out[did] = (nb, ce, round(math.exp(ce), 4))
    return out


def test_matches_python_recompute(spark, sf_dir):
    corpus = load_corpus(spark, sf_dir)
    docs = [(r.doc_id, r.text, r.lang)
            for r in corpus.select("doc_id", "text", "lang").collect()]
    exp = _py_lm(docs, "en")
    expected = sorted(
        ((ce, did, nb, ppx) for did, (nb, ce, ppx) in exp.items())
    )[:25]
    got = [
        (r.ce_nats, r.doc_id, r.n_bigrams, r.ppx)
        for r in tr.lm_perplexity(corpus, "en", k=25).collect()
    ]
    assert got == expected


def test_fluent_beats_garbage(spark):
    # train slice repeats a fluent pattern; a doc following the pattern
    # must out-score (lower ppx) a doc of unseen-garbage bigrams
    rows = [(i, "the cat sat on the mat", "en") for i in range(5)]
    rows += [(10, "the cat sat on the mat", "xx"),
             (11, "zz qq vv kk pp ww", "xx"),
             (12, "a", "xx")]                       # < 2 tokens: excluded
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).selectExpr("doc_id", "text", "lang", "'x' source",
                 "length(text) n_chars")
    got = {r.doc_id: r.ppx for r in
           tr.lm_perplexity(as_corpus(docs), "en", k=50).collect()}
    assert 12 not in got
    assert got[10] < got[11]


def test_ccnet_buckets_parity_and_terciles(spark, sf_dir, duck):
    df = tr.ccnet_buckets(load_corpus(spark, sf_dir), "en")
    assert_same(df, duck.execute(tr.ccnet_buckets_sql("en")).fetchdf())
    rows = df.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r.cnt
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}
        n = sum(b.values())
        # integer rank terciles: |head| = floor(n/3), |tail| = ceil(n/3)
        assert b["head"] == n // 3
        assert b["head"] <= b["middle"] <= b["tail"] <= b["head"] + 1


def test_absent_train_lang_raises(spark, sf_dir):
    import pytest

    with pytest.raises(ValueError, match="empty vocabulary"):
        tr.lm_perplexity(load_corpus(spark, sf_dir), "nosuchlang")
