"""Porter stemmer (Porter, 1980, "An algorithm for suffix stripping") —
the ES `porter_stem` token filter / `english` analyzer stem stage.

Implemented from the published algorithm definition (steps 1a-5b over the
m-measure of the [C](VC)^m[V] word form).  The reference outsourced
analysis to the ES english analyzer (output/elasticsearch.py:33); owning
the index means owning the stemmer.

Engine shape: stemming is inherently per-token string surgery, so it runs
as an Arrow-batched pandas UDF over the corpus text (`apply_porter_analyzer`)
— the analyzed-view seam introduced for the stop filter.  There is no SQL
twin (DuckDB has no Porter function), so analyzer correctness is pinned by
the algorithm's published test vectors and by index-level behavior tests
instead of a driver oracle pair; the stop-filter pair covers the
analyzed-view plumbing cross-engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of VC transitions."""
    m = 0
    prev_v = False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_v and not v:
            m += 1
        prev_v = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (
        len(w) >= 2
        and w[-1] == w[-2]
        and _is_cons(w, len(w) - 1)
    )


def _cvc(w: str) -> bool:
    """*o: stem ends cvc where the final c is not w, x or y."""
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _replace(w: str, suffix: str, repl: str, min_m: int) -> str | None:
    """If w ends with suffix and measure(stem) > min_m, replace; else None."""
    if not w.endswith(suffix):
        return None
    stem = w[: len(w) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return w  # suffix matched but condition failed: stop this step


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    """Stem one lowercase token per the published algorithm."""
    w = word
    if len(w) <= 2:
        return w

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and w[-1] not in "lsz":
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2 (longest match wins: scan by suffix length desc)
    for suf, rep in sorted(_STEP2, key=lambda p: -len(p[0])):
        if w.endswith(suf):
            r = _replace(w, suf, rep, 0)
            if r is not None:
                w = r
            break

    # Step 3
    for suf, rep in sorted(_STEP3, key=lambda p: -len(p[0])):
        if w.endswith(suf):
            r = _replace(w, suf, rep, 0)
            if r is not None:
                w = r
            break

    # Step 4 (m > 1; 'ion' only after s/t)
    done4 = False
    for suf in sorted(_STEP4, key=len, reverse=True):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1:
                w = stem
            done4 = True
            break
    if not done4 and w.endswith("ion"):
        stem = w[:-3]
        if stem and stem[-1] in "st" and _measure(stem) > 1:
            w = stem

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w


def _stem_text_series(texts: pd.Series) -> pd.Series:
    """Stem every token of every row; separators normalized to one space
    (the analyzed-view round-trip contract, same as the stop filter)."""
    from .tokenizer import py_tokenize

    return texts.map(
        lambda t: " ".join(porter_stem(tok) for tok in py_tokenize(t or ""))
    )


def apply_porter_analyzer(corpus):
    """ES `porter_stem` filter as an analyzed corpus view: every token
    replaced by its stem, re-joined with single spaces so the rewritten
    text re-tokenizes to the stemmed stream.

    Arrow-batched iterator pandas UDF (per-token surgery cannot be a
    built-in expression); downstream build/query kernels are untouched —
    index-time AND query-time analysis happen by analyzing the corpus
    and the query terms with the same function, exactly the Lucene
    analyzer contract."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def stem_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for texts in it:
            yield _stem_text_series(texts)

    return corpus.withColumn("text", stem_udf("text"))


def analyze_query_terms(words: list[str]) -> list[str]:
    """Query-time twin: stem the analyzed query tokens."""
    return [porter_stem(w.lower()) for w in words]
