"""Text analysis for training-data pipelines: language ID, quality scoring,
token counting, document fingerprinting.

The reference's enrichment stage scores every message with an LLM
(llm_classifier.py:185-247) behind a cheap rule-based gate (:80-98); these
operators are the native, deterministic, 100-TB-friendly analogues — pure
built-in Column expressions (whole-stage codegen, zero Python per row), each
with an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE, tokens

# Tiny function-word lists per language (n-gram-heuristic language ID; the
# real corpus vocabulary is synthetic, so accuracy is irrelevant — the
# operator contract is determinism and the argmax/tie-break semantics).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "es": ["el", "la", "de", "que", "y", "es"],
    "fr": ["le", "la", "de", "et", "est", "un"],
}
LANGS = sorted(STOPWORDS)


def _hits(lang: str) -> F.Column:
    lst = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(
        F.filter(F.col("__toks"), lambda t: F.array_contains(lst, t))
    )


def lang_id(corpus: DataFrame) -> DataFrame:
    """Stopword-hit language ID: argmax over per-language hit counts with
    deterministic tie-break (alphabetical lang; 'und' when zero hits)."""
    # tokens materialized once per row (|LANGS| references)
    df = corpus.withColumn("__toks", tokens("text")).select(
        "doc_id", *[_hits(lang).alias(f"hits_{lang}") for lang in LANGS]
    )
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANGS])
    pred = F.lit("und")
    for lang in reversed(LANGS):  # earlier langs win ties
        pred = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return df.select(
        "doc_id",
        *[F.col(f"hits_{lang}") for lang in LANGS],
        pred.alias("pred_lang"),
    ).orderBy("doc_id")


def lang_id_sql() -> str:
    hit_cols = []
    for lang in LANGS:
        arr = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        hit_cols.append(
            f"len(list_filter(toks, t -> list_contains([{arr}], t))) AS hits_{lang}"
        )
    hits_sql = ",\n         ".join(hit_cols)
    best = "greatest(" + ", ".join(f"hits_{lang}" for lang in LANGS) + ")"
    pred = "'und'"
    for lang in reversed(LANGS):
        pred = (
            f"CASE WHEN hits_{lang} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {pred} END"
        )
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
hits AS (
  SELECT doc_id,
         {hits_sql}
  FROM tokd
)
SELECT doc_id, {', '.join(f'hits_{lang}' for lang in LANGS)},
       {pred} AS pred_lang
FROM hits ORDER BY doc_id
"""


def quality_scores(corpus: DataFrame) -> DataFrame:
    """Quality heuristics: token count, mean token length, alnum ratio,
    stopword ratio, composite quality score in [0,1] (clamped like the
    reference's score clamp, llm_classifier.py:163)."""
    # tokens materialized once per row (referenced by 4 signals below)
    toks = F.col("__toks")
    n_tok = F.size(toks)
    # raw (unrounded) ratios: quality composes THESE; rounding only at the
    # output edge — composing pre-rounded 5-decimal values with decimal
    # weights lands exactly on .xxxxx5 half-way points where Spark/DuckDB
    # float noise flips the last digit.
    mean_len_raw = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)).cast("double")
        / n_tok,
    ).otherwise(F.lit(0.0))
    alnum = F.length(F.regexp_replace(F.col("text"), r"[^\p{L}\p{N}]", ""))
    alnum_raw = F.when(
        F.length("text") > 0, alnum.cast("double") / F.length("text")
    ).otherwise(F.lit(0.0))
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_arr = F.array(*[F.lit(w) for w in all_stop])
    stop_raw = F.when(
        n_tok > 0,
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast(
            "double"
        )
        / n_tok,
    ).otherwise(F.lit(0.0))
    quality = F.round(
        F.least(
            F.greatest(
                F.least(n_tok.cast("double") / 100.0, F.lit(1.0)) * 0.5
                + alnum_raw * 0.3
                + (1.0 - stop_raw) * 0.2,
                F.lit(0.0),
            ),
            F.lit(1.0),
        ),
        5,
    )
    return corpus.withColumn("__toks", tokens("text")).select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.round(mean_len_raw, 5).alias("mean_token_len"),
        F.round(alnum_raw, 5).alias("alnum_ratio"),
        F.round(stop_raw, 5).alias("stopword_ratio"),
        quality.alias("quality"),
    ).orderBy("doc_id")


def quality_scores_sql() -> str:
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    arr = ", ".join(f"'{w}'" for w in all_stop)
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
m AS (
  SELECT doc_id, text, toks,
         len(toks) AS n_tok,
         CASE WHEN len(toks) > 0 THEN
             CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
             / len(toks) ELSE 0.0 END AS mean_len_raw,
         CASE WHEN length(text) > 0 THEN
             CAST(length(regexp_replace(text, '[^\\p{{L}}\\p{{N}}]', '', 'g'))
                  AS DOUBLE) / length(text) ELSE 0.0 END AS alnum_raw,
         CASE WHEN len(toks) > 0 THEN
             CAST(len(list_filter(toks, t -> list_contains([{arr}], t)))
                  AS DOUBLE) / len(toks) ELSE 0.0 END AS stop_raw
  FROM tokd
)
SELECT doc_id,
       CAST(n_tok AS BIGINT) AS n_tokens,
       round(mean_len_raw, 5) AS mean_token_len,
       round(alnum_raw, 5) AS alnum_ratio,
       round(stop_raw, 5) AS stopword_ratio,
       round(least(greatest(
           least(CAST(n_tok AS DOUBLE) / 100.0, 1.0) * 0.5
           + alnum_raw * 0.3
           + (1.0 - stop_raw) * 0.2, 0.0), 1.0), 5) AS quality
FROM m ORDER BY doc_id
"""


# BPE-ish pre-token pattern: letter runs, digit runs, single other-symbols.
BPEISH_RE = r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"


def token_counts(corpus: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace words and a BPE-ish regex
    pre-tokenizer (the standard LLM-training cost estimator)."""
    ws = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    )
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPEISH_RE), 0))
    return corpus.select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpeish_tokens"),
    ).orderBy("doc_id")


TOKEN_COUNTS_SQL = f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id,
       CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                t -> t <> '')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPEISH_RE}')) AS BIGINT)
           AS bpeish_tokens
FROM corpus ORDER BY doc_id
"""


def fingerprints(corpus: DataFrame) -> DataFrame:
    """Document fingerprint: min/max rolling 3-gram shingle hash (winnowing-
    style extremes) — a compact dedup/citation key."""
    from ..operators.dedup import _toks, shingles_col

    # toks and the hashed-shingle array are materialized as columns so the
    # tokenizer/shingler run once per row (multi-referenced non-cheap
    # aliases are not collapsed) — see shingles_col's performance contract
    hashed = F.transform(
        shingles_col(3, F.col("toks")),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
    )
    sh = F.col("sh")
    return (
        corpus.select("doc_id", _toks().alias("toks"))
        .select("doc_id", hashed.alias("sh"))
        .select(
            "doc_id",
            F.when(F.size(sh) > 0, F.array_min(sh)).alias("fp_min"),
            F.when(F.size(sh) > 0, F.array_max(sh)).alias("fp_max"),
        )
        .orderBy("doc_id")
    )


def fingerprints_sql() -> str:
    from ..operators.dedup import TOKS_CTE_SQL

    return f"""
WITH {CORPUS_CTE.strip()},
{TOKS_CTE_SQL.strip()},
hashed AS (
  SELECT doc_id,
         list_transform(shingles,
             s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
  FROM shing
)
SELECT doc_id,
       CASE WHEN len(hs) > 0 THEN list_min(hs) END AS fp_min,
       CASE WHEN len(hs) > 0 THEN list_max(hs) END AS fp_max
FROM hashed ORDER BY doc_id
"""


# --- winnowing (Schleimer, Wilkerson & Aiken, SIGMOD 2003) -------------------
#
# The MOSS fingerprint-selection algorithm: hash every POSITIONAL k-token
# gram (document order, no distinct — winnowing is position-aware), slide
# a window of w consecutive hashes, select the minimum of each window
# taking the RIGHTMOST occurrence on ties, and keep the distinct
# (position, hash) pairs.  Guarantees: any shared run of >= w + k - 1
# tokens yields a shared fingerprint, and consecutive selected positions
# are at most w apart (density 2/(w+1) in expectation) — the robust
# upgrade over `fingerprints`' min/max extremes for plagiarism-grade
# matching.  Everything stays array-side per doc (narrow map + explode,
# no shuffle before the final distinct), so at 10^12 docs this is one
# corpus scan + one (doc, pos)-keyed distinct.


def winnowing_fingerprints(
    corpus: DataFrame, k: int = 3, w: int = 4
) -> DataFrame:
    """(doc_id, pos, fp): winnowing-selected fingerprints, pos = 1-based
    k-gram start, ordered (doc_id, pos).  Docs with fewer than k tokens
    emit nothing; docs with 1..w-1 grams emit the rightmost-min of all
    their hashes (the single short window)."""
    toks = F.col("toks")
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashed = F.transform(
        F.col("g"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint"),
    )
    hs = F.col("hs")
    starts = (
        F.when(F.size(hs) >= w, F.sequence(F.lit(1), F.size(hs) - (w - 1)))
        .when(F.size(hs) >= 1, F.array(F.lit(1)))
        .otherwise(F.array().cast("array<int>"))
    )

    def pick(t):
        sl = F.slice(hs, t, w)
        m = F.array_min(sl)
        # rightmost occurrence of the min: position in the reversed slice
        pos = (
            t.cast("long")
            + F.size(sl)
            - F.array_position(F.reverse(sl), m)
        )
        return F.struct(pos.alias("pos"), m.alias("fp"))

    return (
        corpus.select("doc_id", tokens("text").alias("toks"))
        .select("doc_id", grams.alias("g"))
        .select("doc_id", hashed.alias("hs"))
        .select("doc_id", F.explode(F.transform(starts, pick)).alias("p"))
        .select("doc_id", F.col("p.pos").alias("pos"), F.col("p.fp").alias("fp"))
        .distinct()
        .orderBy("doc_id", "pos")
    )


def winnowing_fingerprints_sql(k: int = 3, w: int = 4) -> str:
    gram = " || ' ' || ".join(f"toks[i+{j}]" for j in range(k))
    sl = f"list_slice(hs, t, t + {w - 1})"
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= {k}
              THEN list_transform(range(1, len(toks) - {k - 1} + 1),
                                  i -> {gram})
              ELSE [] END AS g
  FROM tokd
),
hashedg AS (
  SELECT doc_id,
         list_transform(g, s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hs
  FROM grams
),
picks AS (
  SELECT doc_id,
         unnest(list_transform(
             CASE WHEN len(hs) >= {w} THEN range(1, len(hs) - {w - 1} + 1)
                  WHEN len(hs) >= 1 THEN [CAST(1 AS BIGINT)]
                  ELSE [] END,
             t -> struct_pack(
                 pos := CAST(t + len({sl})
                             - list_position(list_reverse({sl}),
                                             list_min({sl})) AS BIGINT),
                 fp := list_min({sl})))) AS p
  FROM hashedg
)
SELECT DISTINCT doc_id, p.pos AS pos, p.fp AS fp
FROM picks ORDER BY doc_id, pos
"""


def token_entropy(corpus: DataFrame) -> DataFrame:
    """Per-document token-distribution Shannon entropy (bits) — the
    lexical-diversity quality signal: template/boilerplate/repetitive
    docs score low, natural prose high (the CCNet/Gopher-family
    diversity axis repetition_metrics measures from the other side).

    H = -sum_t (tf_t / len) * log2(tf_t / len) over the doc's token
    distribution; emitted with n_tokens and n_distinct (H's range is
    [0, log2(n_distinct)]).  Empty docs emit 0.0.

    Plan: explode + per-(doc, term) count + per-doc sum — two keyed hash
    aggregates with map-side combine (the nested_terms_agg shape; the
    in-array higher-order alternative is O(len x distinct) interpreted
    lambdas, measured 6x slower — nested.py's contract).  At 10^12 docs
    both shuffles key on (doc, term) / doc — fully parallel, no axis
    bottleneck.  Rounded to 5 (absorbs summation-order float noise,
    the events_rollup convention)."""
    from pyspark.sql.window import Window

    per = (
        corpus.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("n", F.sum("tf").over(Window.partitionBy("doc_id")))
    )
    p = F.col("tf") / F.col("n")
    ent = per.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        # + 0.0 folds IEEE -0.0 (single-token docs) to +0.0 cross-engine
        (F.round(-F.sum(p * F.log2(p)), 5) + F.lit(0.0)).alias("entropy"),
    )
    return (
        corpus.select("doc_id")
        .join(ent, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_distinct", F.lit(0)).cast("long").alias("n_distinct"),
            F.coalesce("entropy", F.lit(0.0)).alias("entropy"),
        )
        .orderBy("doc_id")
    )


TOKEN_ENTROPY_SQL = f"""
WITH {CORPUS_CTE.strip()},
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
per AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
),
tot AS (SELECT doc_id, sum(tf) AS n FROM per GROUP BY 1),
ent AS (
  SELECT per.doc_id,
         CAST(tot.n AS BIGINT) AS n_tokens,
         count(*) AS n_distinct,
         round(-sum((per.tf * 1.0 / tot.n) * log2(per.tf * 1.0 / tot.n)),
               5) + 0.0 AS entropy
  FROM per JOIN tot ON per.doc_id = tot.doc_id
  GROUP BY per.doc_id, tot.n
)
SELECT c.doc_id,
       COALESCE(e.n_tokens, 0) AS n_tokens,
       COALESCE(e.n_distinct, 0) AS n_distinct,
       COALESCE(e.entropy, 0.0) AS entropy
FROM corpus c LEFT JOIN ent e ON c.doc_id = e.doc_id
ORDER BY c.doc_id
"""


def keywords_tfidf(corpus: DataFrame, k: int = 5) -> DataFrame:
    """Per-document keyword extraction: the top-`k` terms by tf-idf
    (score = tf * ln((N+1)/(df+1)), the smooth-idf convention) — the
    classic summarization/labeling signal a training pipeline attaches
    to every document (topic tagging, cluster naming, index previews).

    Determinism contract: ranking uses an INTEGER key
    round(score * 1e5) — both engines compute the same double (one ln,
    one multiply) and the integer comparison removes any float-order
    ambiguity from the sort; ties break term-ascending.  Scores are
    emitted as the key / 1e5, so output doubles are exact dyadic values.

    Plan: one (doc, term) hash aggregate (the index build's tokenize
    shape, map-side combine), one term-keyed df aggregate, one shuffle
    join keyed on term, then a per-doc bounded in-array sort (doc
    vocabulary <= doc length — no window, no global sort).  N is one
    driver count (the temperature_sample driver-state pattern).  With a
    built index the df aggregate is FREE — term_dict already holds df —
    so at 10^12 docs this is the tf pass plus one term-keyed join.
    Reference analogue: the LLM topic labels (llm_classifier.py) whose
    deterministic stand-in enrich_classify stubs; tf-idf is the
    model-free version."""
    n_docs = corpus.count()
    per = (
        corpus.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = per.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(float(n_docs) + 1.0) / (F.col("df") + F.lit(1.0)))
    scored = per.join(df_t, "term").withColumn(
        "skey", F.round(F.col("tf") * idf * 100000).cast("bigint")
    )
    ranked = scored.groupBy("doc_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("skey")).alias("nk"),
                        F.col("term").alias("term"),
                    )
                )
            ),
            1,
            int(k),
        ).alias("top")
    )
    picked = ranked.select(
        "doc_id",
        F.transform("top", lambda s: s["term"]).alias("keywords"),
        F.transform("top", lambda s: F.round(-s["nk"] / 100000.0, 5)).alias(
            "scores"
        ),
    )
    return (
        corpus.select("doc_id")
        .join(picked, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("keywords", F.array().cast("array<string>")).alias(
                "keywords"
            ),
            F.coalesce("scores", F.array().cast("array<double>")).alias(
                "scores"
            ),
        )
        .orderBy("doc_id")
    )


def keywords_tfidf_sql(k: int = 5) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
per AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2
),
dft AS (SELECT term, count(*) AS df FROM per GROUP BY 1),
n AS (SELECT count(*) AS n FROM corpus),
scored AS (
  SELECT per.doc_id, per.term,
         CAST(round(per.tf * ln((n.n + 1.0) / (dft.df + 1.0)) * 100000)
              AS BIGINT) AS skey
  FROM per JOIN dft USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id,
         (list(term ORDER BY skey DESC, term))[1:{int(k)}] AS keywords,
         list_transform((list(skey ORDER BY skey DESC, term))[1:{int(k)}],
                        s -> round(s / 100000.0, 5)) AS scores
  FROM scored GROUP BY doc_id
)
SELECT c.doc_id,
       COALESCE(r.keywords, []) AS keywords,
       COALESCE(r.scores, []) AS scores
FROM corpus c LEFT JOIN ranked r ON c.doc_id = r.doc_id
ORDER BY c.doc_id
"""


# --- Unicode script profiling -------------------------------------------------

# Explicit code-point ranges, NOT \p{Script=...} property names: Java regex
# spells scripts \p{IsCyrillic} while RE2 spells them \p{Cyrillic}, so a
# property-name pattern cannot be shared verbatim between Spark and the
# DuckDB oracle.  \x{....} range escapes parse identically in both.
SCRIPTS = {
    "arabic": r"[\x{0600}-\x{06FF}]",
    "cjk": r"[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}\x{AC00}-\x{D7AF}]",
    "cyrillic": r"[\x{0400}-\x{04FF}]",
    "greek": r"[\x{0370}-\x{03FF}]",
    "latin": r"[A-Za-z\x{00C0}-\x{024F}]",
}
SCRIPT_NAMES = sorted(SCRIPTS)


def script_profile(corpus: DataFrame) -> DataFrame:
    """Per-document Unicode-script histogram + dominant script — the
    multilingual-pipeline routing signal (mC4/OSCAR split corpora by
    script before language ID; mixed-script docs are a spam/obfuscation
    marker).  Counts are code-point occurrences per script range, plus
    digits; `dominant` is the argmax over the five scripts with
    alphabetical tie-break and 'none' when no script character occurs
    (the lang_id argmax contract).  `frac_dominant` = dominant count /
    total script-character count, rounded 5 (0.0 when none).

    Plan: ONE map stage of regexp_count built-ins over the text column —
    no tokenize, no shuffle, codegen'd end to end; at 10^12 docs this is
    embarrassingly parallel scan work.  The synthetic corpus is ASCII so
    real data drives the non-Latin rows through the unit tests (crafted
    multi-script strings) — the operator contract is the deterministic
    count/argmax semantics, as with lang_id.
    """
    counts = {
        s: F.regexp_count(F.col("text"), F.lit(pat)).cast("long")
        for s, pat in SCRIPTS.items()
    }
    df = corpus.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        *[counts[s].alias(f"n_{s}") for s in SCRIPT_NAMES],
        F.regexp_count(F.col("text"), F.lit(r"[0-9]")).cast("long").alias(
            "n_digit"
        ),
    )
    best = F.greatest(*[F.col(f"n_{s}") for s in SCRIPT_NAMES])
    dom = F.lit("none")
    for s in reversed(SCRIPT_NAMES):  # earlier names win ties
        dom = F.when((F.col(f"n_{s}") == best) & (best > 0), F.lit(s)).otherwise(
            dom
        )
    tot = sum(F.col(f"n_{s}") for s in SCRIPT_NAMES)
    return df.select(
        "doc_id",
        "n_chars",
        *[F.col(f"n_{s}") for s in SCRIPT_NAMES],
        "n_digit",
        dom.alias("dominant"),
        F.when(tot > 0, F.round(best / tot, 5)).otherwise(F.lit(0.0)).alias(
            "frac_dominant"
        ),
    ).orderBy("doc_id")


def script_profile_sql() -> str:
    cnt = ",\n       ".join(
        f"CAST(len(regexp_extract_all(text, '{SCRIPTS[s]}')) AS BIGINT)"
        f" AS n_{s}"
        for s in SCRIPT_NAMES
    )
    best = "greatest(" + ", ".join(f"n_{s}" for s in SCRIPT_NAMES) + ")"
    dom = "'none'"
    for s in reversed(SCRIPT_NAMES):
        dom = (
            f"CASE WHEN n_{s} = {best} AND {best} > 0 "
            f"THEN '{s}' ELSE {dom} END"
        )
    tot = " + ".join(f"n_{s}" for s in SCRIPT_NAMES)
    return f"""
WITH {CORPUS_CTE.strip()},
cnt AS (
  SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       {cnt},
       CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit
  FROM corpus
)
SELECT doc_id, n_chars, {', '.join(f'n_{s}' for s in SCRIPT_NAMES)}, n_digit,
       {dom} AS dominant,
       CASE WHEN ({tot}) > 0
            THEN round({best} * 1.0 / ({tot}), 5) ELSE 0.0 END
           AS frac_dominant
FROM cnt ORDER BY doc_id
"""


# --- tokenizer fertility ------------------------------------------------------


def fertility_stats(corpus: DataFrame) -> DataFrame:
    """Per-language tokenizer fertility — the standard tokenizer-equity
    audit for multilingual training mixes (how many BPE-ish tokens a
    language pays per word and per byte; languages a tokenizer fragments
    get silently under-trained at a fixed token budget).

    Per lang: n_docs, ws_tokens (whitespace words), bpeish_tokens (the
    BPE-ish pre-tokenizer, token_counts' regex), n_bytes (UTF-8 octets),
    fertility = bpeish/ws rounded 5, bytes_per_token = bytes/bpeish
    rounded 5 (0.0 when the denominator is empty).

    Plan: one map stage (two regex counts + octet_length per row) into
    ONE lang-keyed hash aggregate with map-side combine — exact integer
    sums, divisions only on the |langs|-row result, so float
    summation-order can never differ across engines.  At 10^12 docs the
    shuffle carries |langs| partial states per task, nothing else."""
    ws = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    ).cast("long")
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPEISH_RE), 0)).cast(
        "long"
    )
    per = corpus.select(
        "lang",
        ws.alias("ws"),
        bpe.alias("bpe"),
        F.octet_length("text").cast("long").alias("nb"),
    )
    g = per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws").alias("ws_tokens"),
        F.sum("bpe").alias("bpeish_tokens"),
        F.sum("nb").alias("n_bytes"),
    )
    return g.select(
        "lang",
        "n_docs",
        "ws_tokens",
        "bpeish_tokens",
        "n_bytes",
        F.when(
            F.col("ws_tokens") > 0,
            F.round(F.col("bpeish_tokens") / F.col("ws_tokens"), 5),
        )
        .otherwise(F.lit(0.0))
        .alias("fertility"),
        F.when(
            F.col("bpeish_tokens") > 0,
            F.round(F.col("n_bytes") / F.col("bpeish_tokens"), 5),
        )
        .otherwise(F.lit(0.0))
        .alias("bytes_per_token"),
    ).orderBy("lang")


FERTILITY_SQL = f"""
WITH {CORPUS_CTE.strip()},
per AS (
  SELECT lang,
         CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
                  t -> t <> '')) AS BIGINT) AS ws,
         CAST(len(regexp_extract_all(text, '{BPEISH_RE}')) AS BIGINT) AS bpe,
         CAST(strlen(text) AS BIGINT) AS nb
  FROM corpus
),
g AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(ws) AS BIGINT) AS ws_tokens,
         CAST(sum(bpe) AS BIGINT) AS bpeish_tokens,
         CAST(sum(nb) AS BIGINT) AS n_bytes
  FROM per GROUP BY lang
)
SELECT lang, n_docs, ws_tokens, bpeish_tokens, n_bytes,
       CASE WHEN ws_tokens > 0
            THEN round(bpeish_tokens * 1.0 / ws_tokens, 5) ELSE 0.0 END
           AS fertility,
       CASE WHEN bpeish_tokens > 0
            THEN round(n_bytes * 1.0 / bpeish_tokens, 5) ELSE 0.0 END
           AS bytes_per_token
FROM g ORDER BY lang
"""


# --- Heaps-law vocabulary growth ------------------------------------------------

def vocab_growth(corpus: DataFrame, buckets: int = 10) -> DataFrame:
    """Heaps'-law vocabulary growth curve: distinct-vocabulary size after
    each 1/`buckets` prefix of the corpus in doc_id (arrival) order —
    the standard corpus-statistics readout for sizing term dictionaries
    and predicting vocab at 100x the data (V = K * n^beta; the measured
    curve IS the fit input, kept exact rather than fitted).

    Pinned semantics: prefix boundaries are INTEGER rank cutoffs
    ceil(i * n_docs / buckets) over doc_id asc (the ccnet_buckets
    tercile rule — both engines split at identical rows); vocab_size
    counts terms whose FIRST document (min doc_id) falls inside the
    prefix; token_count is the prefix's total token count (the Heaps
    x-axis).

    Scale shape: the vocab side is one (term -> min doc_id) hash
    aggregate (vocab-sized) joined against a `buckets`-row broadcast —
    never rescanned per prefix.  The boundary ranks here come from a
    row_number window over the NARROW (doc_id, dl) projection — fine at
    driver scale; at 10^12 docs the boundaries are order statistics of
    the doc store's SORT KEY (doc_id), i.e. row-group metadata lookups
    on the sorted store plus per-group dl prefix sums — no global
    window is inherent to the operator."""
    buckets = int(buckets)
    if buckets < 1:
        raise ValueError("buckets must be >= 1")
    from pyspark.sql import Window

    n_docs = corpus.count()
    cuts = [
        -(-i * n_docs // buckets)  # ceil
        for i in range(1, buckets + 1)
    ]
    docs_ranked = corpus.select(
        "doc_id", F.size(tokens("text")).alias("dl")
    ).withColumn(
        "rnk",
        F.row_number().over(Window.partitionBy(F.lit(0)).orderBy("doc_id")),
    )
    spark = corpus.sparkSession
    bounds = spark.createDataFrame(
        [(i + 1, c) for i, c in enumerate(cuts)], "bucket int, cut long"
    )
    # boundary doc_id per bucket + cumulative token count up to it
    bdoc = (
        docs_ranked.join(F.broadcast(bounds), F.col("rnk") <= F.col("cut"))
        .groupBy("bucket")
        .agg(
            F.max("doc_id").alias("max_doc"),
            F.sum("dl").alias("token_count"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    first_seen = (
        corpus.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    vocab = (
        first_seen.join(
            F.broadcast(bdoc), F.col("first_doc") <= F.col("max_doc")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    return (
        bdoc.join(vocab, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            "token_count",
            F.coalesce("vocab_size", F.lit(0)).alias("vocab_size"),
        )
        .orderBy("bucket")
    )


def vocab_growth_sql(buckets: int = 10) -> str:
    from ..functions.tokenizer import DOC_LEN_SQL, TOKENS_CTE

    buckets = int(buckets)
    return f"""
WITH {CORPUS_CTE.strip()},
{TOKENS_CTE.strip()},
n AS (SELECT count(*) AS n_docs FROM corpus),
ranked AS (
  SELECT doc_id,
         {DOC_LEN_SQL} AS dl,
         row_number() OVER (ORDER BY doc_id) AS rnk
  FROM corpus
),
bounds AS (
  SELECT i AS bucket, CAST(ceil(i * n.n_docs / {buckets}.0) AS BIGINT) AS cut
  FROM range(1, {buckets} + 1) AS r(i), n
),
bdoc AS (
  SELECT b.bucket, max(r.doc_id) AS max_doc,
         CAST(sum(r.dl) AS BIGINT) AS token_count,
         count(*) AS n_docs
  FROM ranked r JOIN bounds b ON r.rnk <= b.cut
  GROUP BY b.bucket
),
first_seen AS (
  SELECT term, min(doc_id) AS first_doc FROM tokens GROUP BY term
),
voc AS (
  SELECT b.bucket, count(*) AS vocab_size
  FROM first_seen f JOIN bdoc b ON f.first_doc <= b.max_doc
  GROUP BY b.bucket
)
SELECT CAST(bd.bucket AS INTEGER) AS bucket,
       bd.n_docs,
       bd.token_count,
       COALESCE(v.vocab_size, 0) AS vocab_size
FROM bdoc bd LEFT JOIN voc v ON bd.bucket = v.bucket
ORDER BY bucket
"""
