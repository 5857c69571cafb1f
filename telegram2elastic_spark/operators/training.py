"""Training-data pipeline operators beyond the reference's surface.

Four ops every large-scale pretraining pipeline runs between "indexed
corpus" and "training shards", each expressed as a declarative Spark plan
with an exact DuckDB oracle (cross-engine md5 determinism kit from
operators/dedup.py):

  * train_val_split — deterministic hash split (no RNG, stable across
    re-runs/partitionings: membership is a pure function of url).
  * decontaminate   — benchmark-overlap check: flag documents sharing any
    8-token shingle with a benchmark set (the n-gram decontamination used
    for eval hygiene).  Plan: explode doc shingles, broadcast-semi-join
    against the benchmark shingle set (small dim side), distinct doc ids.
  * redact_pii      — regex scrubbing (emails, IPv4s) with per-doc
    redaction counts; pure regexp_replace/regexp_count, JVM-side.
  * chunk_documents — token-window chunking (window + stride) for context
    packing; array slicing on the token array, exploded to one row per
    chunk — narrow, no shuffle.

At 10^12 docs: split and redact are map-only; chunking is map-only with
output fan-out; decontamination broadcasts the benchmark shingles (a
benchmark suite is tiny next to the corpus) so the probe is map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import DOC_LEN_SQL, TOKEN_SPLIT_RE, tokens
from .dedup import H64_SQL, TOKS_CTE_SQL, h64

# --- deterministic train/val split -------------------------------------------

N_SPLIT_BUCKETS = 1000


def train_val_split(corpus: DataFrame, val_per_mille: int = 100) -> DataFrame:
    """Assign each doc to 'train' or 'val' by hash bucket of its url —
    stable, RNG-free, and exactly val_per_mille/1000 of the key space."""
    bucket = F.pmod(h64(F.col("url")), F.lit(N_SPLIT_BUCKETS))
    return corpus.select(
        "doc_id",
        F.when(bucket < val_per_mille, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    ).orderBy("doc_id")


def train_val_split_sql(val_per_mille: int = 100) -> str:
    h = H64_SQL.format(x="url")
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id,
       CASE WHEN ({h}) % {N_SPLIT_BUCKETS} < {val_per_mille}
            THEN 'val' ELSE 'train' END AS split
FROM corpus ORDER BY doc_id
"""


# --- benchmark decontamination ------------------------------------------------

CONTAM_NGRAM = 8


def _ngrams(col_toks: F.Column, n: int) -> F.Column:
    # Docs with < n tokens yield NO shingles.  Spark's sequence(1, 0)
    # counts DOWN to [1, 0] and element_at(toks, 0) throws, so the short
    # case must be guarded explicitly (same guard as fuzzy._doc_trigrams_col);
    # the DuckDB oracle's range(1, ...) is upper-exclusive and emits none.
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(col_toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(col_toks, i + j) for j in range(n)]
            ),
        )
    )
    return F.when(
        F.size(col_toks) < n, F.array().cast("array<string>")
    ).otherwise(shingles)


def decontaminate(corpus: DataFrame, benchmark: DataFrame) -> DataFrame:
    """Docs sharing any CONTAM_NGRAM-token shingle with the benchmark set.

    Returns (doc_id, contaminated) for every corpus doc.  The benchmark
    shingle set is the broadcast side (eval suites are tiny vs the
    corpus); the corpus side is explode -> broadcast-semi-join -> distinct
    doc ids — map-side probe, one small dedup shuffle."""
    doc_sh = corpus.select("doc_id", tokens("text").alias("tk")).select(
        "doc_id",
        F.explode(_ngrams(F.col("tk"), CONTAM_NGRAM)).alias("sh"),
    )
    bench_sh = (
        benchmark.select(tokens("text").alias("tk"))
        .select(F.explode(_ngrams(F.col("tk"), CONTAM_NGRAM)).alias("sh"))
        .distinct()
    )
    hit = (
        doc_sh.join(F.broadcast(bench_sh), "sh", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        corpus.select("doc_id")
        .join(hit, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("contaminated", F.lit(False)).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def decontaminate_sql(benchmark_pred: str) -> str:
    """Oracle with the benchmark set defined as `corpus WHERE
    benchmark_pred` (how the driver query derives its benchmark)."""
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(CONTAM_NGRAM))
    ng = (
        "list_distinct(list_transform("
        f"range(1, greatest(len(toks) - {CONTAM_NGRAM - 1}, 0) + 1),"
        f" i -> {parts}))"
    )
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
doc_sh AS (SELECT doc_id, unnest({ng}) AS sh FROM tokd),
bench_sh AS (
  SELECT DISTINCT sh FROM doc_sh WHERE doc_id IN (
      SELECT doc_id FROM corpus WHERE {benchmark_pred})
),
hits AS (
  SELECT DISTINCT doc_id FROM doc_sh WHERE sh IN (SELECT sh FROM bench_sh)
)
SELECT c.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
ORDER BY c.doc_id
"""


# --- PII redaction --------------------------------------------------------------

# Dialect-portable patterns (same semantics in Java regex and RE2/DuckDB).
PII_PATTERNS = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

# Deterministic synthetic contact block so both engines redact the SAME
# strings regardless of corpus content (the corpus text itself is clean).
def _with_pii(corpus: DataFrame) -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), d.cast("string"),
        F.lit("@mail"), (d % 7).cast("string"),
        F.lit(".example or 10."), (d % 256).cast("string"),
        F.lit("."), (d % 100).cast("string"),
        F.lit("."), (d % 50).cast("string"),
    )


def redact_pii(corpus: DataFrame) -> DataFrame:
    """Scrub emails + IPv4s, report per-doc redaction counts and the
    scrubbed text (C13-family regex ops, all JVM-side)."""
    raw = _with_pii(corpus)
    redacted = raw
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(raw, F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}"),
        )
        redacted = F.regexp_replace(redacted, pat, f"[{name.upper()}]")
    return corpus.select(
        "doc_id", *counts, redacted.alias("clean_text")
    ).orderBy("doc_id")


def redact_pii_sql() -> str:
    raw = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@mail' || CAST(doc_id % 7 AS VARCHAR)"
        " || '.example or 10.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.' || CAST(doc_id % 100 AS VARCHAR)"
        " || '.' || CAST(doc_id % 50 AS VARCHAR)"
    )
    cnts = ",\n       ".join(
        f"CAST(len(regexp_extract_all({raw}, '{pat}')) AS BIGINT) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    red = raw
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '[{name.upper()}]', 'g')"
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id,
       {cnts},
       {red} AS clean_text
FROM corpus ORDER BY doc_id
"""


# --- token-window chunking -------------------------------------------------------


def chunk_documents(
    corpus: DataFrame, window: int = 64, stride: int = 48
) -> DataFrame:
    """Context-window packing: one row per (doc, chunk) with the chunk's
    token span rejoined to text.  Narrow map + explode — no shuffle; chunk
    starts advance by `stride` (overlap = window - stride), short docs
    yield one truncated chunk."""
    # tokens materialized once per row (the chunk lambda slices the array
    # per chunk — a raw tokenizer expression would re-split per chunk)
    toks = F.col("toks")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - (window - stride), F.lit(1)),
        F.lit(stride),
    )
    chunks = F.transform(
        starts,
        lambda s: F.concat_ws(" ", F.slice(toks, s, window)),
    )
    return (
        corpus.select("doc_id", tokens("text").alias("toks"))
        .select(
            "doc_id",
            F.size(toks).alias("doc_tokens"),
            F.posexplode(chunks).alias("chunk_id", "chunk_text"),
        )
        .withColumn(
            "chunk_tokens",
            F.when(F.col("chunk_text") == "", 0)
            .otherwise(F.size(F.split(F.col("chunk_text"), " ")))
            .cast("long"),
        )
        .withColumn("chunk_id", F.col("chunk_id").cast("long"))
        .orderBy("doc_id", "chunk_id")
    )


def chunk_documents_sql(window: int = 64, stride: int = 48) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
chunked AS (
  SELECT doc_id, len(toks) AS doc_tokens,
         list_transform(starts,
             s -> coalesce(
                 array_to_string(toks[s : s + {window} - 1], ' '), ''))
             AS texts
  FROM (
    SELECT doc_id, toks,
           range(1, greatest(len(toks) - {window - stride}, 1) + 1,
                 {stride}) AS starts
    FROM tokd
  )
),
flat AS (
  SELECT doc_id, doc_tokens,
         generate_subscripts(texts, 1) - 1 AS chunk_id,
         unnest(texts) AS chunk_text
  FROM chunked
)
SELECT CAST(chunk_id AS BIGINT) AS chunk_id,
       chunk_text,
       CAST(CASE WHEN chunk_text = '' THEN 0
                 ELSE len(string_split(chunk_text, ' ')) END AS BIGINT)
           AS chunk_tokens,
       doc_id,
       doc_tokens
FROM flat ORDER BY doc_id, chunk_id
"""


# --- Gopher-style quality rules ----------------------------------------------
#
# The rule bundle from the Gopher / MassiveText filtering stage (composite
# document-level heuristics, each cheap and JVM-native): word-count bounds,
# mean-word-length bounds, a repetition signal (unique-word fraction), and
# stop-token presence.  Emits the per-doc signals, the verdict, and the
# ordered list of failed rules so downstream can slice rejects by reason.
# Map-only: no shuffle, no UDF — survives any corpus size as a pure scan.

GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 10_000
GOPHER_MIN_MEAN_WLEN = 3.0
GOPHER_MAX_MEAN_WLEN = 10.0
GOPHER_MIN_UNIQ_FRAC = 0.45
GOPHER_STOP_TOKENS = ["the", "a", "data"]
GOPHER_MIN_STOP_HITS = 2


def quality_gopher(corpus: DataFrame) -> DataFrame:
    """(doc_id, n_words, mean_word_len, uniq_frac, stop_hits, passes,
    fail_reasons), doc_id order; floats rounded to 5 so the verdicts are
    engine-portable."""
    # tokens materialized once per row (6 references below)
    toks = F.col("toks")
    d = corpus.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
            )
            / F.size(toks),
            5,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.array_distinct(toks)) / F.size(toks), 5
        ).alias("uniq_frac"),
        F.size(
            F.array_intersect(
                toks, F.array(*[F.lit(t) for t in GOPHER_STOP_TOKENS])
            )
        ).alias("stop_hits"),
    )
    fails = F.filter(
        F.array(
            F.when(
                ~F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS),
                F.lit("word_count"),
            ),
            F.when(
                ~F.col("mean_word_len").between(
                    GOPHER_MIN_MEAN_WLEN, GOPHER_MAX_MEAN_WLEN
                ),
                F.lit("mean_word_len"),
            ),
            F.when(
                F.col("uniq_frac") < GOPHER_MIN_UNIQ_FRAC, F.lit("repetition")
            ),
            F.when(
                F.col("stop_hits") < GOPHER_MIN_STOP_HITS, F.lit("stop_tokens")
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        d.withColumn("fail_reasons", fails)
        .withColumn("passes", F.size("fail_reasons") == 0)
        .select(
            "doc_id", "n_words", "mean_word_len", "uniq_frac", "stop_hits",
            "passes", "fail_reasons",
        )
        .orderBy("doc_id")
    )


def quality_gopher_sql() -> str:
    stops = ", ".join(f"'{t}'" for t in GOPHER_STOP_TOKENS)
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
sig AS (
  SELECT doc_id,
         CAST(len(toks) AS INTEGER) AS n_words,
         round(CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
               / len(toks), 5) AS mean_word_len,
         round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 5)
             AS uniq_frac,
         CAST(len(list_intersect(toks, [{stops}])) AS INTEGER) AS stop_hits
  FROM tokd
),
flagged AS (
  SELECT *,
         list_filter([
           CASE WHEN n_words NOT BETWEEN {GOPHER_MIN_WORDS}
                                     AND {GOPHER_MAX_WORDS}
                THEN 'word_count' END,
           CASE WHEN mean_word_len NOT BETWEEN {GOPHER_MIN_MEAN_WLEN}
                                           AND {GOPHER_MAX_MEAN_WLEN}
                THEN 'mean_word_len' END,
           CASE WHEN uniq_frac < {GOPHER_MIN_UNIQ_FRAC}
                THEN 'repetition' END,
           CASE WHEN stop_hits < {GOPHER_MIN_STOP_HITS}
                THEN 'stop_tokens' END
         ], x -> x IS NOT NULL) AS fail_reasons
  FROM sig
)
SELECT doc_id, n_words, mean_word_len, uniq_frac, stop_hits,
       len(fail_reasons) = 0 AS passes, fail_reasons
FROM flagged ORDER BY doc_id
"""


# --- stratified sampling ------------------------------------------------------
#
# Language-balanced corpus sampling: per-stratum (lang) keep rates in
# per-mille, membership a pure hash of the url (the train_val_split
# determinism contract — re-runs, repartitions, and both engines agree on
# every row).  Map-only; the rate table rides along as a literal CASE, so
# at 10^12 docs this is a scan with a codegen'd predicate — no join, no
# shuffle, no RNG state.

STRATA_RATES = {"en": 600, "zh": 300, "de": 300, "fr": 150}
STRATA_DEFAULT_RATE = 50


def stratified_sample(
    corpus: DataFrame,
    rates: dict[str, int] | None = None,
    default_rate: int = STRATA_DEFAULT_RATE,
) -> DataFrame:
    """Sampled (doc_id, lang) — doc kept iff its url-hash bucket falls
    under its language's per-mille rate."""
    rates = STRATA_RATES if rates is None else rates
    rate = F.lit(int(default_rate))
    for lang, r in sorted(rates.items()):
        rate = F.when(F.col("lang") == lang, F.lit(int(r))).otherwise(rate)
    bucket = F.pmod(h64(F.col("url")), F.lit(N_SPLIT_BUCKETS))
    return (
        corpus.filter(bucket < rate)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def stratified_sample_sql(
    rates: dict[str, int] | None = None,
    default_rate: int = STRATA_DEFAULT_RATE,
) -> str:
    rates = STRATA_RATES if rates is None else rates
    h = H64_SQL.format(x="url")
    whens = "\n           ".join(
        f"WHEN lang = '{lang}' THEN {int(r)}"
        for lang, r in sorted(rates.items())
    )
    return f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id, lang
FROM corpus
WHERE ({h}) % {N_SPLIT_BUCKETS}
      < CASE {whens}
             ELSE {int(default_rate)} END
ORDER BY doc_id
"""


# --- LM quality filter (CCNet shape) ------------------------------------------
#
# CCNet ranks documents by their perplexity under a language model trained
# on a trusted corpus and keeps the low-perplexity head.  The sandbox
# analogue: a Laplace-smoothed BIGRAM model whose statistics come from the
# corpus itself (the same bigram_dict artifact the phrase suggester
# consults — built once, one tokenize + one hash aggregate), evaluated
# exactly:
#
#   H(doc) = -( ln P(w1) + sum_i ln P(w_i | w_{i-1}) ) / n
#   P(w1)        = (cf(w1)+1) / (T+V)
#   P(w|prev)    = (c(prev w)+1) / (cf(prev)+V)
#
# Plan: one shuffle join of exploded doc bigrams against the bigram table
# plus a broadcast-or-shuffle join against the unigram table, then one
# hash aggregate back to doc_id.  Every join key is a token string —
# uniform, no skew beyond Zipf heads, which AQE's skew-join splitting
# handles; nothing is driver-side.  A real deployment swaps the
# stats tables for ones built on the trusted corpus — the plan is
# unchanged.

LM_KEEP_BELOW = 3.41


def lm_cross_entropy(
    corpus: DataFrame, keep_below: float = LM_KEEP_BELOW
) -> DataFrame:
    """(doc_id, n_tokens, cross_entropy, keep) — bigram cross-entropy in
    nats per token under the corpus's own Laplace bigram LM, doc order.
    Docs with < 2 tokens are scored on the unigram term alone."""
    toks = tokens("text")
    tokd = corpus.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    uni = (
        tokd.select(F.explode("toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cf"))
    )
    vv = uni.agg(
        F.count(F.lit(1)).cast("double").alias("V"),
        F.sum("cf").cast("double").alias("T"),
    )
    bg = (
        tokd.select(
            F.explode(
                F.when(
                    F.size("toks") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("toks") - 1),
                        lambda i: F.concat_ws(
                            " ",
                            F.element_at("toks", i),
                            F.element_at("toks", i + 1),
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bcnt"))
    )
    # per-doc first-token unigram term
    first = (
        tokd.select(
            "doc_id", F.element_at("toks", 1).alias("term"),
            F.size("toks").alias("n_tokens"),
        )
        .join(uni, "term")
        .crossJoin(F.broadcast(vv))
        .select(
            "doc_id",
            "n_tokens",
            F.log((F.col("cf") + 1.0) / (F.col("T") + F.col("V"))).alias(
                "lp"
            ),
        )
    )
    # per-doc bigram transitions: ln P(w_i | w_{i-1}) summed
    doc_bg = tokd.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("toks") - 1),
                    lambda i: F.struct(
                        F.element_at("toks", i).alias("prev"),
                        F.concat_ws(
                            " ",
                            F.element_at("toks", i),
                            F.element_at("toks", i + 1),
                        ).alias("bigram"),
                    ),
                ),
            ).otherwise(
                F.array().cast("array<struct<prev:string,bigram:string>>")
            )
        ).alias("t"),
    ).select("doc_id", "t.prev", "t.bigram")
    trans = (
        doc_bg.join(bg, "bigram")
        .join(uni.withColumnRenamed("term", "prev"), "prev")
        .crossJoin(F.broadcast(vv))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    (F.col("bcnt") + 1.0) / (F.col("cf") + F.col("V"))
                )
            ).alias("lp_trans")
        )
    )
    h = -(F.col("lp") + F.coalesce(F.col("lp_trans"), F.lit(0.0))) / F.col(
        "n_tokens"
    )
    return (
        first.join(trans, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(h, 5).alias("cross_entropy"),
            (F.round(h, 5) < float(keep_below)).alias("keep"),
        )
        .orderBy("doc_id")
    )


def lm_cross_entropy_sql(keep_below: float = LM_KEEP_BELOW) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
  WHERE len(list_filter(regexp_split_to_array(lower(text),
        '{TOKEN_SPLIT_RE}'), t -> t <> '')) > 0
),
uni AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf
  FROM (SELECT unnest(toks) AS term FROM tokd) GROUP BY term
),
vv AS (SELECT CAST(count(*) AS DOUBLE) AS V,
              CAST(sum(cf) AS DOUBLE) AS T FROM uni),
bg AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS bcnt
  FROM (
    SELECT toks[i] || ' ' || toks[i + 1] AS bigram
    FROM tokd, unnest(range(1, len(toks))) AS t(i)
  ) GROUP BY bigram
),
first AS (
  SELECT d.doc_id, len(d.toks) AS n_tokens,
         ln((u.cf + 1.0) / (vv.T + vv.V)) AS lp
  FROM tokd d JOIN uni u ON u.term = d.toks[1] CROSS JOIN vv
),
doc_bg AS (
  SELECT doc_id, toks[i] AS prev, toks[i] || ' ' || toks[i + 1] AS bigram
  FROM tokd, unnest(range(1, len(toks))) AS t(i)
),
trans AS (
  SELECT db.doc_id,
         sum(ln((bg.bcnt + 1.0) / (u.cf + vv.V))) AS lp_trans
  FROM doc_bg db
  JOIN bg ON bg.bigram = db.bigram
  JOIN uni u ON u.term = db.prev
  CROSS JOIN vv
  GROUP BY db.doc_id
)
SELECT f.doc_id,
       CAST(f.n_tokens AS INTEGER) AS n_tokens,
       round(-(f.lp + coalesce(t.lp_trans, 0.0)) / f.n_tokens, 5)
           AS cross_entropy,
       round(-(f.lp + coalesce(t.lp_trans, 0.0)) / f.n_tokens, 5)
           < {float(keep_below)} AS keep
FROM first f LEFT JOIN trans t ON f.doc_id = t.doc_id
ORDER BY f.doc_id
"""


# --- per-domain document caps -------------------------------------------------


def cap_per_host(
    corpus: DataFrame, max_per_host: int = 3, limit: int = 50
) -> DataFrame:
    """Domain balancing (the C4 / web-pipeline step that stops one
    prolific host from dominating the corpus): keep at most
    `max_per_host` docs per url host, preferring the NEWEST (warc_ts
    desc, doc_id asc tie-break).  One window rank per host partition —
    a hash repartition on host plus a per-partition sort; no global
    sort, no driver state.  Bounded page of survivors in doc_id order
    (`limit` pages the verification sample; pass None upstream)."""
    from pyspark.sql import Window

    from ..query.collapse import host_col

    w = Window.partitionBy("host").orderBy(
        F.desc("warc_ts"), F.asc("doc_id")
    )
    out = (
        corpus.withColumn("host", host_col())
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= int(max_per_host))
        .select("doc_id", "host", F.col("rn").cast("int").alias("rn"))
        .orderBy("doc_id")
    )
    return out.limit(int(limit)) if limit else out


def cap_per_host_sql(max_per_host: int = 3, limit: int = 50) -> str:
    from ..query.collapse import HOST_SQL

    lim = f"LIMIT {int(limit)}" if limit else ""
    return f"""
WITH {CORPUS_CTE.strip()},
ranked AS (
  SELECT doc_id, {HOST_SQL} AS host,
         CAST(row_number() OVER (
           PARTITION BY {HOST_SQL}
           ORDER BY warc_ts DESC, doc_id ASC) AS INTEGER) AS rn
  FROM corpus
)
SELECT doc_id, host, rn FROM ranked
WHERE rn <= {int(max_per_host)}
ORDER BY doc_id
{lim}
"""


def temperature_sample(corpus: DataFrame, budget: int = 200) -> DataFrame:
    """Multilingual temperature sampling (the XLM-R/mT5 alpha-sampling
    shape, alpha = 1/2): low-resource languages are UP-weighted relative
    to their corpus share — sampling mass q_l proportional to
    sqrt(c_l) — and `budget` total docs are drawn deterministically.

    Pinned integer contract (keeps both engines bit-identical — the
    statistics are unchanged):
        s_l      = floor(sqrt(c_l))        (exact: sqrt is correctly
                                            rounded IEEE, floor exact)
        S        = sum_l s_l               (integer sum, order-free)
        thresh_l = min(NB, (NB * budget * s_l) DIV (c_l * S))
    and a doc is kept iff its url-hash bucket (mod NB = 1000) falls
    under its language's threshold — the same RNG-free membership as
    stratified_sample, so samples are nested as the budget grows.

    Scale shape: the per-lang histogram is ONE map-side hash aggregate
    collapsing to a handful of rows, collected as driver state (the
    k-row-literals pattern the WAND path uses for idfs — a lang
    histogram is bounded by the language inventory, not the corpus);
    thresholds fold into the scan as a CASE literal, membership is a
    map-only filter.  No second corpus pass, no join, no window."""
    import math

    nb = N_SPLIT_BUCKETS
    hist = {
        r["lang"]: int(r["c"])
        for r in corpus.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    if not hist:
        return corpus.select("doc_id", "lang")
    S = sum(math.isqrt(c) for c in hist.values())
    thresh = {
        lang: min(nb, (nb * int(budget) * math.isqrt(c)) // (c * S))
        for lang, c in hist.items()
    }
    t = F.lit(0)
    for lang, th in sorted(thresh.items()):
        t = F.when(F.col("lang") == lang, F.lit(th)).otherwise(t)
    bucket = F.pmod(h64(F.col("url")), F.lit(nb))
    return (
        corpus.filter(bucket < t)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def temperature_sample_sql(budget: int = 200) -> str:
    nb = N_SPLIT_BUCKETS
    h = H64_SQL.format(x="url")
    return f"""
WITH {CORPUS_CTE.strip()},
hist AS (
  SELECT lang, count(*) AS c,
         CAST(floor(sqrt(count(*))) AS BIGINT) AS sl
  FROM corpus GROUP BY lang
),
tot AS (SELECT sum(sl) AS s_tot FROM hist),
thr AS (
  SELECT lang,
         least(CAST({nb} AS BIGINT),
               ({nb} * {int(budget)} * sl) // (c * s_tot)) AS thresh
  FROM hist CROSS JOIN tot
)
SELECT c.doc_id, c.lang
FROM corpus c JOIN thr ON c.lang = thr.lang
WHERE ({h}) % {nb} < thr.thresh
ORDER BY c.doc_id
"""


FUNNEL_MIN_CHARS = 200
FUNNEL_MAX_CHARS = 10_000
FUNNEL_LANGS = ("de", "en", "fr", "zh")


def pipeline_funnel(corpus: DataFrame) -> DataFrame:
    """Training-pipeline funnel report: cumulative survivor counts per
    cleaning stage — the observability table every data pipeline ships
    next to its outputs (how many docs each gate removed).

    Stages (cumulative — each applies on top of the previous):
      1 ingested        all docs
      2 length_gate     n_chars in [FUNNEL_MIN_CHARS, FUNNEL_MAX_CHARS]
      3 lang_whitelist  lang in FUNNEL_LANGS
      4 exact_dedup     keep-first by text hash among stage-3 survivors

    Output (stage, stage_name, survivors), stage order.

    Scale shape: stages 1-3 are flags in ONE corpus scan folded into one
    map-side-combinable aggregate; stage 4 adds the single hash-group
    shuffle exact dedup always costs (keep = min doc_id per text hash,
    computed only over stage-3 survivors).  The stacked output is 4
    literal rows."""
    from ..operators.dedup import h64
    from pyspark.sql import Window

    f2 = F.col("n_chars").between(FUNNEL_MIN_CHARS, FUNNEL_MAX_CHARS)
    f3 = f2 & F.col("lang").isin(*FUNNEL_LANGS)
    flagged = corpus.withColumn("f2", f2).withColumn("f3", f3)
    keep4 = (
        F.col("f3")
        & (
            F.col("doc_id")
            == F.min(F.when(F.col("f3"), F.col("doc_id"))).over(
                Window.partitionBy(h64(F.col("text")))
            )
        )
    )
    agg = flagged.withColumn("f4", keep4).agg(
        F.count(F.lit(1)).alias("s1"),
        F.sum(F.col("f2").cast("long")).alias("s2"),
        F.sum(F.col("f3").cast("long")).alias("s3"),
        F.sum(F.col("f4").cast("long")).alias("s4"),
    )
    return agg.selectExpr(
        "stack(4, "
        "1L, 'ingested', s1, "
        "2L, 'length_gate', s2, "
        "3L, 'lang_whitelist', s3, "
        "4L, 'exact_dedup', s4) AS (stage, stage_name, survivors)"
    ).orderBy("stage")


def pipeline_funnel_sql() -> str:
    langs = ", ".join(f"'{l}'" for l in FUNNEL_LANGS)
    h = H64_SQL.format(x="text")
    return f"""
WITH {CORPUS_CTE.strip()},
flagged AS (
  SELECT doc_id, text, lang,
         n_chars BETWEEN {FUNNEL_MIN_CHARS} AND {FUNNEL_MAX_CHARS} AS f2,
         (n_chars BETWEEN {FUNNEL_MIN_CHARS} AND {FUNNEL_MAX_CHARS})
           AND lang IN ({langs}) AS f3
  FROM corpus
),
keyed AS (
  SELECT *,
         f3 AND doc_id = min(CASE WHEN f3 THEN doc_id END)
           OVER (PARTITION BY {h}) AS f4
  FROM flagged
),
agg AS (
  SELECT count(*) AS s1,
         sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS s2,
         sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS s3,
         sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS s4
  FROM keyed
)
SELECT CAST(stage AS BIGINT) AS stage, stage_name,
       CAST(survivors AS BIGINT) AS survivors
FROM agg, LATERAL (
  VALUES (1, 'ingested', s1), (2, 'length_gate', s2),
         (3, 'lang_whitelist', s3), (4, 'exact_dedup', s4)
) AS t(stage, stage_name, survivors)
ORDER BY stage
"""


PACK_SEQ_LEN = 64
PACK_BUCKET = 1000


def pack_sequences(
    corpus: DataFrame, seq_len: int = PACK_SEQ_LEN, bucket: int = PACK_BUCKET
) -> DataFrame:
    """GPT-style sequence packing: concatenate every doc's token stream
    in doc_id order and cut it into fixed ``seq_len`` training sequences
    (docs may span a boundary; a sequence may hold many docs).  The
    output is the (seq_id, doc_id) placement map a training data loader
    consumes: which token span of which doc lands where in which packed
    sequence.

    The global token offset of each doc is an ordered prefix sum — the
    one pattern a naive Window(orderBy) gets wrong at scale (single
    partition over the whole corpus).  Scalable two-pass shape instead:
      1. bucket docs by doc_id range (``bucket`` ids per bucket); per-
         bucket token totals are ONE map-side-combined hash agg
         (#buckets rows, corpus_size/bucket),
      2. exclusive prefix over the tiny bucket table (bounded window —
         #buckets rows, not #docs),
      3. within-bucket running sum via Window PARTITIONED by bucket —
         a real partitioned window, no global sort.
    offset(doc) = bucket_prefix + within_bucket_cumsum - n_toks; the rest
    is arithmetic + one bounded explode (a doc of n tokens spans at most
    n/seq_len + 1 sequences).

    Returns (seq_id, doc_id, tok_begin, tok_end, seq_pos): doc tokens
    [tok_begin, tok_end) land at position seq_pos of sequence seq_id.
    Zero-token docs are skipped (they occupy no span).
    """
    from pyspark.sql.window import Window

    seq_len, bucket = int(seq_len), int(bucket)
    if seq_len < 1 or bucket < 1:
        raise ValueError("seq_len and bucket must be >= 1")
    t = (
        corpus.select(
            "doc_id",
            F.size(tokens("text")).cast("long").alias("n_toks"),
            (F.floor(F.col("doc_id") / bucket)).cast("long").alias("bkt"),
        )
        .filter(F.col("n_toks") > 0)
    )
    per_bucket = t.groupBy("bkt").agg(F.sum("n_toks").alias("btoks"))
    # bounded window: one row per bucket, not per doc
    wb = Window.partitionBy(F.lit(0)).orderBy("bkt")
    bprefix = per_bucket.select(
        "bkt",
        (F.coalesce(
            F.sum("btoks").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )).alias("bprefix"),
    )
    ww = Window.partitionBy("bkt").orderBy("doc_id")
    placed = (
        t.join(F.broadcast(bprefix), "bkt")
        .withColumn("wsum", F.sum("n_toks").over(ww))
        .withColumn("off", F.col("bprefix") + F.col("wsum") - F.col("n_toks"))
    )
    out = (
        placed.withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("off") / seq_len),
                    F.floor((F.col("off") + F.col("n_toks") - 1) / seq_len),
                )
            ),
        )
        .withColumn("seq_start", F.col("seq_id") * seq_len)
        .select(
            F.col("seq_id").cast("long"),
            "doc_id",
            F.greatest(F.lit(0), F.col("seq_start") - F.col("off"))
            .cast("long")
            .alias("tok_begin"),
            F.least(
                F.col("n_toks"), F.col("seq_start") + seq_len - F.col("off")
            )
            .cast("long")
            .alias("tok_end"),
            F.greatest(F.lit(0), F.col("off") - F.col("seq_start"))
            .cast("long")
            .alias("seq_pos"),
        )
        .orderBy("seq_id", "doc_id")
    )
    return out


def pack_sequences_sql(
    seq_len: int = PACK_SEQ_LEN, bucket: int = PACK_BUCKET
) -> str:
    """Oracle: the same placement from a plain global window prefix sum
    (fine at oracle scale; the Spark side is the two-pass variant)."""
    seq_len = int(seq_len)
    return f"""
WITH {CORPUS_CTE.strip()},
t AS (
  SELECT doc_id, CAST({DOC_LEN_SQL} AS BIGINT) AS n_toks
  FROM corpus
  WHERE {DOC_LEN_SQL} > 0
),
placed AS (
  SELECT doc_id, n_toks,
         CAST(COALESCE(sum(n_toks) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS off
  FROM t
),
spans AS (
  SELECT doc_id, n_toks, off, CAST(s.seq_id AS BIGINT) AS seq_id
  FROM placed,
       unnest(range(off // {seq_len},
                    (off + n_toks - 1) // {seq_len} + 1)) AS s(seq_id)
)
SELECT seq_id, doc_id,
       greatest(0, seq_id * {seq_len} - off)               AS tok_begin,
       least(n_toks, seq_id * {seq_len} + {seq_len} - off) AS tok_end,
       greatest(0, off - seq_id * {seq_len})               AS seq_pos
FROM spans
ORDER BY seq_id, doc_id
"""


# --- BPE tokenizer training stages ---------------------------------------------
#
# Sennrich et al. 2016 byte-pair encoding: start from characters (plus an
# end-of-word marker), repeatedly merge the most frequent adjacent symbol
# pair.  Training runs on the WORD FREQUENCY table, not the raw corpus —
# the first aggregation collapses the corpus to distinct words, and every
# merge round after that is a map-only symbol rewrite plus one pair-count
# hash agg over the words table.  That is the distributed shape at 100 TB:
# corpus-sized work happens exactly once (the word count), rounds touch
# only the vocabulary.

BPE_EOW = "</w>"


def _bpe_words(corpus: DataFrame) -> DataFrame:
    """(w, cnt, s) — distinct words with counts and their initial symbol
    arrays (characters + end-of-word marker)."""
    toks = tokens("text")
    words = (
        corpus.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    syms = F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.substring(F.col("w"), i, F.lit(1)),
        ),
        F.array(F.lit(BPE_EOW)),
    )
    return words.select("w", "cnt", syms.alias("s"))


def _bpe_pair_count_df(words: DataFrame) -> DataFrame:
    # size-1 guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]) and
    # element_at(s, 0) throws — a fully-merged word ('bb' after (b,b)
    # then (bb,</w>)) must contribute no pairs, not crash the round
    pairs = F.when(
        F.size("s") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("s") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("s", i), F.element_at("s", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        words.select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("count"))
    )


def bpe_pair_counts(corpus: DataFrame, k: int = 20) -> DataFrame:
    """(pair, count) — the k most frequent adjacent symbol pairs over the
    initial character segmentation, weighted by word frequency: the
    statistic BPE's first merge decision reads.  Ordered count desc, pair
    asc (the trainer's deterministic tie-break)."""
    return (
        _bpe_pair_count_df(_bpe_words(corpus))
        .orderBy(F.desc("count"), F.asc("pair"))
        .limit(int(k))
    )


def bpe_pair_counts_sql(k: int = 20) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
words AS (
  SELECT w, count(*) AS cnt
  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
           '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS w FROM corpus)
  GROUP BY w
),
syms AS (
  SELECT cnt,
         list_append(list_transform(range(1, length(w) + 1),
                                    i -> substr(w, i, 1)), '{BPE_EOW}') AS s
  FROM words
),
pairs AS (
  SELECT unnest(list_transform(range(1, len(s)),
                               i -> s[i] || ' ' || s[i + 1])) AS pair,
         cnt
  FROM syms
)
SELECT pair, CAST(sum(cnt) AS BIGINT) AS count
FROM pairs GROUP BY pair
ORDER BY count DESC, pair ASC
LIMIT {int(k)}
"""


def bpe_train(corpus: DataFrame, n_merges: int = 10) -> list[tuple[str, str, int]]:
    """Train `n_merges` BPE merges: [(left, right, count)] in merge order.

    Per round: ONE pair-count hash agg over the words table, argmax by
    (count desc, pair asc), then a map-only left-fold rewrite of every
    symbol array (greedy leftmost, non-overlapping — the reference BPE
    semantics).  The argmax is a 1-row TakeOrdered collect (the merge
    table IS driver state, exactly like the k-means centroids);
    localCheckpoint per round truncates the iterative lineage."""
    words = _bpe_words(corpus).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(n_merges)):
        top = (
            _bpe_pair_count_df(words)
            .filter(F.col("count") > 1)
            .orderBy(F.desc("count"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b, int(top[0]["count"])))
        words = words.select(
            "w", "cnt", _bpe_fold(a, b, F.col("s")).alias("s")
        ).localCheckpoint()
    return merges


def _bpe_fold(a: str, b: str, col: F.Column) -> F.Column:
    """One merge's greedy-leftmost rewrite of a symbol array column."""
    ab = a + b
    return F.aggregate(
        col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(ab))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_apply(
    corpus: DataFrame, merges: list[tuple], checkpoint_every: int = 8
) -> DataFrame:
    """Token accounting under a trained BPE merge table: (doc_id, n_words,
    n_bpe_tokens), doc order — the pre-training cost estimator run with
    the ACTUAL tokenizer instead of the whitespace/regex proxies
    (text_quality.token_counts).

    Scale shape: merges are applied to the DISTINCT-WORD table (map-only
    fold rewrite per merge over vocab-sized rows, lineage truncated every
    `checkpoint_every` merges), never to the corpus; the corpus pays one
    token explode + a join against the (word -> symbol count) table +
    one doc-keyed agg.  Same economics as bpe_train: corpus-sized work
    happens once."""
    cur = _bpe_words(corpus).select("w", "s")
    for i, m in enumerate(merges):
        a, b = m[0], m[1]
        cur = cur.select("w", _bpe_fold(a, b, F.col("s")).alias("s"))
        if (i + 1) % int(checkpoint_every) == 0:
            cur = cur.localCheckpoint()
    wlen = cur.select("w", F.size("s").cast("long").alias("n_sym"))
    tokd = corpus.select("doc_id", tokens("text").alias("tk")).select(
        "doc_id", F.explode("tk").alias("w")
    )
    return (
        tokd.join(wlen, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


def bpe_merges(corpus: DataFrame, n_merges: int = 6) -> DataFrame:
    """The trained merge table as a relation: (step, lhs, rhs, count) in
    merge order — `bpe_train`'s driver state, exposed so the full
    iterative trainer is oracle-verifiable (the k-means precedent:
    operators/similarity.py kmeans_assign)."""
    spark = corpus.sparkSession
    rows = [
        (i + 1, a, b, c)
        for i, (a, b, c) in enumerate(bpe_train(corpus, n_merges))
    ]
    return spark.createDataFrame(
        rows, "step bigint, lhs string, rhs string, count bigint"
    )


# SQL-side BPE round machinery.  Words are represented as their symbol
# sequence joined with a TWO-space separator and two-space borders
# ('  l  o  w  </w>  '); one merge is then a plain left-to-right
# non-overlapping string replace of ' a  b ' with ' ab ': the match
# consumes only the INNER space of each flanking separator, so the
# neighbouring pair's context survives and the rewrite is exactly the
# greedy-leftmost merge (Sennrich et al. 2016 learn_bpe's
# `(?<!\S)a b(?!\S)` re.sub) — RE2 has no lookarounds, so the DuckDB
# oracle needs this encoding.  Symbols never contain spaces (tokens are
# whitespace-split), so separator collisions are impossible.  The Spark
# side rewrites symbol ARRAYS with an explicit fold (_bpe_fold), so
# parity of `bpe_merges` cross-validates two independent implementations
# of the merge semantics.

_BPE_WORDS0_SQL = f"""
words AS (
  SELECT w, count(*) AS cnt
  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
           '{{token_re}}'), t -> t <> '')) AS w FROM corpus)
  GROUP BY w
),
w0 AS (
  SELECT w, cnt,
         '  ' || array_to_string(
             list_append(list_transform(range(1, length(w) + 1),
                                        i -> substr(w, i, 1)), '{BPE_EOW}'),
             '  ') || '  ' AS s
  FROM words
)
"""


def _bpe_rounds_sql(n_merges: int) -> str:
    """CTE chain w0 -> (p1,t1,w1) -> ... -> (pN,tN,wN): per round, pair
    counts from the previous words table, the 1-row argmax t{{r}}
    (count desc, pair asc, count > 1 — bpe_train's stop rule), and the
    rewritten words table."""
    ctes = [_BPE_WORDS0_SQL.strip().format(token_re=TOKEN_SPLIT_RE)]
    for r in range(1, int(n_merges) + 1):
        prev = f"w{r - 1}"
        ctes.append(f"""
p{r} AS (
  SELECT unnest(list_transform(range(1, len(sy)),
                               i -> sy[i] || ' ' || sy[i + 1])) AS pair, cnt
  FROM (SELECT cnt, string_split(trim(s), '  ') AS sy FROM {prev})
),
t{r} AS (
  SELECT CAST({r} AS BIGINT) AS step,
         split_part(pair, ' ', 1) AS lhs,
         split_part(pair, ' ', 2) AS rhs,
         CAST(sum(cnt) AS BIGINT) AS count
  FROM p{r} GROUP BY pair HAVING sum(cnt) > 1
  ORDER BY sum(cnt) DESC, pair ASC LIMIT 1
),
w{r} AS (
  -- LEFT JOIN ON true: when t{r} is empty (no pair left with count > 1,
  -- bpe_train's early break) the words table passes through unchanged
  SELECT w, cnt,
         coalesce(replace(s, ' ' || t.lhs || '  ' || t.rhs || ' ',
                             ' ' || t.lhs || t.rhs || ' '), s) AS s
  FROM {prev} LEFT JOIN t{r} t ON true
)""".strip())
    return ",\n".join(ctes)


def bpe_merges_sql(n_merges: int = 6) -> str:
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM t{r}" for r in range(1, int(n_merges) + 1)
    )
    return f"""
WITH {CORPUS_CTE.strip()},
{_bpe_rounds_sql(n_merges)}
SELECT * FROM ({union}) ORDER BY step
"""


def bpe_token_counts(corpus: DataFrame, n_merges: int = 4) -> DataFrame:
    """Train-then-apply in one call: (doc_id, n_words, n_bpe_tokens) under
    the first `n_merges` trained merges — the registered pair for
    `bpe_apply`, with the oracle replaying the training rounds in SQL."""
    return bpe_apply(corpus, bpe_train(corpus, n_merges))


def bpe_token_counts_sql(n_merges: int = 4) -> str:
    n = int(n_merges)
    return f"""
WITH {CORPUS_CTE.strip()},
{_bpe_rounds_sql(n)},
wlen AS (
  SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sym
  FROM w{n}
),
tokd AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS w
  FROM corpus
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sym) AS BIGINT) AS n_bpe_tokens
FROM tokd JOIN wlen USING (w)
GROUP BY doc_id ORDER BY doc_id
"""


# --- DSIR: data selection via importance resampling ---------------------------
#
# Xie et al. 2023 ("Data Selection for Language Models via Importance
# Resampling"): score every raw document by how target-like it is under
# hashed bag-of-ngram language models — log w(x) = log p_target(x) -
# log p_raw(x) — then resample the raw pool with Gumbel-top-k on the log
# weights.  The sandbox keeps the estimator faithful (hashed unigram
# features, Laplace smoothing, Gumbel perturbation) but RNG-free: the
# Gumbel draw is a pure function of the url hash, so both engines (and
# every re-run) draw the same noise.

DSIR_BUCKETS = 4096
DSIR_GUMBEL_M = 1_000_000  # url-hash buckets mapped to (0,1) uniforms


def _dsir_log_ratio(corpus: DataFrame, target_lang: str, n_buckets: int):
    """Broadcastable (bucket, lr) table: lr = ln p_target[f] - ln p_raw[f]
    with Laplace smoothing over the n_buckets hashed-unigram space, plus
    the per-doc (doc_id, bucket, c) count table it probes."""
    toks = tokens("text")
    feat = corpus.select(
        "doc_id",
        "lang",
        F.explode(toks).alias("tok"),
    ).select(
        "doc_id", "lang", F.pmod(h64(F.col("tok")), F.lit(n_buckets)).alias("f")
    )
    # ONE corpus-sized aggregate, materialized (lazy localCheckpoint, the
    # dedup_components pattern): raw/tgt/main all probe the (doc, f)
    # count table instead of re-running the tokenize + hash + explode
    # scan per branch (previously 3 corpus scans — ReuseExchange does
    # not fire across the broadcast boundary).
    doc_counts_l = (
        feat.groupBy("doc_id", "lang", "f")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    doc_counts = doc_counts_l.select("doc_id", "f", "c")
    raw = doc_counts_l.groupBy("f").agg(F.sum("c").alias("cr"))
    tgt = (
        doc_counts_l.filter(F.col("lang") == target_lang)
        .groupBy("f")
        .agg(F.sum("c").alias("ct"))
    )
    totals = raw.agg(F.sum("cr").alias("Tr")).crossJoin(
        tgt.agg(F.sum("ct").alias("Tt"))
    )
    ratio = (
        raw.join(tgt, "f", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "f",
            (
                F.log(F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                - F.log(F.col("Tt") + float(n_buckets))
                - F.log(F.col("cr") + 1.0)
                + F.log(F.col("Tr") + float(n_buckets))
            ).alias("lr"),
        )
    )
    return doc_counts, ratio


def dsir_weights(
    corpus: DataFrame,
    target_lang: str = "fr",
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """(doc_id, log_weight) for every doc with >= 1 token, doc order.

    log_weight = sum_f c_f(doc) * (ln p_t[f] - ln p_r[f]) under Laplace-
    smoothed hashed-unigram models: p_t fit on the target slice (lang ==
    target_lang), p_r on the whole raw pool.  Rounded to 5 decimals (the
    cross-engine float contract used by every scored op here).

    Scale shape: ONE token explode -> (doc, f) hash agg; the model is two
    n_buckets-row aggregates joined into a BROADCAST log-ratio table; the
    per-doc weight is a map-side broadcast-join probe + one doc-keyed
    hash agg.  No corpus-sized shuffle beyond the (doc, f) combine; at
    100 TB n_buckets stays fixed so the model side never grows."""
    doc_counts, ratio = _dsir_log_ratio(corpus, target_lang, int(n_buckets))
    return (
        doc_counts.join(F.broadcast(ratio), "f")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("lr")), 5).alias("log_weight"))
        .orderBy("doc_id")
    )


def _dsir_sql_ctes(target_lang: str, n_buckets: int) -> str:
    h = H64_SQL.format(x="tok")
    return f"""
feat AS (
  SELECT doc_id, lang, ({h}) % {n_buckets} AS f
  FROM (SELECT doc_id, lang, unnest(toks) AS tok FROM tokd)
),
doc_counts AS (
  SELECT doc_id, f, count(*) AS c FROM feat GROUP BY doc_id, f
),
raw AS (SELECT f, count(*) AS cr FROM feat GROUP BY f),
tgt AS (SELECT f, count(*) AS ct FROM feat
        WHERE lang = '{target_lang}' GROUP BY f),
totals AS (
  SELECT (SELECT sum(cr) FROM raw) AS Tr, (SELECT sum(ct) FROM tgt) AS Tt
),
ratio AS (
  SELECT raw.f,
         ln(COALESCE(tgt.ct, 0) + 1.0) - ln(totals.Tt + {n_buckets}.0)
         - ln(raw.cr + 1.0) + ln(totals.Tr + {n_buckets}.0) AS lr
  FROM raw LEFT JOIN tgt ON raw.f = tgt.f CROSS JOIN totals
),
weights AS (
  SELECT d.doc_id, round(sum(d.c * r.lr), 5) AS log_weight
  FROM doc_counts d JOIN ratio r ON d.f = r.f
  GROUP BY d.doc_id
)"""


def dsir_weights_sql(
    target_lang: str = "fr", n_buckets: int = DSIR_BUCKETS
) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),{_dsir_sql_ctes(target_lang, int(n_buckets))}
SELECT doc_id, log_weight FROM weights ORDER BY doc_id
"""


def dsir_sample(
    corpus: DataFrame,
    target_lang: str = "fr",
    k: int = 50,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """Gumbel-top-k resampling over the DSIR log weights: keep the k raw
    docs with the largest log_weight + g, g = -ln(-ln(u)) and u the
    url-hash uniform (deterministic, identical in both engines — the
    paper's without-replacement sampler with the RNG replaced by a hash).
    Returns (doc_id, key) sorted key desc, doc_id asc; key rounded to 5
    so cross-engine float noise cannot reorder ties."""
    doc_counts, ratio = _dsir_log_ratio(corpus, target_lang, int(n_buckets))
    w = doc_counts.join(F.broadcast(ratio), "f").groupBy("doc_id").agg(
        F.sum(F.col("c") * F.col("lr")).alias("lw")
    )
    u = (
        F.pmod(h64(F.col("url")), F.lit(DSIR_GUMBEL_M)).cast("double") + 0.5
    ) / float(DSIR_GUMBEL_M)
    keyed = corpus.select("doc_id", u.alias("u")).join(w, "doc_id")
    return (
        keyed.select(
            "doc_id",
            F.round(F.col("lw") - F.log(-F.log(F.col("u"))), 5).alias("key"),
        )
        .orderBy(F.desc("key"), F.asc("doc_id"))
        .limit(int(k))
    )


def dsir_sample_sql(
    target_lang: str = "fr", k: int = 50, n_buckets: int = DSIR_BUCKETS
) -> str:
    hu = H64_SQL.format(x="url")
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),{_dsir_sql_ctes(target_lang, int(n_buckets))},
raww AS (
  SELECT d.doc_id, sum(d.c * r.lr) AS lw
  FROM doc_counts d JOIN ratio r ON d.f = r.f GROUP BY d.doc_id
),
keyed AS (
  SELECT c.doc_id,
         round(raww.lw - ln(-ln(((({hu}) % {DSIR_GUMBEL_M}) + 0.5)
                               / {DSIR_GUMBEL_M}.0)), 5) AS key
  FROM corpus c JOIN raww ON c.doc_id = raww.doc_id
)
SELECT doc_id, key FROM keyed ORDER BY key DESC, doc_id ASC LIMIT {int(k)}
"""


def top_ngrams(corpus: DataFrame, n: int = 3, k: int = 20) -> DataFrame:
    """WimBD-style corpus analytics ("What's In My Big Data?"): the k
    most frequent token n-grams corpus-wide, with total occurrences and
    document frequency.  The curation probe for memorization-prone
    boilerplate and over-represented templates.

    Shape at scale, two load-bearing choices:

    1. The token array is MATERIALIZED AS A COLUMN before the gram
       transform.  The lambda references it |n|+1 times; fed the raw
       `tokens("text")` expression instead, every element_at reference
       re-evaluates the regex tokenizer PER ELEMENT (CollapseProject
       inlines single-use aliases; multi-use non-cheap aliases like this
       one stay materialized) — measured 10-20x slower.
    2. The gram array is SORTED per doc and each element carries an
       is-first-occurrence flag computed in-array (element i vs i-1), so
       total = count(*) and df = sum(flags) come from ONE ngram hash agg
       — the previous plan paid a second corpus-wide (ngram, doc)
       exchange just for df.  The struct explode emits only (ngram,
       flag): the parent array is never carried through the Generate
       (that copies the whole array per output row — O(grams^2) bytes
       per doc)."""
    n, k = int(n), int(k)
    tokd = corpus.select(tokens("text").alias("tk"))
    tk = F.col("tk")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tk) - (n - 1), F.lit(0))),
        lambda i: F.concat_ws(" ", *[F.element_at(tk, i + j) for j in range(n)]),
    )
    gr = tokd.select(F.array_sort(grams).alias("g"))
    # element_at is 1-based: element i's predecessor sits at index i
    # (i is the transform lambda's 0-based position); element_at(g, 0)
    # is NULL in non-ANSI mode, absorbed by the i == 0 arm
    pairs = F.transform(
        F.col("g"),
        lambda x, i: F.struct(
            x.alias("ngram"),
            ((i == 0) | (x != F.element_at(F.col("g"), i)))
            .cast("long")
            .alias("new"),
        ),
    )
    return (
        gr.select(F.explode(pairs).alias("r"))
        .select("r.ngram", "r.new")
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("total"), F.sum("new").alias("docs"))
        .orderBy(F.desc("total"), F.asc("ngram"))
        .limit(k)
    )


def top_ngrams_sql(n: int = 3, k: int = 20) -> str:
    n, k = int(n), int(k)
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
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
         unnest(list_transform(range(1, greatest(len(toks) - {n - 1}, 0) + 1),
                               i -> {parts})) AS ngram
  FROM tokd
),
per_doc AS (
  SELECT ngram, doc_id, count(*) AS occ FROM grams GROUP BY 1, 2
)
SELECT ngram, CAST(sum(occ) AS BIGINT) AS total, count(*) AS docs
FROM per_doc GROUP BY ngram
ORDER BY total DESC, ngram ASC
LIMIT {k}
"""


def repetition_metrics(
    corpus: DataFrame, top_n: int = 2, dup_n: int = 5
) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, table A1): per doc,
    the fraction of characters covered by (a) occurrences of the single
    MOST FREQUENT top_n-gram and (b) ALL dup_n-grams that occur more
    than once.  Coverage counts each character once (overlapping windows
    don't double-count — the paper's "take care not to count characters
    multiple times"); characters = token characters (separators excluded,
    pinned contract).

    Scale shape: every stage is keyed by doc_id (gram counts, top-gram
    argmax via a doc-partitioned window, coverage distinct) — hash
    shuffles only, no global sort; window explode is bounded by n.

    Returns (doc_id, top_frac, dup_frac) rounded to 5, doc_id order;
    docs with < n tokens score 0.0.
    """
    from pyspark.sql.window import Window

    top_n, dup_n = int(top_n), int(dup_n)
    toks = tokens("text")
    tokd = corpus.select("doc_id", toks.alias("toks"))
    pos = tokd.select(
        "doc_id", F.posexplode("toks").alias("p0", "tok")
    ).select(
        "doc_id", (F.col("p0") + 1).alias("p"), F.length("tok").alias("tlen")
    )
    total = pos.groupBy("doc_id").agg(F.sum("tlen").alias("total_chars"))

    def grams(n: int) -> DataFrame:
        # sequence(1, 0) counts DOWN and element_at(toks, 0) throws —
        # short docs must yield no windows (the _ngrams guard).
        arr = F.transform(
            F.sequence(F.lit(1), F.size("toks") - (n - 1)),
            lambda i: F.struct(
                i.alias("gpos"),
                F.concat_ws(
                    " ", *[F.element_at(F.col("toks"), i + j) for j in range(n)]
                ).alias("gram"),
            ),
        )
        g = F.explode(
            F.when(
                F.size("toks") < n,
                F.array().cast("array<struct<gpos:int,gram:string>>"),
            ).otherwise(arr)
        )
        return tokd.select("doc_id", g.alias("g")).select(
            "doc_id", F.col("g.gpos").alias("gpos"), F.col("g.gram").alias("gram")
        )

    def coverage(occ: DataFrame, n: int, alias: str) -> DataFrame:
        """occ = (doc_id, gpos) windows; chars covered once each."""
        covered = occ.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + (n - 1))
            ).alias("p"),
        ).distinct()
        return (
            covered.join(pos, ["doc_id", "p"])
            .groupBy("doc_id")
            .agg(F.sum("tlen").alias(alias))
        )

    # (a) most frequent top_n-gram (count desc, gram asc tie).  The
    # occurrence positions ride the SAME (doc, gram) aggregate as the
    # counts (collect_list bounded by per-doc gram count), so the winning
    # gram's windows need no join back against the exploded gram table —
    # that join-back was a second corpus-sized shuffle.
    gt = grams(top_n)
    counts = gt.groupBy("doc_id", "gram").agg(
        F.count(F.lit(1)).alias("c"),
        F.collect_list("gpos").alias("gposs"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("gram"))
    top_occ = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.explode("gposs").alias("gpos"))
    )
    top_cov = coverage(top_occ, top_n, "top_chars")

    # (b) all duplicated dup_n-grams — same join-back elimination
    gd = grams(dup_n)
    dup_occ = (
        gd.groupBy("doc_id", "gram")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.collect_list("gpos").alias("gposs"),
        )
        .filter(F.col("c") > 1)
        .select("doc_id", F.explode("gposs").alias("gpos"))
    )
    dup_cov = coverage(dup_occ, dup_n, "dup_chars")

    return (
        total.join(top_cov, "doc_id", "left")
        .join(dup_cov, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.coalesce("top_chars", F.lit(0)) / F.col("total_chars"), 5
            ).alias("top_frac"),
            F.round(
                F.coalesce("dup_chars", F.lit(0)) / F.col("total_chars"), 5
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def repetition_metrics_sql(top_n: int = 2, dup_n: int = 5) -> str:
    top_n, dup_n = int(top_n), int(dup_n)

    def gram_parts(n: int) -> str:
        return " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))

    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
pos AS (
  SELECT doc_id, CAST(x.p AS BIGINT) AS p, length(toks[x.p]) AS tlen
  FROM tokd, unnest(range(1, len(toks) + 1)) AS x(p)
),
total AS (SELECT doc_id, sum(tlen) AS total_chars FROM pos GROUP BY doc_id),
gt AS (
  SELECT doc_id, CAST(i.i AS BIGINT) AS gpos, {gram_parts(top_n)} AS gram
  FROM tokd, unnest(range(1, greatest(len(toks) - {top_n - 1}, 0) + 1)) AS i(i)
),
tc AS (SELECT doc_id, gram, count(*) AS c FROM gt GROUP BY 1, 2),
topg AS (
  SELECT doc_id, gram FROM (
    SELECT doc_id, gram,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, gram ASC) AS rn
    FROM tc
  ) WHERE rn = 1
),
top_cover AS (
  SELECT DISTINCT gt.doc_id, gt.gpos + x.o AS p
  FROM gt JOIN topg ON gt.doc_id = topg.doc_id AND gt.gram = topg.gram,
       unnest(range(0, {top_n})) AS x(o)
),
top_cov AS (
  SELECT c.doc_id, sum(pos.tlen) AS top_chars
  FROM top_cover c JOIN pos ON pos.doc_id = c.doc_id AND pos.p = c.p
  GROUP BY c.doc_id
),
gd AS (
  SELECT doc_id, CAST(i.i AS BIGINT) AS gpos, {gram_parts(dup_n)} AS gram
  FROM tokd, unnest(range(1, greatest(len(toks) - {dup_n - 1}, 0) + 1)) AS i(i)
),
dups AS (
  SELECT doc_id, gram FROM gd GROUP BY doc_id, gram HAVING count(*) > 1
),
dup_cover AS (
  SELECT DISTINCT gd.doc_id, gd.gpos + x.o AS p
  FROM gd JOIN dups ON gd.doc_id = dups.doc_id AND gd.gram = dups.gram,
       unnest(range(0, {dup_n})) AS x(o)
),
dup_cov AS (
  SELECT c.doc_id, sum(pos.tlen) AS dup_chars
  FROM dup_cover c JOIN pos ON pos.doc_id = c.doc_id AND pos.p = c.p
  GROUP BY c.doc_id
)
SELECT total.doc_id,
       round(COALESCE(top_chars, 0) * 1.0 / total_chars, 5) AS top_frac,
       round(COALESCE(dup_chars, 0) * 1.0 / total_chars, 5) AS dup_frac
FROM total
LEFT JOIN top_cov ON total.doc_id = top_cov.doc_id
LEFT JOIN dup_cov ON total.doc_id = dup_cov.doc_id
ORDER BY total.doc_id
"""


# --- CCNet perplexity bucketing -------------------------------------------------


def ccnet_buckets(corpus: DataFrame) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): score every
    doc with the LM cross-entropy (lm_cross_entropy — the corpus's own
    Laplace bigram LM standing in for the paper's Wikipedia KenLM) and
    cut the corpus into terciles — head = best (lowest) third, tail =
    worst.  CCNet sorts and cuts; here the cut is by the exact
    interpolated 1/3 and 2/3 percentile THRESHOLDS (two driver-sized
    values) so no global sort ever runs: one percentile aggregate, then
    a map-only bucket assignment.  Docs tied exactly on a threshold go
    to the lower bucket (h <= t — deterministic; thresholds and scores
    are both 5-decimal-rounded so the comparison is cross-engine
    stable).  (doc_id, cross_entropy, bucket), doc order."""
    scores = lm_cross_entropy(corpus).select("doc_id", "cross_entropy")
    t = scores.agg(
        F.round(
            F.expr("percentile(cross_entropy, 0.3333333333333333)"), 5
        ).alias("t1"),
        F.round(
            F.expr("percentile(cross_entropy, 0.6666666666666666)"), 5
        ).alias("t2"),
    )
    bucket = (
        F.when(F.col("cross_entropy") <= F.col("t1"), "head")
        .when(F.col("cross_entropy") <= F.col("t2"), "middle")
        .otherwise("tail")
    )
    return (
        scores.crossJoin(F.broadcast(t))
        .select("doc_id", "cross_entropy", bucket.alias("bucket"))
        .orderBy("doc_id")
    )


def ccnet_buckets_sql() -> str:
    lm = lm_cross_entropy_sql().strip()
    return f"""
WITH scores AS ({lm}),
t AS (
  SELECT round(quantile_cont(cross_entropy, 0.3333333333333333), 5) AS t1,
         round(quantile_cont(cross_entropy, 0.6666666666666666), 5) AS t2
  FROM scores
)
SELECT s.doc_id, s.cross_entropy,
       CASE WHEN s.cross_entropy <= t.t1 THEN 'head'
            WHEN s.cross_entropy <= t.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scores s CROSS JOIN t
ORDER BY s.doc_id
"""


# --- Domain mixture sampling (DoReMi / Pile-style) ----------------------------
#
# Training mixtures specify TOKEN proportions over domains ("web 60%,
# books 30%, code 10%"); the pipeline must downsample each domain so the
# achieved token mass matches the target weights WITHOUT upsampling any
# domain (the binding domain is the one with the least tokens per unit
# weight).  Deterministic contract, shared by both engines:
#
#   T_s        = sum of doc token counts in source s       (exact int)
#   ratio_s    = T_s / w_s                                  (double)
#   min_ratio  = min over weighted sources of ratio_s       (double)
#   rate_s     = floor(1000 * w_s * min_ratio / T_s)        (permille,
#                capped at 1000; the binding source computes ~1000)
#   keep doc   iff pmod(H64(url), 1000) < rate_s            (RNG-free)
#
# Every float op is the same IEEE expression in the same order in both
# engines, so the floor'd permilles are bit-identical.  Zero-weight
# sources are excluded from min_ratio and get rate 0.

MIX_WEIGHTS = {"src0": 3, "src1": 2}
MIX_DEFAULT_W = 1


def mixture_sample(
    corpus: DataFrame,
    weights: dict[str, int] | None = None,
    default_w: int = MIX_DEFAULT_W,
) -> DataFrame:
    """Per-source mixture report: (source, w, n_docs, n_tokens,
    rate_permille, kept_docs, kept_tokens) ordered by source.

    Scale shape: ONE tokenize + hash agg for the per-source token
    totals (axis-sized output), the min_ratio as a 1-row cross join,
    and ONE more pass computing membership with the per-source rate
    broadcast — the decision is a pure hash compare per doc, no
    shuffle beyond the two keyed aggs."""
    weights = MIX_WEIGHTS if weights is None else weights
    w = F.lit(int(default_w))
    for s, wi in sorted(weights.items()):
        w = F.when(F.col("source") == s, F.lit(int(wi))).otherwise(w)
    per_doc = corpus.select(
        "source",
        "url",
        F.size(tokens("text")).cast("long").alias("n_toks"),
    ).withColumn("w", w)
    stats = per_doc.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
    )
    minr = stats.filter(F.col("w") > 0).agg(
        F.min(F.col("n_tokens").cast("double") / F.col("w")).alias("min_ratio")
    )
    rated = stats.crossJoin(F.broadcast(minr)).select(
        "source",
        "w",
        "n_docs",
        "n_tokens",
        F.when(F.col("w") <= 0, F.lit(0))
        .otherwise(
            F.least(
                F.lit(1000),
                F.floor(
                    F.lit(1000.0)
                    * F.col("w")
                    * F.col("min_ratio")
                    / F.col("n_tokens").cast("double")
                ),
            )
        )
        .cast("long")
        .alias("rate_permille"),
    )
    kept = (
        per_doc.join(F.broadcast(rated.select("source", "rate_permille")), "source")
        .filter(F.pmod(h64(F.col("url")), F.lit(1000)) < F.col("rate_permille"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_toks").alias("kept_tokens"),
        )
    )
    return (
        rated.join(kept, "source", "left")
        .select(
            "source",
            "w",
            "n_docs",
            "n_tokens",
            "rate_permille",
            F.coalesce("kept_docs", F.lit(0)).cast("long").alias("kept_docs"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
        )
        .orderBy("source")
    )


def mixture_sample_docs(
    corpus: DataFrame,
    weights: dict[str, int] | None = None,
    default_w: int = MIX_DEFAULT_W,
) -> DataFrame:
    """The sampled corpus itself: (doc_id, source) kept by the mixture
    rates — the membership predicate of mixture_sample applied per doc."""
    weights = MIX_WEIGHTS if weights is None else weights
    rates = mixture_sample(corpus, weights, default_w).select(
        "source", "rate_permille"
    )
    return (
        corpus.join(F.broadcast(rates), "source")
        .filter(F.pmod(h64(F.col("url")), F.lit(1000)) < F.col("rate_permille"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def mixture_sample_sql(
    weights: dict[str, int] | None = None, default_w: int = MIX_DEFAULT_W
) -> str:
    weights = MIX_WEIGHTS if weights is None else weights
    whens = "\n           ".join(
        f"WHEN source = '{s}' THEN {int(wi)}"
        for s, wi in sorted(weights.items())
    )
    h = H64_SQL.format(x="url")
    return f"""
WITH {CORPUS_CTE.strip()},
per_doc AS (
  SELECT source, url,
         CAST({DOC_LEN_SQL} AS BIGINT) AS n_toks,
         CASE {whens} ELSE {int(default_w)} END AS w
  FROM corpus
),
stats AS (
  SELECT source, w, count(*) AS n_docs,
         CAST(sum(n_toks) AS BIGINT) AS n_tokens
  FROM per_doc GROUP BY source, w
),
minr AS (
  SELECT min(CAST(n_tokens AS DOUBLE) / w) AS min_ratio
  FROM stats WHERE w > 0
),
rated AS (
  SELECT source, w, n_docs, n_tokens,
         CAST(CASE WHEN w <= 0 THEN 0
              ELSE least(1000, floor(
                  1000.0 * w * min_ratio / CAST(n_tokens AS DOUBLE)))
              END AS BIGINT) AS rate_permille
  FROM stats CROSS JOIN minr
),
kept AS (
  SELECT p.source, count(*) AS kept_docs, sum(p.n_toks) AS kept_tokens
  FROM per_doc p JOIN rated r ON p.source = r.source
  WHERE ({h}) % 1000 < r.rate_permille
  GROUP BY p.source
)
SELECT rated.source, rated.w, rated.n_docs, rated.n_tokens,
       rated.rate_permille,
       CAST(COALESCE(kept.kept_docs, 0) AS BIGINT) AS kept_docs,
       CAST(COALESCE(kept.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM rated LEFT JOIN kept ON rated.source = kept.source
ORDER BY rated.source
"""


# --- Skip-gram co-occurrence counts (word2vec statistics) ---------------------

def skipgram_counts(
    corpus: DataFrame, window: int = 2, top: int = 30
) -> DataFrame:
    """Corpus co-occurrence table — the sufficient statistic word2vec /
    GloVe embedding pretraining consumes: unordered token pairs within
    `window` positions, counted once per occurrence.

    Scale shape: pairs are generated ARRAY-SIDE per doc (the window
    offsets are unrolled literals, so each doc row flat-maps to at most
    window * dl pair structs with zero self-join), then ONE hash agg
    with map-side combine on the pair key and a TakeOrdered top.  No
    corpus self-join, no position shuffle — the same plan at any corpus
    size.

    Returns (w1, w2, cnt) with w1 <= w2, ordered cnt desc, w1, w2 asc,
    limit `top`."""
    from ..functions.tokenizer import tokens

    window = int(window)
    if window < 1:
        raise ValueError("window must be >= 1")
    toks = corpus.select(tokens("text").alias("toks"))
    pair_arrays = []
    for off in range(1, window + 1):
        pair_arrays.append(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.greatest(
                    F.size("toks") - off, F.lit(0))),
                F.slice(
                    F.col("toks"),
                    off + 1,
                    F.greatest(F.size("toks") - off, F.lit(0)),
                ),
                lambda a, b: F.struct(
                    F.least(a, b).alias("w1"), F.greatest(a, b).alias("w2")
                ),
            )
        )
    pairs = toks.select(
        F.explode(F.concat(*pair_arrays)).alias("p")
    ).select("p.w1", "p.w2")
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        .limit(int(top))
    )


def skipgram_counts_sql(window: int = 2, top: int = 30) -> str:
    window = int(window)
    arrays = []
    for off in range(1, window + 1):
        arrays.append(
            f"list_transform(range(1, greatest(len(toks) - {off}, 0) + 1), "
            f"i -> {{'w1': least(toks[i], toks[i + {off}]), "
            f"'w2': greatest(toks[i], toks[i + {off}])}})"
        )
    concat = " || ".join(arrays)
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
pairs AS (
  SELECT p.w1 AS w1, p.w2 AS w2
  FROM tokd, LATERAL (SELECT unnest({concat}) AS p)
)
SELECT w1, w2, count(*) AS cnt
FROM pairs GROUP BY w1, w2
ORDER BY cnt DESC, w1 ASC, w2 ASC
LIMIT {int(top)}
"""


# --- PMI collocations (phrase mining) -----------------------------------------


def collocations_pmi(
    corpus: DataFrame, min_count: int = 5, top: int = 30
) -> DataFrame:
    """Pointwise-mutual-information collocation mining — the statistic
    behind word2vec's phrase detection (Mikolov et al. 2013 §4) and
    classic collocation extraction: ordered ADJACENT bigrams scored by

        pmi = ln( P(w1,w2) / (P(w1) * P(w2)) )
            = ln( (c_ab / N_bi) / ((c_a / N_tok) * (c_b / N_tok)) )

    with a `min_count` support floor (PMI is degenerate for rare pairs).

    Scale shape: ONE tokenize materialized as a column (the tokenize-once
    rule), two keyed hash aggs with map-side combine (unigrams, bigrams),
    the support filter applied BEFORE the joins so only surviving bigrams
    (typically << vocab) join the unigram table twice (equi-joins on the
    term key — AQE broadcasts the survivors at small scale, shuffles at
    vocab scale), totals as a broadcast 1-row cross join.  No self-join,
    no window; the identical plan at any corpus size.

    Returns (w1, w2, cnt, pmi) ordered pmi desc / cnt desc / w1 / w2,
    limit `top`.  `pmi` is ROUND(x, 4)-ed in both engines (the repo float
    convention).

    Reference analogue: the reference delegates all corpus statistics to
    ES; this is first-class LLM-pipeline surface (training-corpus phrase
    vocabulary induction)."""
    from ..functions.tokenizer import tokens

    if int(min_count) < 1:
        raise ValueError("min_count must be >= 1")
    toks = corpus.select(tokens("text").alias("toks"))
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    n = F.greatest(F.size("toks") - 1, F.lit(0))
    big = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, n),
                F.slice(F.col("toks"), 2, n),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bcnt = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cab"))
    totals = uni.agg(F.sum("cw").alias("ntok")).crossJoin(
        bcnt.agg(F.sum("cab").alias("nbi"))
    )
    cand = bcnt.filter(F.col("cab") >= int(min_count))
    j = (
        cand.join(
            uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1")),
            on="w1",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2")),
            on="w2",
        )
        .crossJoin(F.broadcast(totals))
    )
    pmi = F.round(
        F.log(
            (F.col("cab") / F.col("nbi"))
            / ((F.col("c1") / F.col("ntok")) * (F.col("c2") / F.col("ntok")))
        ),
        4,
    )
    return (
        j.select(
            "w1", "w2", F.col("cab").alias("cnt"), pmi.alias("pmi")
        )
        .orderBy(F.desc("pmi"), F.desc("cnt"), F.asc("w1"), F.asc("w2"))
        .limit(int(top))
    )


def collocations_pmi_sql(min_count: int = 5, top: int = 30) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
uni AS (
  SELECT w, count(*) AS cw
  FROM (SELECT unnest(toks) AS w FROM tokd) GROUP BY w
),
big AS (
  SELECT p.w1 AS w1, p.w2 AS w2
  FROM tokd, LATERAL (SELECT unnest(
    list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                   i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS p)
),
bcnt AS (SELECT w1, w2, count(*) AS cab FROM big GROUP BY w1, w2),
totals AS (
  SELECT (SELECT sum(cw) FROM uni) AS ntok,
         (SELECT sum(cab) FROM bcnt) AS nbi
)
SELECT b.w1, b.w2, b.cab AS cnt,
       round(ln((b.cab / t.nbi) /
                ((u1.cw / t.ntok) * (u2.cw / t.ntok))), 4) AS pmi
FROM bcnt b
JOIN uni u1 ON u1.w = b.w1
JOIN uni u2 ON u2.w = b.w2
CROSS JOIN totals t
WHERE b.cab >= {int(min_count)}
ORDER BY pmi DESC, cnt DESC, b.w1 ASC, b.w2 ASC
LIMIT {int(top)}
"""


# --- URL quality filtering (RefinedWeb / C4 URL rules) -------------------------

# Driver-side config, like a UT1-category blocklist slice loaded at submit
# time (RefinedWeb §3.1 filters on a 4.6M-domain blocklist the same way).
URL_BLOCKED_HOSTS = ("site13.example", "site404.example", "site666.example")
# Soft-signal substrings anywhere in the url (RefinedWeb's word-score rule).
URL_BANNED_RE = "(666|casino|xxx|porn)"
URL_MAX_PATH_DEPTH = 4


def url_quality_filter(
    corpus: DataFrame,
    blocked_hosts: tuple[str, ...] = URL_BLOCKED_HOSTS,
    banned_re: str = URL_BANNED_RE,
    max_depth: int = URL_MAX_PATH_DEPTH,
) -> DataFrame:
    """URL-level document filtering (the RefinedWeb/C4 pre-content gate
    that runs BEFORE any text is read): per doc, the FIRST failing rule
    in fixed order — (1) host on the domain blocklist, (2) banned
    substring anywhere in the url, (3) path deeper than `max_depth`
    segments (spider traps / calendar pages) — else 'keep'.

    Shape: map-only (host extract + one isin + one rlike + one split —
    all codegen'd, zero Python per row); the blocklist is driver config
    folded into the plan as a literal set, the scale analogue of
    broadcasting a UT1 category file (a multi-million-row blocklist
    would become a broadcast LEFT ANTI join on host — same plan shape,
    one build-side hashmap, still no shuffle of the corpus).  Runs
    before tokenize/dedup so at 10^12 docs the rejected mass never
    reaches a shuffle.  Reference analogue: the cheap rule gate ahead of
    the LLM classifier (llm_classifier.py:80-98 spam pre-filter)."""
    from ..query.collapse import host_col

    host = host_col()
    path = F.regexp_replace("url", "^[a-z]+://[^/]+/?", "")
    depth = F.when(path == "", F.lit(0)).otherwise(
        F.size(F.split(path, "/"))
    )
    verdict = (
        F.when(
            host.isin(*blocked_hosts), F.lit("blocked_host")
        )
        .when(F.col("url").rlike(banned_re), F.lit("banned_substring"))
        .when(depth > int(max_depth), F.lit("path_too_deep"))
        .otherwise(F.lit("keep"))
    )
    return corpus.select(
        "doc_id", "url", verdict.alias("verdict")
    ).orderBy("doc_id")


def url_quality_filter_sql(
    blocked_hosts: tuple[str, ...] = URL_BLOCKED_HOSTS,
    banned_re: str = URL_BANNED_RE,
    max_depth: int = URL_MAX_PATH_DEPTH,
) -> str:
    from ..query.collapse import HOST_SQL

    hosts = ", ".join(f"'{h}'" for h in blocked_hosts)
    return f"""
WITH {CORPUS_CTE.strip()},
parts AS (
  SELECT doc_id, url, {HOST_SQL} AS host,
         regexp_replace(url, '^[a-z]+://[^/]+/?', '') AS path
  FROM corpus
)
SELECT doc_id, url,
       CASE
         WHEN host IN ({hosts}) THEN 'blocked_host'
         WHEN regexp_matches(url, '{banned_re}') THEN 'banned_substring'
         WHEN (CASE WHEN path = '' THEN 0
                    ELSE len(string_split(path, '/')) END)
              > {int(max_depth)} THEN 'path_too_deep'
         ELSE 'keep'
       END AS verdict
FROM parts
ORDER BY doc_id
"""


# --- Token-budget data selection ------------------------------------------------

def budget_select(corpus: DataFrame, budget_tokens: int = 5000) -> DataFrame:
    """Quality-first data selection under a token budget (the
    FineWeb-Edu / phi-style recipe: rank documents by a quality score,
    take the best until the token budget is spent).

    Score: integer lexical-diversity per-mille
    q = (1000 * n_distinct_tokens) DIV n_tokens — exact integer
    arithmetic in both engines, computed map-only from the in-row token
    array (no shuffle for scoring).  Selection is the maximal PREFIX of
    (q DESC, doc_id ASC) order whose running token sum stays <= budget
    (greedy stops at the first overflow — tokens are positive so the
    running sum is strictly increasing and 'cumsum <= budget' IS the
    prefix).  Token-less docs are dropped up front.

    Scale shape (no global sort): the per-mille score axis has <= 1001
    values, so ONE tiny hash aggregate builds the (q -> sum_tokens,
    n_docs) histogram, the driver folds it descending to find the
    cutoff bucket and its remaining budget R (the temperature_sample
    driver-state pattern), whole buckets above the cutoff pass with a
    map-only filter, and only the single cutoff bucket pays a bounded
    prefix-cumsum window (bucket-sized, like search_page's bounded
    window).  The DuckDB oracle is the naive global-window cumsum —
    the identity of the two is exactly what the parity gate checks.
    Reference analogue: the score-ranked keep decision of the LLM
    classifier stage (llm_classifier.py), made budget-aware."""
    from pyspark.sql import Window

    from ..functions.tokenizer import tokens

    base = (
        corpus.select(
            "doc_id",
            F.size(tokens("text")).alias("n_tok"),
            F.size(F.array_distinct(tokens("text"))).alias("n_dis"),
        )
        .filter(F.col("n_tok") > 0)
        .withColumn(
            "q", ((F.lit(1000) * F.col("n_dis")) / F.col("n_tok")).cast("bigint")
        )
        .select("doc_id", "n_tok", "q")
    )
    hist = {
        int(r["q"]): (int(r["s"]), int(r["c"]))
        for r in base.groupBy("q")
        .agg(F.sum("n_tok").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    budget = int(budget_tokens)
    cum = 0
    cutoff, remaining = None, 0
    for q in sorted(hist, reverse=True):
        s, _ = hist[q]
        if cum + s <= budget:
            cum += s
            continue
        cutoff, remaining = q, budget - cum
        break
    if cutoff is None:
        return base.orderBy("doc_id")  # everything fits
    kept_whole = base.filter(F.col("q") > cutoff)
    w = Window.partitionBy(F.lit(0)).orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    boundary = (
        base.filter(F.col("q") == cutoff)
        .withColumn("cs", F.sum("n_tok").over(w))
        .filter(F.col("cs") <= remaining)
        .drop("cs")
    )
    return kept_whole.unionByName(boundary).orderBy("doc_id")


def budget_select_sql(budget_tokens: int = 5000) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
base AS (
  SELECT doc_id,
         len(toks) AS n_tok,
         CAST((1000 * len(list_distinct(toks))) // len(toks) AS BIGINT) AS q
  FROM tokd WHERE len(toks) > 0
),
run AS (
  SELECT doc_id, n_tok, q,
         sum(n_tok) OVER (ORDER BY q DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cs
  FROM base
)
SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok, q
FROM run WHERE cs <= {int(budget_tokens)}
ORDER BY doc_id
"""


# --- Deterministic training-data ordering ----------------------------------------

def shard_shuffle(
    corpus: DataFrame, n_shards: int = 8, epoch: int = 0
) -> DataFrame:
    """Deterministic global shuffle for training-data delivery (the
    T5/GPT-pipeline shape: examples are hash-bucketed into shards and
    hash-ordered within each shard, so the training order is fully
    reproducible with NO RNG state, and changes per epoch by folding the
    epoch into the hash).  Output: (doc_id, shard, pos) — shard file id
    and 1-based position within the shard.

    Scale shape: the shard assignment is a map-only hash; the
    within-shard rank is a per-shard-partition sort — EXACTLY Spark's
    physical write path (repartition(n_shards) + sortWithinPartitions),
    so the 'window' here never sees more than one shard's rows, which
    is the size a shard file must be writable at anyway.  No global
    sort, no driver state.  Epoch e reshuffles by hashing url || ':' ||
    e — epochs are uncorrelated streams without materializing anything
    twice.  Reference analogue: none (training delivery is downstream
    of the reference); the hash-membership idiom is train_val_split's."""
    from pyspark.sql import Window

    h = h64(F.concat(F.col("url"), F.lit(f":{int(epoch)}")))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        corpus.select(
            "doc_id",
            F.pmod(h, F.lit(int(n_shards))).cast("int").alias("shard"),
            h.alias("h"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


def shard_shuffle_sql(n_shards: int = 8, epoch: int = 0) -> str:
    h = H64_SQL.format(x=f"url || ':{int(epoch)}'")
    return f"""
WITH {CORPUS_CTE.strip()},
hashed AS (
  SELECT doc_id,
         CAST(({h}) % {int(n_shards)} AS INTEGER) AS shard,
         ({h}) AS h
  FROM corpus
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS INTEGER) AS pos
FROM hashed
ORDER BY shard, pos
"""


# --- CCNet-style LM-perplexity quality scoring -------------------------------

# Micro-nat scale: per-bigram log-probs are rounded to integers BEFORE the
# per-doc sum, so the sum is associative (partition/engine-order exact) —
# the integer-cents pattern.  1e-6 nats is far below any filtering
# threshold anyone sets.
_LM_SCALE = 1_000_000


def _lm_scored(corpus: DataFrame, train_lang: str):
    """Shared scoring core: (doc_id, lang, n_bigrams, ce_nats) for every
    doc with >= 1 bigram, plus the persisted token relation to release
    once the consumer has materialized."""
    """CCNet-style language-model quality scoring (Wenzek et al. 2020):
    an add-one-smoothed BIGRAM LM is trained on the ``train_lang`` slice
    of the corpus (the in-language reference, KenLM's role) and every doc
    is scored by its cross-entropy under that model — low perplexity =
    fluent in-distribution prose, the head bucket CCNet keeps.

        P(w2|w1) = (C2(w1,w2) + 1) / (C1(w1) + V)

    with C2/C1 bigram/left-context occurrence counts over the training
    slice and V the distinct training vocabulary (unseen contexts and
    bigrams degrade to 1/V smoothly).  Docs with < 2 tokens have no
    bigrams and are excluded, as in CCNet.

    Determinism: each bigram's ln P is rounded to integer MICRO-NATS
    before summation (integer sums are associative — no float-order
    dependence); the per-doc cross-entropy is ONE division of exact
    integers, rounded, and perplexity is exp() of that already-rounded
    value, so both engines exponentiate the same double.

    Scale shape: model = two hash aggs over the training bigrams (vocab-
    and vocab-pair-sized relations — the KenLM-binary analogue, join- or
    broadcast-sized); scoring = one (doc, bigram) agg + two model joins +
    one doc-keyed agg.  The corpus is tokenized once per side.

    Output: (doc_id, n_bigrams, ce_nats, ppx) — lowest cross-entropy
    first, doc_id tie-break, LIMIT k.
    """
    # Tokenize ONCE (persisted token arrays); every consumer below is an
    # array-side explode of the CACHED arrays.  The model aggregates
    # collapse map-side to vocab(-pair)-sized relations (bigram TYPES,
    # no doc key), and scoring joins the raw per-position bigram stream
    # against those small relations (AQE broadcasts them) — the only
    # doc-keyed shuffle is the final integer partial-sum agg.  No
    # corpus-sized relation is ever persisted or shuffled on a
    # near-unique key.
    toksdf = corpus.select(
        "doc_id", "lang", tokens("text").alias("toks")
    ).persist()

    n1 = F.greatest(F.size("toks") - 1, F.lit(0))

    def _bi(df):
        return df.select(
            "doc_id",
            "lang",
            F.explode(
                F.zip_with(
                    F.slice(F.col("toks"), 1, n1),
                    F.slice(F.col("toks"), 2, n1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("b"),
        ).select("doc_id", "lang", "b.w1", "b.w2")

    vocab = (
        toksdf.where(F.col("lang") == train_lang)
        .select(F.explode("toks").alias("t"))
        .distinct()
        .count()
    )
    if vocab == 0:
        toksdf.unpersist()
        raise ValueError(
            f"no training tokens for lang {train_lang!r} — the LM has an "
            "empty vocabulary"
        )
    train = _bi(toksdf.where(F.col("lang") == train_lang))
    # c2 (bigram-type counts) is persisted — it is read twice (the
    # scoring join + the c1 derivation) and is vocab-pair-sized, so the
    # cache is tiny.  c1 (left-context occurrence counts) is derived as
    # sum(c2) GROUP BY w1 over that small relation instead of a second
    # 10M-row bigram explode + shuffle (r6): identical counts — every
    # train bigram occurrence contributes once to exactly one (w1, w2)
    # type.
    c2 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2")).persist()
    c1 = c2.groupBy("w1").agg(F.sum("c2").alias("c1"))

    lp = F.round(
        F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + 1)
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(vocab))
        )
        * _LM_SCALE
    ).cast("long")
    scored = (
        _bi(toksdf)
        .join(c1, "w1", "left")
        .join(c2, ["w1", "w2"], "left")
        .select("doc_id", "lang", lp.alias("lp"))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("lp").alias("s"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    ce = F.round(
        -F.col("s") / (F.col("n_bigrams") * F.lit(float(_LM_SCALE))), 5
    )
    return (
        scored.select("doc_id", "lang", "n_bigrams", ce.alias("ce_nats")),
        [toksdf, c2],
    )


def lm_perplexity(corpus: DataFrame, train_lang: str = "en", k: int = 20) -> DataFrame:
    ced, lm_cached = _lm_scored(corpus, train_lang)
    res = (
        ced.select(
            "doc_id", "n_bigrams", "ce_nats",
            F.round(F.exp("ce_nats"), 4).alias("ppx"),
        )
        .orderBy("ce_nats", "doc_id")
        .limit(k)
        .localCheckpoint()
    )
    for df in lm_cached:
        df.unpersist()
    return res


def ccnet_buckets(corpus: DataFrame, train_lang: str = "en") -> DataFrame:
    """CCNet's head/middle/tail perplexity bucketing (Wenzek et al. 2020):
    within each language, docs are split into terciles of the LM
    cross-entropy — CCNet keeps "head" (most fluent) for training and
    drops or down-weights "tail".

    Cutoffs are INTEGER rank thirds (3*rn <= n / <= 2n on the
    (ce, doc_id)-ordered per-lang rank), not interpolated percentiles —
    so both engines cut at identical rows with no float quantile
    semantics.  Output: (lang, bucket, cnt) counts per bucket.

    Scale shape: scoring as lm_perplexity; the per-lang rank is a window
    over lang partitions (a per-lang range sort — the CCNet sharding
    step itself); the emitted relation is |langs| x 3.
    """
    from pyspark.sql import Window  # noqa: PLC0415

    ced, lm_cached = _lm_scored(corpus, train_lang)
    w = Window.partitionBy("lang").orderBy("ce_nats", "doc_id")
    wn = Window.partitionBy("lang")
    bucketed = ced.select(
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("nl"),
    ).select(
        "lang",
        F.when(3 * F.col("rn") <= F.col("nl"), F.lit("head"))
        .when(3 * F.col("rn") <= 2 * F.col("nl"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("bucket"),
    )
    res = (
        bucketed.groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("lang", "bucket")
        .localCheckpoint()
    )
    for df in lm_cached:
        df.unpersist()
    return res


def _lm_ced_sql(train_lang: str) -> str:
    """Shared oracle CTE chain ending in ced(doc_id, lang, n_bigrams,
    ce_nats)."""
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id, lang,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
bi AS (
  SELECT doc_id, lang, b['w1'] AS w1, b['w2'] AS w2
  FROM tokd, LATERAL (
    SELECT unnest(list_transform(
        range(1, greatest(len(toks) - 1, 0) + 1),
        i -> {{'w1': toks[i], 'w2': toks[i + 1]}})) AS b)
),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi
       WHERE lang = '{train_lang}' GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM bi
       WHERE lang = '{train_lang}' GROUP BY w1),
v AS (SELECT count(DISTINCT t) AS v FROM (
        SELECT unnest(toks) AS t FROM tokd WHERE lang = '{train_lang}')),
scored AS (
  SELECT doc_id, lang,
         sum(CAST(round(ln((coalesce(c2.c2, 0) + 1.0)
                        / (coalesce(c1.c1, 0) + v.v))
                  * {_LM_SCALE}) AS BIGINT)) AS s,
         CAST(count(*) AS BIGINT) AS n_bigrams
  FROM bi
  LEFT JOIN c1 USING (w1)
  LEFT JOIN c2 USING (w1, w2)
  CROSS JOIN v
  GROUP BY doc_id, lang
),
ced AS (
  SELECT doc_id, lang, n_bigrams,
         round(-s / (n_bigrams * {float(_LM_SCALE)!r}), 5) AS ce_nats
  FROM scored)"""


def lm_perplexity_sql(train_lang: str = "en", k: int = 20) -> str:
    return f"""{_lm_ced_sql(train_lang)}
SELECT doc_id, n_bigrams, ce_nats, round(exp(ce_nats), 4) AS ppx
FROM ced ORDER BY ce_nats, doc_id LIMIT {k}"""


def ccnet_buckets_sql(train_lang: str = "en") -> str:
    return f"""{_lm_ced_sql(train_lang)},
ranked AS (
  SELECT lang,
         row_number() OVER (PARTITION BY lang ORDER BY ce_nats, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS nl
  FROM ced)
SELECT lang,
       CASE WHEN 3 * rn <= nl THEN 'head'
            WHEN 3 * rn <= 2 * nl THEN 'middle'
            ELSE 'tail' END AS bucket,
       count(*) AS cnt
FROM ranked GROUP BY 1, 2 ORDER BY lang, bucket"""


# --- BM25 hard-negative mining (retrieval training data) ---------------------


def mine_hard_negatives(
    corpus: DataFrame,
    query_ids: list[int],
    k: int = 5,
    max_query_terms: int = 8,
    min_doc_freq: int = 2,
) -> DataFrame:
    """DPR-style hard-negative mining (Karpukhin et al. 2020): for each
    query document, its BM25 top-k OTHER documents — the lexically-close
    non-positives a dense-retriever trainer contrasts against.

    Batched relational plan — |Q| queries, ONE job, one tokenize:

      1. postings (doc_id, term, tf) + doc lengths from one explode+agg;
      2. per-query term profile: the query doc's top `max_query_terms`
         terms by round(tf * idf, 6) (the ES MoreLikeThisQuery
         interestingness used by query/mlt.py, term-asc ties), terms
         with df < min_doc_freq dropped;
      3. candidate scores: postings x profiles joined ON TERM (the
         profile relation is |Q| * max_query_terms rows — broadcast),
         summed per (query, candidate) with the standard BM25 weight;
      4. exclusions: the query doc itself and its EXACT text duplicates
         (sha256 match — a duplicate is a false negative, the classic
         mining pitfall);
      5. per-query top-k by round(score, 5) desc, doc_id asc.

    Returns (query_doc_id, neg_doc_id, rank, score).

    Scale shape: one corpus tokenize, two keyed hash aggs, one broadcast
    join (profiles), one (query, candidate) agg bounded by |Q| * docs-
    sharing-a-profile-term, one per-query window over the candidates.
    At 10^12 docs the candidate agg is the cost — exactly the shape of
    the WAND batch kernel, which serves when Q is interactive; this
    relational form is the bulk mining pass (Q = millions of training
    queries works: everything is keyed, nothing is per-query driver
    state).
    """
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    if k < 1 or max_query_terms < 1:
        raise ValueError("k and max_query_terms must be >= 1")
    from pyspark.sql import Window

    from ..query.bm25 import K1, B, SCORE_DECIMALS, bm25_weight, idf_col

    qids = sorted(set(int(q) for q in query_ids))
    tk = corpus.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("thash"),
        tokens("text").alias("tk"),
    ).persist()
    dl = tk.select("doc_id", "thash", F.size("tk").alias("dl"))
    postings = (
        tk.select("doc_id", F.explode("tk").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    df_t = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    # 2. query-term profiles
    qpost = postings.filter(F.col("doc_id").isin(qids))
    prof = (
        qpost.join(df_t, "term")
        .filter(F.col("df") >= min_doc_freq)
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", idf_col(F.col("n"), F.col("df")))
        .withColumn(
            "interest", F.round(F.col("tf") * F.col("idf"), 6)
        )
    )
    wq = Window.partitionBy("doc_id").orderBy(
        F.col("interest").desc(), F.col("term").asc()
    )
    prof = (
        prof.withColumn("trn", F.row_number().over(wq))
        .filter(F.col("trn") <= max_query_terms)
        .select(
            F.col("doc_id").alias("qid"), "term", "idf",
        )
    )
    # 3-4. candidate scoring with exclusions
    qhash = dl.filter(F.col("doc_id").isin(qids)).select(
        F.col("doc_id").alias("qid"), F.col("thash").alias("qhash")
    )
    cand = (
        postings.join(F.broadcast(prof), "term")
        .join(dl.select("doc_id", "dl", "thash"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w", bm25_weight(F.col("tf"), F.col("dl"),
                             F.col("avgdl"), F.col("idf"))
        )
        .groupBy("qid", "doc_id", "thash")
        .agg(F.sum("w").alias("raw"))
        .join(F.broadcast(qhash), "qid")
        .filter(
            (F.col("doc_id") != F.col("qid"))
            & (F.col("thash") != F.col("qhash"))
        )
        .withColumn("score", F.round("raw", SCORE_DECIMALS))
    )
    wk = Window.partitionBy("qid").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_doc_id"),
            F.col("doc_id").alias("neg_doc_id"),
            "rank", "score",
        )
        .orderBy("query_doc_id", "rank")
    )


def mine_hard_negatives_sql(
    query_ids: list[int],
    k: int = 5,
    max_query_terms: int = 8,
    min_doc_freq: int = 2,
) -> str:
    """DuckDB oracle — the identical staged plan as CTEs."""
    if not query_ids:
        raise ValueError("query_ids must be non-empty")
    from ..query.bm25 import B, K1, SCORE_DECIMALS

    qids = ", ".join(str(int(q)) for q in sorted(set(query_ids)))
    return f"""
WITH {CORPUS_CTE.strip()},
tk AS (
  SELECT doc_id, sha256(text) AS thash,
         list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '') AS toks
  FROM corpus
),
dl AS (SELECT doc_id, thash, len(toks) AS dl FROM tk),
postings AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tk)
  GROUP BY doc_id, term
),
stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
df_t AS (SELECT term, count(*) AS df FROM postings GROUP BY term),
prof0 AS (
  SELECT p.doc_id AS qid, p.term,
         ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)) AS idf,
         round(p.tf * ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5)), 6)
             AS interest
  FROM postings p
  JOIN df_t d ON p.term = d.term
  CROSS JOIN stats s
  WHERE p.doc_id IN ({qids}) AND d.df >= {int(min_doc_freq)}
),
prof AS (
  SELECT qid, term, idf FROM (
    SELECT *, row_number() OVER (
        PARTITION BY qid ORDER BY interest DESC, term ASC) AS trn
    FROM prof0
  ) WHERE trn <= {int(max_query_terms)}
),
qhash AS (
  SELECT doc_id AS qid, thash AS qhash FROM dl WHERE doc_id IN ({qids})
),
cand AS (
  SELECT pr.qid, p.doc_id, l.thash,
         round(sum(pr.idf * p.tf * ({K1} + 1.0)
             / (p.tf + {K1} * (1.0 - {B} + {B} * l.dl / s.avgdl))),
             {SCORE_DECIMALS}) AS score
  FROM postings p
  JOIN prof pr ON p.term = pr.term
  JOIN dl l ON p.doc_id = l.doc_id
  CROSS JOIN stats s
  GROUP BY pr.qid, p.doc_id, l.thash, s.avgdl
),
ranked AS (
  SELECT c.qid, c.doc_id, c.score,
         row_number() OVER (
             PARTITION BY c.qid ORDER BY c.score DESC, c.doc_id ASC
         ) AS rank
  FROM cand c
  JOIN qhash q ON c.qid = q.qid
  WHERE c.doc_id <> c.qid AND c.thash <> q.qhash
)
SELECT qid AS query_doc_id, doc_id AS neg_doc_id,
       CAST(rank AS INTEGER) AS rank, score
FROM ranked WHERE rank <= {int(k)}
ORDER BY query_doc_id, rank
"""


# --- Data-mixture annealing schedule --------------------------------------------

MIX_PPM = 1_000_000


def mixture_schedule(corpus: DataFrame, epochs: int = 4, by: str = "lang") -> DataFrame:
    """Per-epoch source-sampling schedule annealing from PROPORTIONAL to
    SQRT-TEMPERATURE mixing — the data-mixture curriculum of multilingual
    / multi-source pretraining (alpha-sampling with alpha annealed
    1 -> 1/2 over training: early epochs match the corpus, late epochs
    up-weight low-resource sources, the quality/diversity anneal).

    Pinned integer contract (both engines bit-identical):
        p1_s = c_s * PPM DIV C_tot            (proportional share, ppm)
        p2_s = floor(sqrt(c_s)) * PPM DIV S_tot   (sqrt-temperature share)
        ppm_s(e) = ((E - e) * p1_s + (e - 1) * p2_s) DIV (E - 1)
    (for E = 1 the schedule is the single proportional epoch).  Shares
    per epoch sum to PPM minus deterministic floor drift — the drift is
    part of the contract, not noise.

    Scale shape: ONE map-side per-source hash aggregate (axis-sized —
    the source inventory), a 1-row totals broadcast, and a |sources| x E
    sequence explode.  The corpus is touched exactly once."""
    epochs = int(epochs)
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if by not in ("lang", "source"):
        raise ValueError("by must be lang or source")
    hist = corpus.groupBy(F.col(by).alias("grp")).agg(F.count(F.lit(1)).alias("c"))
    hist = hist.withColumn(
        "sl", F.floor(F.sqrt(F.col("c"))).cast("long")
    )
    tot = hist.agg(
        F.sum("c").alias("c_tot"), F.sum("sl").alias("s_tot")
    )
    e_col = F.explode(
        F.sequence(F.lit(1), F.lit(epochs))
    ).alias("epoch")
    base = hist.crossJoin(F.broadcast(tot)).select("grp", "c", "sl",
                                                   "c_tot", "s_tot", e_col)
    # integer DIV throughout (Spark's DIV on longs == DuckDB's //)
    if epochs == 1:
        ppm = F.expr(f"(c * {MIX_PPM}) DIV c_tot")
    else:
        ppm = F.expr(
            f"(({epochs} - epoch) * ((c * {MIX_PPM}) DIV c_tot) "
            f"+ (epoch - 1) * ((sl * {MIX_PPM}) DIV s_tot)) "
            f"DIV {epochs - 1}"
        )
    return (
        base.select(
            "epoch",
            F.col("grp").alias(by),
            F.col("c").alias("n_docs"),
            ppm.alias("ppm"),
        )
        .orderBy("epoch", by)
    )


def mixture_schedule_sql(epochs: int = 4, by: str = "lang") -> str:
    if by not in ("lang", "source"):
        raise ValueError("by must be lang or source")
    epochs = int(epochs)
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if epochs == 1:
        ppm = f"(c * {MIX_PPM}) // c_tot"
    else:
        ppm = (
            f"(({epochs} - epoch) * ((c * {MIX_PPM}) // c_tot) "
            f"+ (epoch - 1) * ((sl * {MIX_PPM}) // s_tot)) // {epochs - 1}"
        )
    return f"""
WITH {CORPUS_CTE.strip()},
hist AS (
  SELECT {by} AS grp, count(*) AS c,
         CAST(floor(sqrt(count(*))) AS BIGINT) AS sl
  FROM corpus GROUP BY {by}
),
tot AS (SELECT sum(c) AS c_tot, sum(sl) AS s_tot FROM hist),
sched AS (
  SELECT e.epoch, h.grp, h.c, h.sl, t.c_tot, t.s_tot
  FROM hist h CROSS JOIN tot t
  CROSS JOIN (SELECT unnest(range(1, {epochs} + 1)) AS epoch) e
)
SELECT CAST(epoch AS INTEGER) AS epoch, grp AS {by},
       c AS n_docs,
       CAST({ppm} AS BIGINT) AS ppm
FROM sched
ORDER BY epoch, {by}
"""


# --- Staged quality-filter ensemble ---------------------------------------------

REP_TOP_FRAC_MAX = 0.2
REP_DUP_FRAC_MAX = 0.3


def quality_ensemble(corpus: DataFrame) -> DataFrame:
    """The RefinedWeb/CCNet staged filter pipeline as ONE per-doc verdict:
    stages run cheapest-first and the FIRST failing stage wins —
    (1) URL rules (`url_quality_filter`: blocklist/banned/path-depth,
    the pre-content gate), (2) Gopher lexical rules (`quality_gopher`),
    (3) Gopher repetition fractions (`repetition_metrics`: most-frequent
    2-gram coverage > 0.2 or duplicate 5-gram coverage > 0.3).  Output
    (doc_id, keep, stage, reason); stage/reason NULL when kept.

    This is a COMPOSITION of three verified operators — the ensemble
    adds only the precedence rule, so its correctness reduces to theirs
    plus this CASE, and the oracle composes their exact SQL as
    subqueries.

    Scale shape: three doc_id-keyed relations joined on their common
    key; stage 1 is map-only, stages 2-3 are the already-audited
    keyed-hash-agg plans.  (In a literal 10^12 deployment the stages
    SHORT-CIRCUIT — stage N+1 runs on stage N's survivors; the joined
    form here computes all three for the audit columns, the same
    verdicts either way.)"""
    u = url_quality_filter(corpus).select(
        "doc_id", F.col("verdict").alias("url_verdict")
    )
    g = quality_gopher(corpus).select(
        "doc_id", "passes", "fail_reasons"
    )
    r = repetition_metrics(corpus).select("doc_id", "top_frac", "dup_frac")
    j = u.join(g, "doc_id").join(r, "doc_id")
    stage = (
        F.when(F.col("url_verdict") != "keep", F.lit("url"))
        .when(~F.col("passes"), F.lit("gopher"))
        .when(F.col("top_frac") > REP_TOP_FRAC_MAX, F.lit("repetition"))
        .when(F.col("dup_frac") > REP_DUP_FRAC_MAX, F.lit("repetition"))
    )
    reason = (
        F.when(F.col("url_verdict") != "keep", F.col("url_verdict"))
        .when(~F.col("passes"), F.element_at("fail_reasons", 1))
        .when(F.col("top_frac") > REP_TOP_FRAC_MAX, F.lit("top_frac"))
        .when(F.col("dup_frac") > REP_DUP_FRAC_MAX, F.lit("dup_frac"))
    )
    return (
        j.select(
            "doc_id",
            stage.isNull().alias("keep"),
            stage.alias("stage"),
            reason.alias("reason"),
        )
        .orderBy("doc_id")
    )


def quality_ensemble_sql() -> str:
    return f"""
WITH u AS (SELECT doc_id, verdict AS url_verdict
           FROM ({url_quality_filter_sql()})),
g AS (SELECT doc_id, passes, fail_reasons FROM ({quality_gopher_sql()})),
r AS (SELECT doc_id, top_frac, dup_frac FROM ({repetition_metrics_sql()})),
j AS (
  SELECT u.doc_id, u.url_verdict, g.passes, g.fail_reasons,
         r.top_frac, r.dup_frac
  FROM u JOIN g ON u.doc_id = g.doc_id JOIN r ON u.doc_id = r.doc_id
),
v AS (
  SELECT doc_id,
         CASE
           WHEN url_verdict != 'keep' THEN 'url'
           WHEN NOT passes THEN 'gopher'
           WHEN top_frac > {REP_TOP_FRAC_MAX} THEN 'repetition'
           WHEN dup_frac > {REP_DUP_FRAC_MAX} THEN 'repetition'
         END AS stage,
         CASE
           WHEN url_verdict != 'keep' THEN url_verdict
           WHEN NOT passes THEN fail_reasons[1]
           WHEN top_frac > {REP_TOP_FRAC_MAX} THEN 'top_frac'
           WHEN dup_frac > {REP_DUP_FRAC_MAX} THEN 'dup_frac'
         END AS reason
  FROM j
)
SELECT doc_id, stage IS NULL AS keep, stage, reason
FROM v
ORDER BY doc_id
"""
