"""Suggesters — ES `completion` and `term` ("did you mean") analogues.

Completion: prefix -> the corpus's most frequent completions, served from
the term dictionary (cf = collection frequency is already materialized at
build time), prefix-pruned via the sorted layout exactly like
expand.prefix_topk.  ES backs this with an in-memory FST per shard; the
sorted term_dict's row-group pruning is this engine's FST walk, and at
query-node scale the ≤max rows collected here are what a server would
cache.

Spelling ("term suggester"): an unknown or misspelled term -> vocabulary
terms ranked by trigram Jaccard similarity (the pg_trgm `%` / ES term-
suggester shape; the reference's Postgres schema carries pg_trgm GIN
indexes, poc models.py:188).  Candidate generation is a vocab-sized scan
with a similarity threshold — at 10^12-doc scale vocabulary is millions
of rows (Heaps' law), so a full-vocab trigram pass per query remains
cheap relative to any postings work, and the same trigram-bucket GIN
layout used for document fuzzy search (query/fuzzy.py) applies if it is
not.

Trigram model (matches query/fuzzy.py): pad = "  " + term + " ", distinct
3-grams; similarity = |A ∩ B| / |A ∪ B|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE


def _dict_for_scan(index: dict) -> DataFrame:
    return index.get("term_dict_sorted", index["term_dict"])


def suggest_complete(index: dict, prefix: str, k: int = 10) -> DataFrame:
    """(term, cf) completions for `prefix`, most frequent first (cf desc,
    term asc) — StartsWith-pruned on the sorted dictionary."""
    return (
        _dict_for_scan(index)
        .filter(F.col("term").startswith(prefix))
        .select("term", F.col("cf").cast("long").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(int(k))
    )


def suggest_complete_sql(prefix: str, k: int = 10) -> str:
    esc = prefix.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    q = esc.replace("'", "''")
    return f"""
WITH {CORPUS_CTE.strip()},
toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(lower(text),
      '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
)
SELECT term, count(*) AS cf
FROM toks
WHERE term LIKE '{q}%' ESCAPE '\\'
GROUP BY term
ORDER BY cf DESC, term ASC
LIMIT {int(k)}
"""


def suggest_spelling(
    index: dict, word: str, k: int = 5, min_sim: float = 0.3
) -> DataFrame:
    """(term, sim) vocabulary terms trigram-similar to `word`, best first
    (sim desc, term asc); sim rounded to 6 decimals for deterministic
    cross-engine order."""
    word = word.lower()
    q_grams = sorted(_py_trigrams(word))
    grams = F.array(*[F.lit(g) for g in q_grams])
    # term trigrams need a dynamic substring start -> SQL lambda form
    t_grams = F.array_distinct(
        F.expr(
            "transform(sequence(1, length(concat('  ', term, ' ')) - 2), "
            "i -> substring(concat('  ', term, ' '), i, 3))"
        )
    )
    inter = F.size(F.array_intersect(t_grams, grams))
    union = F.size(F.array_union(t_grams, grams))
    return (
        _dict_for_scan(index)
        .select("term", F.round(inter / union, 6).alias("sim"))
        .filter(F.col("sim") >= float(min_sim))
        .orderBy(F.desc("sim"), F.asc("term"))
        .limit(int(k))
    )


def _py_trigrams(word: str) -> set[str]:
    padded = "  " + word + " "
    return {padded[i : i + 3] for i in range(len(padded) - 2)}


def suggest_spelling_sql(word: str, k: int = 5, min_sim: float = 0.3) -> str:
    w = word.lower().replace("'", "''")
    return f"""
WITH {CORPUS_CTE.strip()},
vocab AS (
  SELECT DISTINCT unnest(list_filter(regexp_split_to_array(lower(text),
      '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
qg AS (
  SELECT list_distinct(list_transform(
      range(1, length('  ' || '{w}' || ' ') - 1),
      i -> substring('  ' || '{w}' || ' ', i, 3))) AS grams
),
scored AS (
  SELECT term,
         round(
           len(list_intersect(list_distinct(list_transform(
               range(1, length('  ' || term || ' ') - 1),
               i -> substring('  ' || term || ' ', i, 3))), qg.grams)) * 1.0
           / len(list_distinct(list_concat(list_distinct(list_transform(
               range(1, length('  ' || term || ' ') - 1),
               i -> substring('  ' || term || ' ', i, 3))), qg.grams))),
           6) AS sim
  FROM vocab CROSS JOIN qg
)
SELECT term, sim FROM scored
WHERE sim >= {float(min_sim)}
ORDER BY sim DESC, term ASC
LIMIT {int(k)}
"""


# --- phrase suggester ("did you mean", bigram LM) -----------------------------

PHRASE_MAX_EDITS = 2
PHRASE_PER_TERM = 4
# noisy-channel error model: each edit multiplies the candidate's
# likelihood by alpha (the ES DirectCandidateGenerator's error-likelihood
# prior) — an exact input term (distance 0) pays nothing, so the LM can
# only override it with strong bigram evidence
PHRASE_EDIT_ALPHA = 0.1


def bigram_dict(corpus: DataFrame) -> DataFrame:
    """(bigram "w1 w2", cnt) — the build-time artifact the phrase
    suggester consults (ES recommends a dedicated shingle field for its
    phrase suggester; this is that field's term dictionary).  One
    tokenize + one hash aggregate; built once next to term_dict, NOT per
    query."""
    from ..functions.tokenizer import tokens

    # tokens materialized ONCE per row — the lambda references the array
    # twice per element, and a raw tokenizer expression would re-run the
    # regex split per reference (dedup.shingles_col performance contract)
    tk = F.col("tk")
    bigrams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(tk, i), F.element_at(tk, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        corpus.select(tokens("text").alias("tk"))
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def phrase_suggest(
    index: dict,
    bigrams: DataFrame,
    terms: list[str],
    max_edits: int = PHRASE_MAX_EDITS,
    per_term: int = PHRASE_PER_TERM,
    k: int = 5,
) -> DataFrame:
    """ES `phrase` suggester: candidate corrections for each input term
    (Levenshtein <= max_edits against the term dictionary, capped at
    per_term by (distance, cf desc, term)), every combination phrase
    scored by a Laplace-smoothed bigram language model:

        score = ln((cf(w0)+1)/(T+V)) + sum_i ln((c(w_i w_{i+1})+1)/(cf(w_i)+V))
                + sum_i dist_i * ln(alpha)

    with V = vocabulary size, T = total token count, and dist_i the edit
    distance of position i's candidate (noisy-channel error model, see
    PHRASE_EDIT_ALPHA) — rounded to 5, top-k
    by (score desc, suggestion asc).  All relations after the per-term
    candidate cap are <= per_term^len(terms) rows, so every join
    broadcasts; the bigram side is probed with a broadcast hash join (the
    big table is never shuffled).  Returns (suggestion, score)."""
    td = index["term_dict"].select("term", "cf")
    vv = td.agg(
        F.count(F.lit(1)).cast("double").alias("V"),
        F.sum("cf").cast("double").alias("T"),
    )
    cands = []
    for i, t in enumerate(terms):
        c = (
            td.withColumn("dist", F.levenshtein(F.col("term"), F.lit(t)))
            .filter(F.col("dist") <= int(max_edits))
            .orderBy(F.asc("dist"), F.desc("cf"), F.asc("term"))
            .limit(int(per_term))
            .select(
                F.col("term").alias(f"w{i}"),
                F.col("cf").alias(f"cf{i}"),
                F.col("dist").alias(f"dist{i}"),
            )
        )
        cands.append(c)
    combos = cands[0]
    for c in cands[1:]:
        combos = combos.crossJoin(F.broadcast(c))
    m = len(terms)
    for i in range(m - 1):
        # probe the big bigram table with the tiny candidate-key set
        # (inner broadcast hash join — bg is streamed, never shuffled),
        # THEN left-join the now-tiny hit set back onto the combos
        keys = combos.select(
            F.concat_ws(" ", F.col(f"w{i}"), F.col(f"w{i+1}")).alias(f"bg{i}")
        ).distinct()
        hits = bigrams.select(
            F.col("bigram").alias(f"bg{i}"), F.col("cnt").alias(f"bc{i}")
        ).join(F.broadcast(keys), f"bg{i}")
        combos = combos.join(
            F.broadcast(hits),
            on=F.concat_ws(" ", F.col(f"w{i}"), F.col(f"w{i+1}"))
            == F.col(f"bg{i}"),
            how="left",
        ).drop(f"bg{i}")
    combos = combos.crossJoin(F.broadcast(vv))
    import math

    ln_alpha = math.log(PHRASE_EDIT_ALPHA)
    score = F.log((F.col("cf0") + 1.0) / (F.col("T") + F.col("V")))
    for i in range(m):
        score = score + F.col(f"dist{i}") * F.lit(ln_alpha)
    for i in range(m - 1):
        score = score + F.log(
            (F.coalesce(F.col(f"bc{i}"), F.lit(0)) + 1.0)
            / (F.col(f"cf{i}") + F.col("V"))
        )
    return (
        combos.select(
            F.concat_ws(" ", *[F.col(f"w{i}") for i in range(m)]).alias(
                "suggestion"
            ),
            F.round(score, 5).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("suggestion"))
        .limit(k)
    )


def phrase_suggest_sql(
    terms: list[str],
    max_edits: int = PHRASE_MAX_EDITS,
    per_term: int = PHRASE_PER_TERM,
    k: int = 5,
) -> str:
    m = len(terms)
    cand_ctes = ",\n".join(
        f"""c{i} AS (
  SELECT term AS w{i}, cf AS cf{i},
         levenshtein(term, '{t.replace("'", "''")}') AS dist{i}
  FROM vocab
  WHERE levenshtein(term, '{t.replace("'", "''")}') <= {int(max_edits)}
  ORDER BY levenshtein(term, '{t.replace("'", "''")}'), cf DESC, term
  LIMIT {int(per_term)}
)"""
        for i, t in enumerate(terms)
    )
    cross = " CROSS JOIN ".join(f"c{i}" for i in range(m))
    bg_joins = "\n".join(
        f"LEFT JOIN bg b{i} ON b{i}.bigram = w{i} || ' ' || w{i+1}"
        for i in range(m - 1)
    )
    import math

    ln_alpha = repr(math.log(PHRASE_EDIT_ALPHA))
    score_terms = (
        ["ln((cf0 + 1.0) / (T + V))"]
        + [f"dist{i} * ({ln_alpha})" for i in range(m)]
        + [
            f"ln((coalesce(b{i}.cnt, 0) + 1.0) / (cf{i} + V))"
            for i in range(m - 1)
        ]
    )
    score = " + ".join(score_terms)
    sugg = " || ' ' || ".join(f"w{i}" for i in range(m))
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
vocab AS (
  SELECT term, CAST(count(*) AS BIGINT) AS cf
  FROM (SELECT unnest(toks) AS term FROM tokd)
  GROUP BY term
),
vv AS (SELECT CAST(count(*) AS DOUBLE) AS V,
              CAST(sum(cf) AS DOUBLE) AS T FROM vocab),
bg AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT toks[i] || ' ' || toks[i + 1] AS bigram
    FROM tokd, unnest(range(1, len(toks))) AS t(i)
  )
  GROUP BY bigram
),
{cand_ctes},
combos AS (SELECT * FROM {cross})
SELECT {sugg} AS suggestion,
       round({score}, 5) AS score
FROM combos
{bg_joins}
CROSS JOIN vv
ORDER BY score DESC, suggestion ASC
LIMIT {k}
"""


def write_bigram_store(corpus: DataFrame, out_dir: str, n_files: int = 8) -> str:
    """Persist bigram_dict sorted by bigram with small row groups — the
    shingle-field term dictionary as a point-readable store.  A query
    node probes <= per_term^2 bigrams per suggestion via row-group-stats
    pruning (the doc_store pattern: sorted key + ~128 KiB groups), so a
    warm did-you-mean never runs a Spark job."""
    path = f"{out_dir}/bigram_store"
    (
        bigram_dict(corpus)
        .repartitionByRange(n_files, "bigram")
        .sortWithinPartitions("bigram")
        .write.mode("overwrite")
        .option("parquet.block.size", 128 << 10)
        .parquet(path)
    )
    return path


def fetch_bigrams_local(
    store_dir: str,
    bigrams: list[str],
    cache: dict | None = None,
    ds_cache: dict | None = None,
) -> dict[str, int]:
    """{bigram: count} for the requested keys; keys absent from the
    store come back as 0.  OR-of-equalities filter (pyarrow prunes
    row groups on it where an isin filter does not — the doc_store
    lesson), per-bigram row cache + opened-dataset cache."""
    import pyarrow.dataset as ds

    want = sorted(set(bigrams))
    out: dict[str, int] = {}
    missing = []
    for b in want:
        hit = None if cache is None else cache.get(b)
        if hit is not None:
            out[b] = hit
        else:
            missing.append(b)
    if not missing:
        return out
    src = None if ds_cache is None else ds_cache.get(store_dir)
    if src is None:
        src = ds.dataset(store_dir, format="parquet")
        if ds_cache is not None:
            ds_cache[store_dir] = src
    expr = None
    for b in missing:
        e = ds.field("bigram") == b
        expr = e if expr is None else (expr | e)
    tbl = src.to_table(filter=expr)
    found = dict(
        zip(tbl["bigram"].to_pylist(), (int(c) for c in tbl["cnt"].to_pylist()))
    )
    for b in missing:
        out[b] = found.get(b, 0)
        if cache is not None:
            cache[b] = out[b]
    return out


# --- ES completion suggester with contexts -----------------------------------

def completion_contexts(
    corpus: DataFrame, prefix: str, lang: str | None = None, k: int = 10
) -> DataFrame:
    """ES `completion` suggester with a category context: suggestions
    are host names (the completion-field analogue of a site-search box),
    weighted by how many context-matching docs each host serves, prefix-
    filtered.  ES serves this from a per-context FST; relationally it is
    a prefix filter + one hash agg + TakeOrdered — and the prefix
    predicate pushes to the scan.

    Returns (suggestion, weight) ordered weight desc, suggestion asc."""
    base = corpus
    if lang is not None:
        base = base.filter(F.col("lang") == lang)
    return (
        base.select(
            F.regexp_extract("url", "^[a-z]+://([^/]+)", 1).alias("suggestion")
        )
        .filter(F.col("suggestion").startswith(prefix))
        .groupBy("suggestion")
        .agg(F.count(F.lit(1)).alias("weight"))
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(int(k))
    )


def completion_contexts_sql(
    prefix: str, lang: str | None = None, k: int = 10
) -> str:
    from ..corpus import CORPUS_CTE

    esc = prefix.replace("'", "''")
    where = f"WHERE lang = '{lang}'" if lang is not None else ""
    return f"""
WITH {CORPUS_CTE.strip()},
h AS (
  SELECT regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS suggestion
  FROM corpus {where}
)
SELECT suggestion, count(*) AS weight
FROM h
WHERE suggestion LIKE '{esc}%'
GROUP BY suggestion
ORDER BY weight DESC, suggestion ASC
LIMIT {int(k)}
"""
