"""The reference's explicit query executor, re-expressed relationally.

poc/src/api/routes/search.py:69-147 builds: substring filter (ilike, :76-84)
+ score threshold (:87-89) + topics any-of (:92-100) + implicit spam
exclusion (:103) -> ORDER BY score DESC NULLS LAST, date DESC (:106-109)
-> count() (:112) -> offset/limit page (:115).

Mapped onto the corpus table: `osint_value_score` has no column in the
driver testdata, so we derive a deterministic pseudo-score (with NULLs, to
exercise desc_nulls_last) that DuckDB derives identically; the spam filter
is the reference's rule-based regex cascade (llm_classifier.py:17-21,
80-98) evaluated natively with rlike — cheap-filter-first, exactly the
cost-gating the reference applies before its LLM stage.

Scale note: offset pagination bounds the data FIRST with orderBy().limit(
offset+limit) — a TakeOrderedAndProject (per-partition heap + driver merge
of P k-row heaps), never a global-window funnel of the whole filtered set —
then ranks the <= offset+limit surviving rows in one bounded partition.
The reference caps limit at 1000 (search.py:25-26), enforced here, so the
bounded set is tiny by contract; for deep pagination use search_after
(keyset, same cost for page N as page 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE

# Spam regex cascade, modeled on SPAM_PATTERNS (llm_classifier.py:17-21):
# long digit runs (card numbers), donation keywords, money-emoji runs.
SPAM_RES = [
    r"[0-9]{16}",
    r"(?i)donate|donation",
    r"[$€£]{3,}",
]
SPAM_SQL = (
    "(regexp_matches(text, '[0-9]{16}') OR regexp_matches(lower(text), "
    "'donate|donation') OR regexp_matches(text, '[$€£]{3,}'))"
)

# Deterministic pseudo-score with nulls — analogue of osint_value_score
# (0-100, nullable, models.py:117 + 10% null per FIXTURES.md).
SCORE_SQL = (
    "CASE WHEN doc_id % 11 = 0 THEN NULL "
    "ELSE CAST((doc_id * 37) % 101 AS DOUBLE) END"
)


def is_spam_col() -> F.Column:
    c = F.lit(False)
    for pat in SPAM_RES:
        if pat.startswith("(?i)"):
            c = c | F.lower(F.col("text")).rlike(pat[4:].lower())
        else:
            c = c | F.col("text").rlike(pat)
    return c


def score_col() -> F.Column:
    return F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("double")).otherwise(
        ((F.col("doc_id") * 37) % 101).cast("double")
    )


def search_filtered(
    corpus: DataFrame,
    q: str | None = None,
    min_score: float | None = None,
    langs: list[str] | None = None,
    include_spam: bool = False,
) -> DataFrame:
    """Filter stage — all predicates native (pushdown-friendly), ordered
    cheap-first like the reference's rule-before-LLM gating."""
    df = corpus.withColumn("score", score_col())
    if q is not None:
        # reference: text ILIKE %q% OR raw_text ILIKE %q% (search.py:76-84)
        df = df.filter(F.lower(F.col("text")).contains(q.lower()))
    if min_score is not None:
        df = df.filter(F.col("score") >= min_score)
    if langs:
        # analogue of topics any-of (search.py:92-100)
        df = df.filter(F.col("lang").isin(langs))
    if not include_spam:
        df = df.filter(~is_spam_col())  # implicit, always-on (search.py:103)
    return df


def search_page(
    corpus: DataFrame,
    q: str | None = None,
    min_score: float | None = None,
    langs: list[str] | None = None,
    offset: int = 0,
    limit: int = 20,
) -> DataFrame:
    """ORDER BY score DESC NULLS LAST, warc_ts DESC, doc_id + offset/limit.

    Plan shape: TakeOrderedAndProject(offset+limit) bounds the candidate
    set (distributed heap, no shuffle of the filtered corpus), then rn is
    assigned over that <= offset+limit-row remainder in a single bounded
    partition (constant partition key — deliberate, the set is capped by
    the API contract)."""
    _validate_page(offset, limit)
    df = search_filtered(corpus, q, min_score, langs)
    order = [
        F.col("score").desc_nulls_last(),
        F.col("warc_ts").desc(),
        F.col("doc_id"),
    ]
    bounded = df.orderBy(*order).limit(offset + limit)
    # Deliberate single-partition window: `bounded` holds at most
    # offset+limit rows (validated <= 2000), so the WindowExec "No
    # Partition Defined" warning is noise, not a scale hazard — the full
    # match set was already reduced by the TakeOrdered above.
    w = Window.partitionBy(F.lit(0)).orderBy(*order)
    return (
        bounded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > offset)
        .select(
            "doc_id",
            "url",
            "lang",
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
            "score",
            F.col("rn").cast("long").alias("rn"),
        )
    )


def _validate_page(offset: int, limit: int) -> None:
    """Reference API param contract (poc/src/api/routes/search.py:25-26):
    limit 1..1000, offset >= 0 — F11 bounds checks."""
    if not 1 <= limit <= 1000:
        raise ValueError(f"limit must be in [1, 1000], got {limit}")
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset}")


def search_count(
    corpus: DataFrame,
    q: str | None = None,
    min_score: float | None = None,
    langs: list[str] | None = None,
) -> DataFrame:
    """Total-count-before-pagination (A1, search.py:112) as a 1-row DF."""
    return search_filtered(corpus, q, min_score, langs).agg(
        F.count(F.lit(1)).alias("total")
    )


def _filters_sql(
    q: str | None, min_score: float | None, langs: list[str] | None
) -> str:
    preds = [f"NOT {SPAM_SQL}"]
    if q is not None:
        esc = q.replace("'", "''").lower()
        preds.append(f"contains(lower(text), '{esc}')")
    if min_score is not None:
        preds.append(f"score >= {min_score}")
    if langs:
        ls = ", ".join("'" + x.replace("'", "''") + "'" for x in langs)
        preds.append(f"lang IN ({ls})")
    return " AND ".join(preds)


def search_page_sql(
    q: str | None = None,
    min_score: float | None = None,
    langs: list[str] | None = None,
    offset: int = 0,
    limit: int = 20,
) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
scored AS (SELECT *, {SCORE_SQL} AS score FROM corpus),
filtered AS (SELECT * FROM scored WHERE {_filters_sql(q, min_score, langs)}),
ranked AS (
  SELECT doc_id, url, lang,
         strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') AS ts, score,
         row_number() OVER (
           ORDER BY score DESC NULLS LAST, warc_ts DESC, doc_id
         ) AS rn
  FROM filtered
)
SELECT doc_id, url, lang, ts, score, rn FROM ranked
WHERE rn > {offset} AND rn <= {offset + limit}
"""


def search_count_sql(
    q: str | None = None,
    min_score: float | None = None,
    langs: list[str] | None = None,
) -> str:
    return f"""
WITH {CORPUS_CTE.strip()},
scored AS (SELECT *, {SCORE_SQL} AS score FROM corpus)
SELECT count(*) AS total FROM scored
WHERE {_filters_sql(q, min_score, langs)}
"""


def search_after(
    corpus: DataFrame,
    cursor: tuple | None = None,
    q: str | None = None,
    min_score: float | None = None,
    langs: list[str] | None = None,
    limit: int = 20,
) -> DataFrame:
    """Keyset ("search_after") pagination — the 10^12-scale replacement for
    OFFSET (SURVEY.md §7.4): the cursor is the last row's ordering tuple
    (score, ts, doc_id); the next page is a pushdown-able predicate + top-k,
    so page N costs the same as page 1 (no global row_number funnel).

    NULL scores sort last under DESC; they are keyset-encoded as -1 (scores
    are >= 0), making the tuple comparison total.
    """
    _validate_page(0, limit)
    df = search_filtered(corpus, q, min_score, langs).withColumn(
        "ts", F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    )
    s = F.coalesce(F.col("score"), F.lit(-1.0))
    if cursor is not None:
        cs, cts, cid = cursor
        cs = -1.0 if cs is None else cs
        df = df.filter(
            (s < cs)
            | ((s == cs) & (F.col("ts") < cts))
            | ((s == cs) & (F.col("ts") == cts) & (F.col("doc_id") > cid))
        )
    return (
        df.orderBy(s.desc(), F.col("ts").desc(), F.col("doc_id"))
        .limit(limit)
        .select("doc_id", "url", "lang", "ts", "score")
    )


def search_after_sql(
    cursor: tuple | None = None,
    q: str | None = None,
    min_score: float | None = None,
    langs: list[str] | None = None,
    limit: int = 20,
) -> str:
    pred = ""
    if cursor is not None:
        cs, cts, cid = cursor
        cs = -1.0 if cs is None else cs
        pred = f"""AND (
      coalesce(score, -1.0) < {cs}
      OR (coalesce(score, -1.0) = {cs} AND ts < '{cts}')
      OR (coalesce(score, -1.0) = {cs} AND ts = '{cts}' AND doc_id > {cid})
    )"""
    return f"""
WITH {CORPUS_CTE.strip()},
scored AS (
  SELECT *, {SCORE_SQL} AS score,
         strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') AS ts
  FROM corpus
),
filtered AS (
  SELECT * FROM scored
  WHERE {_filters_sql(q, min_score, langs)} {pred}
)
SELECT doc_id, url, lang, ts, score FROM filtered
ORDER BY coalesce(score, -1.0) DESC, ts DESC, doc_id
LIMIT {limit}
"""


def scan_sliced(
    corpus: DataFrame, slice_id: int, max_slices: int, limit: int = 100
) -> DataFrame:
    """ES sliced scroll (`slice: {id, max}`): deterministic horizontal
    partition of a full-index scan so `max_slices` independent consumers
    can export the corpus in parallel — slice membership is a hash of the
    document id (ES slices on _id by default), here pmod(doc_id, max).

    Scale shape: the slice predicate is a pure row-local filter (pushed
    to the scan, no shuffle); within a slice the scroll order is doc_id
    asc so checkpoints/resumes are trivial.  The limit models one scroll
    page."""
    return (
        corpus.filter(F.pmod(F.col("doc_id"), F.lit(int(max_slices))) == int(slice_id))
        .select(
            "doc_id", "url", "lang",
            F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        )
        .orderBy("doc_id")
        .limit(int(limit))
    )


def scan_sliced_sql(slice_id: int, max_slices: int, limit: int = 100) -> str:
    from ..corpus import CORPUS_CTE

    return f"""
WITH {CORPUS_CTE.strip()}
SELECT doc_id, url, lang,
       strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') AS ts
FROM corpus
WHERE doc_id % {int(max_slices)} = {int(slice_id)}
ORDER BY doc_id
LIMIT {int(limit)}
"""
