"""Compound ranked queries: BM25 terms + an exact phrase, scored together.

The ES analogue is a bool query mixing `match` clauses with a
`match_phrase` clause (the reference's search API issues `match` on text;
phrase support came from the same positional index).  Semantics here:

    score(d) = sum_{t in terms} bm25(t, d)
             + [phrase occurs in d] * bm25_pseudo(phrase, d)

with the phrase scored as a pseudo-term (phrase_tf = exact-adjacency
count, df_p = docs containing it — exactly query/phrase.py), a document
qualifying if it matches ANY term or the phrase (bool-should), and the
final score rounded once (SCORE_DECIMALS) for the deterministic
(score desc, doc_id asc) order.

Distributed shape: ONE postings scan for terms ∪ phrase-terms, one
per-salt kernel pass emitting (doc_id, tscore_raw, phrase_tf, dl) — term
accumulation and phrase adjacency share the decoded blocks — then the
global stage is relational: df_p from the union, phrase idf, combined
score, TakeOrdered top-k, broadcast url join.  No pruning (the combined
bound would need phrase upper bounds); exactness first, and the scan is
already restricted to the query's terms."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE
from ..index.codec import decode_many
from .bm25 import B, K1, SCORE_DECIMALS
from .phrase import _phrase_counts_group
from .wand import _bm25_w, _collect_idfs, _filters_df, _postings_for_terms, _salt_scored

_EMPTY = pd.DataFrame(
    {
        "doc_id": pd.Series([], dtype="int64"),
        "tscore": pd.Series([], dtype="float64"),
        "phrase_tf": pd.Series([], dtype="int64"),
        "dl": pd.Series([], dtype="int64"),
        "dfp_part": pd.Series([], dtype="int64"),
    }
)


def _term_sums(pdf: pd.DataFrame, idfs: dict[str, float], avgdl: float):
    """Raw (unrounded) per-doc BM25 sums over the scoring terms — full
    accumulation, numpy merge-sum."""
    ids_all, w_all = [], []
    for term, g in pdf.groupby("term", sort=False):
        idf = idfs.get(term)
        if idf is None:
            continue  # phrase-only term: not a scoring clause
        g = g.sort_values("block_id")
        ids, tfs, dls = decode_many(
            [bytes(x) for x in g["doc_gaps"]],
            [bytes(x) for x in g["tf_bytes"]],
            [bytes(x) for x in g["dl_bytes"]],
            g["n_docs"].to_numpy(),
        )
        ids_all.append(ids.astype(np.int64))
        w_all.append(
            _bm25_w(tfs.astype(np.float64), dls.astype(np.float64), avgdl, idf)
        )
    if not ids_all:
        return np.array([], dtype=np.int64), np.array([], dtype=np.float64)
    ids = np.concatenate(ids_all)
    ws = np.concatenate(w_all)
    order = np.argsort(ids, kind="stable")
    ids, ws = ids[order], ws[order]
    uniq, starts = np.unique(ids, return_index=True)
    return uniq, np.add.reduceat(ws, starts)


def _compound_group(
    pdf: pd.DataFrame,
    idfs: dict[str, float],
    avgdl: float,
    phrase: list[str],
    tombstones: np.ndarray | None = None,
    allowed: np.ndarray | None = None,
) -> pd.DataFrame:
    if pdf.empty:
        return _EMPTY.copy()
    t_ids, t_scores = _term_sums(pdf, idfs, avgdl)
    ph = (
        _phrase_counts_group(pdf, phrase, tombstones=tombstones)
        if phrase
        else _EMPTY[["doc_id", "phrase_tf", "dl"]].copy()
    )
    out = pd.merge(
        pd.DataFrame({"doc_id": t_ids, "tscore": t_scores}),
        ph,
        on="doc_id",
        how="outer",
    )
    out["tscore"] = out["tscore"].fillna(0.0)
    out["phrase_tf"] = out["phrase_tf"].fillna(0).astype("int64")
    out["dl"] = out["dl"].fillna(0).astype("int64")
    ids = out["doc_id"].to_numpy(np.int64)
    keep = np.ones(ids.shape, dtype=bool)
    if tombstones is not None and len(tombstones):
        keep &= ~np.isin(ids, np.asarray(tombstones, dtype=np.int64))
    out = out.loc[keep]
    # phrase df counted on GLOBAL (tombstone-excluded) stats, BEFORE the
    # doc_filter mask: ES filter context restricts scored docs but never
    # changes idf (the contract documented in wand.py).  Shipped out of the
    # kernel as a per-salt sentinel row (doc_id = -1) so the global stage
    # can sum it without a second unfiltered aggregate pass.
    n_phrase = int((out["phrase_tf"] > 0).sum())
    if allowed is not None:
        ids = out["doc_id"].to_numpy(np.int64)
        al = np.asarray(allowed, dtype=np.int64)
        pos = np.searchsorted(al, ids)
        pos[pos >= al.size] = 0
        mask = (al[pos] == ids) if al.size else np.zeros(ids.shape, bool)
        out = out.loc[mask]
    out = out.assign(dfp_part=np.int64(0)).astype(
        {
            "doc_id": "int64",
            "tscore": "float64",
            "phrase_tf": "int64",
            "dl": "int64",
            "dfp_part": "int64",
        }
    )
    sentinel = pd.DataFrame(
        {
            "doc_id": pd.Series([-1], dtype="int64"),
            "tscore": pd.Series([0.0], dtype="float64"),
            "phrase_tf": pd.Series([0], dtype="int64"),
            "dl": pd.Series([0], dtype="int64"),
            "dfp_part": pd.Series([n_phrase], dtype="int64"),
        }
    )
    return pd.concat([out, sentinel], ignore_index=True)


def compound_topk(
    index: dict,
    terms: list[str],
    phrase: list[str],
    k: int = 10,
    doc_filter: str | None = None,
) -> DataFrame:
    """Top-k (doc_id, url, score) for `terms` OR exact `phrase` (requires a
    positional index when phrase is non-empty)."""
    spark = index["doc_map"].sparkSession
    all_terms = sorted(set(terms) | set(phrase))
    idfs_all, avgdl = _collect_idfs(index, all_terms)
    empty = spark.createDataFrame([], "doc_id long, url string, score double")
    live_phrase = list(phrase) if all(t in idfs_all for t in phrase) else []
    idfs = {t: v for t, v in idfs_all.items() if t in set(terms)}
    if not idfs and not live_phrase:
        return empty
    scan_terms = sorted(set(idfs) | set(live_phrase))
    post = _postings_for_terms(index, scan_terms)
    filt = _filters_df(index, doc_filter)

    def kernel(pdf, tomb, allowed):
        return _compound_group(
            pdf, idfs, float(avgdl), live_phrase,
            tombstones=tomb, allowed=allowed,
        )

    partial = _salt_scored(
        post, filt, doc_filter is not None, kernel,
        "doc_id long, tscore double, phrase_tf long, dl long, dfp_part long",
    )
    n = index["stats"].select("n_docs").first()[0]
    # phrase pseudo-term idf from the global PRE-doc_filter phrase df
    # (per-salt sentinel counts summed); scored rows exclude the sentinels
    dfp = partial.agg(
        F.coalesce(F.sum("dfp_part"), F.lit(0)).alias("df_p")
    )
    partial = partial.filter(F.col("doc_id") >= 0)
    phrase_w = F.when(
        F.col("phrase_tf") > 0,
        F.log(
            F.lit(1.0)
            + (F.lit(float(n)) - F.col("df_p") + 0.5) / (F.col("df_p") + 0.5)
        )
        * F.col("phrase_tf")
        * (K1 + 1.0)
        / (
            F.col("phrase_tf")
            + K1 * (1.0 - B + B * F.col("dl") / float(avgdl))
        ),
    ).otherwise(F.lit(0.0))
    scored = (
        partial.crossJoin(F.broadcast(dfp))
        .withColumn("score", F.round(F.col("tscore") + phrase_w, SCORE_DECIMALS))
        .select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return (
        index["doc_map"]
        .select("doc_id", "url")
        .join(F.broadcast(scored), "doc_id", "inner")
        .select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def compound_topk_sql(terms: list[str], phrase: list[str], k: int = 10) -> str:
    """DuckDB oracle: relational BM25 term sums + tokenized exact-adjacency
    phrase pseudo-term, combined and rounded identically."""
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    m = len(phrase)
    adj = " AND ".join(
        "toks[i+" + str(i) + "] = '" + t.replace("'", "''") + "'"
        for i, t in enumerate(phrase)
    )
    return f"""
WITH {CORPUS_CTE.strip()},
tokd AS (
  SELECT doc_id, url,
         list_filter(regexp_split_to_array(lower(text), '{TOKEN_SPLIT_RE}'),
                     t -> t <> '') AS toks
  FROM corpus
),
stats AS (SELECT count(*) AS n, avg(len(toks)) AS avgdl FROM tokd),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS term FROM tokd)
  WHERE term IN ({tlist})
  GROUP BY doc_id, term
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
tsum AS (
  SELECT tf.doc_id,
         sum(ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({K1} + 1.0)
             / (tf.tf + {K1} * (1.0 - {B}
                 + {B} * len(tokd.toks) / stats.avgdl))) AS tscore
  FROM tf
  JOIN df USING (term)
  JOIN tokd ON tokd.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
pcounts AS (
  SELECT doc_id, len(toks) AS dl,
         len(list_filter(range(1, greatest(len(toks) - {m - 1}, 0) + 1),
             i -> {adj})) AS phrase_tf
  FROM tokd
),
pmatch AS (SELECT * FROM pcounts WHERE phrase_tf > 0),
dfp AS (SELECT count(*) AS df_p FROM pmatch),
combined AS (
  SELECT coalesce(t.doc_id, p.doc_id) AS doc_id,
         coalesce(t.tscore, 0)
         + CASE WHEN p.doc_id IS NOT NULL THEN
             ln(1 + (stats.n - dfp.df_p + 0.5) / (dfp.df_p + 0.5))
             * p.phrase_tf * ({K1} + 1.0)
             / (p.phrase_tf + {K1} * (1.0 - {B} + {B} * p.dl / stats.avgdl))
           ELSE 0 END AS raw
  FROM tsum t
  FULL OUTER JOIN pmatch p ON t.doc_id = p.doc_id
  CROSS JOIN stats CROSS JOIN dfp
)
SELECT c.doc_id, tokd.url, round(c.raw, {SCORE_DECIMALS}) AS score
FROM combined c JOIN tokd ON tokd.doc_id = c.doc_id
ORDER BY score DESC, c.doc_id ASC
LIMIT {k}
"""
