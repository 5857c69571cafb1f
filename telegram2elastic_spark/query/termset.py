"""ES `terms_set` and synonym (`SynonymQuery`) term-group queries over the
compressed posting index.

`terms_set_topk` — ES terms_set: a doc matches when it contains at least
`required(doc)` DISTINCT terms from the candidate list, where the bar is a
per-document numeric field (ES `minimum_should_match_field`) — unlike
bool minimum_should_match, every doc carries its own threshold.  Matching
docs score the ordinary disjunctive BM25 sum over their matched terms
(filter-context semantics: the threshold never changes idf).

`synonym_topk` — Lucene SynonymQuery, what an ES `match` query emits when
the analyzer expands synonyms at the same position: each synonym GROUP is
scored as ONE pseudo-term with

    tf_g(doc) = sum of member-term tfs in doc       (SynonymWeight freq sum)
    df_g      = max of member-term dfs              (SynonymQuery docFreq)
    w_g(doc)  = idf(df_g) * bm25_tf(tf_g, dl)

and the query score is the sum over groups — NOT the sum of member-term
BM25 weights (that would double-count near-duplicate synonyms).

Scale shape (both): postings pruned to the candidate terms (term-bucket
partition pruning + pushed `term IN`), per-salt kernel does ONE pass of
decode + sorted-merge accumulation over the salt's blocks, and emits only
the salt-local top-k by the final rounded key (terms_set additionally
applies the per-doc bar from the cogrouped doc-values slice before
selection).  Each doc lives in exactly one salt and the final key is
computed identically everywhere, so the global merge is an exact
TakeOrdered over P*k rows.  Per-salt work is postings-bounded; nothing
corpus-sized crosses the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import DOC_LEN_SQL, TOKEN_SPLIT_RE
from ..index.codec import decode_many
from .bm25 import B, K1, SCORE_DECIMALS

# Default per-doc threshold: the ES minimum_should_match_field, derived
# deterministically so the DuckDB oracle computes the identical bar.
REQUIRED_EXPR = "1 + pmod(doc_id, 3)"
REQUIRED_SQL = "1 + (doc_id % 3)"


def _decode_terms(post_pdf: pd.DataFrame, terms: set[str]):
    """One salt's blocks for `terms` -> {term: (ids, tfs, dls)} arrays."""
    out = {}
    for term, g in post_pdf.groupby("term", sort=False):
        if term not in terms:
            continue
        g = g.sort_values("block_id")
        ids, tfs, dls = decode_many(
            [bytes(x) for x in g["doc_gaps"]],
            [bytes(x) for x in g["tf_bytes"]],
            [bytes(x) for x in g["dl_bytes"]],
            g["n_docs"].to_numpy(),
        )
        out[term] = (
            ids.astype(np.int64),
            tfs.astype(np.float64),
            dls.astype(np.float64),
        )
    return out


def _collect_dfs(index: dict, terms: list[str]) -> tuple[dict, int, float]:
    """(term -> df, N, avgdl) with the same bucket-pruned term_dict scan
    the idf cache uses (query/wand.py _collect_idfs)."""
    from .wand import _bucketed

    if "_stats" not in index:
        n, avgdl = index["stats"].select("n_docs", "avgdl").first()
        index["_stats"] = (int(n or 0), float(avgdl) if avgdl else 1.0)
    n, avgdl = index["_stats"]
    dfs = {
        r["term"]: int(r["df"])
        for r in _bucketed(index, index["term_dict"], terms)
        .filter(F.col("term").isin(terms))
        .select("term", "df")
        .collect()
    }
    return dfs, n, avgdl


def _bm25_tf(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def _idf(n: int, df: int) -> float:
    return float(np.log(1.0 + (n - df + 0.5) / (df + 0.5)))


def terms_set_topk(
    index: dict,
    terms: list[str],
    k: int = 10,
    required_expr: str = REQUIRED_EXPR,
) -> DataFrame:
    """Top-k (doc_id, url, score) among docs matching >= required(doc)
    distinct candidate terms; `required_expr` is any SQL expression over
    doc_map columns (the stored ES minimum_should_match_field)."""
    from .wand import _n_parts, _postings_for_terms, _tomb_df

    spark = index["doc_map"].sparkSession
    dfs, n, avgdl = _collect_dfs(index, sorted(set(terms)))
    empty = spark.createDataFrame([], "doc_id long, url string, score double")
    live = sorted(t for t in set(terms) if t in dfs)
    if not live:
        return empty
    idfs = {t: _idf(n, dfs[t]) for t in live}

    post = _postings_for_terms(index, live)
    side = index["doc_map"].select(
        "doc_id",
        F.expr(required_expr).cast("long").alias("required"),
        F.lit("h").alias("kind"),
    )
    tomb = _tomb_df(index)
    if tomb is not None:
        side = side.unionByName(
            tomb.select(
                "doc_id",
                F.lit(None).cast("long").alias("required"),
                F.lit("t").alias("kind"),
            )
        )
    side = side.withColumn(
        "salt", F.pmod(F.col("doc_id"), F.lit(_n_parts(index))).cast("int")
    )
    live_set = set(live)

    def kernel(post_pdf: pd.DataFrame, side_pdf: pd.DataFrame) -> pd.DataFrame:
        req = side_pdf.loc[side_pdf["kind"] == "h", ["doc_id", "required"]]
        tomb_ids = np.sort(
            side_pdf.loc[side_pdf["kind"] == "t", "doc_id"].to_numpy(np.int64)
        )
        decoded = _decode_terms(post_pdf, live_set)
        if not decoded:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        all_ids = np.concatenate([v[0] for v in decoded.values()])
        all_w = np.concatenate(
            [
                idfs[t] * _bm25_tf(tfs, dls, avgdl)
                for t, (ids, tfs, dls) in decoded.items()
            ]
        )
        order = np.argsort(all_ids, kind="stable")
        all_ids, all_w = all_ids[order], all_w[order]
        uniq, starts = np.unique(all_ids, return_index=True)
        scores = np.add.reduceat(all_w, starts)
        hits = np.diff(np.append(starts, all_ids.size))
        if tomb_ids.size:
            livem = ~np.isin(uniq, tomb_ids)
            uniq, scores, hits = uniq[livem], scores[livem], hits[livem]
        m = pd.DataFrame({"doc_id": uniq, "score": scores, "hits": hits}).merge(
            req, on="doc_id", how="left"
        )
        m = m[m["hits"] >= m["required"]]
        if m.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        rounded = np.round(m["score"].to_numpy(), SCORE_DECIMALS)
        order = np.lexsort((m["doc_id"].to_numpy(), -rounded))[:k]
        return pd.DataFrame(
            {
                "doc_id": m["doc_id"].to_numpy()[order],
                "score": rounded[order],
            }
        )

    local = (
        post.groupBy("salt")
        .cogroup(side.groupBy("salt"))
        .applyInPandas(kernel, "doc_id long, score double")
    )
    top = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        index["doc_map"]
        .select("doc_id", "url")
        .join(F.broadcast(top), "doc_id", "inner")
        .select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def terms_set_sql(
    terms: list[str], k: int = 10, required_sql: str = REQUIRED_SQL
) -> str:
    tl = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(terms)))
    return f"""
WITH {CORPUS_CTE.strip()},
dl AS (SELECT doc_id, url, {DOC_LEN_SQL} AS doc_len FROM corpus),
stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM dl),
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, dl.url,
         round(sum(
           ln(1 + (stats.n - tdf.df + 0.5) / (tdf.df + 0.5))
           * tf.tf * ({K1} + 1.0)
           / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl))
         ), {SCORE_DECIMALS}) AS score,
         count(*) AS hits
  FROM tf
  JOIN dl ON tf.doc_id = dl.doc_id
  JOIN tdf ON tf.term = tdf.term
  CROSS JOIN stats
  GROUP BY tf.doc_id, dl.url
)
SELECT doc_id, url, score
FROM scored
WHERE hits >= ({required_sql})
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def synonym_topk(
    index: dict, groups: list[list[str]], k: int = 10
) -> DataFrame:
    """Top-k (doc_id, url, score) where each synonym group scores as one
    pseudo-term (tf = member sum, df = member max — module docstring) and
    the query score sums the groups."""
    from .wand import _n_parts, _postings_for_terms, _tomb_df

    spark = index["doc_map"].sparkSession
    all_terms = sorted({t for g in groups for t in g})
    dfs, n, avgdl = _collect_dfs(index, all_terms)
    empty = spark.createDataFrame([], "doc_id long, url string, score double")
    live_groups = []
    for g in groups:
        members = sorted({t for t in g if t in dfs})
        if members:
            live_groups.append((members, _idf(n, max(dfs[t] for t in members))))
    if not live_groups:
        return empty

    scan_terms = sorted({t for members, _ in live_groups for t in members})
    post = _postings_for_terms(index, scan_terms)
    tomb = _tomb_df(index)
    if tomb is not None:
        # tombstones via cogroup (salt-aligned) like the wand path
        tomb = tomb.withColumn(
            "salt", F.pmod(F.col("doc_id"), F.lit(_n_parts(index))).cast("int")
        )

    def score_salt(post_pdf: pd.DataFrame, tomb_pdf: pd.DataFrame | None) -> pd.DataFrame:
        decoded = _decode_terms(post_pdf, set(scan_terms))
        acc_ids = np.array([], dtype=np.int64)
        acc_sc = np.array([], dtype=np.float64)
        for members, idf_g in live_groups:
            parts = [decoded[t] for t in members if t in decoded]
            if not parts:
                continue
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            order = np.argsort(ids, kind="stable")
            ids, tfs, dls = ids[order], tfs[order], dls[order]
            uniq, starts = np.unique(ids, return_index=True)
            tf_g = np.add.reduceat(tfs, starts)
            dl_g = dls[starts]
            w = idf_g * _bm25_tf(tf_g, dl_g, avgdl)
            all_ids = np.concatenate([acc_ids, uniq])
            all_sc = np.concatenate([acc_sc, w])
            order = np.argsort(all_ids, kind="stable")
            all_ids, all_sc = all_ids[order], all_sc[order]
            uniq2, starts2 = np.unique(all_ids, return_index=True)
            acc_ids, acc_sc = uniq2, np.add.reduceat(all_sc, starts2)
        if acc_ids.size == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        if tomb_pdf is not None and len(tomb_pdf):
            t_ids = np.sort(tomb_pdf["doc_id"].to_numpy(np.int64))
            livem = ~np.isin(acc_ids, t_ids)
            acc_ids, acc_sc = acc_ids[livem], acc_sc[livem]
        rounded = np.round(acc_sc, SCORE_DECIMALS)
        order = np.lexsort((acc_ids, -rounded))[:k]
        return pd.DataFrame({"doc_id": acc_ids[order], "score": rounded[order]})

    if tomb is not None:
        local = (
            post.groupBy("salt")
            .cogroup(tomb.groupBy("salt"))
            .applyInPandas(
                lambda p, t: score_salt(p, t), "doc_id long, score double"
            )
        )
    else:
        local = post.groupBy("salt").applyInPandas(
            lambda p: score_salt(p, None), "doc_id long, score double"
        )
    top = local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    return (
        index["doc_map"]
        .select("doc_id", "url")
        .join(F.broadcast(top), "doc_id", "inner")
        .select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


def synonym_topk_sql(groups: list[list[str]], k: int = 10) -> str:
    all_terms = sorted({t for g in groups for t in g})
    tl = ", ".join("'" + t.replace("'", "''") + "'" for t in all_terms)
    cases = []
    for i, g in enumerate(groups):
        ms = ", ".join("'" + t.replace("'", "''") + "'" for t in sorted(set(g)))
        cases.append(f"WHEN term IN ({ms}) THEN {i}")
    grp_expr = "CASE " + " ".join(cases) + " END"
    return f"""
WITH {CORPUS_CTE.strip()},
dl AS (SELECT doc_id, url, {DOC_LEN_SQL} AS doc_len FROM corpus),
stats AS (SELECT count(*) AS n, avg(doc_len) AS avgdl FROM dl),
toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(lower(text),
             '{TOKEN_SPLIT_RE}'), t -> t <> '')) AS term
  FROM corpus
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({tl}) GROUP BY doc_id, term
),
tdf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
-- group df = max df over ALL live members (the SynonymQuery docFreq),
-- independent of which members a particular doc contains
gdf AS (
  SELECT {grp_expr} AS grp, max(df) AS df_g FROM tdf GROUP BY grp
),
-- per (doc, group): tf_g = member tf sum
gtf AS (
  SELECT doc_id, {grp_expr} AS grp, sum(tf) AS tf_g
  FROM tf GROUP BY doc_id, grp
),
scored AS (
  SELECT g.doc_id, dl.url,
         round(sum(
           ln(1 + (stats.n - gdf.df_g + 0.5) / (gdf.df_g + 0.5))
           * g.tf_g * ({K1} + 1.0)
           / (g.tf_g + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl))
         ), {SCORE_DECIMALS}) AS score
  FROM gtf g
  JOIN gdf ON g.grp = gdf.grp
  JOIN dl ON g.doc_id = dl.doc_id
  CROSS JOIN stats
  GROUP BY g.doc_id, dl.url
)
SELECT doc_id, url, score
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
