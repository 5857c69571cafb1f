"""Phrase queries ("match_phrase") over positional postings.

The reference gets phrase matching from Elasticsearch's positional index;
here the positions travel with the compressed postings (codec
pos_bytes, built with build_index(..., positions=True)) and the phrase is
scored as a pseudo-term:

    phrase_tf(d) = number of exact-adjacency occurrences of the phrase
    df_p         = number of docs with phrase_tf > 0
    score(d)     = idf(df_p) * phrase_tf*(k1+1)
                   / (phrase_tf + k1*(1 - b + b*|d|/avgdl))

Distributed shape: per-salt kernel decodes the phrase terms' postings +
positions, intersects doc sets, counts adjacency runs (vectorized via
sorted-array membership over shifted positions), and emits (doc_id,
phrase_tf, dl).  df_p and the final scoring are tiny relational ops over
that result (global stats need the cross-salt df_p, so scoring happens
after the union — exactly the partial-then-global pattern of the WAND
path)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..corpus import CORPUS_CTE
from ..functions.tokenizer import TOKEN_SPLIT_RE
from ..index.codec import decode_many, decode_positions
from .bm25 import B, K1, SCORE_DECIMALS
from .wand import _postings_for_terms


def _phrase_counts_group(
    pdf: pd.DataFrame, phrase: list[str]
) -> pd.DataFrame:
    """One salt's blocks -> (doc_id, phrase_tf, dl) for docs containing the
    exact phrase."""
    empty = pd.DataFrame(
        {
            "doc_id": pd.Series([], dtype="int64"),
            "phrase_tf": pd.Series([], dtype="int64"),
            "dl": pd.Series([], dtype="int64"),
        }
    )
    per_term: dict[str, tuple] = {}
    for term, g in pdf.groupby("term", sort=False):
        g = g.sort_values("block_id")
        ids, tfs, dls = decode_many(
            [bytes(x) for x in g["doc_gaps"]],
            [bytes(x) for x in g["tf_bytes"]],
            [bytes(x) for x in g["dl_bytes"]],
            g["n_docs"].to_numpy(),
        )
        pos: list[np.ndarray] = []
        off = 0
        for pb, tfb in zip(g["pos_bytes"], g["tf_bytes"]):
            from ..index.codec import varbyte_decode

            block_tfs = varbyte_decode(bytes(tfb))
            pos.extend(decode_positions(bytes(pb), block_tfs))
            off += block_tfs.size
        per_term[term] = (ids.astype(np.int64), dls.astype(np.int64), pos)
    if any(t not in per_term for t in set(phrase)):
        return empty

    # doc-set intersection across the distinct phrase terms
    common = None
    for t in set(phrase):
        s = per_term[t][0]
        common = s if common is None else np.intersect1d(common, s)
    if common is None or common.size == 0:
        return empty

    out_ids, out_tf, out_dl = [], [], []
    # per-candidate adjacency: positions(term_i) must contain start + i
    lookups = {
        t: dict(zip(ids.tolist(), range(len(pos))))
        for t, (ids, _, pos) in per_term.items()
    }
    for d in common.tolist():
        t0 = phrase[0]
        ids0, dls0, pos0 = per_term[t0]
        idx0 = lookups[t0][d]
        starts = pos0[idx0].astype(np.int64)
        ok = np.ones(starts.shape, dtype=bool)
        for i, t in enumerate(phrase[1:], start=1):
            idsi, _, posi = per_term[t]
            pi = posi[lookups[t][d]].astype(np.int64)
            ok &= np.isin(starts + i, pi)
            if not ok.any():
                break
        n = int(ok.sum())
        if n:
            out_ids.append(d)
            out_tf.append(n)
            out_dl.append(int(dls0[idx0]))
    if not out_ids:
        return empty
    return pd.DataFrame(
        {"doc_id": out_ids, "phrase_tf": out_tf, "dl": out_dl}
    ).astype({"doc_id": "int64", "phrase_tf": "int64", "dl": "int64"})


def phrase_topk(index: dict, phrase: list[str], k: int = 10) -> DataFrame:
    """Top-k docs containing the exact phrase, BM25-scored as a pseudo-term.

    Requires an index built with positions=True (pos_bytes populated)."""
    spark = index["doc_map"].sparkSession
    empty = spark.createDataFrame([], "doc_id long, url string, score double")
    if len(phrase) < 1:
        return empty
    post = _postings_for_terms(index, sorted(set(phrase)))

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _phrase_counts_group(pdf, phrase)

    matches = post.groupBy("salt").applyInPandas(
        kernel, "doc_id long, phrase_tf long, dl long"
    )
    n, avgdl = index["stats"].select("n_docs", "avgdl").first()
    scored = (
        matches.crossJoin(
            F.broadcast(matches.agg(F.count(F.lit(1)).alias("df_p")))
        )
        .withColumn(
            "score",
            F.round(
                F.log(
                    F.lit(1.0)
                    + (F.lit(float(n)) - F.col("df_p") + 0.5)
                    / (F.col("df_p") + 0.5)
                )
                * F.col("phrase_tf")
                * (K1 + 1.0)
                / (
                    F.col("phrase_tf")
                    + K1 * (1.0 - B + B * F.col("dl") / float(avgdl))
                ),
                SCORE_DECIMALS,
            ),
        )
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


def phrase_topk_sql(phrase: list[str], k: int = 10) -> str:
    """DuckDB oracle: tokenize, count exact-adjacency runs, score the
    phrase as a pseudo-term with the same BM25 parameterization."""
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
counts AS (
  SELECT doc_id, url, len(toks) AS dl,
         len(list_filter(range(1, greatest(len(toks) - {m - 1}, 0) + 1),
             i -> {adj})) AS phrase_tf
  FROM tokd
),
matched AS (SELECT * FROM counts WHERE phrase_tf > 0),
dfp AS (SELECT count(*) AS df_p FROM matched)
SELECT m.doc_id, m.url,
       round(
         ln(1 + (stats.n - dfp.df_p + 0.5) / (dfp.df_p + 0.5))
         * m.phrase_tf * ({K1} + 1.0)
         / (m.phrase_tf + {K1} * (1.0 - {B} + {B} * m.dl / stats.avgdl)),
         {SCORE_DECIMALS}) AS score
FROM matched m CROSS JOIN stats CROSS JOIN dfp
ORDER BY score DESC, m.doc_id ASC
LIMIT {k}
"""
