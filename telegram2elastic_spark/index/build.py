"""Inverted-index build: (term, docID, tf) -> compressed posting blocks.

Replaces the index build the reference delegated to Elasticsearch per-message
upserts (output/elasticsearch.py:22-33).  Spark-first shape:

  corpus --tokens()--> explode --> groupBy(term, doc_id).count()   [map-side
     partial agg, one shuffle on (term, doc_id)]
  term_dict:  groupBy(term).agg(df, cf)                            [built-in]
  doc_map:    select(doc_id, doc_len=size(tokens))                 [no shuffle]
  postings:   salted repartition-by-term -> applyInPandas per
              (term, salt) group -> numpy varbyte blocks           [custom]

Skew (north_star "heavy-hitter terms are skew-split"): the index is
document-partitioned — salt = pmod(doc_id, n_doc_parts) for every term — so a
Zipf-head term's posting list is split across all salts and no applyInPandas
group holds it whole; the query side merge-unions the per-salt partial
postings (each remains sorted, so the merge is k-way sorted).

At 10^12 docs: the only wide op is the (term, doc_id) aggregation + the
repartition by (term, salt); both are hash shuffles whose key-space is huge
(no single reducer hotspot once salted), and AQE skew handling covers the
residual.  Postings are written partitioned by term_bucket =
pmod(xxhash64(term), n_buckets) so a k-term query prunes to <= k buckets.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..functions.tokenizer import tokens
from .codec import BLOCK_SIZE, encode_blocks

POSTINGS_SCHEMA = StructType(
    [
        StructField("term", StringType()),
        StructField("salt", IntegerType()),
        StructField("block_id", IntegerType()),
        StructField("n_docs", IntegerType()),
        StructField("first_doc_id", LongType()),
        StructField("last_doc_id", LongType()),
        StructField("doc_gaps", BinaryType()),
        StructField("tf_bytes", BinaryType()),
        # per-posting doc lengths (varbyte), denormalized into the block —
        # BM25 norms travel with the postings so the query side never joins
        # or shuffles doc_map (Lucene stores norms the same way)
        StructField("dl_bytes", BinaryType()),
        # per-posting token positions (varbyte; empty unless the index was
        # built with positions=True) — enables phrase queries
        StructField("pos_bytes", BinaryType()),
        StructField("block_max_tf", IntegerType()),
    ]
)


def term_frequencies(corpus: DataFrame, positions: bool = False) -> DataFrame:
    """(term, doc_id, dl, tf[, positions]) — ONE shuffle, map-side combine.

    dl (BM25 length norm) is computed narrow before the explode and carried
    through the aggregation as a grouping column (constant per doc_id, so
    it adds no groups) — postings encoding then needs no separate
    doc-length aggregation + join.  With positions=True each row also
    carries the sorted token offsets of the term in the doc (phrase-query
    support; costs a collect_list in the same single shuffle).
    """
    if positions:
        toks = corpus.select("doc_id", tokens("text").alias("toks")).select(
            "doc_id",
            F.size("toks").alias("dl"),
            F.posexplode("toks").alias("pos", "term"),
        )
        return toks.groupBy("term", "doc_id", "dl").agg(
            F.count(F.lit(1)).alias("tf"),
            F.array_sort(F.collect_list("pos")).alias("positions"),
        )
    toks = corpus.select("doc_id", tokens("text").alias("toks")).select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term")
    )
    return toks.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )


def doc_map(corpus: DataFrame) -> DataFrame:
    """(doc_id, url, lang, warc_ts, doc_len) — narrow, no shuffle.

    Computed from the corpus, not from exploded postings, so zero-token
    documents still count toward N and avgdl (BM25 norm correctness).
    """
    return corpus.select(
        "doc_id",
        "url",
        "lang",
        "warc_ts",
        F.size(tokens("text")).cast("int").alias("doc_len"),
    )


def term_dict(tf_df: DataFrame) -> DataFrame:
    """(term, df, cf): document frequency + collection frequency.

    (term, doc_id) is unique post-agg, so df == count(*) — cheaper than
    countDistinct (no second shuffle / no distinct expand).
    """
    return tf_df.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one (term, salt) group -> posting block rows."""
    pdf = pdf.sort_values("doc_id")
    term = pdf["term"].iloc[0]
    salt = int(pdf["salt"].iloc[0])
    blocks = encode_blocks(
        pdf["doc_id"].to_numpy(),
        pdf["tf"].to_numpy(),
        BLOCK_SIZE,
        doc_lens=pdf["dl"].to_numpy(),
        positions=list(pdf["positions"]) if "positions" in pdf else None,
    )
    return pd.DataFrame(
        [
            {
                "term": term,
                "salt": salt,
                "block_id": b["block_id"],
                "n_docs": b["n_docs"],
                "first_doc_id": b["first_doc_id"],
                "last_doc_id": b["last_doc_id"],
                "doc_gaps": b["doc_gaps"],
                "tf_bytes": b["tf_bytes"],
                "dl_bytes": b["dl_bytes"],
                "pos_bytes": b["pos_bytes"],
                "block_max_tf": b["block_max_tf"],
            }
            for b in blocks
        ]
    )


DEFAULT_DOC_PARTS = 32


def build_postings(tf_df: DataFrame, n_doc_parts: int = DEFAULT_DOC_PARTS) -> DataFrame:
    """Sorted, delta-encoded, varbyte posting blocks per (term, salt).

    The index is **document-partitioned**: salt = pmod(doc_id, n_doc_parts)
    for every term.  One mechanism buys three properties at once:
      * skew-split heavy hitters (north_star): a "the"-like term's postings
        are spread over n_doc_parts groups, each <= df/P — no single
        applyInPandas group ever holds a whole Zipf-head posting list;
      * partition-parallel query execution: every doc lives in exactly one
        salt, so per-salt WAND top-k is complete and the global answer is a
        k-way merge of P local top-ks (partial-posting merge);
      * deterministic layout — salt is a pure function of doc_id.
    On a 1000-executor cluster n_doc_parts scales to O(#cores); it only
    changes parallelism, never results.
    """
    # tf_df already carries dl (term_frequencies computes it pre-explode),
    # so norms are denormalized into the blocks with zero extra shuffles.
    salted = tf_df.withColumn(
        "salt", F.pmod(F.col("doc_id"), F.lit(n_doc_parts)).cast("int")
    )
    return salted.groupBy("term", "salt").applyInPandas(
        _encode_group, POSTINGS_SCHEMA
    )


def build_index(
    corpus: DataFrame,
    n_doc_parts: int = DEFAULT_DOC_PARTS,
    positions: bool = False,
) -> dict:
    """Full in-memory build -> {'doc_map', 'term_dict', 'postings', 'stats'}.

    tf_df and doc_map fan out to multiple downstream tables (term_dict +
    postings; stats + persisted doc_map), so they are persisted
    MEMORY_AND_DISK — without this, write_index re-runs the tokenize +
    (term, doc_id) aggregation once per output table (measured 2x build
    cost at bench scale).  Persistence is lazy: a query that only touches
    one output pays nothing extra.
    """
    from pyspark import StorageLevel

    dm = doc_map(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    tf_df = term_frequencies(corpus, positions=positions).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    td = term_dict(tf_df)
    postings = build_postings(tf_df, n_doc_parts=n_doc_parts)
    stats = dm.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
        F.sum("doc_len").alias("total_tokens"),
    )
    return {
        "doc_map": dm,
        "term_dict": td,
        "postings": postings,
        "stats": stats,
        "_n_doc_parts": n_doc_parts,
        "_cached": [dm, tf_df],
    }


N_TERM_BUCKETS = 64


def write_index(
    index: dict,
    out_dir: str,
    n_buckets: int = N_TERM_BUCKETS,
    timings: dict | None = None,
) -> None:
    """Persist index tables as parquet; postings partitioned by term_bucket
    (pmod(xxhash64(term), n_buckets)) so query-time scans prune to the
    buckets of the query's terms — the analogue of the reference's per-day
    ES index routing (output/elasticsearch.py:10,33), keyed by term instead
    of time because queries arrive by term.

    `timings`: optional dict collecting per-table write wall seconds
    (bench per-stage breakdown).
    """
    import time as _time

    def _timed(name, fn):
        t0 = _time.perf_counter()
        fn()
        if timings is not None:
            timings[name] = _time.perf_counter() - t0

    _timed(
        "doc_map_write",
        lambda: index["doc_map"].write.mode("overwrite").parquet(
            f"{out_dir}/doc_map"
        ),
    )
    _timed(
        "term_dict_write",
        lambda: index["term_dict"]
        .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{out_dir}/term_dict"),
    )
    _timed(
        "postings_encode_write",
        lambda: index["postings"]
        .withColumn("term_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{out_dir}/postings"),
    )
    _timed(
        "stats_write",
        lambda: index["stats"].write.mode("overwrite").parquet(
            f"{out_dir}/stats"
        ),
    )
    import json as _json
    import os as _os

    with open(_os.path.join(out_dir, "meta.json"), "w") as f:
        _json.dump(
            {"n_doc_parts": index.get("_n_doc_parts", DEFAULT_DOC_PARTS)}, f
        )
    for df in index.get("_cached", []):
        df.unpersist()


def read_index(spark, out_dir: str) -> dict:
    import json as _json
    import os as _os

    n_parts = DEFAULT_DOC_PARTS
    meta_path = _os.path.join(out_dir, "meta.json")
    if _os.path.exists(meta_path):
        with open(meta_path) as f:
            n_parts = int(_json.load(f).get("n_doc_parts", DEFAULT_DOC_PARTS))
    return {
        "doc_map": spark.read.parquet(f"{out_dir}/doc_map"),
        "term_dict": spark.read.parquet(f"{out_dir}/term_dict"),
        "postings": spark.read.parquet(f"{out_dir}/postings"),
        "stats": spark.read.parquet(f"{out_dir}/stats"),
        "_n_doc_parts": n_parts,
    }
