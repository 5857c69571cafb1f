"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The driver corpus tops out at 5k docs; SPARK_GRAFT_EXPAND (default 40)
replicates it deterministically (corpus.expand_corpus) so build throughput
and query latency are measured at a scale where shuffles/partitioning
actually matter (~200k docs, ~10M tokens on sf0.1).

Extra JSON keys (informational, beyond the driver contract):
  docs_per_sec   — index-build throughput (BASELINE.json metric)
  wand_p95_ms    — BM25 top-10 p95 query latency over the query set
  expand / n_docs

Scaling evidence (north_rule, two parallelism levels): run
  python bench.py --scaling
which executes the identical build job at N and 4N local cores (default
2 and 8 via SPARK_GRAFT_SCALE_PAIR; interleaved best-of-
SPARK_GRAFT_SCALE_TRIALS to ride out shared-host noise) and reports
throughput at both + efficiency (see BASELINE.md "Scaling evidence").
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("SPARK_GRAFT_EXPAND", "40"))
# 320 × 5k = 1.6M docs: sized so the job's PARALLEL work dominates the
# ~10 s per-job constant (driver planning + parquet commit).  The r3
# encode-kernel speedups halved the parallel work at the old 160× size,
# which let that constant eat ~12% of the 2-core wall and understate
# scaling (Amdahl) — on a real cluster the constant is per-job, not
# per-core, and a 100 TB build runs hours, so job size must keep it
# negligible for the measurement to transfer.
SCALE_EXPAND = int(os.environ.get("SPARK_GRAFT_SCALE_EXPAND", "320"))
SCALE_PAIR = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_PAIR", "2,8").split(",")
)

BENCH_QUERIES = [
    ["spark", "merge"],
    ["the"],
    ["vector", "window", "batch"],
    ["the", "data", "row"],
    ["join", "filter"],
    ["dup"],
    ["table", "scan", "query"],
    ["zzzznotaterm"],
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_build_once(cpus: int, workdir: str, expand: int | None = None) -> dict:
    """Timed: parquet corpus scan -> full index build -> index written to
    parquet.  Returns {'n_docs', 'build_sec', 'docs_per_sec'}.

    Methodology for the scaling pair (north_rule N vs 4N evidence):
      * identical pre-written input parquet layout at both levels (128-way
        doc_id-hash layout; 4 MB splits so the scan fans out at both levels);
      * constant n_doc_parts=32 — the *job* (layout, groups, results) is
        identical, only the executor-thread count changes;
      * a tiny warm-up applyInPandas before the timed section so Python
        worker cold-start (a per-executor constant a real cluster pays
        once, not per job) is excluded.
    """
    import pandas as pd

    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.index.build import build_index, write_index
    from telegram2elastic_spark.session import get_spark

    spark = get_spark(
        "bench-build",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    corpus_path = f"{workdir}/corpus"
    docs = expand_corpus(load_documents(spark, SF_DIR), expand or EXPAND)
    as_corpus(docs).repartition(128, "doc_id").write.mode("overwrite").parquet(
        corpus_path
    )

    corpus = spark.read.parquet(corpus_path)
    n_docs = corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()  # warm python workers
    t0 = time.perf_counter()
    idx = build_index(corpus, n_doc_parts=32)
    write_index(idx, f"{workdir}/index_{cpus}")
    build_sec = time.perf_counter() - t0
    spark.stop()
    return {
        "n_docs": n_docs,
        "build_sec": build_sec,
        "docs_per_sec": n_docs / build_sec,
    }


def _suite_trial(spark, corpus, n_docs: int, workdir: str, trial: int):
    """One timed pass of the headline suite: index build + the query-side
    measurements.  Returns (queries, info)."""
    from telegram2elastic_spark.index.build import build_index, read_index, write_index
    from telegram2elastic_spark.operators import aggregates as agg
    from telegram2elastic_spark.query import bm25, search
    from telegram2elastic_spark.query.wand import wand_topk_batch, wand_topk_local

    queries: dict[str, float] = {}
    info: dict = {}

    # q1: index build end-to-end (scan -> postings/doc_map/term_dict on
    # disk), with a per-stage breakdown so round-over-round regressions
    # localize: tokenize+tf-shuffle first (fills the persisted tf_df),
    # then each table write (postings_encode_write = encode kernel +
    # partitioned write on the cached tf).
    stages: dict[str, float] = {}
    t0 = time.perf_counter()
    idx = build_index(corpus, n_doc_parts=CPUS)
    idx["_cached"][1].count()  # materialize tf_df (tokenize + 1 shuffle)
    stages["tokenize_tf_agg"] = time.perf_counter() - t0
    write_index(idx, f"{workdir}/index_t{trial}", timings=stages)
    queries["index_build"] = sum(stages.values())
    info["build_stages"] = {k: round(v, 3) for k, v in stages.items()}
    info["docs_per_sec"] = round(n_docs / queries["index_build"], 1)

    idx = read_index(spark, f"{workdir}/index_t{trial}")
    for name in ("doc_map", "term_dict", "postings", "stats"):
        idx[name] = idx[name].cache()
        idx[name].count()

    # q2: relational BM25 (vectorized baseline) over the raw corpus
    t0 = time.perf_counter()
    for terms in BENCH_QUERIES[:4]:
        bm25.bm25_topk(corpus, terms, k=10).collect()
    queries["bm25_relational_4q"] = time.perf_counter() - t0

    # q3a: WAND batch — the whole query set as ONE Spark job
    t0 = time.perf_counter()
    wand_topk_batch(idx, dict(enumerate(BENCH_QUERIES)), k=10).collect()
    queries["wand_batch_8q"] = time.perf_counter() - t0

    # q3b: single-query latency via the driver-local query-node path —
    # cold (first touch of each term: one pruned Spark fetch) and warm
    # (hot-shard posting cache, no Spark in the loop)
    wand_topk_local(idx, BENCH_QUERIES[0], k=10)  # warm workers
    idx.pop("_local_post_cache", None)
    cold = []
    for terms in BENCH_QUERIES:
        t0 = time.perf_counter()
        wand_topk_local(idx, terms, k=10)
        cold.append(time.perf_counter() - t0)
    warm = []
    for terms in BENCH_QUERIES:
        t0 = time.perf_counter()
        wand_topk_local(idx, terms, k=10)
        warm.append(time.perf_counter() - t0)
    cold.sort(); warm.sort()
    queries["wand_local_8q"] = sum(cold)
    info["wand_p95_ms"] = round(cold[max(0, int(len(cold) * 0.95) - 1)] * 1000, 1)
    info["wand_p50_ms"] = round(cold[len(cold) // 2] * 1000, 1)
    info["wand_warm_p95_ms"] = round(warm[max(0, int(len(warm) * 0.95) - 1)] * 1000, 1)

    # q4: search pipeline (filter -> sort -> paginate)
    t0 = time.perf_counter()
    search.search_page(corpus, q="merge", min_score=10.0, offset=5, limit=10).collect()
    search.search_count(corpus, q="merge", min_score=10.0).collect()
    queries["search_pipeline"] = time.perf_counter() - t0

    # q5: aggregations + window + self-join over events
    from telegram2elastic_spark.corpus import load_events

    events = load_events(spark, SF_DIR)
    t0 = time.perf_counter()
    agg.events_rollup(events).collect()
    agg.top_users_per_type(events).collect()
    agg.timeline_daily(corpus).collect()
    queries["aggregates"] = time.perf_counter() - t0

    for name in ("doc_map", "term_dict", "postings", "stats"):
        idx[name].unpersist()
    shutil.rmtree(f"{workdir}/index_t{trial}", ignore_errors=True)
    return queries, info


def main() -> None:
    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.session import get_spark

    trials_n = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))
    workdir = tempfile.mkdtemp(prefix="bench_")
    extra: dict = {"expand": EXPAND, "cpus": CPUS, "n_trials": trials_n}
    try:
        spark = get_spark("bench", master=f"local[{CPUS}]")

        corpus_path = f"{workdir}/corpus"
        docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
        as_corpus(docs).repartition(64, "doc_id").write.mode(
            "overwrite"
        ).parquet(corpus_path)
        corpus = spark.read.parquet(corpus_path)
        n_docs = corpus.count()
        extra["n_docs"] = n_docs

        # warm python workers once (per-executor constant, not per-query cost)
        import pandas as pd
        corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
            lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
        ).collect()

        # The headline suite runs `trials_n` times; the artifact records
        # EVERY trial plus best/median per query, so round-over-round
        # comparisons aren't confounded by the documented 2-3x host noise.
        all_trials: list[dict] = []
        infos: list[dict] = []
        for t in range(trials_n):
            q, info = _suite_trial(spark, corpus, n_docs, workdir, t)
            all_trials.append(q)
            infos.append(info)
        keys = list(all_trials[0])
        queries = {k: min(tr[k] for tr in all_trials) for k in keys}
        med = {
            k: round(sorted(tr[k] for tr in all_trials)[len(all_trials) // 2], 3)
            for k in keys
        }
        extra["trials"] = [
            {k: round(v, 3) for k, v in tr.items()} for tr in all_trials
        ]
        extra["queries_median"] = med
        best_build = min(range(trials_n), key=lambda i: all_trials[i]["index_build"])
        extra["build_stages"] = infos[best_build]["build_stages"]
        extra["docs_per_sec"] = infos[best_build]["docs_per_sec"]
        for k in ("wand_p95_ms", "wand_p50_ms", "wand_warm_p95_ms"):
            extra[k] = min(info[k] for info in infos)

        # fuzzy (extra keys, outside the headline sum): the PRODUCTION
        # path is build-once/probe-many against the materialized trigram
        # GIN index (partition-pruned probe); the full-corpus scan path is
        # kept only as the labeled no-index baseline.
        from telegram2elastic_spark.query import fuzzy as fz

        fuzzy_queries = ["mergge batch", "sparkk", "window scan", "fastt merge"]
        gin_dir = f"{workdir}/trgm_gin"
        t0 = time.perf_counter()
        fz.build_trigram_index(corpus, gin_dir)
        fuzzy_info = {"index_build_sec": round(time.perf_counter() - t0, 3)}
        probe_ms = []
        for _pass in range(2):
            for q in fuzzy_queries:
                t0 = time.perf_counter()
                fz.fuzzy_topk_indexed(spark, gin_dir, q, k=10).collect()
                probe_ms.append((time.perf_counter() - t0) * 1000)
        probe_ms.sort()
        fuzzy_info["probe_p50_ms"] = round(probe_ms[len(probe_ms) // 2], 1)
        fuzzy_info["probe_p95_ms"] = round(
            probe_ms[max(0, int(len(probe_ms) * 0.95) - 1)], 1
        )
        fuzzy_info["n_probes"] = len(probe_ms)
        # driver-local probe (query-node path, no Spark job): cold = bucket
        # read + score, warm = per-bucket cache hit
        lcache: dict = {}
        local_cold, local_warm = [], []
        for q in fuzzy_queries:
            t0 = time.perf_counter()
            fz.fuzzy_topk_local(gin_dir, q, k=10, cache=lcache)
            local_cold.append((time.perf_counter() - t0) * 1000)
        for q in fuzzy_queries:
            t0 = time.perf_counter()
            fz.fuzzy_topk_local(gin_dir, q, k=10, cache=lcache)
            local_warm.append((time.perf_counter() - t0) * 1000)
        local_cold.sort(); local_warm.sort()
        fuzzy_info["local_probe_cold_p50_ms"] = round(
            local_cold[len(local_cold) // 2], 1
        )
        fuzzy_info["local_probe_warm_p50_ms"] = round(
            local_warm[len(local_warm) // 2], 1
        )
        extra["fuzzy_indexed"] = fuzzy_info
        t0 = time.perf_counter()
        fz.fuzzy_topk(corpus, "mergge batch", k=10).collect()
        extra["fuzzy_scan_baseline_1q_sec"] = round(time.perf_counter() - t0, 3)

        # q6 (extra keys, outside the headline sum so `value` stays
        # round-over-round comparable): segmented-index lifecycle — 8
        # micro-batch segments on a 1/16 corpus slice, batched query
        # latency before vs after size-tiered auto-compaction.
        from pyspark.sql import functions as SF

        from telegram2elastic_spark.query.wand import wand_topk_batch
        from telegram2elastic_spark.streaming.ingest import IncrementalIndexer

        seg_corpus = corpus.filter(SF.col("doc_id") % 16 == 0).cache()
        seg_corpus.count()
        ix = IncrementalIndexer(spark, f"{workdir}/segix", n_doc_parts=CPUS)
        n_seg = 8
        t0 = time.perf_counter()
        for i in range(n_seg):
            ix.ingest_batch(
                seg_corpus.filter(SF.col("doc_id") % (16 * n_seg) == 16 * i),
                batch_id=f"s{i}",
            )
        seg = {"ingest_8seg_sec": round(time.perf_counter() - t0, 3)}
        t0 = time.perf_counter()
        wand_topk_batch(ix.as_index(), dict(enumerate(BENCH_QUERIES)), k=10).collect()
        seg["query_8q_before_compact_sec"] = round(time.perf_counter() - t0, 3)
        seg["n_segments_before"] = len(ix.manifest())
        t0 = time.perf_counter()
        ix.maybe_compact(max_per_tier=2, tier_factor=8)
        seg["compaction_sec"] = round(time.perf_counter() - t0, 3)
        seg["n_segments_after"] = len(ix.manifest())
        t0 = time.perf_counter()
        wand_topk_batch(ix.as_index(), dict(enumerate(BENCH_QUERIES)), k=10).collect()
        seg["query_8q_after_compact_sec"] = round(time.perf_counter() - t0, 3)
        extra["segments"] = seg

        # q7 (extra keys, outside the headline sum): round-3 ES
        # query-surface ops — one timed run each against a WRITTEN index
        # (so prefix/suggest exercise the sorted-dict pruned path and the
        # phrase ops the on-disk positional blocks).
        from telegram2elastic_spark.index.build import (
            build_index,
            read_index,
            write_index,
        )
        from telegram2elastic_spark.query import expand as exq
        from telegram2elastic_spark.query import facets as fc
        from telegram2elastic_spark.query import highlight as hl
        from telegram2elastic_spark.query import mlt as ml
        from telegram2elastic_spark.query import multifield as mff
        from telegram2elastic_spark.query import phrase as ph
        from telegram2elastic_spark.query import suggest as sg
        from telegram2elastic_spark.query.wand import wand_topk

        es: dict = {}
        t0 = time.perf_counter()
        es_dir = f"{workdir}/es_idx"
        write_index(build_index(corpus, n_doc_parts=CPUS, positions=True), es_dir)
        es["positional_index_build_write_sec"] = round(time.perf_counter() - t0, 3)
        eidx = read_index(spark, es_dir)

        def timed(name, fn, reps=2):
            # best-of-reps: single-shot per-op numbers rode the documented
            # 2-3x host noise in r3; index caches staying warm across reps
            # is the serving steady state these ops are quoted for
            best = float("inf")
            for _ in range(reps):
                t = time.perf_counter()
                fn().collect()
                best = min(best, time.perf_counter() - t)
            es[name] = round(best, 3)

        # reps=3: these two are the first ops after the positional index
        # write — rep 1 pays the cold parquet scan AND rep 2 still pays
        # JIT/page-cache warming (profiled: 6.8 / 6.2 / 2.9 s), so
        # best-of-2 under-reports the serving steady state the per-op
        # numbers are quoted for (the timed() docstring contract).
        timed("phrase_batch_4q_sec", lambda: ph.phrase_topk_batch(
            eidx,
            {0: ["merge", "batch"], 1: ["the", "fast"],
             2: ["table", "scan", "merge"], 3: ["data", "row"]},
            k=10, slop={2: 1}), reps=3)
        from telegram2elastic_spark.query import compound as cq

        timed("compound_batch_3q_sec", lambda: cq.compound_topk_batch(
            eidx,
            {0: (["spark", "merge"], ["the", "fast"]),
             1: (["spark"], ["merge", "batch"]),
             2: ([], ["the", "fast"])},
            k=10), reps=3)
        timed("msm_sec", lambda: wand_topk(
            eidx, ["vector", "window", "batch"], k=10, min_should_match=2))
        timed("must_not_sec", lambda: wand_topk(
            eidx, ["the", "data"], k=10, exclude_terms=["vector"]))
        timed("phrase_slop_sec", lambda: ph.phrase_topk(
            eidx, ["merge", "batch"], k=10, slop=2))
        timed("prefix_sec", lambda: exq.prefix_topk(eidx, "sc", k=10))
        timed("wildcard_sec", lambda: exq.wildcard_topk(eidx, "s?a*", k=10))
        timed("suggest_complete_sec", lambda: sg.suggest_complete(
            eidx, "s", k=10))
        timed("suggest_spelling_sec", lambda: sg.suggest_spelling(
            eidx, "mergge", k=5))
        timed("highlight_sec", lambda: hl.search_highlight(
            corpus, ["spark", "merge"], k=10, index=eidx))
        timed("facets_sec", lambda: fc.search_facets(
            corpus, q="merge", min_score=10.0))
        timed("significant_terms_sec", lambda: fc.significant_terms(
            corpus, q="merge", min_score=10.0, k=15, index=eidx))
        timed("more_like_this_sec", lambda: ml.more_like_this(
            eidx, corpus, 7, k=10))
        timed("rescore_sec", lambda: ml.rescore_recency(
            eidx, ["spark", "merge"], k=10, window_size=100))
        t0 = time.perf_counter()
        fidx = mff.build_field_indexes(
            corpus, {"text": "text", "url": "url"}, n_doc_parts=CPUS
        )
        for _fi in fidx.values():
            for nm in ("doc_map", "term_dict", "postings", "stats"):
                _fi[nm] = _fi[nm].cache()
                _fi[nm].count()
        es["field_indexes_build_sec"] = round(time.perf_counter() - t0, 3)
        timed("multi_match_sec", lambda: mff.multi_match_topk(
            fidx, {"text": 1.0, "url": 2.0}, ["spark", "page"], k=10))
        # round-4 session-6 surface: spans, scoring clauses, suggester
        from telegram2elastic_spark.query import boosting as bsq
        from telegram2elastic_spark.query import spans as spq

        timed("span_or_sec", lambda: spq.span_or_topk(
            eidx, ["vector", "window"], k=10))
        timed("span_multi_sec", lambda: spq.span_multi_topk(
            eidx, prefix="s", k=10))
        from telegram2elastic_spark.query import synonyms as synq

        timed("synonym_match_sec", lambda: synq.synonym_match_topk(
            eidx, [["spark"], ["merge", "join", "combine"]], k=10))
        timed("highlight_fvh_sec", lambda: hl.highlight_fvh(
            corpus, ["spark", "merge"], k=10, index=eidx))
        timed("span_not_sec", lambda: spq.span_not_topk(
            eidx, "merge", "batch", pre=1, post=1, k=10))
        timed("rank_feature_sec", lambda: bsq.rank_feature_topk(
            eidx, ["spark", "merge"], k=10))
        timed("pinned_sec", lambda: bsq.pinned_topk(
            eidx, ["spark", "merge"], [42, 7, 400], k=10))
        t0 = time.perf_counter()
        bgd = sg.bigram_dict(corpus).cache()
        bgd.count()
        es["bigram_dict_build_sec"] = round(time.perf_counter() - t0, 3)
        timed("phrase_suggest_sec", lambda: sg.phrase_suggest(
            eidx, bgd, ["tne", "fast"], k=5))
        # round-4 session-7 surface: intervals, search-as-you-type,
        # collapse inner_hits, nested, sharded terms agg, federated
        from telegram2elastic_spark.query import collapse as clq
        from telegram2elastic_spark.query import federated as fdq
        from telegram2elastic_spark.query import intervals as ivq
        from telegram2elastic_spark.query import nested as nsq

        timed("intervals_ordered_sec", lambda: ivq.intervals_ordered_topk(
            eidx, ["merge", "batch"], max_gaps=3, k=10))
        timed("match_bool_prefix_sec", lambda: exq.match_bool_prefix_topk(
            eidx, ["merge", "sc"], k=10))
        timed("collapse_inner_hits_sec", lambda: clq.collapse_inner_hits(
            corpus, ["spark", "merge"], k=5, inner_size=3, index=eidx))
        timed("nested_query_sec", lambda: nsq.nested_query_page(
            corpus, "mer", 2, 60))
        timed("terms_agg_sharded_sec", lambda: fc.terms_agg_sharded(
            corpus, size=10, shard_size=15, n_shards=CPUS))
        timed("federated_sec", lambda: fdq.federated_topk(
            corpus, ["spark", "merge"], k=10))
        # session-10: blended fuzzy match + seeded random_score (indexed)
        timed("match_fuzzy_sec", lambda: exq.match_fuzzy_topk(
            eidx, ["fast", "row"], k=10, fuzziness=2, prefix_length=0,
            max_expansions=8))
        from telegram2elastic_spark.query import funcscore as fsq

        timed("random_score_sec", lambda: fsq.function_score_random_topk(
            corpus, ["spark", "merge"], seed=42, k=10, index=eidx))
        # round-4 session-8 surface: lenient query-string, span
        # enclosure, completion contexts, hybrid fusion, new aggs
        from telegram2elastic_spark.corpus import load_embeddings as _lde
        from telegram2elastic_spark.operators import aggregates as agq
        from telegram2elastic_spark.query import hybrid as hyq
        from telegram2elastic_spark.query import querystring as qsq

        timed("simple_query_string_sec", lambda: qsq.simple_query_string_topk(
            eidx, "spark merge -vector field:x", k=10))
        timed("span_within_sec", lambda: spq.span_within_topk(
            eidx, "fast", ["the", "merge"], slop=2, k=10))
        timed("span_containing_sec", lambda: spq.span_containing_topk(
            eidx, "fast", ["the", "merge"], slop=2, k=10))
        timed("completion_contexts_sec", lambda: sg.completion_contexts(
            corpus, "site1", lang="en", k=10))
        _emb = _lde(spark, SF_DIR)
        timed("rrf_hybrid_sec", lambda: hyq.rrf_hybrid_topk(
            None, _emb, ["spark", "merge"], query_vec_id=0, k=10,
            index=eidx))
        timed("agg_mad_sec", lambda: agq.agg_mad(corpus))
        timed("agg_cumulative_cardinality_sec",
              lambda: agq.agg_cumulative_cardinality(corpus))
        timed("variable_width_histogram_sec",
              lambda: agq.variable_width_histogram(corpus, k=4, iters=2))
        # round-4 session-11 surface
        from telegram2elastic_spark.operators import similarity as smq
        from telegram2elastic_spark.query import rules as rlq
        from telegram2elastic_spark.query import sparse as spvq
        from telegram2elastic_spark.query import geo as geq

        timed("weighted_tokens_sec", lambda: spvq.weighted_tokens_topk(
            eidx, {"batch": 0.3, "scan": 2.0, "merge": 0.35, "spark": 0.25},
            ratio_threshold=1.03, k=10))
        timed("tsr_rerank_sec", lambda: hyq.text_similarity_reranker_topk(
            None, _emb, ["spark", "merge"], query_vec_id=0, k=10,
            index=eidx))
        timed("rank_vectors_maxsim_sec", lambda: smq.rank_vectors_maxsim_topk(
            _emb, query_group=0, group_size=5, k=10))
        timed("rule_query_sec", lambda: rlq.rule_query_topk(
            eidx,
            [{"rule_id": "p", "type": "pinned",
              "criteria": [{"type": "exact", "metadata": "q",
                            "values": ["spark merge"]}], "ids": [42, 7]},
             {"rule_id": "x", "type": "exclude",
              "criteria": [{"type": "always"}], "ids": [3]}],
            {"q": "spark merge"}, ["spark", "merge"], k=10))
        timed("geo_line_sec", lambda: geq.geo_line(corpus, size=10))
        timed("geo_polygon_sec", lambda: geq.geo_polygon_page(corpus, k=50))
        from telegram2elastic_spark.query import semantic as smq2

        timed("semantic_sec", lambda: smq2.semantic_topk(
            corpus, "spark merge batch", k=10))
        # session-12: the semantic_text STORE shape — embed once at
        # ingest (store build priced separately), then each query is a
        # broadcast join + one hash agg over the sparse store
        t0 = time.perf_counter()
        _sem_store = smq2.doc_embeddings(corpus).cache()
        _sem_store.count()
        es["semantic_store_build_sec"] = round(time.perf_counter() - t0, 3)
        timed("semantic_indexed_sec", lambda: smq2.semantic_topk(
            None, "spark merge batch", k=10, store=_sem_store))
        _sem_store.unpersist()
        # round-4 session-14: chunked semantic_text (ES 8.15) — per-chunk
        # embeddings, best-chunk-per-doc; plus the serving store + the
        # driver-local probe's cold/warm ms (pyarrow bucket-pruned reads)
        timed("semantic_chunked_sec", lambda: smq2.semantic_chunked_topk(
            corpus, "spark merge batch", k=10))
        _csd = tempfile.mkdtemp(prefix="chunkstore_")
        t0 = time.perf_counter()
        smq2.write_semantic_chunk_store(corpus, _csd)
        es["semantic_chunk_store_build_sec"] = round(
            time.perf_counter() - t0, 3
        )
        _ccache: dict = {}
        t0 = time.perf_counter()
        smq2.semantic_chunked_topk_local(
            _csd, "spark merge batch", k=10, cache=_ccache
        )
        es["semantic_chunked_local_cold_ms"] = round(
            (time.perf_counter() - t0) * 1000, 2
        )
        t0 = time.perf_counter()
        smq2.semantic_chunked_topk_local(
            _csd, "spark merge batch", k=10, cache=_ccache
        )
        es["semantic_chunked_local_warm_ms"] = round(
            (time.perf_counter() - t0) * 1000, 2
        )
        shutil.rmtree(_csd, ignore_errors=True)
        timed("sampler_sec", lambda: fc.sampler_agg(
            corpus, "merge", shard_size=100))
        # round-4 session-12: retriever-tree coordinator (rrf fusion of a
        # lexical and a knn leg — the composed legs are already benched
        # solo; this row prices the fusion layer itself)
        from telegram2elastic_spark.query import retriever as rtq

        _rctx = {"index": eidx, "embeddings": _lde(spark, SF_DIR)}
        timed("retriever_rrf_sec", lambda: rtq.retriever_search(_rctx, {
            "retriever": {"rrf": {"retrievers": [
                {"standard": {"query": {"match": {"text": "spark merge"}}}},
                {"knn": {"query_vec_id": 0, "k": 20}},
            ], "rank_window_size": 20, "rank_constant": 60}},
            "size": 10,
        }))
        # round-4 session-12 surface additions
        timed("rescorer_retriever_sec", lambda: rtq.retriever_search(
            _rctx, {
                "retriever": {"rescorer": {
                    "retriever": {"standard": {"query": {
                        "match": {"text": "spark merge"}}}},
                    "rescore": {"window_size": 20, "query": {
                        "rescore_query": {
                            "match": {"text": "batch vector"}},
                        "query_weight": 0.7,
                        "rescore_query_weight": 1.5}},
                }},
                "size": 10,
            }))
        from telegram2elastic_spark.query import dsl as qdsl2

        timed("msearch_4q_sec", lambda: qdsl2.msearch(eidx, [
            {"query": {"bool": {
                "must": [{"match": {"text": "the data row"}}],
                "must_not": [{"match": {"text": "vector"}}]}}, "size": 10},
            {"query": {"match": {"text": {
                "query": "spark merge batch",
                "minimum_should_match": 2}}}, "size": 8},
            {"query": {"match_phrase": {"text": {
                "query": "merge batch", "slop": 1}}}, "size": 6},
            {"query": {"bool": {"must": [
                {"match": {"text": "spark"}},
                {"match_phrase": {"text": "the fast"}}]}}, "size": 4},
        ]))
        timed("search_mvt_sec", lambda: geq.search_mvt(
            corpus, z=2, x=1, y=1, grid_precision=5, hits=10))
        timed("geohash_grid_sec", lambda: geq.geohash_grid(
            corpus, precision=4, k=10))
        timed("geo_grid_sec", lambda: geq.geo_grid_page(corpus, "3/5/3", k=20))
        from telegram2elastic_spark.query import scriptscore as ssq

        timed("script_score_sec", lambda: ssq.script_score_topk(
            None, ["spark", "merge"],
            "saturation(_score, 2) * Math.log(1 + doc['doc_len'].value)",
            k=10, index=eidx))
        for _fi in fidx.values():
            for nm in ("doc_map", "term_dict", "postings", "stats"):
                _fi[nm].unpersist()
        extra["es_surface"] = es

        # q8 (extra keys): driver-local query-node paths for the same
        # surface ops — WARM per-op latency in ms (vocab/postings caches
        # hot; mlt/rescore/highlight still pay their documented k-row
        # doc-store Spark fetch per call).  Best of 3 after one warm-up.
        from telegram2elastic_spark.query import local as lqp

        lsf: dict = {}

        def timed_local(name, fn, reps=3):
            fn()  # warm the caches this op touches
            best = float("inf")
            for _ in range(reps):
                t = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t)
            lsf[name] = round(best * 1000, 2)

        timed_local("prefix_ms", lambda: lqp.prefix_topk_local(eidx, "sc", k=10))
        timed_local(
            "wildcard_ms", lambda: lqp.wildcard_topk_local(eidx, "s?a*", k=10)
        )
        timed_local(
            "suggest_complete_ms",
            lambda: lqp.suggest_complete_local(eidx, "s", k=10),
        )
        timed_local(
            "suggest_spelling_ms",
            lambda: lqp.suggest_spelling_local(eidx, "mergge", k=5),
        )
        timed_local(
            "more_like_this_ms",
            lambda: lqp.more_like_this_local(eidx, corpus, 7, k=10),
        )
        timed_local(
            "rescore_ms",
            lambda: lqp.rescore_recency_local(
                eidx, ["spark", "merge"], k=10, window_size=100
            ),
        )
        timed_local(
            "highlight_ms",
            lambda: lqp.search_highlight_local(
                eidx, corpus, ["spark", "merge"], k=10
            ),
        )
        from telegram2elastic_spark.query.querystring import (
            query_string_topk_local,
        )

        timed_local(
            "query_string_ms",
            lambda: query_string_topk_local(eidx, "spark merge -vector", k=10),
        )
        timed_local(
            "fuzzy_term_ms",
            lambda: lqp.fuzzy_term_topk_local(eidx, "mergge", k=10),
        )
        timed_local(
            "regexp_ms",
            lambda: lqp.regexp_topk_local(eidx, "sc[ab].*", k=10),
        )
        timed_local(
            "dis_max_ms",
            lambda: lqp.dis_max_topk_local(
                fidx, {"text": 1.0, "url": 2.0}, ["spark", "page"], k=10
            ),
        )
        # Same three ops over the stored-fields store: the doc fetch is a
        # driver-local pyarrow point read (query/docstore.py), no Spark
        # job in the loop at all.  doc-cache cleared between reps so the
        # number includes the point read, not a dict hit.
        from telegram2elastic_spark.index.build import write_doc_store

        t0 = time.perf_counter()
        write_doc_store(corpus, es_dir)
        lsf["doc_store_write_sec"] = round(time.perf_counter() - t0, 3)
        eidx["_doc_store_dir"] = f"{es_dir}/doc_store"

        def timed_store(name, fn, reps=3):
            fn()
            best = float("inf")
            for _ in range(reps):
                eidx["_doc_cache"] = {}
                t = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t)
            lsf[name] = round(best * 1000, 2)

        timed_store(
            "more_like_this_store_ms",
            lambda: lqp.more_like_this_local(eidx, None, 7, k=10),
        )
        timed_store(
            "rescore_store_ms",
            lambda: lqp.rescore_recency_local(
                eidx, ["spark", "merge"], k=10, window_size=100
            ),
        )
        timed_store(
            "highlight_store_ms",
            lambda: lqp.search_highlight_local(
                eidx, None, ["spark", "merge"], k=10
            ),
        )
        timed_local(
            "pinned_ms",
            lambda: lqp.pinned_topk_local(
                eidx, ["spark", "merge"], [42, 7, 400], k=10
            ),
        )
        timed_local(
            "rank_feature_ms",
            lambda: lqp.rank_feature_topk_local(eidx, ["spark", "merge"], k=10),
        )
        from telegram2elastic_spark.query.scriptscore import (
            script_score_topk_local,
        )

        timed_local(
            "script_score_ms",
            lambda: script_score_topk_local(
                eidx, ["spark", "merge"],
                "saturation(_score, 2) * Math.log(1 + doc['doc_len'].value)",
                k=10,
            ),
        )
        t0 = time.perf_counter()
        bg_store = sg.write_bigram_store(corpus, es_dir)
        lsf["bigram_store_write_sec"] = round(time.perf_counter() - t0, 3)
        timed_local(
            "phrase_suggest_ms",
            lambda: lqp.phrase_suggest_local(
                eidx, bg_store, ["tne", "fast"], k=5
            ),
        )
        timed_local(
            "intervals_ms",
            lambda: ivq.intervals_ordered_topk_local(
                eidx, ["merge", "batch"], max_gaps=3, k=10
            ),
        )
        timed_local(
            "boolprefix_ms",
            lambda: lqp.match_bool_prefix_topk_local(
                eidx, ["merge", "sc"], k=10
            ),
        )
        timed_local(
            "synonyms_ms",
            lambda: lqp.synonym_match_topk_local(
                eidx, [["spark"], ["merge", "join", "combine"]], k=10
            ),
        )
        timed_local(
            "fvh_store_ms",
            lambda: lqp.highlight_fvh_local(
                eidx, ["spark", "merge"], k=10
            ),
        )
        # round-4 session-11 local twins
        from telegram2elastic_spark.query import hybrid as _hyl
        from telegram2elastic_spark.query import sparse as _spl

        _embp = f"{SF_DIR}/embeddings.parquet"
        timed_local(
            "tsr_ms",
            lambda: _hyl.text_similarity_reranker_local(
                eidx, _embp, ["spark", "merge"], query_vec_id=0, k=10
            ),
        )
        timed_local(
            "maxsim_ms",
            lambda: _hyl.rank_vectors_maxsim_local(
                eidx, _embp, query_group=0, group_size=5, k=10
            ),
        )
        timed_local(
            "weighted_tokens_ms",
            lambda: _spl.weighted_tokens_topk_local(
                eidx,
                {"batch": 0.3, "scan": 2.0, "merge": 0.35, "spark": 0.25},
                ratio_threshold=1.03, k=10,
            ),
        )
        extra["local_surface"] = lsf

        # q9 (extra keys): the training-pipeline ops at bench-corpus
        # scale — one timed Spark action each (throughput ops, not
        # serving ops; quoted as whole-corpus seconds)
        from telegram2elastic_spark.operators import dedup as ddp
        from telegram2elastic_spark.operators import training as trp

        pl: dict = {}

        def timed_pl(name, fn):
            t = time.perf_counter()
            fn().count()
            pl[name] = round(time.perf_counter() - t, 3)

        timed_pl("dedup_blocks_sec", lambda: ddp.dedup_blocks(corpus))
        timed_pl("quality_gopher_sec", lambda: trp.quality_gopher(corpus))
        timed_pl(
            "lm_cross_entropy_sec", lambda: trp.lm_cross_entropy(corpus)
        )
        timed_pl(
            "stratified_sample_sec", lambda: trp.stratified_sample(corpus)
        )
        timed_pl(
            "cap_per_host_sec",
            lambda: trp.cap_per_host(corpus, limit=None),
        )
        timed_pl(
            "remove_boilerplate_sec",
            lambda: ddp.remove_boilerplate(corpus, block=10, min_docs=3),
        )
        timed_pl(
            "temperature_sample_sec",
            lambda: trp.temperature_sample(corpus, budget=20_000),
        )
        timed_pl("pipeline_funnel_sec", lambda: trp.pipeline_funnel(corpus))
        timed_pl(
            "dedup_url_canonical_sec",
            lambda: ddp.dedup_url_canonical(corpus),
        )
        timed_pl(
            "pack_sequences_sec",
            lambda: trp.pack_sequences(corpus, seq_len=2048),
        )
        timed_pl("top_ngrams_sec", lambda: trp.top_ngrams(corpus, n=3, k=20))
        timed_pl(
            "repetition_metrics_sec",
            lambda: trp.repetition_metrics(corpus),
        )
        # dedup_components runs its own per-round convergence actions;
        # the timed .count() just adds the final materialization
        timed_pl(
            "dedup_components_sec", lambda: ddp.dedup_components(corpus)
        )
        timed_pl(
            "dsir_weights_sec",
            lambda: trp.dsir_weights(corpus, target_lang="fr"),
        )
        timed_pl(
            "dsir_sample_sec",
            lambda: trp.dsir_sample(corpus, target_lang="fr", k=50),
        )
        timed_pl(
            "bpe_pair_counts_sec", lambda: trp.bpe_pair_counts(corpus, k=20)
        )
        t = time.perf_counter()
        trp.bpe_train(corpus, n_merges=3)
        pl["bpe_train_3merges_sec"] = round(time.perf_counter() - t, 3)
        from telegram2elastic_spark.query import geo as geoq

        timed_pl(
            "geo_distance_agg_sec", lambda: geoq.geo_distance_agg(corpus)
        )
        from telegram2elastic_spark.operators import aggregates as aggp

        timed_pl(
            "agg_bucket_selector_sec",
            lambda: aggp.agg_bucket_selector(corpus),
        )
        from telegram2elastic_spark.query import federated as fedp

        timed_pl(
            "federated_dfs_sec",
            lambda: fedp.federated_topk_dfs(corpus, ["spark", "merge"], k=10),
        )
        # session-10 ops
        timed_pl(
            "substring_spans_sec",
            lambda: ddp.dedup_substring_spans(corpus, n=8),
        )
        timed_pl(
            "substring_clean_sec",
            lambda: ddp.dedup_substring_clean(corpus, n=8),
        )
        timed_pl(
            "frequent_item_sets_sec",
            lambda: aggp.agg_frequent_item_sets(
                corpus, min_support=max(200, n_docs // 3), top=20
            ),
        )
        timed_pl("change_point_sec", lambda: aggp.agg_change_point(corpus))
        timed_pl("categorize_text_sec", lambda: aggp.categorize_text(corpus))
        # round-4 session-12 additions
        from telegram2elastic_spark.corpus import load_events as _lev

        timed_pl(
            "tsdb_downsample_sec",
            lambda: aggp.downsample(_lev(spark, SF_DIR), interval_hours=6),
        )
        from telegram2elastic_spark.query import parentchild as pcq

        timed_pl("agg_children_sec", lambda: pcq.children_agg(corpus))
        from telegram2elastic_spark.query import nested as nsq

        timed_pl(
            "agg_reverse_nested_sec",
            lambda: nsq.reverse_nested_agg(corpus, lang="en", top=10),
        )
        timed_pl(
            "scripted_metric_sec",
            lambda: aggp.scripted_metric_profile(corpus),
        )
        from telegram2elastic_spark.functions.tokenizer import (
            apply_stop_analyzer,
        )

        timed_pl(
            "stop_analyzed_view_sec",
            lambda: apply_stop_analyzer(corpus, ["the", "a"]),
        )
        from telegram2elastic_spark.operators import ingest_pipeline as ipp

        import __spark_entry__ as _se

        timed_pl(
            "ingest_pipeline_sec",
            lambda: ipp.apply_pipeline(corpus, _se.INGEST_PIPE).select(
                "doc_id", *_se.INGEST_COLS
            ),
        )
        # round-4 session-11 pipeline ops
        timed_pl(
            "mixture_sample_sec",
            lambda: trp.mixture_sample(corpus),
        )
        timed_pl(
            "skipgram_counts_sec",
            lambda: trp.skipgram_counts(corpus, window=2, top=30),
        )
        timed_pl(
            "collocations_pmi_sec",
            lambda: trp.collocations_pmi(corpus, min_count=5, top=30),
        )
        timed_pl(
            "fingerprint_dedup_sec",
            lambda: ddp.fingerprint_dedup(corpus, top=20),
        )
        # round-4 session-12: ES|QL (POST /_query) compiled to a DataFrame
        # chain — scan -> fused map -> one hash agg at any corpus size
        from telegram2elastic_spark.query import esql as esqp

        timed_pl(
            "esql_stats_sec",
            lambda: esqp.EsqlPlan(_se.ESQL_PROGRAMS["esql_stats"])
            .dataframe(spark, SF_DIR, tables={"corpus": corpus}),
        )
        timed_pl(
            "esql_grok_case_sec",
            lambda: esqp.EsqlPlan(_se.ESQL_PROGRAMS["esql_grok_case"])
            .dataframe(spark, SF_DIR, tables={"corpus": corpus}),
        )
        # round-4 session-13 ops
        from telegram2elastic_spark.functions import text_quality as tqp

        timed_pl("agg_parent_sec", lambda: pcq.parent_agg(corpus))
        timed_pl(
            "agg_time_series_sec",
            lambda: aggp.time_series_agg(_lev(spark, SF_DIR), size=50),
        )
        timed_pl(
            "keywords_tfidf_sec", lambda: tqp.keywords_tfidf(corpus, k=5)
        )
        timed_pl(
            "url_quality_filter_sec",
            lambda: trp.url_quality_filter(corpus),
        )
        timed_pl(
            "budget_select_sec",
            lambda: trp.budget_select(corpus, budget_tokens=500_000),
        )
        timed_pl(
            "dedup_cross_snapshot_sec",
            lambda: ddp.dedup_cross_snapshot(corpus),
        )
        timed_pl(
            "shard_shuffle_sec",
            lambda: trp.shard_shuffle(corpus, n_shards=8, epoch=1),
        )
        timed_pl(
            "ingest_pipeline2_sec",
            lambda: ipp.apply_pipeline(corpus, _se.INGEST_PIPE2).select(
                "doc_id", *_se.INGEST_COLS2
            ),
        )
        timed_pl(
            "geo_shape_sec",
            lambda: geoq.geo_shape_page(corpus, relation="intersects", k=20),
        )
        # round-4 session-14 ops
        timed_pl("script_profile_sec", lambda: tqp.script_profile(corpus))
        timed_pl(
            "fertility_stats_sec", lambda: tqp.fertility_stats(corpus)
        )
        timed_pl(
            "agg_ip_prefix_sec", lambda: aggp.agg_ip_prefix(corpus, 8)
        )
        # round-4 session-19: graph-ranking family (integer-exact)
        from telegram2elastic_spark.operators import graph as grp

        timed_pl(
            "textrank_terms_sec",
            lambda: grp.textrank_terms(corpus, window=2, iters=3, k=20),
        )
        timed_pl(
            "hits_authorities_sec",
            lambda: grp.hits_authorities(corpus, iters=2, k=20),
        )
        timed_pl(
            "textrank_seeded_sec",
            lambda: grp.textrank_seeded(
                corpus, ["spark", "merge"], window=2, iters=3, k=20
            ),
        )
        from telegram2elastic_spark.corpus import load_embeddings as _lemb
        from telegram2elastic_spark.operators import similarity as simp

        timed_pl(
            "bitext_margin_sec",
            lambda: simp.bitext_margin_topk(
                _lemb(spark, SF_DIR), 0, 1, knn=4, k=10
            ),
        )
        # round-4 session-20: EQL funnels + itemset/categorization aggs
        from telegram2elastic_spark.query import eql as eqlp
        from telegram2elastic_spark.query import facets as facp

        _ev20 = _lev(spark, SF_DIR)
        timed_pl(
            "eql_sequence_sec",
            lambda: eqlp.eql_sequence(
                _ev20, ["signup", "purchase"], 21600, until="error", k=50
            ),
        )
        timed_pl(
            "frequent_item_sets_sec",
            lambda: facp.frequent_item_sets(
                corpus, 20, max_set_size=3, k=25, closed=True
            ),
        )
        timed_pl(
            "categorize_text_sec",
            lambda: facp.categorize_text(corpus, 5, k=20),
        )
        timed_pl(
            "graph_triangles_sec",
            lambda: grp.triangle_counts(corpus, window=2, k=20),
        )
        timed_pl(
            "lm_perplexity_sec",
            lambda: trp.lm_perplexity(corpus, "en", k=20),
        )
        from telegram2elastic_spark.operators import sketches as skp
        from telegram2elastic_spark.query import esql as esqlp

        timed_pl(
            "hll_cardinality_sec", lambda: skp.hll_cardinality(corpus)
        )
        _knn_prog = (
            "FROM embeddings "
            '| WHERE KNN(embedding, TEXT_EMBEDDING("spark merge batch"), 10) '
            "| KEEP vec_id, _score | SORT _score DESC, vec_id ASC"
        )
        timed_pl(
            "esql_knn_sec",
            lambda: esqlp.execute_esql(spark, SF_DIR, _knn_prog),
        )
        # round-4 session-23: membership sketch, outlier/MMR, lifecycle,
        # corpus statistics, interval join
        from telegram2elastic_spark.functions import text_quality as tqp
        from telegram2elastic_spark.index import maintenance as mntp
        from telegram2elastic_spark.operators import similarity as simp
        from telegram2elastic_spark.query import scriptscore as ssp
        from telegram2elastic_spark.streaming import windows as winp

        _emb23 = _lemb(spark, SF_DIR)
        timed_pl(
            "bloom_probe_sec",
            lambda: skp.bloom_probe(
                corpus,
                ["batch batch batch", "spark group query", "zz yy xx"],
                m=1 << 22,
                k=5,
            ),
        )
        # exact-global outlier is quadratic by contract (ANN generates
        # neighbourhoods at scale) — bench the scorer on one label slice
        from pyspark.sql import functions as _F23

        timed_pl(
            "outlier_knn_sec",
            lambda: simp.outlier_knn_scores(
                _emb23.filter(_F23.col("label") == 0), knn=5, k=10
            ),
        )
        timed_pl(
            "mmr_rerank_sec",
            lambda: simp.mmr_rerank(_emb23, query_vec_id=0, pool=20, k=5),
        )
        timed_pl(
            "script_fields_sec",
            lambda: ssp.script_fields_page(
                corpus,
                {"len_log": "Math.log(doc['doc_len'].value + 1)"},
                "Math.log(doc['doc_len'].value + 1)",
                k=20,
            ),
        )
        timed_pl(
            "ilm_rollover_sec",
            lambda: mntp.ilm_rollover(corpus, max_docs=2000, max_age_min=40),
        )
        timed_pl("vocab_growth_sec", lambda: tqp.vocab_growth(corpus))
        timed_pl(
            "interval_join_sec",
            lambda: winp.purchases_after_signup(
                _lev(spark, SF_DIR), within_min=60, k=None
            ),
        )
        timed_pl(
            "mixture_schedule_sec",
            lambda: trp.mixture_schedule(corpus, epochs=4),
        )
        timed_pl(
            "knn_mip_sec", lambda: simp.knn_mip_topk(_emb23, 0, k=10)
        )
        timed_pl(
            "quality_ensemble_sec", lambda: trp.quality_ensemble(corpus)
        )
        timed_pl(
            "slm_retention_sec",
            lambda: mntp.slm_retention(
                corpus, expire_after_min=120, min_count=5, max_count=100
            ),
        )
        timed_pl("lsh_dup_flags_sec", lambda: ddp.lsh_dup_flags(corpus))
        extra["pipeline_ops"] = pl

        spark.stop()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    out = {
        "metric": "index_build+query_suite_wall_sec",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": _sf_from_dir(SF_DIR),
    }
    # Artifact contract: the driver records a bounded tail of stdout, so
    # the LAST line must be a compact summary that always fits (r3's full
    # dump overflowed the window and `parsed` came back null).  Per-trial
    # arrays, stage breakdowns and the per-op blocks go to a side file
    # committed with the round notes.
    detail = dict(out)
    detail.update(extra)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    compact_keys = (
        "expand", "cpus", "n_trials", "n_docs", "docs_per_sec",
        "wand_p95_ms", "wand_p50_ms", "wand_warm_p95_ms",
    )
    out.update({k: extra[k] for k in compact_keys if k in extra})
    out["detail_file"] = "BENCH_DETAIL.json"
    print(json.dumps(out))


def scaling() -> None:
    """North-rule scaling evidence: the same build job at N and 4N local
    cores (default 2 and 8 via SPARK_GRAFT_SCALE_PAIR; this container's 32
    hardware threads are SMT/shared — a process-pool calibration shows
    ALU-bound speedup capping at ~22x for 32 threads and memory-bound work
    saturating earlier, so the honest N->4N window with headroom is the
    lower pair).  Fresh subprocess per level, identical input."""
    trials = int(os.environ.get("SPARK_GRAFT_SCALE_TRIALS", "2"))
    results: dict[int, dict] = {}
    # interleave trials across levels so slow-host drift hits both levels
    # equally; keep the best trial per level (noise only ever subtracts
    # throughput, so max measures machine-capability scaling)
    for _trial in range(trials):
        for cpus in SCALE_PAIR:
            workdir = tempfile.mkdtemp(prefix=f"scale_{cpus}_")
            try:
                code = (
                    "import json, sys; sys.path.insert(0, '.');"
                    "from bench import run_build_once;"
                    f"print('RESULT ' + json.dumps(run_build_once({cpus}, '{workdir}', {SCALE_EXPAND})))"
                )
                # taskset pins the whole process tree (JVM GC/JIT/IO
                # threads + python workers) to exactly `cpus` CPUs —
                # local[N] alone only caps Spark task slots, letting the
                # low-core run borrow extra cores and understate scaling
                cmd = [sys.executable, "-c", code]
                if shutil.which("taskset"):
                    cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
                p = subprocess.run(
                    cmd,
                    capture_output=True, text=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
                if not line:
                    print(p.stdout[-2000:], p.stderr[-2000:], file=sys.stderr)
                    raise RuntimeError(f"scaling run at {cpus} cores failed")
                r = json.loads(line[0][len("RESULT "):])
                if cpus not in results or r["docs_per_sec"] > results[cpus]["docs_per_sec"]:
                    results[cpus] = r
            finally:
                shutil.rmtree(workdir, ignore_errors=True)
    lo, hi = SCALE_PAIR
    tl, th = results[lo]["docs_per_sec"], results[hi]["docs_per_sec"]
    print(json.dumps({
        "n_docs": results[lo]["n_docs"],
        f"local{lo}_docs_per_sec": round(tl, 1),
        f"local{hi}_docs_per_sec": round(th, 1),
        f"local{lo}_build_sec": round(results[lo]["build_sec"], 2),
        f"local{hi}_build_sec": round(results[hi]["build_sec"], 2),
        "scaling_efficiency": round((th / tl) / (hi / lo), 3),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
