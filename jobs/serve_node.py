"""Query-node serving loop: every ES-surface op answered from the driver
acting as a warm query node.

    spark-submit --master local[8] --py-files /tmp/t2es.zip \\
        jobs/serve_node.py --index /path/to/index \\
        [--corpus /path/to/corpus_parquet] [--trigram /path/to/gin] \\
        [--warm "spark merge the data"]

Reads one JSON request per stdin line, answers one JSON line per request:

    {"op": "terms",    "q": "spark merge", "k": 10}
    {"op": "terms",    "q": "the data", "exclude": "vector", "msm": 2}
    {"op": "msearch",  "bodies": [{"query": {...}, "size": 10}, ...]}
    {"op": "sparsevec", "weights": {"spark": 2.1, "merge": 1.4}, "k": 10}
    {"op": "body", "body": {"query": {"match": {"text": "spark merge"}}}}
    {"op": "template", "source": "...{{q}}...", "params": {"q": "spark"}}
    {"op": "phrase",   "q": "merge batch", "slop": 1}
    {"op": "compound", "q": "spark", "phrase": "merge batch"}
    {"op": "multi",    "q": "spark page", "boosts": {"text": 1.0, "url": 2.0}}
    {"op": "prefix",   "q": "sc"}
    {"op": "boolprefix","q": "merge sc"}           (search-as-you-type)
    {"op": "intervals","q": "merge batch", "max_gaps": 3}
    {"op": "wildcard", "q": "s?a*"}
    {"op": "fuzzyterm","q": "mergge", "fuzziness": 2}
    {"op": "regexp",   "q": "sc[ab].*"}
    {"op": "dismax",   "q": "spark page", "boosts": {"text": 1.0, "url": 2.0}}
    {"op": "suggest",  "q": "s"}
    {"op": "spell",    "q": "mergge"}
    {"op": "fuzzy",    "q": "mergge batch"}        (needs --trigram)
    {"op": "mlt",      "doc_id": 7}                (needs --corpus)
    {"op": "rescore",  "q": "spark merge"}
    {"op": "highlight","q": "spark merge"}         (needs --corpus)
    {"op": "pinned",   "q": "spark merge", "pins": [42, 7]}
    {"op": "rankfeature", "q": "spark merge", "pivot": 40, "boost": 2}
    {"op": "scriptscore", "q": "spark merge", "script": "saturation(_score, 2)"}
    {"op": "didyoumean", "q": "tne fast"}          (needs --bigrams)
    {"op": "sqs",      "q": "spark -vector field:x"} (lenient syntax)
    {"op": "sql", "q": "SELECT doc_id, url, SCORE() AS score FROM
        documents WHERE MATCH(text, 'spark') ..."}  (ES _sql endpoint)
    {"op": "hybrid",   "q": "spark merge", "vec_id": 0} (needs --embeddings)
    {"op": "knnq",     "vec_id": 7, "kind": "int8"}     (needs --embeddings)
    {"op": "tsr",      "q": "spark merge", "vec_id": 0} (needs --embeddings)
    {"op": "maxsim",   "group": 0, "group_size": 5}     (needs --embeddings)
    {"op": "weightedtokens", "weights": {"spark": 2.0}, "ratio": 5.0}
    {"op": "semantic", "q": "spark merge batch"}   (needs --semantic-store)
    {"op": "semanticchunked", "q": "spark merge"}  (needs --semantic-chunk-store)
    {"op": "mget",     "ids": [3, 7, 99999]}       (doc-store point reads)
    {"op": "scriptfields", "ids": [3, 7], "scripts": {"len_log":
        "Math.log(doc['doc_len'].value + 1)"}}     (per-hit computed fields)
    {"op": "stats"} / {"op": "stats", "disk": true}  (_stats / _disk_usage)
    {"op": "rules",    "q": "spark merge", "ruleset": [...], "match": {...}}

Response: {"op": ..., "hits": [...], "latency_ms": ...}.  After the
per-cache warm-up fetches (vocabulary, hot term shards, trigram pages),
the loop runs without Spark jobs: when the index was built with a
doc_store (build_index_job --doc-store), mlt source text, highlight
snippets and rescore timestamps are driver-local pyarrow point reads
(query/docstore.py); without one they fall back to k-row Spark fetches
from --corpus.  This is the shape a production query node serves at
millisecond latency while the executor fan-out paths (wand_topk /
phrase_topk / *_batch) remain the cold-tier and analytics story.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--corpus", default=None,
                    help="corpus parquet dir (highlight / mlt doc store)")
    ap.add_argument("--trigram", default=None,
                    help="trigram GIN dir (fuzzy probes)")
    ap.add_argument("--warm", default=None,
                    help="space-separated terms to pre-fetch into the "
                         "hot-shard cache")
    ap.add_argument("--requests", default="-",
                    help="request source: '-' = stdin (plain `python` "
                         "runs), or a file of JSON lines (spark-submit "
                         "does not forward stdin to the Python driver)")
    ap.add_argument("--bigrams", default=None,
                    help="bigram store dir (phrase-suggester didyoumean)")
    ap.add_argument("--embeddings", default=None,
                    help="embedding parquet dir (hybrid RRF knn leg)")
    ap.add_argument("--semantic-store", default=None,
                    help="write_semantic_store dir (semantic query op)")
    ap.add_argument("--semantic-chunk-store", default=None,
                    help="write_semantic_chunk_store dir (semanticchunked "
                         "op — chunked semantic_text, best chunk per doc)")
    ap.add_argument("--field-index", action="append", default=[],
                    metavar="NAME=DIR",
                    help="per-field index dir for multi_match "
                         "(repeatable, e.g. --field-index url=/idx_url)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("t2es-serve")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .getOrCreate()
    )
    from telegram2elastic_spark.index.build import read_index
    from telegram2elastic_spark.query import local as lq
    from telegram2elastic_spark.query.compound import compound_topk_local
    from telegram2elastic_spark.query.fuzzy import fuzzy_topk_local
    from telegram2elastic_spark.query.phrase import phrase_topk_local
    from telegram2elastic_spark.query.wand import wand_topk_local

    idx = read_index(spark, args.index)
    corpus = spark.read.parquet(args.corpus) if args.corpus else None
    # multi_match fields: the main index serves as field "text"; extra
    # per-field indexes (same corpus, same salt layout) come from disk
    field_indexes = {"text": idx}
    for spec in args.field_index:
        name, _, d = spec.partition("=")
        field_indexes[name] = read_index(spark, d)
    fuzzy_cache: dict = {}
    semantic_cache: dict = {}
    semantic_chunk_cache: dict = {}
    lq._vocab(idx)  # the FST load — one job, then expansion is in-process
    if args.warm:
        wand_topk_local(idx, args.warm.split(), k=1)

    def answer(req: dict):
        op = req["op"]
        k = int(req.get("k", 10))
        if op == "terms":
            ex = req.get("exclude")
            after = req.get("after")  # [score, doc_id] cursor from the
            return wand_topk_local(  # previous page's last hit
                idx, req["q"].split(), k=k,
                doc_filter=req.get("doc_filter"),
                min_should_match=int(req.get("msm", 0)),
                exclude_terms=ex.split() if ex else None,
                after=tuple(after) if after else None,
            )
        if op == "body":
            # {"op": "body", "body": {"query": {...}, "size": 10}}
            from telegram2elastic_spark.query.dsl import execute_dsl_local

            return execute_dsl_local(idx, req["body"])
        if op == "msearch":
            # {"op": "msearch", "bodies": [{...}, {...}]} — per-body local
            # dispatch, [(query_id, doc_id, score)]
            from telegram2elastic_spark.query.dsl import msearch_local

            return msearch_local(idx, req["bodies"])
        if op == "template":
            # {"op": "template", "source": "<mustache json>", "params": {...}}
            from telegram2elastic_spark.query.dsl import (
                search_template_topk_local,
            )

            return search_template_topk_local(
                idx, req["source"], req.get("params", {})
            )
        if op == "sparsevec":
            # {"op": "sparsevec", "weights": {"spark": 2.1, "merge": 1.4}}
            from telegram2elastic_spark.query.sparse import (
                sparse_vector_topk_local,
            )

            return sparse_vector_topk_local(
                idx, {t: float(v) for t, v in req["weights"].items()}, k=k
            )
        if op == "phrase":
            return phrase_topk_local(
                idx, req["q"].split(), k=k, slop=int(req.get("slop", 0)),
                doc_filter=req.get("doc_filter"),
            )
        if op == "compound":
            return compound_topk_local(
                idx, req["q"].split(), req.get("phrase", "").split(), k=k
            )
        if op == "multi":
            boosts = {
                f: float(b) for f, b in (req.get("boosts") or {}).items()
            }
            return lq.multi_match_topk_local(
                field_indexes, boosts, req["q"].split(), k=k
            )
        if op == "prefix":
            return lq.prefix_topk_local(idx, req["q"], k=k)
        if op == "boolprefix":
            return lq.match_bool_prefix_topk_local(idx, req["q"].split(), k=k)
        if op == "intervals":
            from telegram2elastic_spark.query.intervals import (
                intervals_ordered_topk_local,
            )

            return intervals_ordered_topk_local(
                idx, req["q"].split(), max_gaps=int(req.get("max_gaps", 0)), k=k
            )
        if op == "wildcard":
            return lq.wildcard_topk_local(idx, req["q"], k=k)
        if op == "qs":
            from telegram2elastic_spark.query.querystring import (
                query_string_topk_local,
            )

            return query_string_topk_local(
                idx, req["q"], k=k, doc_filter=req.get("doc_filter")
            )
        if op == "sqs":
            from telegram2elastic_spark.query.querystring import (
                simple_query_string_topk_local,
            )

            return simple_query_string_topk_local(
                idx, req["q"], k=k, doc_filter=req.get("doc_filter")
            )
        if op == "fuzzyterm":
            return lq.fuzzy_term_topk_local(
                idx, req["q"], k=k,
                fuzziness=int(req.get("fuzziness", 2)),
                prefix_length=int(req.get("prefix_length", 1)),
            )
        if op == "regexp":
            return lq.regexp_topk_local(idx, req["q"], k=k)
        if op == "dismax":
            boosts = {
                f: float(b) for f, b in (req.get("boosts") or {}).items()
            }
            return lq.dis_max_topk_local(
                field_indexes, boosts, req["q"].split(), k=k
            )
        if op == "pinned":
            return lq.pinned_topk_local(
                idx, req["q"].split(), [int(p) for p in req["pins"]],
                k=k, corpus=corpus,
            )
        if op == "scriptscore":
            # {"op": "scriptscore", "q": "...", "script": "<painless subset>",
            #  "min_score": 0.5} — script over (_score, doc-values), full
            # accumulation on the resident posting cache
            from telegram2elastic_spark.query.scriptscore import (
                script_score_topk_local,
            )

            ms = req.get("min_score")
            return script_score_topk_local(
                idx, req["q"].split(), req["script"], k=k,
                min_score=float(ms) if ms is not None else None,
            )
        if op == "mget":
            # {"op": "mget", "ids": [3, 7, 99999]} — GET/_mget: doc-store
            # row-group point reads, found:false envelope, no Spark job
            from telegram2elastic_spark.query.docstore import (
                mget_local, resolve_doc_store,
            )

            store = resolve_doc_store(idx, None)
            if store is None:
                raise ValueError("mget needs an index with doc_store")
            return mget_local(
                store, [int(i) for i in req["ids"]],
                cache=idx.setdefault("_doc_cache", {}),
                ds_cache=idx.setdefault("_ds_cache", {}),
            )
        if op == "scriptfields":
            # {"op": "scriptfields", "ids": [3, 7],
            #  "scripts": {"len_log": "Math.log(doc['doc_len'].value+1)"}}
            from telegram2elastic_spark.query.scriptscore import (
                script_fields_local,
            )

            return script_fields_local(
                idx, [int(i) for i in req["ids"]], dict(req["scripts"]),
                cache=idx.setdefault("_doc_cache", {}),
                ds_cache=idx.setdefault("_ds_cache", {}),
            )
        if op == "rankfeature":
            return lq.rank_feature_topk_local(
                idx, req["q"].split(),
                pivot=float(req.get("pivot", 40.0)),
                boost=float(req.get("boost", 2.0)),
                func=req.get("func", "saturation"),
                exponent=float(req.get("exponent", 2.0)),
                k=k,
            )
        if op == "hybrid":
            if not args.embeddings:
                raise ValueError("hybrid needs --embeddings")
            from telegram2elastic_spark.query.hybrid import rrf_hybrid_local

            return rrf_hybrid_local(
                idx, args.embeddings, req["q"].split(),
                query_vec_id=int(req.get("vec_id", 0)), k=k,
                window=int(req.get("window", 20)),
            )
        if op == "knnq":
            # {"op": "knnq", "vec_id": 7, "kind": "int8"|"bit"} — quantized
            # kNN from the resident code table (1-16 B/vector), float
            # matrix touched only for the k*oversample rescore window
            if not args.embeddings:
                raise ValueError("knnq needs --embeddings")
            from telegram2elastic_spark.query.hybrid import (
                knn_bit_local,
                knn_int8_local,
            )

            kind = req.get("kind", "int8")
            fn = knn_int8_local if kind == "int8" else knn_bit_local
            return fn(
                idx, args.embeddings, int(req.get("vec_id", 0)), k=k,
                oversample=int(req.get("oversample", 3 if kind == "int8" else 5)),
            )
        if op == "tsr":
            # {"op": "tsr", "q": "spark merge", "vec_id": 0} — BM25
            # top-window re-scored by the semantic model (exact cosine)
            if not args.embeddings:
                raise ValueError("tsr needs --embeddings")
            from telegram2elastic_spark.query.hybrid import (
                text_similarity_reranker_local,
            )

            return text_similarity_reranker_local(
                idx, args.embeddings, req["q"].split(),
                query_vec_id=int(req.get("vec_id", 0)), k=k,
                rank_window_size=int(req.get("window", 30)),
                min_score=(
                    float(req["min_score"]) if "min_score" in req else None
                ),
            )
        if op == "maxsim":
            # {"op": "maxsim", "group": 0} — rank_vectors late-interaction
            if not args.embeddings:
                raise ValueError("maxsim needs --embeddings")
            from telegram2elastic_spark.query.hybrid import (
                rank_vectors_maxsim_local,
            )

            return rank_vectors_maxsim_local(
                idx, args.embeddings,
                query_group=int(req.get("group", 0)),
                group_size=int(req.get("group_size", 5)), k=k,
            )
        if op == "stats":
            # {"op": "stats"} / {"op": "stats", "disk": true} — the
            # _stats/_disk_usage card (filesystem + parquet footers,
            # zero Spark jobs)
            from telegram2elastic_spark.index.diskusage import (
                disk_usage,
                index_stats,
            )

            if req.get("disk"):
                return disk_usage(args.index)
            return index_stats(args.index)
        if op == "semantic":
            # {"op": "semantic", "q": "spark merge batch"} — ES semantic
            # query off the sparse semantic store (bucket-pruned reads)
            if not args.semantic_store:
                raise ValueError("semantic needs --semantic-store")
            from telegram2elastic_spark.query.semantic import (
                semantic_topk_local,
            )

            return semantic_topk_local(
                args.semantic_store, req["q"], k=k, cache=semantic_cache
            )
        if op == "semanticchunked":
            # {"op": "semanticchunked", "q": "spark merge batch"} —
            # chunked semantic_text: best chunk per doc off the chunk
            # store (bucket-pruned reads, per-chunk numpy dots)
            if not args.semantic_chunk_store:
                raise ValueError(
                    "semanticchunked needs --semantic-chunk-store"
                )
            from telegram2elastic_spark.query.semantic import (
                semantic_chunked_topk_local,
            )

            return semantic_chunked_topk_local(
                args.semantic_chunk_store, req["q"], k=k,
                cache=semantic_chunk_cache,
            )
        if op == "rules":
            # {"op": "rules", "q": "spark merge", "ruleset": [...],
            #  "match": {"user_query": "spark merge"}}
            from telegram2elastic_spark.query.rules import (
                rule_query_topk_local,
            )

            return rule_query_topk_local(
                idx, req["ruleset"], req.get("match", {}),
                req["q"].split(), k=k, corpus=corpus,
            )
        if op == "weightedtokens":
            # {"op": "weightedtokens", "weights": {tok: w}, "ratio": 5.0,
            #  "weight_threshold": 0.4, "rescore_leg": false}
            from telegram2elastic_spark.query.sparse import (
                weighted_tokens_topk_local,
            )

            return weighted_tokens_topk_local(
                idx, {t: float(v) for t, v in req["weights"].items()},
                ratio_threshold=float(req.get("ratio", 5.0)),
                weight_threshold=float(req.get("weight_threshold", 0.4)),
                only_score_pruned_tokens=bool(req.get("rescore_leg", False)),
                k=k,
            )
        if op == "didyoumean":
            if not args.bigrams:
                raise ValueError("didyoumean needs --bigrams")
            return lq.phrase_suggest_local(
                idx, args.bigrams, req["q"].split(), k=k
            )
        if op == "suggest":
            return lq.suggest_complete_local(idx, req["q"], k=k)
        if op == "spell":
            return lq.suggest_spelling_local(
                idx, req["q"], k=k, min_sim=float(req.get("min_sim", 0.1))
            )
        if op == "fuzzy":
            if not args.trigram:
                raise ValueError("fuzzy needs --trigram")
            return fuzzy_topk_local(
                args.trigram, req["q"], k=k, cache=fuzzy_cache
            )
        if op == "mlt":
            if corpus is None and "_doc_store_dir" not in idx:
                raise ValueError(
                    "mlt needs --corpus or an index with doc_store"
                )
            return lq.more_like_this_local(
                idx, corpus, int(req["doc_id"]), k=k
            )
        if op == "rescore":
            return lq.rescore_recency_local(idx, req["q"].split(), k=k)
        if op == "ltr":
            # {"op": "ltr", "q": "spark merge"} — LTR rescore of the
            # BM25 top-window (linear feature model)
            return lq.ltr_rescore_local(idx, req["q"].split(), k=k)
        if op == "validate":
            # {"op": "validate", "body": {...}} — parse-only, no search
            from telegram2elastic_spark.query.dsl import validate_query

            r = validate_query(req["body"])
            return [(r["valid"], r["explanation"])]
        if op == "retriever":
            # {"op": "retriever", "body": {"retriever": {...}, "size": N}}
            # — full 8.14 retriever-tree serving (knn/reranker legs need
            # --embeddings)
            from telegram2elastic_spark.query.retriever import (
                retriever_search_local,
            )

            return retriever_search_local(
                idx, req["body"], emb_path=args.embeddings
            )
        if op == "sql":
            # {"op": "sql", "q": "SELECT doc_id, url, SCORE() AS score
            #  FROM documents WHERE MATCH(text, '...') ..."} — the ES
            # `_sql` endpoint; MATCH statements serve from the hot-shard
            # cache, anything else is analytics (run via Spark) and 400s
            from telegram2elastic_spark.query.essql import (
                es_sql_query_local,
            )

            rows = es_sql_query_local(idx, req["q"], default_limit=k)
            return [tuple(r.values()) for r in rows]
        if op == "kql":
            # {"op": "kql", "q": "lang:en and spark"} — parse-only
            # validation (the Kibana syntax banner); Discover execution
            # is a corpus scan, not a node-local serve
            from telegram2elastic_spark.query.kql import validate_kql

            r = validate_kql(req["q"])
            return [(r["valid"], r.get("spark", r.get("error", "")))]
        if op == "esql":
            # {"op": "esql", "q": "FROM corpus | ..."} — parse/typecheck
            # only (the _query?validate analogue); execution is a Spark
            # job, not a node-local serve
            from telegram2elastic_spark.query.esql import validate_esql

            r = validate_esql(req["q"])
            return [(
                r["valid"],
                ",".join(r.get("stages", [])) or r.get("error", ""),
            )]
        if op == "highlight":
            if corpus is None and "_doc_store_dir" not in idx:
                raise ValueError(
                    "highlight needs --corpus or an index with doc_store"
                )
            return lq.search_highlight_local(idx, corpus, req["q"].split(), k=k)
        if op == "fvh":
            # {"op": "fvh", "q": "...", "frag_size"?, "num_frags"?} —
            # fragment-scored highlighting (ES highlight type=fvh)
            if corpus is None and "_doc_store_dir" not in idx:
                raise ValueError(
                    "fvh needs --corpus or an index with doc_store"
                )
            return lq.highlight_fvh_local(
                idx, req["q"].split(), k=k,
                frag_size=int(req.get("frag_size", 20)),
                num_frags=int(req.get("num_frags", 2)),
                corpus=corpus,
            )
        if op == "synonyms":
            # {"op": "synonyms", "groups": [["a","b"], ["c"]]} —
            # SynonymQuery-blended match
            return lq.synonym_match_topk_local(idx, req["groups"], k=k)
        raise ValueError(f"unknown op {op!r}")

    source = sys.stdin if args.requests == "-" else open(args.requests)
    for line in source:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        t0 = time.perf_counter()
        try:
            hits = answer(req)
            out = {
                "op": req["op"],
                "latency_ms": round((time.perf_counter() - t0) * 1000, 2),
            }
            if isinstance(hits, dict):
                out["result"] = hits  # metadata ops (stats/_disk_usage)
            else:
                out["hits"] = [list(h) for h in hits]
        except Exception as e:  # report, keep serving
            out = {"op": req.get("op"), "error": str(e)}
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
