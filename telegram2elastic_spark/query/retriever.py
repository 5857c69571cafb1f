"""ES retriever trees (search API `retriever`, ES 8.14+).

The reference serves Kibana over Elasticsearch (README.md:5); since 8.14
that search surface composes ranking stages as a recursive *retriever*
tree instead of flat query+rescore:

    {"retriever": {"rrf": {"retrievers": [
        {"standard": {"query": {...}}},
        {"knn": {...}},
        {"text_similarity_reranker": {"retriever": {...}, ...}}
    ], "rank_window_size": 50, "rank_constant": 60}}, "size": 10}

This module is the coordinator: it walks the tree once and dispatches
every node onto the engine paths that are already verified one by one
(execute_dsl -> WAND/phrase/compound, cosine knn, the semantic reranker),
then fuses.  Nothing here re-implements scoring — composition only.

Node vocabulary:
  leaf     standard {query}            the full query-DSL subset
           knn {query_vec_id, k}       exact cosine over the vector store
  combiner rrf {retrievers, rank_window_size, rank_constant}
           linear {retrievers: [{retriever, weight}], rank_window_size}
             (minmax normalizer — ES default for linear; constant leg -> 1.0)
           text_similarity_reranker {retriever, rank_window_size,
             query_vec_id, min_score?}
           pinned {ids, retriever}     ES 8.18 pinned retriever
           rescorer {retriever, rescore: {window_size, query:
             {rescore_query, query_weight, rescore_query_weight}}}
             ES 8.18 rescorer retriever: the child's top window_size is
             re-scored qw*original + rqw*secondary (BM25 of the rescore
             terms over the window docs, global stats — the ES rescore
             total score_mode); the window ids are a BOUNDED driver
             materialization, exactly what the ES coordinator holds
           rule {ruleset, match_criteria, retriever}   ES 8.15 rule
             retriever: the ruleset is evaluated against the request
             metadata on the driver (coordinator logic shared verbatim by
             all three walkers — rules.applied_rules), pins lead in rule
             order, excluded ids are removed (exclusion wins over a pin);
             the child is over-fetched by |excludes| so the page fills

Scale shape: every leaf is the verified top-window retrieval; everything
above a leaf operates on <= rank_window_size rows per leg (rank windows
are single-partition by construction — bounded, deliberate).  Fusion
pivots legs into columns and adds them in FIXED leg order, so the float
trajectory is deterministic — never a groupBy-sum whose addition order
the scheduler picks.

Oracle: `retriever_sql` walks the same tree emitting one nested DuckDB
query per node — independently derived, same (doc_id, score) contract.

Reference parity: the composed legs cite their own reference anchors
(query/dsl.py, operators/similarity.py, query/hybrid.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dsl import dsl_sql, execute_dsl

FUSE_DECIMALS = 6
PIN_BASE = 1_000_000.0  # pinned scores sit above any organic score


# --------------------------------------------------------------- helpers


def _rank(leg: DataFrame) -> DataFrame:
    # leg is already truncated to the rank window — bounded single
    # partition (the query/search.py convention).
    w = Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), F.asc("doc_id"))
    return leg.select("doc_id", "score", F.row_number().over(w).alias("rnk"))


def _knn_leaf(ctx: dict, spec: dict, k: int) -> DataFrame:
    from ..operators.similarity import cosine_topk

    return cosine_topk(
        ctx["embeddings"], query_vec_id=int(spec.get("query_vec_id", 0)),
        k=int(spec.get("k", k)),
    ).select(F.col("vec_id").alias("doc_id"), F.col("cosine").alias("score"))


def _tsr(ctx: dict, spec: dict, k: int) -> DataFrame:
    from ..operators.similarity import _dot

    window = int(spec.get("rank_window_size", 30))
    child = execute_retriever(ctx, spec["retriever"], k=window)
    e = ctx["embeddings"].select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    q = F.broadcast(
        ctx["embeddings"]
        .filter(F.col("vec_id") == int(spec.get("query_vec_id", 0)))
        .select(F.col("embedding").cast("array<double>").alias("qv"))
    )
    scored = (
        F.broadcast(child.select("doc_id"))
        .join(e, "doc_id")
        .crossJoin(q)
        .select(
            "doc_id",
            F.round(
                _dot(F.col("v"), F.col("qv"))
                / (
                    F.sqrt(_dot(F.col("v"), F.col("v")))
                    * F.sqrt(_dot(F.col("qv"), F.col("qv")))
                ),
                5,
            ).alias("score"),
        )
    )
    if spec.get("min_score") is not None:
        scored = scored.filter(F.col("score") >= float(spec["min_score"]))
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def _fuse_fixed_order(legs: list[DataFrame], contrib_cols: list[str]) -> DataFrame:
    """Full-outer fold of per-leg contribution frames (doc_id, <col>),
    then a fixed-order coalesced sum — deterministic float trajectory."""
    fused = legs[0]
    for leg in legs[1:]:
        fused = fused.join(leg, "doc_id", "full_outer")
    total = F.coalesce(F.col(contrib_cols[0]), F.lit(0.0))
    for c in contrib_cols[1:]:
        total = total + F.coalesce(F.col(c), F.lit(0.0))
    return fused.select(
        "doc_id", F.round(total, FUSE_DECIMALS).alias("score")
    )


def _rrf(ctx: dict, spec: dict, k: int) -> DataFrame:
    window = int(spec.get("rank_window_size", 10))
    c = float(spec.get("rank_constant", 60))
    legs = []
    cols = []
    for i, child in enumerate(spec["retrievers"]):
        col = f"contrib_{i}"
        legs.append(
            _rank(execute_retriever(ctx, child, k=window)).select(
                "doc_id", (1.0 / (F.lit(c) + F.col("rnk"))).alias(col)
            )
        )
        cols.append(col)
    return (
        _fuse_fixed_order(legs, cols)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _linear(ctx: dict, spec: dict, k: int) -> DataFrame:
    window = int(spec.get("rank_window_size", 10))
    legs = []
    cols = []
    for i, item in enumerate(spec["retrievers"]):
        wgt = float(item.get("weight", 1.0))
        child = execute_retriever(ctx, item["retriever"], k=window)
        # minmax over the leg's own window; constant leg -> 1.0 (ES)
        wspec = Window.partitionBy(F.lit(0))
        col = f"contrib_{i}"
        legs.append(
            child.select(
                "doc_id",
                "score",
                F.max("score").over(wspec).alias("mx"),
                F.min("score").over(wspec).alias("mn"),
            ).select(
                "doc_id",
                (
                    F.lit(wgt)
                    * F.when(F.col("mx") == F.col("mn"), F.lit(1.0)).otherwise(
                        (F.col("score") - F.col("mn"))
                        / (F.col("mx") - F.col("mn"))
                    )
                ).alias(col),
            )
        )
        cols.append(col)
    return (
        _fuse_fixed_order(legs, cols)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _pinned(ctx: dict, spec: dict, k: int) -> DataFrame:
    ids = [int(v) for v in spec["ids"]]
    child = execute_retriever(ctx, spec["retriever"], k=k)
    spark = child.sparkSession
    pins = spark.createDataFrame(
        [(doc, PIN_BASE - pos) for pos, doc in enumerate(ids)],
        "doc_id bigint, score double",
    )
    organic = child.filter(~F.col("doc_id").isin(ids))
    return (
        pins.unionByName(organic.select("doc_id", "score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _rescore_parts(spec: dict) -> tuple[int, float, float, list[str]]:
    from .dsl import parse_dsl

    rs = spec["rescore"]
    q = rs["query"]
    p, _ = parse_dsl({"query": q["rescore_query"]})
    if (
        p.phrase or p.prefix is not None or p.sparse is not None
        or p.ids is not None or p.fuzziness is not None
        or p.must_not or p.doc_filter or p.msm
    ):
        raise ValueError("rescorer supports plain terms rescore queries")
    return (
        int(rs.get("window_size", 10)),
        float(q.get("query_weight", 1.0)),
        float(q.get("rescore_query_weight", 1.0)),
        p.terms,
    )


def _rescorer(ctx: dict, spec: dict, k: int) -> DataFrame:
    from .wand import wand_topk

    window, qw, rqw, terms = _rescore_parts(spec)
    child = execute_retriever(ctx, spec["retriever"], k=window)
    # the rescore window is a bounded driver materialization (<= window
    # ids) — the same rows the ES coordinator holds during rescore
    ids = [int(r["doc_id"]) for r in child.select("doc_id").collect()]
    if not ids:
        return child.limit(k)
    sec = wand_topk(
        ctx["index"], terms, k=window,
        doc_filter=f"doc_id IN ({', '.join(str(d) for d in ids)})",
    ).select("doc_id", F.col("score").alias("rs"))
    return (
        child.join(sec, "doc_id", "left")
        .select(
            "doc_id",
            F.round(
                F.lit(qw) * F.col("score")
                + F.lit(rqw) * F.coalesce(F.col("rs"), F.lit(0.0)),
                FUSE_DECIMALS,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def _rule(ctx: dict, spec: dict, k: int) -> DataFrame:
    from .rules import applied_rules

    pins, excl = applied_rules(
        spec["ruleset"], spec.get("match_criteria", {})
    )
    pins = [d for d in pins if d not in set(excl)]  # exclusion wins
    child = execute_retriever(ctx, spec["retriever"], k=k + len(excl))
    drop = [int(d) for d in {*pins, *excl}]
    organic = (
        child.filter(~F.col("doc_id").isin(drop)) if drop else child
    ).select("doc_id", "score")
    if pins:
        pdf = child.sparkSession.createDataFrame(
            [(doc, PIN_BASE - pos) for pos, doc in enumerate(pins)],
            "doc_id bigint, score double",
        )
        organic = pdf.unionByName(organic)
    return organic.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


# ------------------------------------------------------------ public API


def execute_retriever(ctx: dict, node: dict, k: int = 10) -> DataFrame:
    """Evaluate one retriever node -> (doc_id, score) top-k.

    ctx: {"index": compressed index, "embeddings": vector store}.
    """
    if not isinstance(node, dict) or len(node) != 1:
        raise ValueError("retriever node must hold exactly one type")
    kind, spec = next(iter(node.items()))
    if kind == "standard":
        return (
            execute_dsl(ctx["index"], {"query": spec["query"], "size": k})
            .select("doc_id", "score")
        )
    if kind == "knn":
        return _knn_leaf(ctx, spec, k)
    if kind == "rrf":
        return _rrf(ctx, spec, k)
    if kind == "linear":
        return _linear(ctx, spec, k)
    if kind == "text_similarity_reranker":
        return _tsr(ctx, spec, k)
    if kind == "pinned":
        return _pinned(ctx, spec, k)
    if kind == "rule":
        return _rule(ctx, spec, k)
    if kind == "rescorer":
        return _rescorer(ctx, spec, k)
    raise ValueError(f"unknown retriever type {kind!r}")


def retriever_search(ctx: dict, body: dict) -> DataFrame:
    """POST /_search {"retriever": ..., "size": N} entry point."""
    extra = set(body) - {"retriever", "size"}
    if extra:
        raise ValueError(f"out-of-subset body keys: {sorted(extra)}")
    return execute_retriever(
        ctx, body["retriever"], k=int(body.get("size", 10))
    )


# --------------------------------------------------------------- oracle


def _sql(node: dict, k: int) -> str:
    kind, spec = next(iter(node.items()))
    if kind == "standard":
        inner = dsl_sql({"query": spec["query"], "size": k}).strip()
        return f"SELECT doc_id, score FROM ({inner}) s"
    if kind == "knn":
        from ..operators.similarity import cosine_topk_sql

        inner = cosine_topk_sql(
            query_vec_id=int(spec.get("query_vec_id", 0)),
            k=int(spec.get("k", k)),
        ).strip()
        return (
            f"SELECT vec_id AS doc_id, cosine AS score FROM ({inner}) s"
        )
    if kind == "rrf":
        window = int(spec.get("rank_window_size", 10))
        c = float(spec.get("rank_constant", 60))
        legs = []
        for i, child in enumerate(spec["retrievers"]):
            legs.append(
                f"l{i} AS (SELECT doc_id, row_number() OVER "
                f"(ORDER BY score DESC, doc_id ASC) AS rnk "
                f"FROM ({_sql(child, window)}) x)"
            )
        fused = f"l0.doc_id AS doc_id"
        joins = "l0"
        total = f"COALESCE(1.0 / ({c} + l0.rnk), 0.0)"
        for i in range(1, len(spec["retrievers"])):
            joins += (
                f" FULL OUTER JOIN l{i} ON "
                f"COALESCE({' ,'.join(f'l{j}.doc_id' for j in range(i))})"
                f" = l{i}.doc_id"
            )
            total += f" + COALESCE(1.0 / ({c} + l{i}.rnk), 0.0)"
        ids = ", ".join(
            f"l{i}.doc_id" for i in range(len(spec["retrievers"]))
        )
        return (
            f"WITH {', '.join(legs)} "
            f"SELECT COALESCE({ids}) AS doc_id, "
            f"round({total}, {FUSE_DECIMALS}) AS score "
            f"FROM {joins} "
            f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
        )
    if kind == "linear":
        window = int(spec.get("rank_window_size", 10))
        legs = []
        for i, item in enumerate(spec["retrievers"]):
            wgt = float(item.get("weight", 1.0))
            legs.append(
                f"l{i} AS (SELECT doc_id, {wgt!r} * CASE WHEN mx = mn "
                "THEN 1.0 ELSE (score - mn) / (mx - mn) END AS contrib "
                "FROM (SELECT doc_id, score, max(score) OVER () AS mx, "
                f"min(score) OVER () AS mn FROM "
                f"({_sql(item['retriever'], window)}) y) x)"
            )
        joins = "l0"
        total = "COALESCE(l0.contrib, 0.0)"
        for i in range(1, len(spec["retrievers"])):
            joins += (
                f" FULL OUTER JOIN l{i} ON "
                f"COALESCE({' ,'.join(f'l{j}.doc_id' for j in range(i))})"
                f" = l{i}.doc_id"
            )
            total += f" + COALESCE(l{i}.contrib, 0.0)"
        ids = ", ".join(
            f"l{i}.doc_id" for i in range(len(spec["retrievers"]))
        )
        return (
            f"WITH {', '.join(legs)} "
            f"SELECT COALESCE({ids}) AS doc_id, "
            f"round({total}, {FUSE_DECIMALS}) AS score "
            f"FROM {joins} "
            f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
        )
    if kind == "text_similarity_reranker":
        window = int(spec.get("rank_window_size", 30))
        qid = int(spec.get("query_vec_id", 0))
        pred = (
            f"AND round(list_dot_product(e.v, q.qv) / "
            "(sqrt(list_dot_product(e.v, e.v)) * "
            f"sqrt(list_dot_product(q.qv, q.qv))), 5) "
            f">= {float(spec['min_score'])!r}"
            if spec.get("min_score") is not None
            else ""
        )
        return (
            f"WITH win AS (SELECT doc_id FROM "
            f"({_sql(spec['retriever'], window)}) w), "
            "e AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) "
            "AS v FROM embeddings), "
            "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv "
            f"FROM embeddings WHERE vec_id = {qid}) "
            "SELECT e.doc_id, round(list_dot_product(e.v, q.qv) / "
            "(sqrt(list_dot_product(e.v, e.v)) * "
            "sqrt(list_dot_product(q.qv, q.qv))), 5) AS score "
            "FROM win JOIN e ON win.doc_id = e.doc_id CROSS JOIN q "
            f"WHERE 1 = 1 {pred} "
            f"ORDER BY score DESC, e.doc_id ASC LIMIT {k}"
        )
    if kind == "pinned":
        ids = [int(v) for v in spec["ids"]]
        vals = ", ".join(
            f"({doc}, {PIN_BASE - pos!r})" for pos, doc in enumerate(ids)
        )
        idlist = ", ".join(str(d) for d in ids)
        return (
            f"SELECT doc_id, score FROM ("
            f"SELECT CAST(doc_id AS BIGINT) AS doc_id, "
            f"CAST(score AS DOUBLE) AS score "
            f"FROM (VALUES {vals}) p(doc_id, score) "
            f"UNION ALL "
            f"SELECT doc_id, score FROM ({_sql(spec['retriever'], k)}) c "
            f"WHERE c.doc_id NOT IN ({idlist})) u "
            f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
        )
    if kind == "rule":
        from .rules import applied_rules

        pins, excl = applied_rules(
            spec["ruleset"], spec.get("match_criteria", {})
        )
        pins = [d for d in pins if d not in set(excl)]
        child = _sql(spec["retriever"], k + len(excl))
        drop = sorted({*pins, *excl})
        where = (
            f" WHERE c.doc_id NOT IN ({', '.join(str(d) for d in drop)})"
            if drop
            else ""
        )
        organic = f"SELECT doc_id, score FROM ({child}) c{where}"
        if pins:
            vals = ", ".join(
                f"({doc}, {PIN_BASE - pos!r})"
                for pos, doc in enumerate(pins)
            )
            organic = (
                f"SELECT CAST(doc_id AS BIGINT) AS doc_id, "
                f"CAST(score AS DOUBLE) AS score "
                f"FROM (VALUES {vals}) p(doc_id, score) "
                f"UNION ALL {organic}"
            )
        return (
            f"SELECT doc_id, score FROM ({organic}) u "
            f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
        )
    if kind == "rescorer":
        from .bm25 import bm25_topk_sql

        window, qw, rqw, terms = _rescore_parts(spec)
        child = _sql(spec["retriever"], window)
        sec = bm25_topk_sql(
            terms, k=window, global_stats=True,
            extra_pred=f"doc_id IN (SELECT doc_id FROM ({child}) rwin)",
        ).strip()
        return (
            f"WITH win AS (SELECT doc_id, score FROM ({child}) c), "
            f"sec AS (SELECT doc_id, score AS rs FROM ({sec}) s) "
            f"SELECT win.doc_id AS doc_id, "
            f"round({qw!r} * win.score + {rqw!r} * COALESCE(sec.rs, 0.0), "
            f"{FUSE_DECIMALS}) AS score "
            f"FROM win LEFT JOIN sec ON win.doc_id = sec.doc_id "
            f"ORDER BY score DESC, doc_id ASC LIMIT {k}"
        )
    raise ValueError(f"unknown retriever type {kind!r}")


def retriever_sql(body: dict) -> str:
    """DuckDB oracle for retriever_search — same tree, independently
    emitted SQL per node."""
    return _sql(body["retriever"], int(body.get("size", 10)))


# ---------------------------------------------------------- serving twin


def _local(index: dict, emb_path: str | None, node: dict, k: int) -> list:
    """[(doc_id, score)] — driver-local evaluation of one node, rank-
    identical to execute_retriever (hot-shard caches, zero Spark jobs
    warm).  knn / reranker legs need `emb_path` (the resident embedding
    shard, cached by hybrid._emb_matrix)."""
    from .dsl import execute_dsl_local
    from .hybrid import _cosine_leg_local, _emb_matrix, _fold_dot

    kind, spec = next(iter(node.items()))
    if kind == "standard":
        rows = execute_dsl_local(index, {"query": spec["query"], "size": k})
        return [(int(d), float(s)) for d, s, *_ in rows]
    if kind == "knn":
        if emb_path is None:
            raise ValueError("knn retriever needs --embeddings")
        return _cosine_leg_local(
            index, emb_path, int(spec.get("query_vec_id", 0)),
            int(spec.get("k", k)),
        )
    if kind == "rrf":
        window = int(spec.get("rank_window_size", 10))
        c = float(spec.get("rank_constant", 60))
        legs = [
            _local(index, emb_path, child, window)
            for child in spec["retrievers"]
        ]
        fused: dict[int, float] = {}
        # fixed leg order, matching the engine's coalesced addition
        for leg in legs:
            for r, (doc_id, _s) in enumerate(leg, start=1):
                fused[doc_id] = fused.get(doc_id, 0.0) + 1.0 / (c + r)
        out = [(d, round(s, FUSE_DECIMALS)) for d, s in fused.items()]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]
    if kind == "linear":
        window = int(spec.get("rank_window_size", 10))
        fused = {}
        for item in spec["retrievers"]:
            wgt = float(item.get("weight", 1.0))
            leg = _local(index, emb_path, item["retriever"], window)
            if not leg:
                continue
            mx = max(s for _, s in leg)
            mn = min(s for _, s in leg)
            for doc_id, s in leg:
                norm = 1.0 if mx == mn else (s - mn) / (mx - mn)
                fused[doc_id] = fused.get(doc_id, 0.0) + wgt * norm
        out = [(d, round(s, FUSE_DECIMALS)) for d, s in fused.items()]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]
    if kind == "text_similarity_reranker":
        if emb_path is None:
            raise ValueError("text_similarity_reranker needs --embeddings")
        import numpy as np

        window = int(spec.get("rank_window_size", 30))
        child = _local(index, emb_path, spec["retriever"], window)
        ids, M = _emb_matrix(index, emb_path)
        qi = np.searchsorted(ids, int(spec.get("query_vec_id", 0)))
        qv = M[qi]
        qnorm = _fold_dot(qv, qv) ** 0.5
        out = []
        for doc_id, _s in child:
            i = np.searchsorted(ids, doc_id)
            if i >= ids.size or ids[i] != doc_id:
                continue
            c = round(
                _fold_dot(M[i], qv)
                / ((_fold_dot(M[i], M[i]) ** 0.5) * qnorm),
                5,
            )
            if spec.get("min_score") is not None and c < float(
                spec["min_score"]
            ):
                continue
            out.append((doc_id, float(c)))
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]
    if kind == "pinned":
        ids = [int(v) for v in spec["ids"]]
        child = _local(index, emb_path, spec["retriever"], k)
        out = [
            (doc, PIN_BASE - pos) for pos, doc in enumerate(ids)
        ] + [(d, s) for d, s in child if d not in set(ids)]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]
    if kind == "rule":
        from .rules import applied_rules

        pins, excl = applied_rules(
            spec["ruleset"], spec.get("match_criteria", {})
        )
        pins = [d for d in pins if d not in set(excl)]
        child = _local(index, emb_path, spec["retriever"], k + len(excl))
        drop = {*pins, *excl}
        out = [(doc, PIN_BASE - pos) for pos, doc in enumerate(pins)] + [
            (d, s) for d, s in child if d not in drop
        ]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]
    if kind == "rescorer":
        from .wand import wand_topk_local

        window, qw, rqw, terms = _rescore_parts(spec)
        child = _local(index, emb_path, spec["retriever"], window)
        if not child:
            return []
        ids = [d for d, _s in child]
        sec = dict(
            wand_topk_local(
                index, terms, k=window,
                doc_filter=f"doc_id IN ({', '.join(str(d) for d in ids)})",
            )
        )
        out = [
            (d, round(qw * s + rqw * sec.get(d, 0.0), FUSE_DECIMALS))
            for d, s in child
        ]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out[:k]
    raise ValueError(f"unknown retriever type {kind!r}")


def retriever_search_local(
    index: dict, body: dict, emb_path: str | None = None
) -> list:
    """Serving twin of retriever_search: [(doc_id, score)]."""
    return _local(
        index, emb_path, body["retriever"], int(body.get("size", 10))
    )
