"""ANN / similarity search vs DuckDB oracles + recall sanity."""

from telegram2elastic_spark.corpus import load_embeddings
from telegram2elastic_spark.operators import similarity as sim

from .oracle import assert_same


def test_cosine_topk(spark, duck, sf_dir):
    assert_same(
        sim.cosine_topk(load_embeddings(spark, sf_dir), query_vec_id=0, k=10),
        duck.execute(sim.cosine_topk_sql(query_vec_id=0, k=10)).df(),
    )


def test_lsh_buckets(spark, duck, sf_dir):
    assert_same(
        sim.lsh_buckets(load_embeddings(spark, sf_dir)),
        duck.execute(sim.lsh_buckets_sql()).df(),
    )


def test_ann_topk(spark, duck, sf_dir):
    assert_same(
        sim.ann_topk(load_embeddings(spark, sf_dir), query_vec_id=7, k=5),
        duck.execute(sim.ann_topk_sql(query_vec_id=7, k=5)).df(),
    )


def test_ann_subset_of_corpus_and_ordered(spark, sf_dir):
    emb = load_embeddings(spark, sf_dir)
    exact = sim.cosine_topk(emb, query_vec_id=3, k=20).collect()
    approx = sim.ann_topk(emb, query_vec_id=3, k=20).collect()
    exact_ids = [r["vec_id"] for r in exact]
    # every ANN hit is a real vector with correctly computed cosine
    exact_map = {r["vec_id"]: r["cosine"] for r in exact}
    for r in approx:
        if r["vec_id"] in exact_map:
            assert abs(r["cosine"] - exact_map[r["vec_id"]]) < 1e-9
    # buckets shrink the candidate set
    assert len(approx) <= len(exact_ids)


def test_ivf_assign_and_topk(spark, duck, sf_dir):
    """IVF: assignment lists + nprobe search vs oracle; candidates really
    come from the probed lists only."""
    from telegram2elastic_spark.operators import similarity as sim

    emb = load_embeddings(spark, sf_dir)
    assign = sim.ivf_assign(emb)
    assert_same(assign, duck.execute(sim.ivf_assign_sql()).df())
    # every vector assigned exactly once, to an existing centroid
    cents = {
        r["vec_id"]
        for r in emb.filter(f"vec_id % {sim.IVF_CENTROID_MOD} = 0").collect()
    }
    rows = assign.collect()
    assert len(rows) == emb.count()
    assert all(r["cid"] in cents for r in rows)
    # a centroid is its own nearest list (dist 0)
    by_vec = {r["vec_id"]: r for r in rows}
    for c in cents:
        assert by_vec[c]["cid"] == c and by_vec[c]["dist"] == 0.0

    got = sim.ivf_topk(emb, query_vec_id=7, k=5, nprobe=2)
    assert_same(got, duck.execute(sim.ivf_topk_sql(7, 5, 2)).df())


def test_ivf_recall_vs_exact(spark, sf_dir):
    """With nprobe = all lists, IVF search == exact brute force."""
    from telegram2elastic_spark.operators import similarity as sim

    emb = load_embeddings(spark, sf_dir)
    n_cents = emb.filter(f"vec_id % {sim.IVF_CENTROID_MOD} = 0").count()
    full = [
        (r["vec_id"], r["cosine"])
        for r in sim.ivf_topk(emb, 7, k=5, nprobe=n_cents).collect()
    ]
    exact = [
        (r["vec_id"], r["cosine"])
        for r in sim.cosine_topk(emb, 7, k=5).collect()
    ]
    assert full == exact


def test_ivf_assign_plan_has_no_window(spark, sf_dir):
    """The per-vector argmin must be a min_by hash aggregation (map-side
    combine over the N×C expansion), NOT a row_number Window that shuffles
    every distance row."""
    df = sim.ivf_assign(load_embeddings(spark, sf_dir))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_kmeans_assign_matches_oracle(spark, duck, sf_dir):
    """Trained (Lloyd's) quantizer feeding the same IVF structure — the
    DuckDB oracle unrolls the identical fixed-depth iteration."""
    got = sim.kmeans_assign(load_embeddings(spark, sf_dir), k=8, iters=3)
    assert_same(got, duck.execute(sim.kmeans_assign_sql(8, 3)).df())


def test_kmeans_improves_or_matches_seed_quantizer(spark, sf_dir):
    """Training must not make the quantizer worse: mean assignment
    distance after 3 Lloyd's iterations <= iteration-0 seeds."""
    from pyspark.sql import functions as F

    emb = load_embeddings(spark, sf_dir)
    seeds = sim.kmeans_centroids(emb, k=8, iters=0)
    trained = sim.kmeans_centroids(emb, k=8, iters=3)
    d0 = sim.ivf_assign(emb, centroids=seeds).agg(F.avg("dist")).first()[0]
    d3 = sim.ivf_assign(emb, centroids=trained).agg(F.avg("dist")).first()[0]
    assert d3 <= d0


# ---------------------------------------------------------------------------
# Product quantization (PQ / ADC)


def test_pq_encode_matches_oracle(spark, duck, sf_dir):
    got = sim.pq_encode(load_embeddings(spark, sf_dir))
    assert_same(got, duck.execute(sim.pq_encode_sql()).df())


def test_pq_adc_matches_oracle(spark, duck, sf_dir):
    got = sim.pq_adc_topk(load_embeddings(spark, sf_dir), query_vec_id=7, k=10)
    assert_same(got, duck.execute(sim.pq_adc_topk_sql(7, k=10)).df())


def test_pq_codebook_shape_and_code_range(spark, sf_dir):
    emb = load_embeddings(spark, sf_dir)
    cb = sim.pq_codebooks(emb).collect()
    # every subspace keeps a codebook; a cluster emptied by an iteration
    # may drop (matching the SQL oracle), never exceed ksub
    per_sub: dict[int, int] = {}
    for r in cb:
        per_sub[r["sub"]] = per_sub.get(r["sub"], 0) + 1
        assert len(r["cv"]) == sim.EMB_DIM // sim.PQ_M
    assert set(per_sub) == set(range(sim.PQ_M))
    assert all(1 <= c <= sim.PQ_KSUB for c in per_sub.values())
    codes = sim.pq_codes(emb).collect()
    n = emb.count()
    assert len(codes) == n * sim.PQ_M
    valid = {(r["sub"], r["cid"]) for r in cb}
    assert all((r["sub"], r["cid"]) in valid for r in codes)


def test_pq_adc_recall_vs_exact_l2(spark, sf_dir):
    """ADC is an approximation: its top-10 must overlap the exact
    squared-L2 top-10 (deterministic corpus, fixed codebook params)."""
    from pyspark.sql import functions as F

    emb = load_embeddings(spark, sf_dir)
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.filter(F.col("vec_id") == 7).select(F.col("v").alias("qv"))
    exact = [
        r["vec_id"]
        for r in e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 7)
        .select("vec_id", sim._l2sq(F.col("v"), F.col("qv")).alias("d"))
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    ]
    adc = [
        r["vec_id"]
        for r in sim.pq_adc_topk(emb, query_vec_id=7, k=10).collect()
    ]
    assert len(set(adc) & set(exact)) >= 3


def test_pq_scoring_plan_broadcasts_table_no_window(spark, sf_dir):
    """ADC scoring must be a broadcast join on (sub, cid) + hash
    aggregate — no Window, no sort-merge join against the codes table."""
    df = sim.pq_adc_topk(load_embeddings(spark, sf_dir), query_vec_id=7, k=10)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert "Window" not in plan
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_ivfpq_matches_oracle(spark, duck, sf_dir):
    got = sim.ivfpq_topk(
        load_embeddings(spark, sf_dir), query_vec_id=7, k=5, nprobe=2
    )
    assert_same(got, duck.execute(sim.ivfpq_topk_sql(7, k=5, nprobe=2)).df())


def test_ivfpq_subset_of_full_adc(spark, sf_dir):
    """IVF-PQ hits are ADC-scored members of the probed lists: every hit
    must appear in the unpruned ADC ranking with the SAME adc_dist."""
    emb = load_embeddings(spark, sf_dir)
    full = {
        r["vec_id"]: r["adc_dist"]
        for r in sim.pq_adc_topk(emb, query_vec_id=7, k=500).collect()
    }
    hits = sim.ivfpq_topk(emb, query_vec_id=7, k=5, nprobe=2).collect()
    assert len(hits) > 0
    for r in hits:
        assert full[r["vec_id"]] == r["adc_dist"]


class TestIVFPQRefine:
    def test_vs_oracle(self, spark, duck, sf_dir):
        got = sim.ivfpq_refine_topk(
            load_embeddings(spark, sf_dir), query_vec_id=7, k=5, nprobe=2,
            oversample=4,
        )
        want = duck.execute(
            sim.ivfpq_refine_topk_sql(7, k=5, nprobe=2, oversample=4)
        ).df()
        assert_same(got, want)

    def test_exact_distances_and_candidate_subset(self, spark, sf_dir):
        """Refined hits carry EXACT L2^2 (not ADC estimates) and come from
        the ADC oversample window."""
        from pyspark.sql import functions as F

        emb = load_embeddings(spark, sf_dir)
        window = {
            r["vec_id"]
            for r in sim.ivfpq_topk(emb, query_vec_id=7, k=20, nprobe=2)
            .collect()
        }
        hits = sim.ivfpq_refine_topk(
            emb, query_vec_id=7, k=5, nprobe=2, oversample=4
        ).collect()
        assert len(hits) == 5
        e = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        qv = e.filter("vec_id = 7").collect()[0]["v"]
        exact = {
            r["vec_id"]: round(
                sum((a - b) ** 2 for a, b in zip(r["v"], qv)), 5
            )
            for r in e.filter(
                F.col("vec_id").isin([h["vec_id"] for h in hits])
            ).collect()
        }
        for h in hits:
            assert h["vec_id"] in window
            assert abs(exact[h["vec_id"]] - h["dist"]) < 1e-6

    def test_rescoring_recovers_adc_misrankings(self, spark, sf_dir):
        """Recall@k vs the exact brute-force ranking: refine must be at
        least as good as raw ADC order over the same candidate window
        (the reason the op exists)."""
        emb = load_embeddings(spark, sf_dir)
        true = [
            r["vec_id"]
            for r in sim.cosine_l2_topk(emb, query_vec_id=7, k=5).collect()
        ] if hasattr(sim, "cosine_l2_topk") else None
        if true is None:
            # exact L2 brute force inline
            from pyspark.sql import functions as F

            e = emb.select(
                "vec_id", F.col("embedding").cast("array<double>").alias("v")
            )
            q = e.filter("vec_id = 7").select(F.col("v").alias("qv"))
            true = [
                r["vec_id"]
                for r in e.filter("vec_id != 7")
                .crossJoin(F.broadcast(q))
                .select(
                    "vec_id",
                    F.round(sim._l2sq(F.col("v"), F.col("qv")), 5).alias("d"),
                )
                .orderBy(F.asc("d"), F.asc("vec_id"))
                .limit(5)
                .collect()
            ]
        adc = [
            r["vec_id"]
            for r in sim.ivfpq_topk(emb, query_vec_id=7, k=5, nprobe=2)
            .collect()
        ]
        ref = [
            r["vec_id"]
            for r in sim.ivfpq_refine_topk(
                emb, query_vec_id=7, k=5, nprobe=2, oversample=8
            ).collect()
        ]
        r_adc = len(set(adc) & set(true)) / 5
        r_ref = len(set(ref) & set(true)) / 5
        assert r_ref >= r_adc


class TestKnnRadius:
    def test_vs_oracle(self, spark, duck, sf_dir):
        assert_same(
            sim.knn_radius(
                load_embeddings(spark, sf_dir), query_vec_id=0,
                similarity=0.15, num_candidates=50,
            ),
            duck.execute(sim.knn_radius_sql(
                query_vec_id=0, similarity=0.15, num_candidates=50)).df(),
        )

    def test_threshold_and_cap_semantics(self, spark, sf_dir):
        emb = load_embeddings(spark, sf_dir)
        rows = sim.knn_radius(
            emb, query_vec_id=0, similarity=0.15, num_candidates=50
        ).collect()
        assert all(r["cosine"] >= 0.15 for r in rows)
        assert all(r["vec_id"] != 0 for r in rows)
        assert len(rows) <= 50
        # tighter radius is a strict subset of the looser one
        tight = {
            r["vec_id"]
            for r in sim.knn_radius(
                emb, query_vec_id=0, similarity=0.3, num_candidates=50
            ).collect()
        }
        loose = {r["vec_id"] for r in rows}
        assert tight <= loose
        # cap binds: num_candidates=3 returns the 3 highest cosines
        capped = sim.knn_radius(
            emb, query_vec_id=0, similarity=0.15, num_candidates=3
        ).collect()
        top3 = sorted(rows, key=lambda r: (-r["cosine"], r["vec_id"]))[:3]
        assert [(r["vec_id"], r["cosine"]) for r in capped] == [
            (r["vec_id"], r["cosine"]) for r in top3
        ]


class TestQuantizedKnn:
    """int8 scalar-quantized and bit-packed (hamming) kNN with the ES 9.0
    oversample + exact-rescore contract."""

    def test_int8_vs_oracle(self, spark, duck, sf_dir):
        assert_same(
            sim.knn_int8_topk(
                load_embeddings(spark, sf_dir), query_vec_id=7, k=5, oversample=4
            ),
            duck.execute(sim.knn_int8_topk_sql(7, k=5, oversample=4)).df(),
        )

    def test_bit_vs_oracle(self, spark, duck, sf_dir):
        assert_same(
            sim.knn_bit_topk(
                load_embeddings(spark, sf_dir), query_vec_id=7, k=5, oversample=5
            ),
            duck.execute(sim.knn_bit_topk_sql(7, k=5, oversample=5)).df(),
        )

    def test_int8_codes_match_numpy(self, spark, sf_dir):
        """Quantized codes equal an independent numpy recompute of
        round((x - lo) * 127 / (hi - lo)) with exact corpus min/max."""
        import numpy as np
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        emb = load_embeddings(spark, sf_dir)
        lo, hi = sim._sq_bounds(emb)
        got = (
            emb.select(
                "vec_id",
                sim._sq_code(
                    F.col("embedding").cast("array<double>"), lo, hi
                ).alias("code"),
            )
            .orderBy("vec_id")
            .toPandas()
        )
        tab = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
        tab = tab.sort_values("vec_id", ignore_index=True)
        comp = np.stack([v.astype(np.float64) for v in tab["embedding"]])
        assert float(comp.min()) == lo and float(comp.max()) == hi
        # np.round is HALF_EVEN; the engines round HALF_UP — recompute
        # with floor(x + 0.5), valid for the non-negative operand.
        want = np.floor((comp - lo) * (127.0 / (hi - lo)) + 0.5).astype(np.int64)
        assert all(
            list(g) == list(w) for g, w in zip(got["code"], want)
        )
        assert want.min() >= 0 and want.max() <= 127

    def test_bit_codes_match_numpy(self, spark, sf_dir):
        """Packed sign-bit halves equal an independent numpy packing."""
        import numpy as np
        import pyarrow.parquet as pq
        from pyspark.sql import functions as F

        emb = load_embeddings(spark, sf_dir)
        lo_c, hi_c = sim._bit_halves(F.col("embedding").cast("array<double>"))
        got = (
            emb.select("vec_id", lo_c.alias("blo"), hi_c.alias("bhi"))
            .orderBy("vec_id")
            .toPandas()
        )
        tab = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
        tab = tab.sort_values("vec_id", ignore_index=True)
        comp = np.stack([v.astype(np.float64) for v in tab["embedding"]])
        bits = (comp > 0).astype(np.uint64)
        pw = (np.uint64(1) << np.arange(32, dtype=np.uint64))
        want_lo = (bits[:, :32] * pw).sum(axis=1).astype(np.int64)
        want_hi = (bits[:, 32:] * pw).sum(axis=1).astype(np.int64)
        assert got["blo"].tolist() == want_lo.tolist()
        assert got["bhi"].tolist() == want_hi.tolist()

    def test_high_oversample_recovers_exact_ranking(self, spark, sf_dir):
        """With a window covering the whole corpus, both quantized paths
        must return exactly the exact top-k under their final metric."""
        emb = load_embeddings(spark, sf_dir)
        n = emb.count()
        k = 5
        # bit path's final metric is cosine — compare vs cosine_topk
        exact_cos = sim.cosine_topk(emb, query_vec_id=3, k=k).toPandas()
        full_bit = sim.knn_bit_topk(
            emb, query_vec_id=3, k=k, oversample=(n // k) + 1
        ).toPandas()
        assert full_bit["vec_id"].tolist() == exact_cos["vec_id"].tolist()
        # int8 path's final metric is the dot product
        from pyspark.sql import functions as F

        e = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        q = e.filter(F.col("vec_id") == 3).select(F.col("v").alias("qv"))
        exact_dot = (
            e.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != 3)
            .select(
                "vec_id", F.round(sim._dot(F.col("v"), F.col("qv")), 5).alias("dot")
            )
            .orderBy(F.desc("dot"), F.asc("vec_id"))
            .limit(k)
            .toPandas()
        )
        full_int8 = sim.knn_int8_topk(
            emb, query_vec_id=3, k=k, oversample=(n // k) + 1
        ).toPandas()
        assert full_int8["vec_id"].tolist() == exact_dot["vec_id"].tolist()

    def test_int8_candidate_recall_at_default_oversample(self, spark, sf_dir):
        """The corrective offset keeps recall high at the DEFAULT window:
        the quantized path at oversample=3 must agree with the exhaustive
        path on >= 4 of the top-5 (it is 5/5 on this corpus; the assert
        leaves one slot of slack for future synthetic-data tweaks)."""
        emb = load_embeddings(spark, sf_dir)
        n = emb.count()
        approx = set(
            sim.knn_int8_topk(emb, query_vec_id=11, k=5, oversample=3)
            .toPandas()["vec_id"]
        )
        exact = set(
            sim.knn_int8_topk(
                emb, query_vec_id=11, k=5, oversample=(n // 5) + 1
            ).toPandas()["vec_id"]
        )
        assert len(approx & exact) >= 4
