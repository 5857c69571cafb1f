"""Round-6 auxiliary benchmarks (bench.py is FROZEN for measurement, so
extra evidence lives here — guide §1 noop-sink isolation + the
interleaved multi-trial re-measurement VERDICT r5 #3/#8 asked for).

Covers:
  * the r5-flagged "regressed" pipeline lines (dedup_components,
    dsir_weights, top_ngrams, repetition_metrics) with n_trials
    interleaved trials each (single-shot numbers rode host noise in r5);
  * highlight_store_ms (flagged 42 -> 328 ms in r5);
  * noop-sink isolation of the index-build stages (tf kernel, postings
    encode) so compute is timed separately from the parquet sink.

Prints ONE JSON line; also writes BENCH_EXTRA.json next to this file.
"""
from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
EXPAND = int(os.environ.get("SPARK_GRAFT_EXPAND", "40"))
TRIALS = int(os.environ.get("SPARK_GRAFT_TRIALS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import pandas as pd

    from telegram2elastic_spark.corpus import as_corpus, expand_corpus, load_documents
    from telegram2elastic_spark.index.build import (
        build_index,
        build_postings,
        read_index,
        term_frequencies,
        write_index,
    )
    from telegram2elastic_spark.operators import dedup as ddp
    from telegram2elastic_spark.operators import training as trp
    from telegram2elastic_spark.session import get_spark

    spark = get_spark("bench-extra", master=f"local[{CPUS}]")
    sc = spark.sparkContext
    wd = tempfile.mkdtemp(prefix="bext_")
    docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
    as_corpus(docs).repartition(64, "doc_id").write.mode("overwrite").parquet(
        f"{wd}/c"
    )
    corpus = spark.read.parquet(f"{wd}/c")
    n_docs = corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()

    out: dict = {"sf": SF_DIR, "cpus": CPUS, "n_docs": n_docs, "trials": TRIALS}

    # --- interleaved multi-trial pipeline ops (VERDICT r5 #3/#8) --------
    flagged = {
        "dedup_components_sec": lambda: ddp.dedup_components(corpus).count(),
        "dsir_weights_sec": lambda: trp.dsir_weights(
            corpus, target_lang="fr"
        ).count(),
        "top_ngrams_sec": lambda: trp.top_ngrams(corpus, n=3, k=20).count(),
        "repetition_metrics_sec": lambda: trp.repetition_metrics(
            corpus
        ).count(),
    }
    samples: dict[str, list[float]] = {k: [] for k in flagged}
    for _trial in range(TRIALS):
        for name, fn in flagged.items():  # interleaved across trials
            sc.setJobDescription(f"bench_extra: {name}")
            t0 = time.perf_counter()
            fn()
            samples[name].append(round(time.perf_counter() - t0, 3))
    out["pipeline_ops_trials"] = samples
    out["pipeline_ops_best"] = {k: min(v) for k, v in samples.items()}
    out["pipeline_ops_median"] = {
        k: sorted(v)[len(v) // 2] for k, v in samples.items()
    }

    # --- noop-sink isolation of index-build stages (guide §1.4) ---------
    from pyspark import StorageLevel

    sc.setJobDescription("bench_extra: tf kernel noop")
    t0 = time.perf_counter()
    noop(term_frequencies(corpus))
    out["tf_kernel_noop_sec"] = round(time.perf_counter() - t0, 3)
    tfc = term_frequencies(corpus).persist(StorageLevel.MEMORY_AND_DISK)
    tfc.count()
    sc.setJobDescription("bench_extra: postings encode noop")
    t0 = time.perf_counter()
    noop(build_postings(tfc, n_doc_parts=CPUS))
    out["postings_encode_noop_sec"] = round(time.perf_counter() - t0, 3)
    tfc.unpersist()

    # --- full index build+write (the headline stage, best of TRIALS) ----
    builds = []
    for t in range(TRIALS):
        sc.setJobDescription(f"bench_extra: index build {t}")
        t0 = time.perf_counter()
        idx = build_index(corpus, n_doc_parts=CPUS)
        idx["_tf"].count()
        write_index(idx, f"{wd}/ix{t}")
        builds.append(round(time.perf_counter() - t0, 3))
        shutil.rmtree(f"{wd}/ix{t}", ignore_errors=True)
    out["index_build_write_trials"] = builds
    out["index_build_write_best_sec"] = min(builds)

    # --- highlight_store_ms (flagged in r5) -----------------------------
    from telegram2elastic_spark.index.build import write_doc_store
    from telegram2elastic_spark.query import local as lqp

    idx = build_index(corpus, n_doc_parts=CPUS)
    write_index(idx, f"{wd}/hx")
    eidx = read_index(spark, f"{wd}/hx")
    write_doc_store(corpus, f"{wd}/hx")
    eidx["_doc_store_dir"] = f"{wd}/hx/doc_store"
    lqp.search_highlight_local(eidx, None, ["spark", "merge"], k=10)  # warm
    hs = []
    for _ in range(TRIALS):
        eidx["_doc_cache"] = {}
        t0 = time.perf_counter()
        lqp.search_highlight_local(eidx, None, ["spark", "merge"], k=10)
        hs.append(round((time.perf_counter() - t0) * 1000, 2))
    out["highlight_store_ms_trials"] = hs
    out["highlight_store_ms_best"] = min(hs)

    shutil.rmtree(wd, ignore_errors=True)
    spark.stop()

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_EXTRA.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
