"""Round-6 pass-3 probe: the bench `aggregates` line op by op (guide §1).

Per op: wall seconds (best of N interleaved trials) + Spark job count via
statusTracker, to separate real work from per-job overhead.  NOT part of
the driver bench contract.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EXPAND = int(os.environ.get("SPARK_GRAFT_EXPAND", "40"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    import pandas as pd

    from telegram2elastic_spark.corpus import (
        as_corpus,
        expand_corpus,
        load_documents,
        load_events,
    )
    from telegram2elastic_spark.operators import aggregates as agg
    from telegram2elastic_spark.session import get_spark

    spark = get_spark("probe-aggs", master=f"local[{CPUS}]")
    sc = spark.sparkContext
    import tempfile

    wd = tempfile.mkdtemp(prefix="probe_agg_")
    docs = expand_corpus(load_documents(spark, SF_DIR), EXPAND)
    as_corpus(docs).repartition(64, "doc_id").write.mode("overwrite").parquet(
        f"{wd}/corpus"
    )
    corpus = spark.read.parquet(f"{wd}/corpus")
    corpus.count()
    corpus.select("doc_id", "lang").limit(2000).groupBy("lang").applyInPandas(
        lambda p: pd.DataFrame({"n": [len(p)]}), "n long"
    ).collect()
    events = load_events(spark, SF_DIR)

    ops = {
        "events_rollup": lambda: agg.events_rollup(events).collect(),
        "top_users_per_type": lambda: agg.top_users_per_type(events).collect(),
        "timeline_daily": lambda: agg.timeline_daily(corpus).collect(),
    }
    best = {k: float("inf") for k in ops}
    jobs = {}
    for trial in range(4):
        for name, fn in ops.items():
            before = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.perf_counter()
            fn()
            w = time.perf_counter() - t0
            after = sc._jsc.sc().dagScheduler().nextJobId()
            best[name] = min(best[name], w)
            jobs[name] = after - before
            print(f"trial{trial} {name}: {w:.3f}s jobs={after - before}",
                  flush=True)
    print({k: round(v, 3) for k, v in best.items()}, "jobs:", jobs)
    spark.stop()


if __name__ == "__main__":
    main()
