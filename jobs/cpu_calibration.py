"""Machine-capability calibration for the scaling certificate.

The north-rule scaling measurement (bench.py --scaling) divides Spark-job
throughput at N and 4N pinned CPUs.  That quotient certifies the PLAN
only if the machine itself gives 4x compute from N to 4N CPUs — on a
shared/virtualized host (this sandbox: 32 KVM vCPUs) per-vCPU capability
degrades as more vCPUs run (hypervisor SMT/steal), so wide spans hit a
hardware ceiling no plan shape can evade.  This job measures that
ceiling with an embarrassingly parallel workload that has ZERO
coordination, shuffle, or skew — any sub-linearity it shows is the
machine, not a plan:

    worker = C-speed numpy kernel loop (int64 multiply-xor-shift mixing
    + a float pass over a ~4 MB working set, roughly the posting-encode
    mix of ALU and memory traffic), fixed units per worker.

Usage:
    python jobs/cpu_calibration.py [N] [M]   # default 4 16
prints one JSON line:
    {"cpusN": ..., "throughputN": ..., "cpusM": ..., "throughputM": ...,
     "machine_efficiency": (tM/tN)/(M/N)}

Each level runs in a fresh taskset-pinned subprocess (whole process tree
pinned, same as bench.py --scaling).  Use machine_efficiency as the
denominator for the plan-relative efficiency of the same span.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

UNITS_PER_WORKER = 12
ARR_WORDS = 1 << 19  # 512k int64 = 4 MB working set


def _one_unit(seed: int) -> int:
    import numpy as np

    x = np.arange(ARR_WORDS, dtype=np.int64) + seed
    acc = 0
    for i in range(40):
        x = (x * np.int64(-0x61C8864680B583EB)) ^ (x >> np.int64(29))
        x = x + np.int64(i)
        if i % 8 == 0:
            acc ^= int(x[::4096].sum())
    f = x.astype(np.float64)
    for _ in range(4):
        f = np.sqrt(np.abs(f)) * 1.0001 + 1.0
    return acc ^ int(f[::4096].sum())


def _worker(seed: int) -> float:
    t0 = time.perf_counter()
    s = 0
    for u in range(UNITS_PER_WORKER):
        s ^= _one_unit(seed * 1000 + u)
    return time.perf_counter() - t0


def run_level(cpus: int) -> float:
    """Aggregate units/sec with `cpus` pool workers (call pinned)."""
    from multiprocessing import Pool

    with Pool(cpus) as p:
        t0 = time.perf_counter()
        p.map(_worker, range(cpus))
        wall = time.perf_counter() - t0
    return cpus * UNITS_PER_WORKER / wall


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out = {}
    for cpus in (n, m):
        code = (
            "import json,sys; sys.path.insert(0, '.');"
            "from jobs.cpu_calibration import run_level;"
            f"print('RESULT ' + json.dumps(run_level({cpus})))"
        )
        cmd = [sys.executable, "-c", code]
        if shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}", *cmd]
        p = subprocess.run(
            cmd, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        line = [l for l in p.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(p.stdout[-1000:], p.stderr[-1000:], file=sys.stderr)
            raise RuntimeError(f"calibration at {cpus} cpus failed")
        out[cpus] = float(line[0][len("RESULT "):])
    print(json.dumps({
        f"cpus{n}": n, f"throughput{n}": round(out[n], 2),
        f"cpus{m}": m, f"throughput{m}": round(out[m], 2),
        "machine_efficiency": round((out[m] / out[n]) / (m / n), 3),
    }))


if __name__ == "__main__":
    main()
