"""Spark-free scaling probe of the vectorized pack-kernel computation.

Answers one question about THIS host: how does raw vectorized-numpy
delta+VByte packing (the exact per-batch computation of the r5 build
kernels — reduceat merge + batched LEB128 encode + per-group slicing)
scale from N to 4N pinned cores, with FIXED work per process and no Spark,
no JVM, no shuffle?

Why it exists: after the r5 kernel vectorization the Spark build's 2→8
pinned-core efficiency measured ~0.73-0.75 (BENCH/BASELINE.md §2), down
from 0.91 when the same stages were interpreter-bound Python loops. If
this probe's numpy-only efficiency lands in the same band, the Spark
number equals the host's vectorized-memory ceiling — the dataflow adds no
additional serialization — and on a real cluster (where 4N executors are
4N machines with 4N memory controllers, not 4N threads against one) the
measured per-machine throughput is what multiplies out.

Usage: python tools/kernel_scaling_probe.py [N]   (default N=2; probes N vs 4N)
Prints one JSON line.
"""

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np


def _one_unit(seed: int) -> int:
    """One unit of pack work ≈ one Arrow batch of the postings pack kernel:
    100k rows in ~30k groups → reduceat sums + grouped delta+VByte."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from veloci_spark.vbyte import pack_ids_grouped, vbyte_encode_grouped

    rng = np.random.RandomState(seed)
    n = 100_000
    scores = rng.randint(1, 50_000, size=n).astype(np.uint64)
    group_of = np.sort(rng.randint(0, 30_000, size=n))
    change = np.concatenate(([True], group_of[1:] != group_of[:-1]))
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], n)
    ids = np.sort(rng.randint(0, 1 << 20, size=n))
    sums = np.add.reduceat(scores, starts)
    blobs = pack_ids_grouped(ids, starts, ends)
    blobs2 = vbyte_encode_grouped(scores, starts, ends)
    return len(blobs) + len(blobs2) + int(sums[0])


def _worker(core: int, units: int, q):
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    t0 = time.time()
    acc = 0
    for u in range(units):
        acc += _one_unit(1000 + u)
    q.put((core, time.time() - t0, acc))


def run(procs: int, units: int) -> float:
    """Aggregate units/sec with `procs` processes, one pinned core each."""
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(i, units, q)) for i in range(procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    outs = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.time() - t0
    assert len(outs) == procs
    return procs * units / wall


def main():
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    units = int(os.environ.get("PROBE_UNITS", "60"))
    run(1, 3)  # warm imports/allocator
    t_n = run(base, units)
    t_4n = run(base * 4, units)
    eff = (t_4n / t_n) / 4.0
    print(json.dumps({
        "probe": "vectorized pack kernel (numpy only, fixed work/proc, pinned)",
        f"units_per_sec_{base}c": round(t_n, 2),
        f"units_per_sec_{base * 4}c": round(t_4n, 2),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
