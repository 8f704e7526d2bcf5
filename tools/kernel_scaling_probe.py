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


# ---------------------------------------------------------------------------
# fixed-work host band: how DOES this box scale N→4N pinned cores, by
# working-set regime relative to its ONE shared L3 (260 MB on this VM)?
# Measured r5 (slowest-proc aggregation, the stage-barrier view):
#   * collective working set ≪ L3 at both leg sizes  → ~0.9+   (pack kernel)
#   * ≫ L3 at both leg sizes (pure DRAM streaming)   → ~0.9    (bw 29→108 GB/s)
#   * fits L3 at N procs but SPILLS it at 4N procs   → 0.25-0.65
# The third regime is exactly Spark-task-shaped (tens of MB of Arrow/scan/
# shuffle buffers per task: 2 concurrent tasks fit the shared L3, 8 thrash
# it), so a measured build efficiency of ~0.8 sits ABOVE the host's own
# ceiling for its dominant regime. This is a single-box artifact: on a real
# cluster 4N executors are 4N machines with PRIVATE L3s and memory
# controllers, and the mid regime collapses into the first.
# ---------------------------------------------------------------------------

def _band_worker(core: int, shape: str, q):
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    import numpy as np  # local: keep worker import cost out of timing
    if shape == "dram_both_legs":  # 256 MB/proc: > L3 collectively even at N=2
        a = np.empty(256 << 20, dtype=np.uint8)
        a[:] = 1
        b = np.empty_like(a)
        b[:] = 0  # pre-touch: first-touch page-zeroing must not be timed
        t0 = time.time()
        for _ in range(12):
            np.copyto(b, a)
    elif shape == "l3_both_legs":  # ~6 MB/proc: < L3 collectively even at 4N=8
        a = np.arange(250_000, dtype=np.int64)
        t0 = time.time()
        for _ in range(800):
            (a * 3 + 1).sum()
    else:  # l3_spill_at_4n: 64 MB/proc — fits L3 at 2 procs, spills at 8
        a = np.empty(32 << 20, dtype=np.uint8)
        a[:] = 1
        b = np.empty_like(a)
        b[:] = 0
        t0 = time.time()
        for _ in range(40):
            np.copyto(b, a)
    q.put(time.time() - t0)


def _band_run(procs: int, shape: str) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_band_worker, args=(i, shape, q)) for i in range(procs)]
    for p in ps:
        p.start()
    outs = [q.get() for _ in ps]
    for p in ps:
        p.join()
    # a Spark stage ends when its LAST task does — the slowest proc is the
    # right aggregation for adjudicating stage-barrier dataflows
    return procs / max(outs)


def host_band(base: int) -> dict:
    out = {}
    for shape in ("l3_both_legs", "l3_spill_at_4n", "dram_both_legs"):
        _band_run(2, shape)  # warm
        t_n = _band_run(base, shape)
        t_4n = _band_run(base * 4, shape)
        out[shape] = round((t_4n / t_n) / 4.0, 3)
    out["note"] = ("fixed work/proc, pinned, slowest-proc aggregation; the "
                   "host's own N->4N scaling by working-set regime vs its "
                   "one shared 260MB L3 — the spill-at-4N regime is "
                   "Spark-task-shaped and collapses to ~1.0 on a real "
                   "cluster where 4N executors have private L3s")
    return out


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
        "host_band": host_band(base),
    }))


if __name__ == "__main__":
    main()
