"""Host-CPU entitlement probe (no Spark): a fixed pure-CPU workload run by
k worker processes, k in {1, 2, 4, 8, 16, 32}. On a machine that really has
32 cores, aggregate throughput grows ~linearly to 32. On an oversubscribed
guest it flattens at the host's real entitlement — that ceiling, not any
Spark plan property, bounds every local[N] scaling number measured in this
sandbox (see BENCH.md). Run before/alongside scaling benches to calibrate.
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time

WORK_ITEMS = 60_000  # md5 chains per worker task unit


def _burn(seed: int) -> int:
    h = hashlib.md5(str(seed).encode()).digest()
    for _ in range(WORK_ITEMS):
        h = hashlib.md5(h).digest()
    return h[0]


def measure(k: int, tasks_per_worker: int = 8) -> float:
    """Return aggregate task-units/sec with k worker processes."""
    n_tasks = k * tasks_per_worker
    t0 = time.time()
    with mp.Pool(k) as pool:
        pool.map(_burn, range(n_tasks), chunksize=1)
    return n_tasks / (time.time() - t0)


def main() -> None:
    levels = [int(x) for x in (sys.argv[1:] or ["1", "2", "4", "8", "16", "32"])]
    out = {}
    for k in levels:
        thr = measure(k)
        out[k] = round(thr, 2)
        print(f"k={k:<3} aggregate={thr:9.2f} units/s  "
              f"speedup_vs_first={thr / out[levels[0]]:.2f}")
    print("PROBE " + json.dumps(out))


if __name__ == "__main__":
    main()
