"""Standalone steal-guarded re-measurement of named bench queries.

VERDICT r04 flagged sf1 in-suite regressions (skipgram_neg 3.1x,
ann_ivf_topk 1.76x, ann_lsh_topk 1.56x, lwc_sigmoid 1.94x,
disagreement_variance 1.79x) that all carry steal re-runs and sit in the
burst-throttle pattern; the adjudication protocol (next-round #1/#8) is a
clean OUT-OF-SUITE re-measure before trusting or chasing them. This tool
runs each named query in the bench's own measurement discipline but with
nothing else in the session: fresh-session option, full state release +
sync between reps, min-of-reps with per-rep steal shares printed.

Usage: python tools/standalone_remeasure.py <sf_dir> <q1,q2,...> [reps]
Prints one JSON line: {"sf_dir":..., "queries": {name: {"wall": s,
"steal_pct": p, "reps": [[w, p], ...], "rows": n}}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (  # noqa: E402
    _read_steal_jiffies, _release_query_state, _steal_pct,
)
from ontologymatching_spark import benchqueries as B  # noqa: E402
from ontologymatching_spark.session import get_spark  # noqa: E402


def measure(spark, sf_dir: str, name: str, reps: int) -> dict:
    """``SPARK_GRAFT_STOP_BELOW`` (seconds, optional): stop repeating once a
    CLEAN rep (steal ≤ 5%) lands under the floor — a short clean wall has
    neither a JIT tail nor a steal window worth re-measuring, so sweep
    drivers (tools/bench_prociso.py) don't pay double for the cheap 80%."""
    stop_below = float(os.environ.get("SPARK_GRAFT_STOP_BELOW", "0"))
    fn = B.QUERIES[name]
    out = {"reps": [], "rows": None}
    for _ in range(reps):
        _release_query_state(spark)
        s0 = _read_steal_jiffies()
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        wall = time.time() - t0
        sp = _steal_pct(s0, _read_steal_jiffies(), wall)
        out["reps"].append([round(wall, 3), round(sp, 1)])
        out["rows"] = n
        print(f"  [remeasure] {name} {wall:.1f}s steal={sp:.1f}% rows={n}",
              file=sys.stderr, flush=True)
        if stop_below and wall < stop_below and sp <= 5.0:
            break
    best = min(out["reps"], key=lambda r: r[0])
    out["wall"], out["steal_pct"] = best
    return out


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="remeasure", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    B.q_doc_stats(spark, sf_dir).count()  # warm JVM/Arrow init
    res = {n: measure(spark, sf_dir, n, reps) for n in names}
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus), "queries": res}))


if __name__ == "__main__":
    main()
