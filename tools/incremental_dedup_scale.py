"""Incremental-vs-full measurement for the dedup/ANN maintenance plan
(plans/incremental_dedup.py), the same harness shape as the r4 incremental
KG measurement: build a v1 snapshot store, mutate a small fraction of the
corpus, then time the incremental run against a from-scratch rebuild on v2
and report the reuse stats. Steal-guarded (min of reps with per-rep steal
printed) per the repo's measurement protocol.

Usage: python tools/incremental_dedup_scale.py [sf_dir] [diff_frac] [reps]
Defaults: /root/repo/scaledata/sf1 (100k docs / 100k vectors), 0.01, 2.
Prints one JSON line with walls + stats.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _read_steal_jiffies, _release_query_state, _steal_pct  # noqa: E402
from ontologymatching_spark.plans.checkpoint import CheckpointStore  # noqa: E402
from ontologymatching_spark.plans.incremental_dedup import (  # noqa: E402
    IncrementalDedupPlan,
)
from ontologymatching_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402


def _timed(spark, fn, reps: int):
    walls = []
    for _ in range(reps):
        _release_query_state(spark)
        s0 = _read_steal_jiffies()
        t0 = time.time()
        out = fn()
        wall = time.time() - t0
        sp = _steal_pct(s0, _read_steal_jiffies(), wall)
        walls.append((round(wall, 2), round(sp, 1)))
        print(f"  rep {wall:.1f}s steal={sp:.1f}%", file=sys.stderr, flush=True)
    return walls, min(w for w, _ in walls)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1"
    diff_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="inc_dedup_scale", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n = docs.count()
    # v2 = v1 with ~diff_frac of docs rewritten (md5-deterministic pick) +
    # 0.1*diff_frac new docs appended
    pick = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(int(1 / diff_frac))) == 0
    v2 = docs.withColumn(
        "text",
        F.when(pick, F.concat(F.col("text"), F.lit(" v2 edit token"))).otherwise(
            F.col("text")
        ),
    )
    n_changed_docs = docs.filter(pick).count()

    roots = [tempfile.mkdtemp(prefix=f"idsc_{i}_") for i in range(3 + reps)]
    try:
        print(f"[v1 full build: {n} docs]", file=sys.stderr, flush=True)
        v1_store = CheckpointStore(spark, roots[0])
        out1 = IncrementalDedupPlan(spark, v1_store).full_minhash(docs)
        out1["mh_clusters"].count()

        print("[full rebuild on v2]", file=sys.stderr, flush=True)

        def _full():
            root = tempfile.mkdtemp(prefix="idsc_f_")
            try:
                p = IncrementalDedupPlan(spark, CheckpointStore(spark, root))
                return p.full_minhash(v2)["mh_clusters"].count()
            finally:
                shutil.rmtree(root, ignore_errors=True)

        full_walls, full_best = _timed(spark, _full, reps)

        print("[incremental on v2]", file=sys.stderr, flush=True)
        stats = {}

        def _inc():
            root = tempfile.mkdtemp(prefix="idsc_i_")
            try:
                p = IncrementalDedupPlan(
                    spark, CheckpointStore(spark, root), prev_store=v1_store
                )
                cnt = p.run_minhash(v2)["mh_clusters"].count()
                stats.update(p.last_stats or {})
                return cnt
            finally:
                shutil.rmtree(root, ignore_errors=True)

        inc_walls, inc_best = _timed(spark, _inc, reps)

        print(json.dumps({
            "sf_dir": sf_dir,
            "n_docs": n,
            "n_docs_changed_expected": n_changed_docs,
            "stats": stats,
            "full_rebuild_s": full_best,
            "incremental_s": inc_best,
            "speedup": round(full_best / inc_best, 2) if inc_best else None,
            "full_reps": full_walls,
            "inc_reps": inc_walls,
        }))
    finally:
        for r in roots:
            shutil.rmtree(r, ignore_errors=True)


if __name__ == "__main__":
    main()
