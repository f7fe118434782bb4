"""N→4N scaling evidence on the current VM (north rule: throughput
scaling efficiency >= 0.8 between cluster sizes N and 4N).

No real cluster exists in this sandbox, so the same job runs at two
local[] parallelism levels on the SAME input and we report throughput at
both + efficiency. Two candidate pairs are measured:

  - 2 -> 8 cores: inside the CPU probe's linear region on every VM seen
    so far (tools/cpu_probe.py first); the clean evidence.
  - 8 -> 32 cores: the full-width pair; on host-capped VMs the probe
    itself shows the ceiling, so efficiency here is reported WITH the
    probe efficiency as context (never compare against a different VM).

Representative jobs: one quadratic pair-matrix query (ufl_quality), one
linear scan+agg (pricing_summary), one shuffle-heavy dedup
(minhash_lsh_pairs), and the KG pipeline itself.

Each (cores, job) runs in a FRESH SparkSession (stop + new), one at a
time, so JVM heap state from the wide run can't pollute the narrow run.

Usage: python tools/scaling_probe_sf1.py [sf_dir] [pairs]
  pairs: comma list like "2:8,8:32" (default)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontologymatching_spark import benchqueries as B  # noqa: E402
from ontologymatching_spark.session import get_spark  # noqa: E402

JOBS = [
    "pricing_summary",      # linear scan+agg (lineitem 6M rows)
    "lev_blocked_pairs",    # quadratic blocked similarity join
    "jaro_winkler_pairs",   # pandas-UDF kernel over the pair matrix
    "minhash_lsh_pairs",    # sig build + banded shuffle join
]


def run_at(cores: int, sf_dir: str, include_kg: bool) -> dict[str, float]:
    spark = get_spark(app_name=f"scale{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    # warm JVM/code paths once so measurements exclude first-call JIT
    B.q_doc_stats(spark, sf_dir).count()
    for name in JOBS:
        t0 = time.time()
        B.QUERIES[name](spark, sf_dir).count()
        times[name] = round(time.time() - t0, 3)
    if include_kg:
        from ontologymatching_spark.corpus.generator import generate_corpus
        from ontologymatching_spark.plans.checkpoint import CheckpointStore
        from ontologymatching_spark.plans.pipeline import KGPipeline

        src_files, _ = generate_corpus(n_repos=100, files_per_repo=20,
                                       seed=42)
        sf = spark.createDataFrame(src_files).repartition(32).cache()
        sf.count()
        t0 = time.time()
        out = KGPipeline(
            spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="scal_"))
        ).run(sf)
        n_triples = out["triples"].count()
        wall = time.time() - t0
        times["kg_pipeline"] = round(wall, 3)
        times["kg_triples_per_sec"] = round(n_triples / wall, 1)
    spark.stop()
    return times


def main(sf_dir: str, pairs: list[tuple[int, int]]) -> None:
    cores_needed = sorted({c for p in pairs for c in p})
    results = {}
    for c in cores_needed:
        print(f"== local[{c}] ==", flush=True)
        results[c] = run_at(c, sf_dir, include_kg=True)
        print(json.dumps(results[c]), flush=True)
    report = {"sf_dir": sf_dir, "runs": {str(c): r for c, r in results.items()},
              "pairs": {}}
    for lo, hi in pairs:
        eff = {}
        for k in results[lo]:
            if k.endswith("per_sec"):
                eff[k] = round(results[hi][k] / results[lo][k] / (hi / lo), 3)
            else:
                eff[k] = round(
                    results[lo][k] / results[hi][k] / (hi / lo), 3
                )
        report["pairs"][f"{lo}->{hi}"] = eff
    print("SCALING " + json.dumps(report))


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1"
    raw = sys.argv[2] if len(sys.argv) > 2 else "2:8,8:32"
    prs = [tuple(int(x) for x in p.split(":")) for p in raw.split(",")]
    main(sf_dir, prs)
