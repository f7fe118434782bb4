"""N→4N scaling evidence on the current VM (north rule: throughput
scaling efficiency >= 0.8 between cluster sizes N and 4N).

No real cluster exists in this sandbox, so the same job runs at two
local[] parallelism levels on the SAME input and we report throughput at
both + efficiency. Protocol learned the hard way (see BENCH.md):

  - every job runs TWICE per level and the SECOND (warm) time is kept —
    the first run pays JIT/codegen/footer-parse costs that swamp small
    jobs and fake super-linear speedups;
  - the 2→8 pair uses mid-size queries (feasible at 2 cores and large
    enough to dwarf scheduling overhead); the 8→32 pair uses the HEAVY
    pair-matrix queries (a 0.5 s job cannot evidence 32-way scaling);
  - the KG pipeline probe uses a 10k-file corpus at 8/32 only — the
    2k-file bench corpus is fixed-overhead-dominated at any width
    (CLAUDE.md: never judge N→4N on a small corpus);
  - run tools/cpu_probe.py FIRST: its 8→32 kernel efficiency is the
    hardware ceiling of this VM — quote Spark's 8→32 number against it,
    never against 1.0.

Each (cores, job) runs in a FRESH SparkSession (stop + new) so heap and
codegen state can't leak across levels.

Usage: python tools/scaling_probe_sf1.py [sf_dir]
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

MID_JOBS = [
    "lev_blocked_pairs",    # quadratic blocked similarity join
    "jaro_winkler_pairs",   # pandas-UDF kernel over the pair matrix
    "minhash_lsh_pairs",    # sig build + banded shuffle join
]
HEAVY_JOBS = [
    # tfidf_cosine_pairs was retired from this set in round 5: the round-4
    # dense-vector rewrite made it a ~13 s job at sf1, fixed-overhead-
    # dominated at any width (see the probe rule above — a job that small
    # cannot evidence 32-way scaling).
    "ufl_quality",               # 11-metric diagnostic over the pair matrix
    "similarity_flooding_docs",  # frontier propagation, 20.7M-row rounds
]


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def _timed_steal_aware(fn, max_reps: int = 2) -> tuple[float, float]:
    """(wall, steal_pct) of the best rep — re-measures when the window's
    hypervisor-steal share exceeds 5% (the bursty-host guard bench.py
    grew this round; scaling ratios are even more steal-sensitive than
    absolute walls since the two levels run minutes apart)."""
    from bench import _read_steal_jiffies, _steal_pct

    best = None
    for _ in range(max_reps):
        s0 = _read_steal_jiffies()
        t0 = time.time()
        fn()
        wall = time.time() - t0
        sp = _steal_pct(s0, _read_steal_jiffies(), wall)
        if best is None or wall < best[0]:
            best = (wall, sp)
        if sp <= 5.0:
            break
        print(f"  [probe] window stolen ({sp:.1f}%, {wall:.1f}s) — "
              "re-measuring", flush=True)
    return best


def run_level(cores: int, sf_dir: str, jobs: list[str],
              kg_files: int | None) -> dict[str, float]:
    spark = get_spark(app_name=f"scale{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    for name in jobs:
        _timed(lambda: B.QUERIES[name](spark, sf_dir).count())  # warm JIT
        # drop plan-canonical .cache() data from the warm run — otherwise
        # cached stages (e.g. minhash signatures) are skipped in the timed
        # run and the job under-reports its own work
        spark.catalog.clearCache()

        def _run(n=name):
            spark.catalog.clearCache()
            B.QUERIES[n](spark, sf_dir).count()

        wall, sp = _timed_steal_aware(_run)
        times[name] = round(wall, 3)
        times[f"{name}_steal_pct"] = round(sp, 1)
    if kg_files:
        from ontologymatching_spark.corpus.generator import generate_corpus
        from ontologymatching_spark.plans.checkpoint import CheckpointStore
        from ontologymatching_spark.plans.pipeline import KGPipeline

        src_files, _ = generate_corpus(
            n_repos=kg_files // 40, files_per_repo=40, seed=42
        )
        sf = spark.createDataFrame(src_files).repartition(64).cache()
        sf.count()
        from bench import _read_steal_jiffies, _steal_pct
        s0 = _read_steal_jiffies()
        t0 = time.time()
        out = KGPipeline(
            spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="scal_"))
        ).run(sf)
        n_triples = out["triples"].count()
        wall = time.time() - t0
        times["kg_pipeline"] = round(wall, 3)
        times["kg_triples_per_sec"] = round(n_triples / wall, 1)
        times["kg_pipeline_steal_pct"] = round(
            _steal_pct(s0, _read_steal_jiffies(), wall), 1)
    spark.stop()
    return times


def main(sf_dir: str) -> None:
    report = {"sf_dir": sf_dir, "runs": {}, "pairs": {}}

    for cores in (2, 8):
        print(f"== mid jobs local[{cores}] ==", flush=True)
        report["runs"][f"mid_{cores}"] = run_level(
            cores, sf_dir, MID_JOBS, kg_files=None
        )
        print(json.dumps(report["runs"][f"mid_{cores}"]), flush=True)
    for cores in (8, 32):
        print(f"== heavy jobs local[{cores}] ==", flush=True)
        report["runs"][f"heavy_{cores}"] = run_level(
            cores, sf_dir, HEAVY_JOBS, kg_files=10_000
        )
        print(json.dumps(report["runs"][f"heavy_{cores}"]), flush=True)

    def eff(lo: dict, hi: dict, ratio: float) -> dict:
        out = {}
        for k in lo:
            if k.endswith("_steal_pct"):
                continue
            if k.endswith("per_sec"):
                out[k] = round(hi[k] / lo[k] / ratio, 3)
            else:
                out[k] = round(lo[k] / hi[k] / ratio, 3)
        return out

    report["pairs"]["2->8"] = eff(
        report["runs"]["mid_2"], report["runs"]["mid_8"], 4.0
    )
    report["pairs"]["8->32"] = eff(
        report["runs"]["heavy_8"], report["runs"]["heavy_32"], 4.0
    )
    print("SCALING " + json.dumps(report), flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1")
