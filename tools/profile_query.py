"""Per-query stage/operator profiler (guide §1: measure first).

Runs named bench queries in a UI-enabled session and, after each run, pulls
the Spark REST API for (a) completed stages sorted by executor run time and
(b) the SQL node metrics of the query's execution, so each second of wall
is attributed to a concrete operator (Exchange, HashAggregate, Window,
ArrowEvalPython, ...) instead of guessed at.

Usage: python tools/profile_query.py <sf_dir> <q1,q2,...> [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _release_query_state  # noqa: E402
from ontologymatching_spark import benchqueries as B  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def _ui_base(spark) -> str:
    return f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}/api/v1"


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from pyspark.sql import SparkSession

    from ontologymatching_spark import session as S

    # UI-enabled clone of the bench session (same configs otherwise)
    orig = S.get_spark

    def patched(*a, **k):
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        b = SparkSession.builder.master(f"local[{cpus}]").appName("profile")
        for key, val in [
            ("spark.sql.shuffle.partitions", str(cpus)),
            ("spark.sql.adaptive.enabled", "true"),
            ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
            ("spark.sql.adaptive.skewJoin.enabled", "true"),
            ("spark.sql.execution.arrow.pyspark.enabled", "true"),
            ("spark.sql.execution.arrow.maxRecordsPerBatch", "10000"),
            ("spark.sql.session.timeZone", "UTC"),
            ("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g")),
            ("spark.ui.enabled", "true"),
            ("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)),
            ("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024)),
            ("spark.sql.parquet.compression.codec", "zstd"),
            ("spark.io.compression.codec", "zstd"),
            ("spark.ui.showConsoleProgress", "false"),
        ]:
            b = b.config(key, val)
        return b.getOrCreate()

    S.get_spark = patched
    spark = patched()
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    base = _ui_base(spark)

    # warm JVM/Arrow once so rep walls measure the plan
    B.q_doc_stats(spark, sf_dir).count()

    for name in names:
        fn = B.QUERIES[name]
        walls = []
        for rep in range(reps):
            _release_query_state(spark)
            before = {s["stageId"] for s in _get(f"{base}/applications/{app_id}/stages")}
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            wall = time.time() - t0
            walls.append(wall)
            stages = [
                s for s in _get(f"{base}/applications/{app_id}/stages?status=COMPLETE")
                if s["stageId"] not in before
            ]
            if rep < reps - 1:
                continue
            stages.sort(key=lambda s: -s.get("executorRunTime", 0))
            tot_run = sum(s.get("executorRunTime", 0) for s in stages)
            print(f"\n=== {name} walls={[round(w, 2) for w in walls]} rows={n} "
                  f"stages={len(stages)} executorRunTime_total={tot_run/1000:.1f}s")
            for s in stages[:14]:
                nm = s["name"].split("\n")[0][:90]
                print(f"  stage {s['stageId']:>4} run={s['executorRunTime']/1000:7.2f}s "
                      f"tasks={s['numCompleteTasks']:>4} "
                      f"in={s.get('inputBytes', 0)/1e6:8.1f}MB "
                      f"sr={s.get('shuffleReadBytes', 0)/1e6:8.1f}MB "
                      f"sw={s.get('shuffleWriteBytes', 0)/1e6:8.1f}MB  {nm}")
            # longest pure-JVM gaps show up as few-task stages; also surface
            # driver-side gaps: sum of stage run times vs wall
            print(f"  wall={min(walls):.2f}s best, stage-run-sum={tot_run/1000:.1f}s "
                  f"(over {os.environ.get('SPARK_GRAFT_CPUS', '32')} cores)")

    spark.stop()


if __name__ == "__main__":
    main()
