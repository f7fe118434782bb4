"""N->4N scaling evidence for the sf1 suite's two heaviest iterative
queries (VERDICT r03 next-round #8): one_to_one_full and
similarity_flooding_docs at local[2] vs local[8] — the probe pair inside
this VM's linear region (tools/cpu_probe.py: 2->8 kernel ceiling ~0.82,
8->32 host-capped ~0.72).

Protocol deltas vs scaling_probe_sf1.py, both deliberate:

- the JIT warm-up runs at sf0.1 (10x less work): these jobs are 40s-10min,
  so paying a second full sf1 run per level buys nothing — codegen/JIT
  constants are amortized over minutes, and the warm-up still compiles
  every stage shape the sf1 run uses;
- each level also emits an ORDER-INDEPENDENT output checksum computed
  engine-side (sum of md5-derived BIGINTs over the row strings + row
  count, no driver collect) so the "identical output at both levels"
  claim is part of the recorded evidence, not an assumption.

Usage: python tools/scaling_probe_big2.py [sf1_dir] [sf01_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ontologymatching_spark import benchqueries as B  # noqa: E402
from ontologymatching_spark.session import get_spark  # noqa: E402

JOBS = ["one_to_one_full", "similarity_flooding_docs"]


def checksum(df) -> tuple[int, int]:
    row = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])
    # sum 60-bit hashes as decimal(38,0): a long sum overflows ANSI mode
    # past ~2^4 rows of 2^59-scale values; decimal is exact + order-free
    h = F.conv(F.substring(F.md5(row), 1, 15), 16, 10).cast("decimal(38,0)")
    r = df.select(
        F.sum(h).alias("c"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return int(r["c"]), int(r["n"])


def run_level(cores: int, sf1: str, sf01: str) -> dict:
    spark = get_spark(app_name=f"big2_{cores}", master=f"local[{cores}]")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}
    for name in JOBS:
        B.QUERIES[name](spark, sf01).count()  # sf0.1 JIT/codegen warm-up
        spark.catalog.clearCache()
        t0 = time.time()
        c, n = checksum(B.QUERIES[name](spark, sf1))
        out[name] = round(time.time() - t0, 3)
        out[f"{name}_checksum"] = f"{c}:{n}"
        print(f"  local[{cores}] {name}: {out[name]}s rows={n}", flush=True)
    spark.stop()
    return out


def main(sf1: str, sf01: str) -> None:
    report = {"sf1": sf1, "runs": {}, "pairs": {}}
    for cores in (2, 8):
        print(f"== local[{cores}] ==", flush=True)
        report["runs"][str(cores)] = run_level(cores, sf1, sf01)
    lo, hi = report["runs"]["2"], report["runs"]["8"]
    for name in JOBS:
        assert lo[f"{name}_checksum"] == hi[f"{name}_checksum"], (
            name, lo[f"{name}_checksum"], hi[f"{name}_checksum"])
        report["pairs"][name] = round(lo[name] / hi[name] / 4.0, 3)
    print("SCALING_BIG2 " + json.dumps(report), flush=True)


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1",
        sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1",
    )
