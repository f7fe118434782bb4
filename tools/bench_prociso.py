"""Process-isolated bench sweep: every registered query in its OWN python
process (fresh JVM, fresh session), min-of-reps with the in-process JIT
floor (a first rep ≥ SPARK_GRAFT_STOP_BELOW repeats once; a clean short
rep stops early).

Why this exists (BENCH.md round-5): on a one-disk box, in-suite walls of
shuffle/checkpoint-heavy queries carry 2.2–3.1× residue that NEITHER
clearCache/state release NOR a fresh SparkSession clears — and a shared
multi-query measurement session reproduces the same effect internally
(asm_content_words 179.3 s mid-session vs 78.0 s alone). Process-level
separation is the only instrument whose per-query walls match the
standalone-evidence protocol, so this sweep is the definitive per-query
record; its TOTAL is not comparable to in-suite totals (spin-up is
untimed, inter-query interference is absent by construction).

Usage: python tools/bench_prociso.py [sf_dir] [out_json] [name1,name2,...]
Emits one bench-shaped JSON line (also written to out_json if given):
  {"metric": "prociso_query_runtime", "value": <sum>, "unit": "sec",
   "queries": {...}, "steal_pct": {...}, "sf": ..., "protocol": ...}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontologymatching_spark import benchqueries as B  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main(sf_dir: str, out_path: str | None,
         only: list[str] | None = None) -> None:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_STOP_BELOW", "15")
    walls: dict[str, float] = {}
    steals: dict[str, float] = {}
    for name in (only or B.QUERIES):
        try:
            r = subprocess.run(
                [sys.executable, os.path.join(HERE, "standalone_remeasure.py"),
                 sf_dir, name, "2"],
                capture_output=True, text=True, env=env, timeout=1800,
            )
        except subprocess.TimeoutExpired:
            # record the timeout and keep sweeping — an unhandled raise
            # discarded every previously measured query (ADVICE r05)
            print(f"  [prociso] {name} TIMEOUT (1800s)",
                  file=sys.stderr, flush=True)
            walls[name] = -1.0
            steals[name] = -1.0
            continue
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"  [prociso] {name} FAILED:\n{r.stderr[-2000:]}",
                  file=sys.stderr, flush=True)
            walls[name] = -1.0
            steals[name] = -1.0
            continue
        q = json.loads(line[-1])["queries"][name]
        walls[name] = q["wall"]
        steals[name] = q["steal_pct"]
        print(f"  [prociso] {name} {q['wall']:.1f}s "
              f"steal={q['steal_pct']:.1f}% reps={len(q['reps'])}",
              file=sys.stderr, flush=True)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    rec = {
        "metric": "prociso_query_runtime",
        "value": round(sum(w for w in walls.values() if w > 0), 3),
        "unit": "sec",
        "queries": walls,
        "steal_pct": steals,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "protocol": "one process per query, min-of-reps, "
                    "JIT-floor rep, steal-guarded",
    }
    line = json.dumps(rec)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/repo/scaledata/sf1",
        sys.argv[2] if len(sys.argv) > 2 else None,
        sys.argv[3].split(",") if len(sys.argv) > 3 else None,
    )
