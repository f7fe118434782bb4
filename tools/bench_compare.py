"""Compare two bench JSON records query-by-query (e.g. r4 vs r5 sf1).

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]
Prints a sorted table of walls + ratios and a summary line with the
common-query sums (the cross-round comparator BENCH.md uses — suite
totals are not comparable when the registry changed).
"""

from __future__ import annotations

import json
import sys


def main(old_path: str, new_path: str, top_n: int = 100) -> None:
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq), key=lambda k: -nq[k])
    print(f"{'query':35s} {'old':>8s} {'new':>8s} {'ratio':>6s}")
    for k in common[:top_n]:
        r = nq[k] / oq[k] if oq[k] else float("inf")
        print(f"{k:35s} {oq[k]:8.1f} {nq[k]:8.1f} {r:6.2f}")
    so, sn = sum(oq[k] for k in common), sum(nq[k] for k in common)
    print(
        f"\ncommon {len(common)} queries: old {so:.1f}s new {sn:.1f}s "
        f"ratio {sn / so:.2f}"
    )
    only_new = sorted(set(nq) - set(oq), key=lambda k: -nq[k])
    if only_new:
        print("new-only:", {k: round(nq[k], 1) for k in only_new})


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 100)
