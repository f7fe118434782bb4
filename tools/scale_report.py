"""Compare two bench.py JSON outputs (small SF vs big SF) and report
per-query scaling ratios against each query's EXPECTED work growth.

Expected work model (docs ×S, with the driver's fixed 31-word vocab the
cross-side blocked pair count grows ~S²):
  - 'pairs' queries (blocked similarity joins, matrices over pairs): S²
  - everything else (scans, per-row transforms, linear joins/aggs): S

A query is flagged when wall-time ratio > FLAG_FACTOR × expected-work
ratio — the VERDICT's "no query >3× its data-size ratio" bar, applied to
the right exponent per query family.

Usage: python tools/scale_report.py small.json big.json [scale]
"""

from __future__ import annotations

import json
import sys

FLAG_FACTOR = 3.0

# queries whose dominant term is the cross-side blocked pair count
QUADRATIC = {
    "lev_blocked_pairs", "qgram_jaccard_pairs", "tfidf_cosine_pairs",
    "mutual_best_selection", "jaro_winkler_pairs", "lwc_combine",
    "local_confidence", "alignment_delta", "one_to_one_full",
    "asm_sorted_token_match", "sigmoid_rescale", "lwc_sigmoid",
    "mediating_join", "completion_anti_join", "best_match_boost",
    "iism_boosted_pairs", "iism_subprop_union", "structural_boost",
    "order_preservation",
    "similarity_flooding_docs", "disagreement_variance", "ufl_quality",
    "ufl_propagation", "fs_extrapolation", "joslyn_distance_quality",
    "bsm_cascade", "hierarchy_mappings", "pr_evaluation",
    "instance_linking", "lexicon_match", "salted_exact_join",
    "ngram_jaccard_dedup",
}


def main(small_path: str, big_path: str, scale: float = 10.0) -> int:
    small = json.load(open(small_path))
    big = json.load(open(big_path))
    qs, qb = small["queries"], big["queries"]
    rows = []
    flagged = 0
    for name in qb:
        if name not in qs:
            continue
        t0, t1 = max(qs[name], 0.05), qb[name]
        ratio = t1 / t0
        expected = scale * scale if name in QUADRATIC else scale
        bar = FLAG_FACTOR * expected
        flag = ratio > bar
        flagged += flag
        rows.append((name, t0, t1, ratio, expected, flag))
    rows.sort(key=lambda r: -(r[3] / r[4]))
    print(f"{'query':30s} {'small':>8s} {'big':>9s} {'ratio':>8s} "
          f"{'expect':>7s} flag")
    for name, t0, t1, ratio, expected, flag in rows:
        print(f"{name:30s} {t0:8.2f} {t1:9.2f} {ratio:8.1f}x "
              f"{expected:6.0f}x {'<<< FLAG' if flag else ''}")
    print(f"\ntotal: small={small['value']}s big={big['value']}s "
          f"ratio={big['value'] / small['value']:.1f}x; "
          f"{flagged} queries over {FLAG_FACTOR}x their expected-work ratio")
    return 1 if flagged else 0


if __name__ == "__main__":
    sc = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    sys.exit(main(sys.argv[1], sys.argv[2], sc))
