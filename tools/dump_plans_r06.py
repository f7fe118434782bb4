"""Dump explain('formatted') for the round-6 touched queries.

Usage: python tools/dump_plans_r06.py <out_dir> <suffix> [q1,q2,...]
Writes <out_dir>/<query>_<suffix>.txt per query. Run once from the
round-start tree (suffix=before) and once from the optimized tree
(suffix=after); the streaming queries execute side effects at build time,
so their plans reflect the final (post-stream) aggregate — noted inline.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ontologymatching_spark import benchqueries as B  # noqa: E402
from ontologymatching_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

DEFAULT = (
    "asm_content_words,ufl_quality,ufl_propagation,disagreement_variance,"
    "contamination_check,stratified_mix,jaro_winkler_pairs,lev_blocked_pairs,"
    "qgram_jaccard_pairs,tfidf_cosine_pairs,lwc_combine,lwc_sigmoid,"
    "minhash_lsh_pairs,minhash_cc_clusters,ann_lsh_topk,ann_ivf_topk,"
    "ann_lsh_buckets,embedding_topk,embedding_neardup,skipgram_neg,"
    "joslyn_distance_quality,concept_match,pra_block_pairs,"
    "completion_anti_join,pr_evaluation,mutual_best_selection,"
    "one_to_one_full,connected_components,streaming_sessionize"
)


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = (sys.argv[3] if len(sys.argv) > 3 else DEFAULT).split(",")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        try:
            df = B.QUERIES[name](spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # keep dumping the rest
            text = f"EXPLAIN FAILED: {exc}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
