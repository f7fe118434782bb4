"""Dump formatted physical plans of the headline operators into PLANS.md —
the 'is this the plan you'd want at 100 TB' audit (predicate pushdown reaches
the scan, small sides broadcast, windows use WindowGroupLimit, UDF stages are
ArrowEvalPython not BatchEvalPython)."""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from ontologymatching_spark import benchqueries as B
from ontologymatching_spark.session import get_spark

SF = "/root/testdata/sf0.01"

AUDITS = {
    "pricing_summary": "filter pushed to parquet scan (PushedFilters), partial+final agg, no shuffle before partial agg",
    "top_revenue_orders": "customer broadcast, agg before join on lineitem side",
    "topk_orders_per_customer": "WindowGroupLimit prunes before the full sort",
    "lev_blocked_pairs": "equi-join on block_key (no cross join), levenshtein inside WholeStageCodegen",
    "tfidf_cosine_pairs": "vocab-adaptive dense path (dictionary-sized vocab): per-doc fixed-width vectors broadcast into the blocked-pair join, dot product = zip_with fold in codegen, ZERO pair-x-term rows; sparse inverted term join kept for real vocabularies",
    "minhash_lsh_pairs": "band equi-join (no cross join), signature compute cached once",
    "embedding_topk": "probe side broadcast (BroadcastNestedLoopJoin BuildLeft/Right on the 20-row side), scan prunes columns",
    "dedup_exact": "single shuffle (groupBy fp), md5 computed in codegen",
    "ngram_jaccard_dedup": "singleton blocks pruned BEFORE shingling (agg + semi-join shape), then equi-join on bk — no cross join, no grams for lone docs",
    "embedding_neardup": "bucket equi-join (pair count driven by bucket size, not corpus size), cosine in codegen via zip_with/aggregate",
    "disagreement_variance": "pure projection over the blocked join — variance entirely inside WholeStageCodegen, no UDF, no extra shuffle",
    "hierarchy_mappings": "two equi-joins on parent edges + union + dedup shuffle; alignment side reusable/broadcastable",
    "alignment_delta": "full-outer sort-merge join on the pair key, status from null flags in codegen",
    "order_preservation": "self-join restricted to the (small, post-selection) alignment; ancestor lookups as broadcast left joins; single agg row out",
    "matrix_gram": "relational matmul: equi-join on the contracted key (no cross join), partial+final agg on (row,col) — pair-table sparsity means cost is |A| x fanout, never n^2",
    "ufl_quality": "matrix checkpointed once before the ~10-branch metric fan-out; SimilarityDistance = two window passes (sorted-adjacent-diff min), NO self-join; scalar normalizers are one-row aggs broadcast back; all metric arithmetic in codegen",
    "ann_ivf_topk": "centroids broadcast into the assignment; narrow checkpointed (vec_id,cid,rk) read by both probe and cell branches; candidate pairs from the salted cell equi-join (no cross join over the corpus); cosine in codegen; WindowGroupLimit top-k",
    "ufl_propagation": "tiny validated-signature train set broadcast into ONE cross join with the (checkpointed) pair matrix; argmin via a single partial+final min(struct) agg on narrow rows; per-cell update arithmetic (log delta, clamps) entirely in codegen; the wide matrix never shuffles",
    "iism_subprop_union": "both certainty rules are equi-joins blocked by parent/union ids (sub-set cross pairs bounded by tiny per-parent blocks); remainder rank-zip = per-parent-pair windows; union-rule row/col maxima are single groupBys on narrow pair rows",
    "skipgram_neg": "examples built by token/sequence explodes + broadcast CDF range join (doc text never shuffles); per round: two broadcast weight joins, sigmoid factor in codegen, gradient = ONE groupBy(word_id) with per-dim sums (no posexplode row multiplication); vocab-sized weight table localCheckpointed per round; vocab rank+CDF windows are hashpartitioning(pid) after repartitionByRange — NO SinglePartition exchange (2^-20-grid CDF makes the per-partition/carry decomposition bit-exact)",
    "similarity_flooding_docs": "PCG built pairs-first with broadcast edge maps + broadcast to-candidate existence join (never pairs x pairs); connected state is the only per-round materialization; isolated pairs never shuffle — driver-replayed normalization max + unrolled-recurrence scans",
    "connected_components": "large-star/small-star: per round two groupBy(min)+join shuffles over the (shrinking) edge set, convergence via one fused count+bit_xor agg; O(log n) rounds regardless of component diameter",
    "asm_content_words": "nonContent state machine entirely in array HOFs (no shuffle before the block equi-join); block key = first letter x 16-way salt (src pmod-salted, dst replicated: 26 keys -> 416, join parallelism no longer capped at the letter count — VERDICT r04 weak #2; pair set identical to the unsalted join so the DuckDB twin is unchanged); kernel grid bounded at max_tokens^2 cells per pair and built IN-ROW by nested transforms when the kernel is a JVM expression (row_kernel=True: no posexplode, no groupBy — ZERO shuffles after the block join); greedy 1-1 = sort_array + F.aggregate bitmask fold on exact 1e-6-grid longs, all whole-stage codegen (the applyInPandas cut paid ~1ms/group x 518k pair-groups); computeValue weight switch = literal CASE chain in codegen",
    "one_to_one_full": "per round: two window shuffles over the logically-shrinking remainder + broadcast hash anti-joins of the tiny checkpointed best (remainder re-checkpointed every 3rd round only — no 20M-row write per round); mutual-best fixpoint == greedy, O(log) rounds",
}


def main() -> None:
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — formatted physical plans of headline operators\n",
        "Generated by tools/explain_plans.py (re-run after plan-affecting "
        "changes). Audit notes state what the plan must show to be the one "
        "we'd want at 100 TB.\n",
    ]
    for name, audit in AUDITS.items():
        df = B.QUERIES[name](spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree + first scan details; truncate the long tail
        head, _, tail = plan.partition("\n\n(1)")
        scan_part = ("\n\n(1)" + tail.split("\n\n(")[0]) if tail else ""
        out.append(f"## {name}\n\n**Audit:** {audit}\n\n```\n{head}{scan_part}\n```\n")
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
