"""PRAMatcher subtree-pairing block keys.

Re-expresses the pair-enumeration core of the reference's PRAMatcher
(`agreementmaker/AgreementMaker-OSGi/Matcher-PRA/src/main/java/am/matcher/
pra/PRAMatcher/PRAMatcher.java:71-651`, VERDICT r04 missing item #2) as
DataFrame joins. The reference:

1. marks nodes matched from a prior alignment's nonzero-sim cells; a source
   node aligned to several targets keeps the LAST one scanned, i.e. the
   highest target index (`setMatchingPairs`, :246-277 — the overwrite loop);
2. DFS-cuts each ontology tree at matched nodes (`createPRATrees`,
   :407-480): every matched node becomes a subtree root and is REMOVED from
   its parent's child list, so each node belongs to the subtree of its
   nearest matched ancestor-or-self (or to its original root's unmatched
   subtree when no ancestor is matched);
3. re-matches within paired subtrees (`alignNodes`, :481-614): for every
   matched source root S, subtree(S) x subtree(matchedTo(S)); plus every
   unmatched source root subtree x every unmatched target root subtree —
   which unions to (all unmatched-partition source nodes) x (all
   unmatched-partition target nodes).

Spark-first design: "nearest matched ancestor-or-self" is an ancestor
closure WITH DISTANCE (level-by-level frontier, dist = level) joined to the
matched set and argmin-reduced per node — no recursion, no driver loops.
The block key is the root pair, so the downstream re-match is a plain
equi-join on the key; the unmatched bucket is returned separately so the
caller can route it through blocking.candidate_pairs' caps (the reference's
all-pairs behavior does not survive 100 TB; the matched blocks — the
novelty of PRA — do, because the prior alignment bounds block sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ancestor_closure_with_dist(
    parent_edges: DataFrame, max_levels: int = 30
) -> DataFrame:
    """(child_id, parent_id) → (node_id, anc_id, dist) with dist >= 1.
    Level-by-level frontier exactly like concept.ancestor_closure, but the
    level number is kept as the distance column (needed for nearest-matched
    argmin)."""
    edges = parent_edges.select(
        F.col("child_id").alias("node_id"), F.col("parent_id").alias("anc_id")
    ).dropDuplicates()
    frontier = edges.withColumn("dist", F.lit(1)).localCheckpoint(eager=False)
    levels = [frontier]
    for lvl in range(2, max_levels + 1):
        nxt = (
            frontier.join(
                edges.select(
                    F.col("node_id").alias("anc_id"),
                    F.col("anc_id").alias("next_anc"),
                ),
                "anc_id",
            )
            .select(
                "node_id",
                F.col("next_anc").alias("anc_id"),
                F.lit(lvl).alias("dist"),
            )
            .dropDuplicates(["node_id", "anc_id"])
        ).localCheckpoint(eager=False)  # materialized by the isEmpty probe
        if nxt.isEmpty():
            break
        frontier = nxt
        levels.append(frontier)
    out = levels[0]
    for f in levels[1:]:
        out = out.unionByName(f)
    # DAG: same ancestor at several distances → keep the SHORTEST (the DFS
    # cut happens at the first matched node on the path)
    return out.groupBy("node_id", "anc_id").agg(F.min("dist").alias("dist"))


def pra_subtree_roots(
    nodes: DataFrame,
    parent_edges: DataFrame,
    matched_ids: DataFrame,
    max_levels: int = 30,
    anc: DataFrame | None = None,
) -> DataFrame:
    """Per node, the root of the PRA subtree it falls in.

    ``nodes``: (node_id); ``matched_ids``: (node_id) of prior-alignment
    matched nodes. Returns (node_id, root_id) where root_id is the nearest
    matched ancestor-or-self (dist-argmin, tie-broken by smallest root_id
    for DAG safety), or NULL for nodes in the unmatched partition.
    ``anc``: optional precomputed (node_id, anc_id, dist) closure —
    pra_block_pairs computes ONE closure loop for both sides and passes
    each side's slice in (the loop is driver-latency-bound)."""
    ids = nodes.select("node_id")
    self_rows = ids.select(
        "node_id", F.col("node_id").alias("anc_id"), F.lit(0).alias("dist")
    )
    if anc is None:
        anc = ancestor_closure_with_dist(parent_edges, max_levels)
    anc = anc.unionByName(self_rows)
    m = matched_ids.select(F.col("node_id").alias("anc_id")).dropDuplicates()
    w = Window.partitionBy("node_id").orderBy(
        F.col("dist").asc(), F.col("anc_id").asc()
    )
    nearest = (
        anc.join(m, "anc_id", "semi")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("node_id", F.col("anc_id").alias("root_id"))
    )
    return ids.join(nearest, "node_id", "left")


def pra_block_pairs(
    src_nodes: DataFrame,
    dst_nodes: DataFrame,
    src_parent_edges: DataFrame,
    dst_parent_edges: DataFrame,
    alignment: DataFrame,
    max_levels: int = 30,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """PRA candidate-pair enumeration from a prior ``alignment``
    (src_id, dst_id, sim).

    Returns (matched_pairs, unmatched_src, unmatched_dst):

    - ``matched_pairs``: (src_id, dst_id, src_root, dst_root) — every pair
      inside a matched subtree block, i.e. src's nearest matched
      ancestor-or-self is S and dst's is matchedTo(S). This is the
      alignment-guided block join (PRAMatcher.java:557-614).
    - ``unmatched_src`` / ``unmatched_dst``: (node_id) of the unmatched
      partitions, for the caller to feed through
      ``blocking.candidate_pairs`` — the reference crosses them all-pairs
      (:510-535), which is kept out of this operator by design (CLAUDE.md:
      no uncapped quadratic blocks).
    """
    nz = alignment.filter(F.col("sim") != 0.0)
    matched_src = nz.select(F.col("src_id").alias("node_id")).dropDuplicates()
    matched_dst = nz.select(F.col("dst_id").alias("node_id")).dropDuplicates()
    # matchedTo = LAST target scanned, i.e. the max dst index
    # (setMatchingPairs' overwrite loop, :255-271)
    matched_to = nz.groupBy("src_id").agg(F.max("dst_id").alias("dst_root"))

    # ONE closure loop for both sides (the concept_match r6 treatment):
    # edges run under a (side, id) struct key — components are disjoint, so
    # the union closure is the union of the per-side closures — and each
    # side's slice feeds its pra_subtree_roots. Halves the driver-latency-
    # bound frontier loop.
    def _tag(edges, side):
        return edges.select(
            F.struct(
                F.lit(side).alias("s"), F.col("child_id").alias("i")
            ).alias("child_id"),
            F.struct(
                F.lit(side).alias("s"), F.col("parent_id").alias("i")
            ).alias("parent_id"),
        )

    anc_all = ancestor_closure_with_dist(
        _tag(src_parent_edges, 0).unionByName(_tag(dst_parent_edges, 1)),
        max_levels,
    ).localCheckpoint(eager=False)

    def _side(side):
        return anc_all.filter(F.col("node_id.s") == side).select(
            F.col("node_id.i").alias("node_id"),
            F.col("anc_id.i").alias("anc_id"),
            "dist",
        )

    roots_s = pra_subtree_roots(
        src_nodes, src_parent_edges, matched_src, max_levels, anc=_side(0)
    )
    roots_d = pra_subtree_roots(
        dst_nodes, dst_parent_edges, matched_dst, max_levels, anc=_side(1)
    )

    s_part = roots_s.filter(F.col("root_id").isNotNull()).select(
        F.col("node_id").alias("src_id"), F.col("root_id").alias("src_root")
    )
    d_part = roots_d.filter(F.col("root_id").isNotNull()).select(
        F.col("node_id").alias("dst_id"), F.col("root_id").alias("dst_root")
    )
    matched_pairs = (
        s_part.join(
            matched_to.withColumnRenamed("src_id", "src_root"), "src_root"
        )
        .join(d_part, "dst_root")
        .select("src_id", "dst_id", "src_root", "dst_root")
    )
    unmatched_src = roots_s.filter(F.col("root_id").isNull()).select("node_id")
    unmatched_dst = roots_d.filter(F.col("root_id").isNull()).select("node_id")
    return matched_pairs, unmatched_src, unmatched_dst
