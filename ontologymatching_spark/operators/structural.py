"""Structural refinement matchers over the code graph (SURVEY.md §2.8):

  DSI — DescendantsSimilarityInheritance (dsi/DescendantsSimilarity
        InheritanceMatcher.java:63-185): sim' = MCP*sim + (1-MCP)*
        avg_over_src_parents(max_over_dst_parents(parent_sim)). The reference
        recurses with memoization over the DAG; here each level is one pass
        of joins (SURVEY.md §4: process levels in a bounded loop).

  SSC — SiblingsSimilarityContribution (ssc/SiblingsSimilarityContribution
        Matcher.java:77-117): blend in the average similarity of the two
        nodes' sibling sets.

  SF  — SimilarityFlooding (structuralMatchers/SimilarityFlooding.java:
        34-47,375-447,472-575): Melnik fixpoint over the pairwise
        connectivity graph, propagation coefficient = 1/out-degree per
        predicate, ROUND_MAX=10, normalize by global max each round,
        converge on max-delta. DataFrame self-join loop with localCheckpoint
        per round to cut lineage.

Edges here are (child_id, parent_id, pred) — in the code graft, `declares`
(module→entity, used inverted as the parent link) and resolved `imports`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parent_edges_from_triples(triples: DataFrame, entities: DataFrame) -> DataFrame:
    """declares triples → (child_id, parent_id): entity's parent is its
    module. Ids resolved through the entities table (uri → entity_id)."""
    ids = entities.select("uri", "entity_id")
    decl = triples.filter(F.col("pred") == "declares").select(
        F.col("subj").alias("parent_uri"), F.col("obj").alias("child_uri")
    )
    return (
        decl.join(ids.withColumnRenamed("uri", "child_uri"), "child_uri")
        .withColumnRenamed("entity_id", "child_id")
        .join(
            ids.withColumnRenamed("uri", "parent_uri").withColumnRenamed(
                "entity_id", "parent_id"
            ),
            "parent_uri",
        )
        .select("child_id", "parent_id")
    )


def dsi(
    pairs: DataFrame,
    src_parents: DataFrame,
    dst_parents: DataFrame,
    mcp: float = 0.75,
) -> DataFrame:
    """pairs(src_id, dst_id, sim) + parent edges → pairs with sim_dsi.

    MCP (main contribution percentage) weighs the node's own sim; the rest
    comes from the best-aligned parents (recursiveDSI:110)."""
    p = pairs.select("src_id", "dst_id", "sim")
    sp = src_parents.select(
        F.col("child_id").alias("src_id"), F.col("parent_id").alias("s_parent")
    )
    dp = dst_parents.select(
        F.col("child_id").alias("dst_id"), F.col("parent_id").alias("d_parent")
    )
    psim = p.select(
        F.col("src_id").alias("s_parent"),
        F.col("dst_id").alias("d_parent"),
        F.col("sim").alias("parent_sim"),
    )
    # per (pair, src-parent): best-matching dst-parent similarity; a parent
    # with NO aligned counterpart in the matrix stays NULL (neutral) rather
    # than 0 — in our kind-gated matrix module parents are often absent, and
    # the reference's recursion simply has no cell to read there
    per_sparent = (
        p.join(sp, "src_id")
        .join(dp, "dst_id")
        .join(psim, ["s_parent", "d_parent"], "left")
        .groupBy("src_id", "dst_id", "s_parent")
        .agg(F.max(F.col("parent_sim")).alias("best"))
    )
    contrib = per_sparent.groupBy("src_id", "dst_id").agg(
        F.avg("best").alias("parent_contrib")  # avg ignores NULLs
    )
    return (
        p.join(contrib, ["src_id", "dst_id"], "left")
        .withColumn(
            "sim_dsi",
            F.round(
                F.lit(mcp) * F.col("sim")
                + (1 - mcp) * F.coalesce(F.col("parent_contrib"), F.col("sim")),
                12,
            ),
        )
        .select("src_id", "dst_id", "sim", "sim_dsi")
    )


def ssc(
    pairs: DataFrame,
    src_parents: DataFrame,
    dst_parents: DataFrame,
    weight: float = 0.25,
) -> DataFrame:
    """Sibling contribution: avg sim over aligned sibling pairs (children of
    the two parents, excluding the pair itself), blended at ``weight``."""
    p = pairs.select("src_id", "dst_id", "sim")
    sp = src_parents.select(
        F.col("child_id").alias("src_id"), F.col("parent_id").alias("s_parent")
    )
    dp = dst_parents.select(
        F.col("child_id").alias("dst_id"), F.col("parent_id").alias("d_parent")
    )
    # sibling pair sims grouped by (s_parent, d_parent)
    fam = p.join(sp, "src_id").join(dp, "dst_id")
    fam_stats = fam.groupBy("s_parent", "d_parent").agg(
        F.sum("sim").alias("fam_sum"), F.count("*").alias("fam_n")
    )
    out = (
        fam.join(fam_stats, ["s_parent", "d_parent"])
        .withColumn(
            "sib_avg",
            F.when(
                F.col("fam_n") > 1,
                (F.col("fam_sum") - F.col("sim")) / (F.col("fam_n") - 1),
            ).otherwise(F.col("sim")),
        )
        .withColumn(
            "sim_ssc",
            F.round((1 - weight) * F.col("sim") + weight * F.col("sib_avg"), 12),
        )
        # a pair may have several parent combos (multi-parent DAGs): take max
        .groupBy("src_id", "dst_id")
        .agg(F.max("sim_ssc").alias("sim_ssc"), F.first("sim").alias("sim"))
    )
    return p.join(out.select("src_id", "dst_id", "sim_ssc"), ["src_id", "dst_id"], "left").withColumn(
        "sim_ssc", F.coalesce(F.col("sim_ssc"), F.col("sim"))
    )


# Inflow contributions are quantized onto a 2^-40 binary grid before the
# groupBy sum: every term becomes an exact multiple of 2^-40, so partial sums
# (bounded well under 2^13) are EXACT doubles in ANY addition order — the sum
# is bit-identical across partition counts, engines (DuckDB oracle) and
# cluster sizes. Without this, summing hundreds of doubles is order-sensitive
# at ~1e-11, which the per-round round(·,12) cannot absorb.
_Q = float(1 << 40)


def similarity_flooding(
    pairs: DataFrame,
    src_edges: DataFrame,
    dst_edges: DataFrame,
    max_rounds: int = 10,
    epsilon: float = 1e-3,
    stats: dict | None = None,
) -> DataFrame:
    """Melnik similarity flooding fixpoint.

    PCG nodes = candidate pairs; a PCG edge connects (a,b)→(a',b') when
    edge(a,a') exists in the source graph and edge(b,b') in the target graph
    with the same predicate, in both directions, weighted 1/out-degree
    (propagation coefficients, SimilarityFlooding.java:375-447).

    sigma_{i+1} = normalize(sigma_0 + sigma_i + sum_in(coeff * sigma_i)),
    rounds capped at ROUND_MAX=10, convergence on max per-pair delta.

    One scalar collect per round (not two): the aggregate returns BOTH the
    normalization max of this round's raw scores AND the convergence delta
    of the previous transition, so convergence is detected one iteration
    later at zero extra Spark jobs. ``stats['rounds']`` reports the number
    of sigma updates applied (guards the fusion in tests)."""
    # materialize the base pair table once: it is referenced by the PCG
    # build (twice), the sigma init, AND every round's raw computation —
    # uncheckpointed, its upstream lineage (e.g. a full TF-IDF query) would
    # re-execute at each of those points
    sigma0 = pairs.select(
        "src_id", "dst_id", F.col("sim").alias("s0")
    ).localCheckpoint()

    se = src_edges.select(
        F.col("child_id").alias("sa"), F.col("parent_id").alias("sb"),
        F.col("pred") if "pred" in src_edges.columns else F.lit("e").alias("pred"),
    )
    de = dst_edges.select(
        F.col("child_id").alias("da"), F.col("parent_id").alias("db"),
        F.col("pred") if "pred" in dst_edges.columns else F.lit("e").alias("pred"),
    )
    # forward PCG edges between pair nodes, built PAIRS-FIRST: anchor on the
    # candidate pairs and walk one edge per side, requiring the far endpoints
    # to be a candidate pair too. The naive alternative — se.join(de, "pred")
    # then restrict — materializes a |src_edges| x |dst_edges| cross on each
    # hot predicate BEFORE the restriction (25M rows at sf0.1's single
    # 'grouped' pred; quadratic in docs at scale), for the identical result.
    keys = sigma0.select(
        F.col("src_id").alias("from_src"), F.col("dst_id").alias("from_dst")
    )
    fwd = (
        keys
        .join(se, F.col("from_src") == F.col("sa"))
        .join(
            de.withColumnRenamed("pred", "pred_d"),
            (F.col("from_dst") == F.col("da"))
            & (F.col("pred") == F.col("pred_d")),
        )
        .join(
            sigma0.select(
                F.col("src_id").alias("to_src"),
                F.col("dst_id").alias("to_dst"),
            ),
            (F.col("sb") == F.col("to_src")) & (F.col("db") == F.col("to_dst")),
        )
        .select("from_src", "from_dst", "to_src", "to_dst")
    )
    bwd = fwd.select(
        F.col("to_src").alias("from_src"), F.col("to_dst").alias("from_dst"),
        F.col("from_src").alias("to_src"), F.col("from_dst").alias("to_dst"),
    )
    pcg = fwd.unionByName(bwd)
    outdeg = pcg.groupBy("from_src", "from_dst").agg(
        F.count("*").alias("deg")
    )
    pcg = pcg.join(outdeg, ["from_src", "from_dst"]).withColumn(
        "coeff", F.lit(1.0) / F.col("deg")
    ).localCheckpoint()

    sigma = sigma0.select(
        "src_id", "dst_id", F.col("s0").alias("s"),
        F.lit(None).cast("double").alias("s_prev"),
    ).localCheckpoint()
    rounds = 0
    for i in range(max_rounds):
        inflow = (
            pcg.join(
                sigma.select(
                    F.col("src_id").alias("from_src"),
                    F.col("dst_id").alias("from_dst"),
                    F.col("s").alias("in_s"),
                ),
                ["from_src", "from_dst"],
            )
            .groupBy("to_src", "to_dst")
            .agg(
                F.sum(
                    F.floor(F.col("coeff") * F.col("in_s") * _Q) / _Q
                ).alias("inflow")
            )
            .select(
                F.col("to_src").alias("src_id"),
                F.col("to_dst").alias("dst_id"),
                "inflow",
            )
        )
        raw = (
            sigma0.join(sigma, ["src_id", "dst_id"])
            .join(inflow, ["src_id", "dst_id"], "left")
            .select(
                "src_id", "dst_id", "s", "s_prev",
                (F.col("s0") + F.col("s") + F.coalesce(F.col("inflow"), F.lit(0.0))
                 ).alias("raw"),
            )
        ).localCheckpoint()
        # ONE job per round: normalization max + previous-round delta fused
        row = raw.agg(
            F.max("raw").alias("mx"),
            F.max(F.abs(F.col("s") - F.col("s_prev"))).alias("delta"),
        ).collect()[0]
        if i > 0 and row.delta is not None and row.delta < epsilon:
            break
        mx = row.mx or 1.0
        sigma = raw.select(
            "src_id", "dst_id",
            F.round(F.col("raw") / F.lit(mx), 12).alias("s"),
            F.col("s").alias("s_prev"),
        ).localCheckpoint()
        rounds += 1
    if stats is not None:
        stats["rounds"] = rounds
    return sigma.select("src_id", "dst_id", F.col("s").alias("sim_sf"))
