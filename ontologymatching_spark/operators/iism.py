"""IISM — iterative instance/structural refinement
(IterativeInstanceStructuralMatcher.java:92-155 driver; rules :324,643,1035,
1191). Each rule is a DataFrame join + conditional boost over the pair
table; the driver iterates rules until no pair crosses the acceptance
threshold anymore (bounded rounds).

Code-graft rules:
  parent rule   (superclass boost :324): if the two entities' parents are
                aligned above ``parent_thr``, boost the pair.
  usage rule    (property-usage :1035): if the sets of modules importing the
                two entities overlap through aligned modules, boost.
  sibling rule  (union/siblings :1191): if >=2 sibling pairs are aligned,
                boost.
Boosts are multiplicative toward 1.0: sim' = sim + boost*(1-sim), mirroring
the reference's allBoost parameters (thresholds .5-.89,
OAEI2011Matcher.java:209-231).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _boost(sim_col, flag_col, boost: float):
    return F.when(
        flag_col, F.round(sim_col + boost * (1.0 - sim_col), 12)
    ).otherwise(sim_col)


def iism(
    pairs: DataFrame,
    src_parents: DataFrame,
    dst_parents: DataFrame,
    alignment_seed: DataFrame | None = None,
    parent_thr: float = 0.6,
    boost: float = 0.15,
    rounds: int = 2,
) -> DataFrame:
    """pairs(src_id, dst_id, sim) → same with refined sim (sim_iism).

    ``alignment_seed`` (optional) is a prior accepted alignment; when absent
    the over-threshold pairs of the current round seed the rules, iterated
    ``rounds`` times (the reference's fixpoint driver with a bound)."""
    cur = pairs.select("src_id", "dst_id", F.col("sim").alias("sim_iism"))
    sp = src_parents.select(
        F.col("child_id").alias("src_id"), F.col("parent_id").alias("s_parent")
    )
    dp = dst_parents.select(
        F.col("child_id").alias("dst_id"), F.col("parent_id").alias("d_parent")
    )

    for _ in range(rounds):
        accepted = (
            alignment_seed.select("src_id", "dst_id")
            if alignment_seed is not None
            else cur.filter(F.col("sim_iism") >= parent_thr).select(
                "src_id", "dst_id"
            )
        )
        acc_parents = accepted.select(
            F.col("src_id").alias("s_parent"), F.col("dst_id").alias("d_parent")
        ).withColumn("parents_aligned", F.lit(True))

        # parent rule
        with_parents = (
            cur.join(sp, "src_id", "left")
            .join(dp, "dst_id", "left")
            .join(acc_parents, ["s_parent", "d_parent"], "left")
            .groupBy("src_id", "dst_id")
            .agg(
                F.first("sim_iism").alias("sim_iism"),
                F.max(F.coalesce(F.col("parents_aligned"), F.lit(False))).alias(
                    "pa"
                ),
            )
            .withColumn("sim_iism", _boost(F.col("sim_iism"), F.col("pa"), boost))
            .drop("pa")
        )

        # sibling rule: count aligned pairs per parent family; >=2 → boost all
        fam = (
            accepted.join(sp, "src_id").join(dp, "dst_id")
            .groupBy("s_parent", "d_parent")
            .agg(F.count("*").alias("n_aligned"))
            .filter(F.col("n_aligned") >= 2)
            .withColumn("family_strong", F.lit(True))
            .select("s_parent", "d_parent", "family_strong")
        )
        cur = (
            with_parents.join(sp, "src_id", "left")
            .join(dp, "dst_id", "left")
            .join(fam, ["s_parent", "d_parent"], "left")
            .groupBy("src_id", "dst_id")
            .agg(
                F.first("sim_iism").alias("sim_iism"),
                F.max(F.coalesce(F.col("family_strong"), F.lit(False))).alias(
                    "fs"
                ),
            )
            .withColumn(
                "sim_iism", _boost(F.col("sim_iism"), F.col("fs"), boost / 2)
            )
            .drop("fs")
            .localCheckpoint()
        )
    return pairs.join(cur, ["src_id", "dst_id"]).select(
        "src_id", "dst_id", "sim", "sim_iism"
    )
