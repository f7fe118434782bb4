"""Refactor-equivalence guard for the round-4 similarity-flooding rewrite.

``similarity_flooding`` now splits pairs into PCG-connected vs isolated,
propagates only CHANGED sigma along PCG edges (frontier/delta inflow), and
evolves isolated pairs by an unrolled closed-form recurrence. All of that
must be BIT-IDENTICAL to the naive full-table loop (the round-3
implementation, reproduced below verbatim in loop structure) — the 2^-40
grid quantization is what makes incremental sums exact in any order.
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ontologymatching_spark.operators.structural import _Q, similarity_flooding


def _naive_similarity_flooding(pairs, src_edges, dst_edges, max_rounds=10,
                               epsilon=1e-3, stats=None):
    """The pre-round-4 full-table loop (structural.py @ r03), kept as the
    semantic reference: full inflow join + full raw/sigma materialization
    every round."""
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
    keys = sigma0.select(
        F.col("src_id").alias("from_src"), F.col("dst_id").alias("from_dst")
    )
    fwd = (
        keys
        .join(se, F.col("from_src") == F.col("sa"))
        .join(
            de.withColumnRenamed("pred", "pred_d"),
            (F.col("from_dst") == F.col("da")) & (F.col("pred") == F.col("pred_d")),
        )
        .join(
            sigma0.select(
                F.col("src_id").alias("to_src"), F.col("dst_id").alias("to_dst")
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
    outdeg = pcg.groupBy("from_src", "from_dst").agg(F.count("*").alias("deg"))
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
                F.sum(F.floor(F.col("coeff") * F.col("in_s") * _Q) / _Q)
                .alias("inflow")
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
                (F.col("s0") + F.col("s")
                 + F.coalesce(F.col("inflow"), F.lit(0.0))).alias("raw"),
            )
        ).localCheckpoint()
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


def _rand_instance(seed, n_src=14, n_dst=14, p_pair=0.35, p_edge=0.5):
    """Random pair matrix + random parent forests: a mix of connected pair
    chains and isolated pairs (both code paths of the split exercised)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = [
        (i, 100 + j, float(np.round(rng.random(), 6)))
        for i in range(n_src) for j in range(n_dst)
        if rng.random() < p_pair
    ]
    # parent forests: node k's parent is some node > k (acyclic)
    se = [
        (i, int(rng.integers(i + 1, n_src)))
        for i in range(n_src - 1) if rng.random() < p_edge
    ]
    de = [
        (100 + j, 100 + int(rng.integers(j + 1, n_dst)))
        for j in range(n_dst - 1) if rng.random() < p_edge
    ]
    return rows, se, de


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_frontier_sf_bit_identical_to_naive(spark, seed):
    rows, se_rows, de_rows = _rand_instance(seed)
    pairs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["src_id", "dst_id", "sim"])
    )
    se = spark.createDataFrame(
        pd.DataFrame(se_rows or [(0, 1)], columns=["child_id", "parent_id"])
    ).withColumn("pred", F.lit("declares"))
    de = spark.createDataFrame(
        pd.DataFrame(de_rows or [(100, 101)], columns=["child_id", "parent_id"])
    ).withColumn("pred", F.lit("declares"))

    st_new, st_old = {}, {}
    new = similarity_flooding(pairs, se, de, max_rounds=6, stats=st_new)
    old = _naive_similarity_flooding(pairs, se, de, max_rounds=6, stats=st_old)
    pn = new.orderBy("src_id", "dst_id").toPandas()
    po = old.orderBy("src_id", "dst_id").toPandas()
    assert st_new["rounds"] == st_old["rounds"]
    assert len(pn) == len(po)
    # bit-identical sigma: exact double equality, not approx
    assert (pn["src_id"].values == po["src_id"].values).all()
    assert (pn["dst_id"].values == po["dst_id"].values).all()
    assert (pn["sim_sf"].values == po["sim_sf"].values).all()


def test_round12_driver_twin_matches_spark(spark):
    """_round12_half_up must reproduce F.round(·, 12) bit-for-bit — it feeds
    the per-round normalization max, which feeds EVERY sigma. Includes exact
    decimal .5-tie values (k/2^13 has a 13-digit exact decimal ending in 5)
    where a half-even rounder would diverge."""
    import numpy as np

    from ontologymatching_spark.operators.structural import _round12_half_up

    rng = np.random.default_rng(11)
    vals = list(rng.random(500)) + [
        1 / 2**13, 3 / 2**13, 5 / 2**13, 0.5 + 1 / 2**13,
        1e-13, 0.9999999999995, 2.0000000000005,
    ]
    pdf = pd.DataFrame({"x": [float(v) for v in vals]})
    got = (
        spark.createDataFrame(pdf)
        .select(F.round(F.col("x"), 12).alias("r"))
        .toPandas()["r"]
        .values
    )
    want = np.array([_round12_half_up(v) for v in pdf["x"]])
    assert (got == want).all()


def test_frontier_sf_all_isolated(spark):
    """Empty PCG (no same-parent structure): the conn branch must be fully
    skipped and the recurrence must match the naive loop bit-for-bit."""
    import numpy as np

    rng = np.random.default_rng(5)
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "src_id": range(30),
                "dst_id": range(100, 130),
                "sim": np.round(rng.random(30), 6),
            }
        )
    )
    edges = spark.createDataFrame(
        pd.DataFrame({"child_id": [900], "parent_id": [901]})
    ).withColumn("pred", F.lit("declares"))
    new = similarity_flooding(pairs, edges, edges, max_rounds=5)
    old = _naive_similarity_flooding(pairs, edges, edges, max_rounds=5)
    pn = new.orderBy("src_id").toPandas()
    po = old.orderBy("src_id").toPandas()
    assert (pn["sim_sf"].values == po["sim_sf"].values).all()
