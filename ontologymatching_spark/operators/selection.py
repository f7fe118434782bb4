"""Alignment selection — the reference's ``scanMatrix`` dispatch
(AbstractMatcher.java:758-792) re-expressed over the sparse pair table:

  ANY-ANY → everything over threshold        (getThemAll :884-895)
  N-ANY   → top-k per source row              (:839-877, getRowMaxValues)
  ANY-N   → top-k per target column
  1-1     → iterative mutual-best (greedy / stable-marriage semantics of
            scanWithBothConstraints :897-1041 and chooseBestN
            ArraySimilarityMatrix.java:513-566)

Determinism: the reference's loops are index-ordered (:953). Under Spark
parallelism we must make tie-breaking explicit — everywhere the order is
(sim DESC, src_uri ASC, dst_uri ASC), so results are identical at local[8],
local[32], and on a real cluster (SURVEY.md §4 custom work (d)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PAIR_COLS = ["src_id", "dst_id", "src_uri", "dst_uri", "sim"]


def _w_src():
    return Window.partitionBy("src_id").orderBy(
        F.col("sim").desc(), F.col("dst_uri").asc()
    )


def _w_dst():
    return Window.partitionBy("dst_id").orderBy(
        F.col("sim").desc(), F.col("src_uri").asc()
    )


def select_all(pairs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """ANY-ANY: keep every pair over threshold (getThemAll)."""
    return pairs.filter(F.col("sim") >= threshold)


def select_topk_per_src(pairs: DataFrame, k: int, threshold: float = 0.6) -> DataFrame:
    """N-ANY: top-k per source (getRowMaxValues,
    ArraySimilarityMatrix.java:231-255)."""
    return (
        pairs.filter(F.col("sim") >= threshold)
        .withColumn("rn", F.row_number().over(_w_src()))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def select_topk_per_dst(pairs: DataFrame, k: int, threshold: float = 0.6) -> DataFrame:
    """ANY-N: top-k per target (getColMaxValues :269-295)."""
    return (
        pairs.filter(F.col("sim") >= threshold)
        .withColumn("rn", F.row_number().over(_w_dst()))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def select_one_to_one(
    pairs: DataFrame,
    threshold: float = 0.6,
    max_rounds: int = 50,
    ckpt_every: int = 3,
) -> DataFrame:
    """Greedy 1-1 selection as an iterative mutual-best fixpoint.

    Each round keeps pairs that are simultaneously their source's best and
    their target's best (under the deterministic order), then removes the
    matched rows/columns and repeats — exactly the fixpoint of the
    reference's greedy `chooseBestN` (pick global max, delete row+col,
    repeat): a pair survives greedy iff it is mutual-best after all better
    pairs are removed, which is what this loop computes, O(log) rounds of
    Spark jobs instead of O(n) driver picks.

    Physical refinements over the naive per-round materialization (the
    r03 bench's 95 s sf1 entry — VERDICT r03 next-round #4):

    - the tiny per-round ``best`` is localCheckpointed (so later rounds'
      anti-joins reference materialized rows, never re-running earlier
      rounds' windows), while the big ``remaining`` is localCheckpointed
      only every ``ckpt_every`` rounds: between checkpoints the removals
      are broadcast hash anti-joins that pipeline into the next round's
      window scan — re-streaming the last checkpoint through a few hash
      filters is far cheaper than writing a 20M-row intermediate per round
      (measured at sf1: 20.3M pairs → rounds 0-11 run 5.0→0.6 s with
      ckpt+count costing ≤1.3 s every third round).
    - a per-connected-component greedy handoff for the tail was measured
      and REJECTED: from the round-12 remainder (53k rows) continuing the
      window rounds reaches the fixpoint in 9 rounds / 4.3 s while
      ``assignment.select_greedy_by_component`` takes 18.6 s on identical
      output (1058 rows) — the CC pass's fixed round costs dwarf the
      dwindling window scans, and mutual-best needs only O(log chain)
      rounds so no realistic tail makes CC win.
    """
    remaining = pairs.filter(F.col("sim") >= threshold).select(*PAIR_COLS)
    remaining = remaining.localCheckpoint()
    selected: list[DataFrame] = []

    # NOTE (r6): a min_by-aggregation formulation of the round (map-side
    # argmin per key + semi-join, "aggregate before you shuffle") was
    # measured and REJECTED: 17.4 s vs 11.6 s at sf0.1 — the two agg
    # branches re-stream the remaining set twice and add a third shuffle,
    # while the chained windows pass the data once.
    for r in range(max_rounds):
        # lazy checkpoint + count = ONE job per round (the count action
        # materializes the checkpoint); the previous eager checkpoint +
        # count pair cost two blocking driver actions per round
        best = (
            remaining.withColumn("rs", F.row_number().over(_w_src()))
            .withColumn("rd", F.row_number().over(_w_dst()))
            .filter((F.col("rs") == 1) & (F.col("rd") == 1))
            .drop("rs", "rd")
        ).localCheckpoint(eager=False)
        n = best.count()
        if n == 0:
            break
        selected.append(best)
        remaining = remaining.join(
            F.broadcast(best.select("src_id")), "src_id", "left_anti"
        ).join(F.broadcast(best.select("dst_id")), "dst_id", "left_anti")
        if (r + 1) % ckpt_every == 0:
            remaining = remaining.localCheckpoint(eager=False)
            if remaining.isEmpty():
                break

    if not selected:
        return pairs.select(*PAIR_COLS).limit(0)
    out = selected[0]
    for b in selected[1:]:
        out = out.unionByName(b)
    return out.select(*PAIR_COLS)


def mutual_best_round(pairs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """One round of mutual-best (SQL-expressible; used by the oracle gate)."""
    return (
        pairs.filter(F.col("sim") >= threshold)
        .withColumn("rs", F.row_number().over(_w_src()))
        .withColumn("rd", F.row_number().over(_w_dst()))
        .filter((F.col("rs") == 1) & (F.col("rd") == 1))
        .drop("rs", "rd")
    )


def completion_filter(pairs: DataFrame, prior: DataFrame) -> DataFrame:
    """Completion mode (AbstractMatcher.java:683-717): only consider pairs
    whose source AND target are not already mapped by a prior alignment;
    anti-join both sides."""
    return pairs.join(
        prior.select("src_id").distinct(), "src_id", "left_anti"
    ).join(prior.select("dst_id").distinct(), "dst_id", "left_anti")


def best_match_boosting(pairs: DataFrame, boost: float = 1.2) -> DataFrame:
    """BestMatchBoosting (boosting/BestMatchBoosting.java:17-79): multiply
    each source row's best pair by ``boost`` (clamped to 1)."""
    return pairs.withColumn("rn", F.row_number().over(_w_src())).withColumn(
        "sim",
        F.when(F.col("rn") == 1, F.least(F.col("sim") * boost, F.lit(1.0))).otherwise(
            F.col("sim")
        ),
    ).drop("rn")
