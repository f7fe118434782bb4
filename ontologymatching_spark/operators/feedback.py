"""User-feedback propagation + extrapolating matchers (UFL loop).

The reference's feedback loop consumes user validations of candidate
mappings and pushes their effect back into the similarity matrix:

  ServerFeedbackPropagation.java
    (AgreementMaker-UserFeedback/src/main/java/am/extension/
     multiUserFeedback/propagation/ServerFeedbackPropagation.java)
    :163-210 euclideanDistance — per cell, nearest validated signature
      vector by Euclidean distance; threshold 0 → exact signature matches
      adopt the validation label as their similarity.
    :246-306 logDistance — threshold (n_train-1)*dist_perc/100; eligible
      cells move by log2(2-minDist)*log_multiplier toward (label=1) or
      away from (label=0) 1.0, clamped to [0,1]. Constants
      log_multiplier=1.2, dist_perc=3.0 (:32-33).
    :320-377 qualityPropagation — threshold |ssv|*dist_perc/100; delta =
      ts_quality*(1-mp_quality/2)*(±1 by label).
    (wekaRegression :212-244 needs Weka — out of scope, no ML runtime in
     this engine; the three distance modes are the propagation math.)
  ExtrapolatingDSI.java (feedback/matchers/) :15-31 — DSI where
    validated (filtered) cells are frozen: structural inheritance runs
    but never overwrites a user-validated similarity.
  ExtrapolatingFS.java (feedback/matchers/) :50-121 with
    FamilialSimilarity.simSetAboveThreshold (feedback/measures/
    FamilialSimilarity.java:151-169) — for each user mapping (e1,e2),
    siblings of e1 / e2 whose intra-ontology similarity to e1 / e2 is
    >= threshold pair up when their two sibling-similarities agree
    within delta (approx :146-151); each such pair is emitted at 1.0.

Spark realization: the matrix is the sparse pair table; the training
set (user validations) is tiny per iteration → broadcast cross join +
one groupBy argmin per pair, everything JVM-side. Determinism across
engines (the DuckDB oracle twin): signature values are floored onto a
2^-20 grid, so squared distances land exactly on the 2^-40 grid and
the IEEE-exact sqrt/compare agree; the only libm call (log) is floored
onto the grid right after, making a cross-engine last-ulp divergence
vanishingly unlikely (same convention as the MSSG/flooding oracles).
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOG_MULTIPLIER = 1.2  # ServerFeedbackPropagation.java:32
DIST_PERC = 3.0       # ServerFeedbackPropagation.java:33
LN2 = 0.6931471805599453  # shared literal so both engines divide identically
GRID = float(1 << 20)


def _floor_grid(c, grid: float = GRID):
    return F.floor(c * grid) / grid


def nearest_validated(
    pairs: DataFrame,
    train: DataFrame,
    ssv_cols: list[str],
) -> DataFrame:
    """(src_id, dst_id, nn_dist, nn_label): each pair's nearest validated
    signature (argmin Euclidean over the broadcast train set; ties to the
    lowest train_idx like the reference's strict-< scan). Shared across
    propagation methods — the argmin is method-independent, and computing
    it once halves a multi-method pass (measured in ufl_propagation)."""
    tq = train.select(
        "train_idx", "label",
        *[_floor_grid(F.col(c)).alias(f"t_{c}") for c in ssv_cols],
    )
    pq = pairs.select(
        "src_id", "dst_id",
        *[_floor_grid(F.col(c)).alias(f"q_{c}") for c in ssv_cols],
    )
    valid = reduce(
        lambda a, b: a | b, [F.col(f"q_{c}") != 0.0 for c in ssv_cols]
    )
    dist2 = reduce(
        lambda a, b: a + b,
        [
            (F.col(f"q_{c}") - F.col(f"t_{c}"))
            * (F.col(f"q_{c}") - F.col(f"t_{c}"))
            for c in ssv_cols
        ],
    )
    return (
        pq.filter(valid)
        .crossJoin(F.broadcast(tq))
        .withColumn("dist", F.sqrt(dist2))
        .groupBy("src_id", "dst_id")
        .agg(F.min(F.struct("dist", "train_idx", "label")).alias("nn"))
        .select(
            "src_id", "dst_id",
            F.col("nn.dist").alias("nn_dist"),
            F.col("nn.label").alias("nn_label"),
        )
    )


def propagate_feedback(
    pairs: DataFrame,
    train: DataFrame,
    ssv_cols: list[str],
    method: str = "logdist",
    dist_perc: float = DIST_PERC,
    log_multiplier: float = LOG_MULTIPLIER,
    ts_quality: float | None = None,
    mp_quality_col: str | None = None,
    forbidden: DataFrame | None = None,
    sim_col: str = "sim",
    out_col: str = "sim_prop",
    nn: DataFrame | None = None,
) -> DataFrame:
    """One propagation round over the sparse pair matrix.

    ``pairs``: (src_id, dst_id, sim, *ssv_cols) — ssv_cols are the
    per-matcher signature-vector components (getSignatureVector :46-59).
    ``train``: (train_idx, *ssv_cols, label) — validated signatures with
    label 1.0 (correct) / 0.0 (incorrect); train_idx is the caller's
    deterministic ordering (the reference keeps the FIRST minimal row —
    ties break by train_idx ASC here).
    ``forbidden``: validated positions (src_id, dst_id) that must keep
    their similarity (the forbidden_pos gate).

    Signature values are floored to the 2^-20 grid on both operands
    before distances. Cells with an all-zero signature are skipped
    (validSsv :64-73). The training set is broadcast (user validations
    per iteration are tiny by construction; at 100 TB the pair table
    streams against it with no shuffle). ``nn`` lets callers share one
    ``nearest_validated`` result across methods (checkpoint it first)."""
    if method not in ("none", "euzero", "logdist", "quality"):
        raise ValueError(f"unknown propagation method {method!r}")
    if method == "none":
        return pairs.withColumn(out_col, F.col(sim_col))
    if method == "quality" and (ts_quality is None or mp_quality_col is None):
        raise ValueError("quality propagation needs ts_quality and "
                         "mp_quality_col")

    n_train = train.count()  # bounded: per-iteration user validations
    if n_train == 0:
        return pairs.withColumn(out_col, F.col(sim_col))
    if method == "euzero":
        thr = (n_train - 1) * 0.0 / 100          # :170 — always 0
    elif method == "logdist":
        thr = (n_train - 1) * dist_perc / 100    # :252
    else:
        thr = len(ssv_cols) * dist_perc / 100    # :326 (|ssv| columns)

    if nn is None:
        nn = nearest_validated(pairs, train, ssv_cols)
    nn = nn.filter(F.col("nn_dist") <= thr)
    if forbidden is not None:
        nn = nn.join(
            forbidden.select("src_id", "dst_id"),
            ["src_id", "dst_id"],
            "left_anti",
        )
    out = pairs.join(nn, ["src_id", "dst_id"], "left")
    cur = F.col(sim_col)
    if method == "euzero":
        updated = F.col("nn_label")
    elif method == "logdist":
        delta = _floor_grid(
            F.log(F.lit(2.0) - _floor_grid(F.col("nn_dist")))
            / F.lit(LN2) * log_multiplier
        )
        updated = F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.when(F.col("nn_label") == 1.0, cur + delta)
                .otherwise(cur - delta),
            ),
        )
    else:  # quality
        delta = F.lit(ts_quality) * (1.0 - F.col(mp_quality_col) / 2.0)
        updated = F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(1.0),
                F.when(F.col("nn_label") == 1.0, cur + delta)
                .otherwise(cur - delta),
            ),
        )
    return out.withColumn(
        out_col,
        F.when(F.col("nn_dist").isNotNull(), updated).otherwise(cur),
    ).drop("nn_dist", "nn_label")


def extrapolate_fs(
    validated: DataFrame,
    src_siblings: DataFrame,
    dst_siblings: DataFrame,
    threshold: float = 0.6,
    delta: float = 0.01,
) -> DataFrame:
    """ExtrapolatingFS (:50-121): user mappings extrapolate to sibling
    pairs whose familial similarities agree.

    ``validated``: user mappings (src_id, dst_id).
    ``*_siblings``: (entity_id, sibling_id, sim) — intra-ontology
    initial-matcher similarity of each entity to its siblings (children
    of its parents, itself excluded), i.e. FamilialSimilarity.
    simSetAboveThreshold's input. (The reference's target-side loop
    excludes entity1 instead of entity2 — a cross-ontology equals that
    never fires; the intended exclude-self semantics is what the
    sibling tables encode.)

    For each validated (e1,e2): siblings s1 of e1 with sim1 >= threshold
    and s2 of e2 with sim2 >= threshold pair up iff |sim1 - sim2| <=
    delta (approx :146-151) → emitted at similarity 1.0."""
    e1 = validated.join(
        src_siblings.select(
            F.col("entity_id").alias("src_id"),
            F.col("sibling_id").alias("s1"),
            F.col("sim").alias("sim1"),
        ).filter(F.col("sim1") >= threshold),
        "src_id",
    )
    e2 = validated.join(
        dst_siblings.select(
            F.col("entity_id").alias("dst_id"),
            F.col("sibling_id").alias("s2"),
            F.col("sim").alias("sim2"),
        ).filter(F.col("sim2") >= threshold),
        "dst_id",
    )
    return (
        e1.join(e2, ["src_id", "dst_id"])
        .filter(F.abs(F.col("sim1") - F.col("sim2")) <= delta)
        .select(
            F.col("s1").alias("src_id"),
            F.col("s2").alias("dst_id"),
            F.lit(1.0).alias("sim"),
        )
        .distinct()
    )


def extrapolating_dsi(
    pairs: DataFrame,
    src_parents: DataFrame,
    dst_parents: DataFrame,
    validated: DataFrame,
    mcp: float = 0.75,
) -> DataFrame:
    """ExtrapolatingDSI (:15-31): plain DSI, but cells of ``validated``
    pairs are frozen — the structural pass never overwrites a
    user-validated similarity (isComputedAlready[i][j] = true)."""
    from .structural import dsi

    out = dsi(pairs, src_parents, dst_parents, mcp=mcp)
    frozen = validated.select("src_id", "dst_id").withColumn(
        "is_frozen", F.lit(True)
    )
    return (
        out.join(frozen, ["src_id", "dst_id"], "left")
        .withColumn(
            "sim_dsi",
            F.when(
                F.coalesce(F.col("is_frozen"), F.lit(False)), F.col("sim")
            ).otherwise(F.col("sim_dsi")),
        )
        .drop("is_frozen")
    )


__all__ = [
    "nearest_validated",
    "propagate_feedback",
    "extrapolate_fs",
    "extrapolating_dsi",
    "LOG_MULTIPLIER",
    "DIST_PERC",
    "LN2",
    "GRID",
]
# unused import guard: math retained for parity with the LN2 derivation
assert abs(LN2 - math.log(2.0)) == 0.0
