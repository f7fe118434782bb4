"""User-feedback-loop candidate-quality metrics (qualityEvaluation/metrics/
ufl/*.java) re-expressed over sparse pair tables.

The reference's UFL subsystem ranks mappings by how much a user validation
would teach the ensemble; each metric is a per-cell score over the
similarity matrix plus user-validation count matrices. The matrix-scan
loops become relational aggregations:

- CrossCountQuality.java:23-62  → nonzero row/col counts, global max-norm
- CrossSumQuality.java:23-61    → row/col similarity sums, global max-norm
- SimilarityScoreDefinitness.java:30-35 → 2*|sim - 0.5|
- ufl/shi/SimilarityDistance.java:30-60 → min |sim - neighbor| over the
  cell's row and column (sparse form: unmaterialized cells are 0, so when
  a row/column has absent cells the implicit-zero distance |sim - 0| is a
  candidate — at matrix scale this is almost always present)
- ufl/shi/MultiMatcherConfidence.java:37-50 → weighted mean of
  |threshold - sim_k| over the input matchers' signature vector
- ConsensusQuality.java:37-49   → validation-vote consensus (quirk kept:
  |pos-neg|/maxConsensus may exceed 1 when one side holds >maxConsensus)
- ExpandedConsensus.java:44-68  → single-validation cells expanded by the
  ensemble score vs threshold before the consensus formula
- PropagationImpactMetric.java:38-57 → min/max remaining-consensus ratio
  (quirk kept: negative when a side exceeds maxConsensus)
- RevalidationRate.java:41-46   → (pos+neg) / (max pos + max neg)
- IntraCouplingQualityMetric.java:28-70 → global scalar: distinct
  row-argmax targets / number of rows (sparse form: rows = rows with at
  least one nonzero cell; the reference's all-rows scan would dereference
  a zero row's first column — not reproduced, documented deviation).
  Argmax ties break deterministically by (sim DESC, dst ASC).

All column arithmetic stays in whole-stage codegen; the only shuffles are
the row/col groupBys and SimilarityDistance's two sort-window passes
(min-to-any-neighbor = min adjacent gap after an in-partition sort — NO
self-join, so a hot row costs n log n, never n²). Scalar normalizers are
one-row aggs broadcast back with a crossJoin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_INF = 1.0e9  # stands in for Double.MAX_VALUE; both engines treat it alike


def cross_stats(pairs: DataFrame, src: str, dst: str, sim: str) -> DataFrame:
    """Fused row/col aggregates shared by the cross-* metrics (and reusable
    as the sparse cell counts of similarity_distance): ONE groupBy per side
    computes (nonzero count, sim sum); the four scalar maxima ride along in
    a single broadcast one-row crossJoin. Appends _rc/_cc/_rs/_cs and
    _mrc/_mcc/_mrs/_mcs (caller drops them)."""
    rs = pairs.groupBy(src).agg(
        F.count(F.when(F.col(sim) > 0.0, 1)).alias("_rc"),
        F.sum(sim).alias("_rs"),
    )
    cs = pairs.groupBy(dst).agg(
        F.count(F.when(F.col(sim) > 0.0, 1)).alias("_cc"),
        F.sum(sim).alias("_cs"),
    )
    norm = rs.agg(
        F.max("_rc").alias("_mrc"), F.max("_rs").alias("_mrs")
    ).crossJoin(cs.agg(F.max("_cc").alias("_mcc"), F.max("_cs").alias("_mcs")))
    return (
        pairs.join(rs, src, "left")
        .join(cs, dst, "left")
        .crossJoin(F.broadcast(norm))
    )


def _cross_count_col() -> Column:
    """CrossCountQuality.java:23-62 on cross_stats columns: (nonzero cells
    in the row + in the column) / (max row count + max col count)."""
    return (
        F.coalesce(F.col("_rc"), F.lit(0))
        + F.coalesce(F.col("_cc"), F.lit(0))
    ).cast("double") / (F.col("_mrc") + F.col("_mcc"))


def _cross_sum_col() -> Column:
    """CrossSumQuality.java:23-61 on cross_stats columns: (Σ sims in the
    row + in the column) / (max row sum + max col sum)."""
    return (
        F.coalesce(F.col("_rs"), F.lit(0.0))
        + F.coalesce(F.col("_cs"), F.lit(0.0))
    ) / (F.col("_mrs") + F.col("_mcs"))


_STATS_COLS = ("_rc", "_cc", "_rs", "_cs", "_mrc", "_mcc", "_mrs", "_mcs")


def cross_count_quality(pairs: DataFrame, src: str, dst: str, sim: str,
                        out: str = "cross_count") -> DataFrame:
    """CrossCountQuality.java:23-62 standalone (see cross_stats for the
    fused form used by the ufl_quality query)."""
    return cross_stats(pairs, src, dst, sim).withColumn(
        out, _cross_count_col()
    ).drop(*_STATS_COLS)


def cross_sum_quality(pairs: DataFrame, src: str, dst: str, sim: str,
                      out: str = "cross_sum") -> DataFrame:
    """CrossSumQuality.java:23-61 standalone (see cross_stats for the fused
    form used by the ufl_quality query)."""
    return cross_stats(pairs, src, dst, sim).withColumn(
        out, _cross_sum_col()
    ).drop(*_STATS_COLS)


def similarity_definiteness(pairs: DataFrame, sim: str,
                            out: str = "definiteness") -> DataFrame:
    """SimilarityScoreDefinitness.java:30-35: 2*|sim - 0.5| — how far from
    maximally-uncertain the score is. Pure codegen."""
    return pairs.withColumn(out, 2.0 * F.abs(F.col(sim) - 0.5))


def multi_matcher_confidence(pairs: DataFrame, sim_cols: list[str],
                             threshold: float,
                             weights: list[float] | None = None,
                             out: str = "mm_confidence") -> DataFrame:
    """ufl/shi/MultiMatcherConfidence.java:37-50: mean_k w_k*|τ - sim_k|
    over the matcher signature vector. Pure codegen."""
    w = weights or [1.0] * len(sim_cols)
    terms = [
        F.lit(wk) * F.abs(F.lit(threshold) - F.col(c))
        for wk, c in zip(w, sim_cols)
    ]
    total: Column = terms[0]
    for t in terms[1:]:
        total = total + t
    return pairs.withColumn(out, total / F.lit(float(len(sim_cols))))


def similarity_distance(pairs: DataFrame, src: str, dst: str, sim: str,
                        n_rows: int, n_cols: int,
                        out: str = "sim_distance") -> DataFrame:
    """ufl/shi/SimilarityDistance.java:30-60: min |sim(i,j) - sim(k,j)| over
    the column ∪ min |sim(i,j) - sim(i,k)| over the row (k ≠ self). Sparse
    form: when the row has < n_cols materialized cells (resp. col < n_rows)
    an implicit zero neighbor exists, contributing |sim - 0| = sim.

    n_rows/n_cols are the dense matrix dimensions (count of source/target
    entities). The reference's O(rows+cols) scan per cell becomes two
    window passes: min distance to ANY other value in a set = min of the
    adjacent differences once the set is sorted, so per row/column it is
    least(v - lag(v), lead(v) - v) over the value ordering — O(n log n)
    total, no self-join, no quadratic blowup on hot rows."""
    from pyspark.sql import Window

    def _neighbor_min(df: DataFrame, part: str, alias: str) -> DataFrame:
        w = Window.partitionBy(part).orderBy(F.col(sim).asc())
        prev = F.lag(F.col(sim)).over(w)
        nxt = F.lead(F.col(sim)).over(w)
        return df.withColumn(
            alias,
            F.least(
                F.coalesce(F.col(sim) - prev, F.lit(_INF)),
                F.coalesce(nxt - F.col(sim), F.lit(_INF)),
            ),
        )

    df = _neighbor_min(pairs, src, "_rmin")
    df = _neighbor_min(df, dst, "_cmin")
    drop = ["_rmin", "_cmin"]
    if "_rc" not in pairs.columns:
        rc = pairs.groupBy(src).agg(F.count(F.lit(1)).alias("_rc"))
        cc = pairs.groupBy(dst).agg(F.count(F.lit(1)).alias("_cc"))
        df = df.join(rc, src, "left").join(cc, dst, "left")
        drop += ["_rc", "_cc"]
    # else: caller already attached cross_stats' per-row/col cell counts
    return df.withColumn(
        out,
        F.least(
            F.col("_rmin"),
            F.col("_cmin"),
            F.when(F.coalesce(F.col("_rc"), F.lit(0)) < n_cols,
                   F.abs(F.col(sim))).otherwise(F.lit(_INF)),
            F.when(F.coalesce(F.col("_cc"), F.lit(0)) < n_rows,
                   F.abs(F.col(sim))).otherwise(F.lit(_INF)),
        ),
    ).drop(*drop)


def consensus_quality(pairs: DataFrame, pos: str, neg: str,
                      max_revalidation: int,
                      out: str = "consensus") -> DataFrame:
    """ConsensusQuality.java:37-49. maxConsensus = maxRevalidation/2 + 1.
    0 on a tie, 1 when either side hits maxConsensus exactly, else
    |pos-neg|/maxConsensus (may exceed 1 — reference quirk preserved).
    Returns the DataFrame with the appended column."""
    mc = max_revalidation // 2 + 1
    return pairs.withColumn(
        out,
        F.when(F.col(pos) == F.col(neg), 0.0)
        .when((F.col(pos) == mc) | (F.col(neg) == mc), 1.0)
        .otherwise(F.abs(F.col(pos) - F.col(neg)).cast("double") / F.lit(float(mc))),
    )


def expanded_consensus(pairs: DataFrame, pos: str, neg: str, sim: str,
                       threshold: float, max_revalidation: int,
                       out: str = "expanded_consensus") -> DataFrame:
    """ExpandedConsensus.java:44-68: cells with exactly one validation get a
    synthetic second vote from the ensemble score (> τ → positive), then the
    ConsensusQuality formula on the adjusted counts."""
    mc = max_revalidation // 2 + 1
    one = (F.col(pos) + F.col(neg)) == 1
    p2 = F.when(one & (F.col(sim) > threshold), F.col(pos) + 1).otherwise(F.col(pos))
    n2 = F.when(one & ~(F.col(sim) > threshold), F.col(neg) + 1).otherwise(F.col(neg))
    return pairs.withColumn(
        out,
        F.when(p2 == n2, 0.0)
        .when((p2 == mc) | (n2 == mc), 1.0)
        .otherwise(F.abs(p2 - n2).cast("double") / F.lit(float(mc))),
    )


def propagation_impact(pairs: DataFrame, pos: str, neg: str,
                       validation: int,
                       out: str = "propagation_impact") -> DataFrame:
    """PropagationImpactMetric.java:38-57: 0 once either side reaches
    maxConsensus, else min(mc-pos, mc-neg)/max(mc-pos, mc-neg) — how evenly
    the remaining consensus budget is split (negative when a side exceeds
    mc — reference quirk preserved)."""
    mc = validation // 2 + 1
    a = F.lit(mc) - F.col(pos)
    b = F.lit(mc) - F.col(neg)
    return pairs.withColumn(
        out,
        F.when((F.col(pos) == mc) | (F.col(neg) == mc), 0.0)
        .otherwise(F.least(a, b).cast("double") / F.greatest(a, b)),
    )


def revalidation_rate(pairs: DataFrame, pos: str, neg: str,
                      out: str = "revalidation_rate") -> DataFrame:
    """RevalidationRate.java:41-46: (pos+neg) / maxRepetition where
    maxRepetition = max(pos) + max(neg) over all cells (scalar agg,
    broadcast back)."""
    norm = pairs.agg(
        (F.greatest(F.max(pos) + F.max(neg), F.lit(1))).alias("_maxrep")
    )
    return (
        pairs.crossJoin(F.broadcast(norm))
        .withColumn(
            out,
            (F.col(pos) + F.col(neg)).cast("double") / F.col("_maxrep"),
        )
        .drop("_maxrep")
    )


def user_disagreement(pairs: DataFrame, pos: str, neg: str,
                      out: str = "user_disagreement") -> DataFrame:
    """UserDisagrement.java:36-55: 4 × population variance of the
    {1×pos, 0×neg} validation vector — closed form 4·pos·neg/(pos+neg)²
    (Bernoulli variance p(1−p) with p = pos/n, rescaled to [0,1]).
    0.0 for unvalidated cells (the reference's empty vector)."""
    n = (F.col(pos) + F.col(neg)).cast("double")
    return pairs.withColumn(
        out,
        F.when(n == 0, 0.0).otherwise(
            4.0 * F.col(pos) * F.col(neg) / (n * n)
        ),
    )


def intra_coupling(pairs: DataFrame, src: str, dst: str, sim: str) -> DataFrame:
    """IntraCouplingQualityMetric.java:28-70 global measure: each row's
    argmax target is collected; quality = distinct targets / rows — a good
    matcher maps different sources to different targets. Sparse form scans
    rows with ≥1 nonzero cell (the reference's zero-row first-column
    dereference is not reproduced). Argmax tie-break: (sim DESC, dst ASC).
    → one row (intra_coupling)."""
    from pyspark.sql import Window

    w = Window.partitionBy(src).orderBy(F.col(sim).desc(), F.col(dst).asc())
    best = (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(src, dst)
    )
    return best.agg(
        (F.countDistinct(dst).cast("double")
         / F.count(F.lit(1))).alias("intra_coupling")
    )
