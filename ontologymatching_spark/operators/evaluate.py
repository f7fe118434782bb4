"""P/R/F evaluation vs a gold alignment — ReferenceEvaluator semantics
(referenceAlignment/ReferenceEvaluator.java:21-123: correct = |eval ∩ ref| by
URI-pair equality, P = correct/found, R = correct/ref, F harmonic α=0.5) —
plus the matcher-disagreement metric (am/evaluation/disagreement/variance/
VarianceDisagreement.java:30-62, VarianceComputation.java:20-50): per-pair
POPULATION variance of the matchers' similarity signature vector; high
variance = the matchers disagree = the pair a feedback loop should ask a
user about first (VarianceDisagreementComparator orders descending).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def disagreement_variance(pairs: DataFrame, sim_cols: list[str],
                          out_col: str = "disagreement") -> DataFrame:
    """Append the variance-disagreement column over the given matcher
    similarity columns (the signature vector). Pure column arithmetic —
    no shuffle, no UDF; stays inside whole-stage codegen."""
    k = len(sim_cols)
    mean: Column = sum(
        (F.col(c) for c in sim_cols[1:]), F.col(sim_cols[0])
    ) / F.lit(float(k))
    var: Column = sum(
        ((F.col(c) - mean) * (F.col(c) - mean) for c in sim_cols[1:]),
        (F.col(sim_cols[0]) - mean) * (F.col(sim_cols[0]) - mean),
    ) / F.lit(float(k))
    return pairs.withColumn(out_col, var)


def global_confidence(weights: DataFrame, quality_col: str = "quality") -> float:
    """GlobalConfidenceQuality (qualityEvaluation/metrics/
    GlobalConfidenceQuality.java:30-62): the matcher-level scalar quality =
    average of the per-row local confidences (which
    matchers.local_confidence_weights computes)."""
    row = weights.agg(F.avg(quality_col).alias("g")).collect()[0]
    return float(row.g) if row.g is not None else 0.0


def alignment_delta(a: DataFrame, b: DataFrame,
                    keys: tuple[str, str] = ("src_uri", "dst_uri")) -> DataFrame:
    """Alignment edit-distance classification (evaluation/alignment/
    DeltaFromReference.java:24-44: delta = #insertions + #deletions;
    AlignmentMetrics.java:30-66 derives correct/found from the overlap):
    full-outer join of the two pair sets, each pair tagged ``both`` /
    ``only_a`` / ``only_b``. delta = count(status != 'both')."""
    k = list(keys)
    da = a.select(*k).distinct().withColumn("_a", F.lit(1))
    db = b.select(*k).distinct().withColumn("_b", F.lit(1))
    return (
        da.join(db, k, "full_outer")
        .select(
            *k,
            F.when(F.col("_a").isNotNull() & F.col("_b").isNotNull(), "both")
            .when(F.col("_a").isNotNull(), "only_a")
            .otherwise("only_b")
            .alias("status"),
        )
    )


def precision_recall(alignment: DataFrame, gold: DataFrame) -> dict[str, float]:
    """alignment(src_uri, dst_uri) vs gold(src_uri, dst_uri) → P/R/F dict.
    Equality = URI-pair join (Alignment.contains, Alignment.java:147-204)."""
    found = alignment.select("src_uri", "dst_uri").distinct()
    ref = gold.select("src_uri", "dst_uri").distinct()
    n_found = found.count()
    n_ref = ref.count()
    n_correct = found.join(ref, ["src_uri", "dst_uri"]).count()
    p = n_correct / n_found if n_found else 0.0
    r = n_correct / n_ref if n_ref else 0.0
    f = 2 * p * r / (p + r) if (p + r) else 0.0
    return {
        "precision": p,
        "recall": r,
        "fmeasure": f,
        "found": n_found,
        "ref": n_ref,
        "correct": n_correct,
    }


def order_preservation(
    alignment: DataFrame,
    src_ancestors: DataFrame,
    dst_ancestors: DataFrame,
) -> DataFrame:
    """Joslyn order-preservation quality (qualityEvaluation/metrics/joslyn/
    JoslynStructuralQuality.java:149-204 via OrderPreservationQM): for every
    unordered pair of mappings a1=(a,a'), a2=(b,b'), discrepancy = 1 iff
    order(a,b) ≠ order(a',b') where order ∈ {ancestor, descendant,
    noncomparable} against each side's ancestor relation; quality =
    1 − Σdiscrepancy / C(n,2). → one row (order_quality, n_mapping_pairs).

    The reference's dense double loop is a self-join here; selected
    alignments are small post-1-1, and at lake scale the metric is computed
    per component or on a deterministic sample (it is diagnostics, not a
    pipeline stage). ancestors = (anc_id, desc_id) pairs."""
    al = alignment.select(F.col("src_id").alias("a"), F.col("dst_id").alias("ap"))
    l = al.select(F.col("a").alias("a1"), F.col("ap").alias("a1p"))
    r = al.select(F.col("a").alias("a2"), F.col("ap").alias("a2p"))
    pairs = l.crossJoin(r).filter(
        (F.col("a1") < F.col("a2"))
        | ((F.col("a1") == F.col("a2")) & (F.col("a1p") < F.col("a2p")))
    )

    def _order(df, x, y, anc, tag):
        lt = anc.select(
            F.col("anc_id").alias(x), F.col("desc_id").alias(y),
            F.lit(True).alias(f"_lt_{tag}"),
        )
        gt = anc.select(
            F.col("desc_id").alias(x), F.col("anc_id").alias(y),
            F.lit(True).alias(f"_gt_{tag}"),
        )
        df = df.join(lt, [x, y], "left").join(gt, [x, y], "left")
        return df.withColumn(
            f"ord_{tag}",
            F.when(F.col(f"_lt_{tag}"), "anc")
            .when(F.col(f"_gt_{tag}"), "desc")
            .otherwise("nc"),
        ).drop(f"_lt_{tag}", f"_gt_{tag}")

    pairs = _order(pairs, "a1", "a2", src_ancestors, "src")
    pairs = _order(pairs, "a1p", "a2p", dst_ancestors, "dst")
    return pairs.agg(
        F.round(
            1.0
            - F.coalesce(
                F.avg((F.col("ord_src") != F.col("ord_dst")).cast("double")),
                F.lit(0.0),
            ),
            6,
        ).alias("order_quality"),
        F.count(F.lit(1)).alias("n_mapping_pairs"),
    )
