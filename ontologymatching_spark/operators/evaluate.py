"""P/R/F evaluation vs a gold alignment — ReferenceEvaluator semantics
(referenceAlignment/ReferenceEvaluator.java:21-123: correct = |eval ∩ ref| by
URI-pair equality, P = correct/found, R = correct/ref, F harmonic α=0.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
