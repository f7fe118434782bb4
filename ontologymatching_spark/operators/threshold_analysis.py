"""Threshold sweep — the reference's am/tools/ThresholdAnalysis (SURVEY.md
§5.4: batch drivers score P/R per threshold to pick the operating point).

One pass over the scored pair table computes P/R/F at every threshold in the
grid simultaneously: selection is re-run per threshold (selection outcome is
threshold-dependent), but the expensive part — the scored pairs — is computed
once and cached by the caller.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .evaluate import precision_recall
from .selection import select_one_to_one


def threshold_sweep(
    scored_pairs: DataFrame,
    gold: DataFrame,
    thresholds: list[float] | None = None,
) -> list[dict]:
    """→ [{threshold, precision, recall, fmeasure, found, ...}] sorted by
    threshold. ``scored_pairs`` should be cached/checkpointed by the caller."""
    thresholds = thresholds or [0.5, 0.6, 0.7, 0.8, 0.9, 0.95]
    out = []
    for t in sorted(thresholds):
        alignment = select_one_to_one(scored_pairs, threshold=t)
        pr = precision_recall(alignment, gold)
        out.append({"threshold": t, **pr})
    return out
