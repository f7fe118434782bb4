"""Unit tests: hierarchy matcher (relation-typed mappings) and the
variance-disagreement metric — deterministic synthetic fixtures in the
reference's degenerate-matcher test style (SURVEY.md §5.3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ontologymatching_spark.operators.evaluate import disagreement_variance
from ontologymatching_spark.operators.hierarchy import hierarchy_mappings


def test_hierarchy_mappings_rules(spark):
    # alignment: s10 ≡ d11 ; source children of 10: {12, 14}; target child
    # of 11: {13}; unrelated parent 20→22 must emit nothing
    align = spark.createDataFrame([(10, 11)], "src_id long, dst_id long")
    sp = spark.createDataFrame(
        [(12, 10), (14, 10), (22, 20)], "child_id long, parent_id long"
    )
    dp = spark.createDataFrame([(13, 11)], "child_id long, parent_id long")
    got = {
        (r.src_id, r.dst_id, r.rel)
        for r in hierarchy_mappings(align, sp, dp).collect()
    }
    assert got == {
        (12, 11, "subClassOf"),
        (14, 11, "subClassOf"),
        (10, 13, "superClassOf"),
    }


def test_hierarchy_mappings_dedups(spark):
    # two alignments sharing a child-parent edge must not duplicate rows
    align = spark.createDataFrame(
        [(10, 11), (10, 11)], "src_id long, dst_id long"
    )
    sp = spark.createDataFrame([(12, 10)], "child_id long, parent_id long")
    dp = spark.createDataFrame([], "child_id long, parent_id long")
    assert hierarchy_mappings(align, sp, dp).count() == 1


def test_disagreement_variance_values(spark):
    # VarianceComputation semantics: population variance (divide by n)
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 0.0), (2, 1.0, 1.0, 1.0), (3, 1.0, 0.0, 0.5)],
        "pair_id long, a double, b double, c double",
    )
    got = {
        r.pair_id: r.disagreement
        for r in disagreement_variance(df, ["a", "b", "c"]).collect()
    }
    assert got[1] == 0.0  # all-agree → zero disagreement
    assert got[2] == 0.0
    # mean 0.5, deviations (0.5, -0.5, 0) → var = (0.25+0.25+0)/3
    assert got[3] == pytest.approx(0.5 / 3.0)


def test_disagreement_ranks_conflicts_first(spark):
    # the feedback-loop ordering: a matcher-conflicted pair outranks a
    # unanimous one (VarianceDisagreementComparator, descending)
    df = spark.createDataFrame(
        [("agree", 0.9, 0.9), ("conflict", 1.0, 0.0)],
        "pair string, a double, b double",
    )
    top = (
        disagreement_variance(df, ["a", "b"])
        .orderBy(F.desc("disagreement"))
        .first()
    )
    assert top.pair == "conflict"


def test_global_confidence_and_alignment_delta(spark):
    from ontologymatching_spark.operators.evaluate import (
        alignment_delta,
        global_confidence,
    )

    w = spark.createDataFrame(
        [(1, 0.8), (2, 0.6)], "src_id long, quality double"
    )
    assert global_confidence(w) == pytest.approx(0.7)

    a = spark.createDataFrame(
        [("s1", "d1"), ("s2", "d2")], "src_uri string, dst_uri string"
    )
    b = spark.createDataFrame(
        [("s1", "d1"), ("s3", "d3")], "src_uri string, dst_uri string"
    )
    got = {
        (r.src_uri, r.dst_uri): r.status
        for r in alignment_delta(a, b).collect()
    }
    assert got == {
        ("s1", "d1"): "both",
        ("s2", "d2"): "only_a",
        ("s3", "d3"): "only_b",
    }
    # delta (DeltaFromReference) = insertions + deletions
    delta = sum(1 for s in got.values() if s != "both")
    assert delta == 2


def test_order_preservation_metric(spark):
    from ontologymatching_spark.operators.evaluate import order_preservation

    # src hierarchy: 1 anc 2 ; dst hierarchy: 11 anc 12 / 22 anc 21
    sp = spark.createDataFrame([(1, 2)], "anc_id long, desc_id long")
    # preserved case: (1->11, 2->12): ord_src anc, ord_dst anc
    dp_ok = spark.createDataFrame([(11, 12)], "anc_id long, desc_id long")
    align = spark.createDataFrame(
        [(1, 11), (2, 12)], "src_id long, dst_id long"
    )
    row = order_preservation(align, sp, dp_ok).collect()[0]
    assert (row.order_quality, row.n_mapping_pairs) == (1.0, 1)

    # violated case: dst order inverted (12 anc 11) → discrepancy 1
    dp_bad = spark.createDataFrame([(12, 11)], "anc_id long, desc_id long")
    row = order_preservation(align, sp, dp_bad).collect()[0]
    assert (row.order_quality, row.n_mapping_pairs) == (0.0, 1)


def test_mapping_pairs_no_cartesian_and_cap(spark):
    """Pair enumeration is Generate+equi-join (no CartesianProduct node) and
    max_pairs deterministically caps the quadratic output."""
    import pandas as pd

    from ontologymatching_spark.operators.evaluate import _mapping_pairs

    align = spark.createDataFrame(
        pd.DataFrame({"src_id": list(range(40)), "dst_id": list(range(100, 140))})
    )
    mp = _mapping_pairs(align)
    assert mp.count() == 40 * 39 // 2
    plan = mp._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # capped mode: expected pairs <= max_pairs, deterministic across calls
    mp1 = _mapping_pairs(align, max_pairs=50).toPandas()
    mp2 = _mapping_pairs(align, max_pairs=50).toPandas()
    assert len(mp1) <= 50
    assert len(mp1) > 0
    cols = sorted(mp1.columns)
    assert mp1[cols].sort_values(cols).reset_index(drop=True).equals(
        mp2[cols].sort_values(cols).reset_index(drop=True)
    )


def test_order_discrepancy_and_distance_preservation(spark):
    from ontologymatching_spark.operators.evaluate import (
        distance_preservation,
        order_discrepancy,
    )

    sp = spark.createDataFrame([(1, 2)], "anc_id long, desc_id long")
    dp_bad = spark.createDataFrame([(12, 11)], "anc_id long, desc_id long")
    align = spark.createDataFrame(
        [(1, 11), (2, 12)], "src_id long, dst_id long"
    )
    # inverted dst order → raw discrepancy 1.0 (the PRESERVATION=false twin)
    row = order_discrepancy(align, sp, dp_bad).collect()[0]
    assert (row.order_discrepancy, row.n_mapping_pairs) == (1.0, 1)

    # distance preservation: identical 2-chain hierarchies → |d_src - d_dst|
    # = 0 everywhere → quality 1.0 for both modes
    dp_ok = spark.createDataFrame([(11, 12)], "anc_id long, desc_id long")
    sn = spark.createDataFrame([(1,), (2,)], "node_id long")
    dn = spark.createDataFrame([(11,), (12,)], "node_id long")
    for mode in ("upper", "lower"):
        row = distance_preservation(align, sp, dp_ok, sn, dn, mode=mode).collect()[0]
        assert row.quality == 1.0, mode
        assert row.n_mapping_pairs == 1

    # asymmetric case: dst sides unrelated (no dst hierarchy) → dst distance
    # 0/diam while src pair distance is 1+0-0=1 normalized by diameter 1 →
    # upper quality = 1 - |1 - 0| = 0
    dp_none = spark.createDataFrame([], "anc_id long, desc_id long")
    row = distance_preservation(
        align, sp, dp_none, sn, dn, mode="upper"
    ).collect()[0]
    assert row.quality == pytest.approx(0.0)
