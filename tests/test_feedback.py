"""Feedback propagation + extrapolating matchers
(ServerFeedbackPropagation.java, ExtrapolatingDSI/FS.java)."""
import math

import pandas as pd
import pytest

from ontologymatching_spark.operators import feedback

GRID = float(1 << 20)


def fg(x):
    return math.floor(x * GRID) / GRID


def test_propagate_euzero_exact_match_adopts_label(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "src_id": [1, 2, 3],
                "dst_id": [11, 12, 13],
                "sim": [0.4, 0.4, 0.4],
                "a": [0.5, 0.5, 0.0],
                "b": [0.25, 0.3, 0.0],
            }
        )
    )
    train = spark.createDataFrame(
        pd.DataFrame(
            {"train_idx": [0, 1], "a": [0.5, 0.9], "b": [0.25, 0.9],
             "label": [1.0, 0.0]}
        )
    )
    out = feedback.propagate_feedback(
        pairs, train, ["a", "b"], method="euzero"
    ).toPandas().set_index("src_id")
    # pair 1 matches train row 0 exactly (dist 0) → adopts label 1.0
    assert out.loc[1, "sim_prop"] == pytest.approx(1.0)
    # pair 2 is near but not exact → threshold 0 → unchanged
    assert out.loc[2, "sim_prop"] == pytest.approx(0.4)
    # pair 3 has an all-zero signature → skipped (validSsv)
    assert out.loc[3, "sim_prop"] == pytest.approx(0.4)


def test_propagate_logdist_moves_toward_label(spark):
    # two training rows → threshold (2-1)*3/100 = 0.03
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "src_id": [1, 2, 4],
                "dst_id": [11, 12, 14],
                "sim": [0.5, 0.5, 0.5],
                "a": [0.51, 0.88, 0.3],
                "b": [0.52, 0.91, 0.3],
            }
        )
    )
    train = spark.createDataFrame(
        pd.DataFrame(
            {"train_idx": [0, 1], "a": [0.5, 0.9], "b": [0.5, 0.9],
             "label": [1.0, 0.0]}
        )
    )
    out = feedback.propagate_feedback(
        pairs, train, ["a", "b"], method="logdist"
    ).toPandas().set_index("src_id")
    # pair 1: dist to t0 = hypot(.01,.02) ≈ 0.0224 <= 0.03, label 1 → up
    d1 = math.sqrt((fg(0.51) - fg(0.5)) ** 2 + (fg(0.52) - fg(0.5)) ** 2)
    delta1 = fg(math.log(2 - fg(d1)) / feedback.LN2 * 1.2)
    assert out.loc[1, "sim_prop"] == pytest.approx(min(1.0, 0.5 + delta1))
    assert out.loc[1, "sim_prop"] == pytest.approx(1.0)  # big log delta caps
    # pair 2: nearest t1 (label 0) at dist ≈ 0.0224 → down, clamped at 0
    assert out.loc[2, "sim_prop"] == pytest.approx(0.0)
    # pair 4: far from both → unchanged
    assert out.loc[4, "sim_prop"] == pytest.approx(0.5)


def test_propagate_logdist_forbidden_and_tiebreak(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "src_id": [1, 2],
                "dst_id": [11, 12],
                "sim": [0.5, 0.5],
                "a": [0.5, 0.5],
                "b": [0.5, 0.5],
            }
        )
    )
    # two equidistant training rows with opposite labels → the FIRST
    # (lowest train_idx) wins, as in the reference's strict < scan
    train = spark.createDataFrame(
        pd.DataFrame(
            {"train_idx": [0, 1], "a": [0.5, 0.5], "b": [0.5, 0.5],
             "label": [0.0, 1.0]}
        )
    )
    forb = spark.createDataFrame(
        pd.DataFrame({"src_id": [2], "dst_id": [12]})
    )
    out = feedback.propagate_feedback(
        pairs, train, ["a", "b"], method="logdist", forbidden=forb
    ).toPandas().set_index("src_id")
    # pair 1: tie → train_idx 0 (label 0) → pushed down to 0
    assert out.loc[1, "sim_prop"] == pytest.approx(0.0)
    # pair 2 is forbidden (validated) → untouched
    assert out.loc[2, "sim_prop"] == pytest.approx(0.5)


def test_propagate_quality_delta(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "src_id": [1],
                "dst_id": [11],
                "sim": [0.5],
                "a": [0.52],
                "b": [0.5],
                "mq": [0.4],
            }
        )
    )
    train = spark.createDataFrame(
        pd.DataFrame(
            {"train_idx": [0], "a": [0.5], "b": [0.5], "label": [1.0]}
        )
    )
    # threshold = |ssv| * 3/100 = 0.06 >= dist 0.02 → fires;
    # delta = ts_quality*(1-mq/2) = 0.25*0.8 = 0.2
    out = feedback.propagate_feedback(
        pairs, train, ["a", "b"], method="quality",
        ts_quality=0.25, mp_quality_col="mq",
    ).toPandas()
    assert out["sim_prop"].iloc[0] == pytest.approx(0.7)
    with pytest.raises(ValueError):
        feedback.propagate_feedback(pairs, train, ["a"], method="quality")
    with pytest.raises(ValueError):
        feedback.propagate_feedback(pairs, train, ["a"], method="bogus")


def test_extrapolate_fs(spark):
    validated = spark.createDataFrame(
        pd.DataFrame({"src_id": [1], "dst_id": [11]})
    )
    ss = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity_id": [1, 1, 1],
                "sibling_id": [2, 3, 4],
                "sim": [0.8, 0.7, 0.3],
            }
        )
    )
    ds = spark.createDataFrame(
        pd.DataFrame(
            {
                "entity_id": [11, 11],
                "sibling_id": [12, 13],
                "sim": [0.805, 0.95],
            }
        )
    )
    out = feedback.extrapolate_fs(
        validated, ss, ds, threshold=0.6, delta=0.01
    ).toPandas()
    # (2,12): |0.8-0.805| <= 0.01 → emitted at 1.0; sibling 4 below
    # threshold; (3,12)/(2,13)/(3,13) disagree beyond delta
    assert [(r.src_id, r.dst_id, r.sim) for r in out.itertuples()] == [
        (2, 12, 1.0)
    ]


def test_extrapolating_dsi_freezes_validated(spark):
    from ontologymatching_spark.operators.structural import dsi

    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "src_id": [1, 2, 100],
                "dst_id": [11, 12, 110],
                "sim": [0.4, 0.4, 0.9],
            }
        )
    )
    sp = spark.createDataFrame(
        pd.DataFrame({"child_id": [1, 2], "parent_id": [100, 100]})
    )
    dp = spark.createDataFrame(
        pd.DataFrame({"child_id": [11, 12], "parent_id": [110, 110]})
    )
    validated = spark.createDataFrame(
        pd.DataFrame({"src_id": [1], "dst_id": [11]})
    )
    plain = dsi(pairs, sp, dp).toPandas().set_index("src_id")
    out = (
        feedback.extrapolating_dsi(pairs, sp, dp, validated)
        .toPandas().set_index("src_id")
    )
    # the unvalidated sibling pair still inherits (matches plain DSI)
    assert out.loc[2, "sim_dsi"] == pytest.approx(plain.loc[2, "sim_dsi"])
    assert plain.loc[2, "sim_dsi"] != pytest.approx(0.4)
    # the validated cell is frozen at its user-approved sim
    assert out.loc[1, "sim_dsi"] == pytest.approx(0.4)
    assert plain.loc[1, "sim_dsi"] != pytest.approx(0.4)
