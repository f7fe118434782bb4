"""Unit tests for the UFL candidate-quality metrics (operators/ufl.py) —
hand-computed expectations on tiny matrices, reference quirks included."""

import math

import pytest
from pyspark.sql import functions as F

from ontologymatching_spark.operators.ufl import (
    consensus_quality,
    cross_count_quality,
    cross_sum_quality,
    expanded_consensus,
    intra_coupling,
    multi_matcher_confidence,
    propagation_impact,
    revalidation_rate,
    similarity_definiteness,
    similarity_distance,
)


@pytest.fixture()
def matrix(spark):
    # 2x3 sparse matrix:
    #        d1    d2    d3
    #  s1   0.9   0.4    -
    #  s2    -    0.8    -
    return spark.createDataFrame(
        [("s1", "d1", 0.9), ("s1", "d2", 0.4), ("s2", "d2", 0.8)],
        "src string, dst string, sim double",
    )


def _by_pair(rows, col):
    return {(r["src"], r["dst"]): r[col] for r in rows}


def test_cross_count(spark, matrix):
    # row counts: s1=2, s2=1 (max 2); col counts: d1=1, d2=2 (max 2) → norm 4
    out = _by_pair(
        cross_count_quality(matrix, "src", "dst", "sim").collect(), "cross_count"
    )
    assert out[("s1", "d1")] == pytest.approx((2 + 1) / 4)
    assert out[("s1", "d2")] == pytest.approx((2 + 2) / 4)
    assert out[("s2", "d2")] == pytest.approx((1 + 2) / 4)


def test_cross_sum(spark, matrix):
    # row sums: s1=1.3, s2=0.8 (max 1.3); col sums: d1=0.9, d2=1.2 (max 1.2)
    out = _by_pair(
        cross_sum_quality(matrix, "src", "dst", "sim").collect(), "cross_sum"
    )
    norm = 1.3 + 1.2
    assert out[("s1", "d1")] == pytest.approx((1.3 + 0.9) / norm)
    assert out[("s2", "d2")] == pytest.approx((0.8 + 1.2) / norm)


def test_definiteness_and_mm_confidence(spark, matrix):
    df = similarity_definiteness(matrix, "sim")
    df = df.withColumn("s2", F.col("sim") / 2)
    df = multi_matcher_confidence(df, ["sim", "s2"], threshold=0.7)
    rows = _by_pair(df.collect(), "definiteness")
    assert rows[("s1", "d1")] == pytest.approx(0.8)   # 2*|0.9-0.5|
    assert rows[("s1", "d2")] == pytest.approx(0.2)   # 2*|0.4-0.5|
    conf = _by_pair(df.collect(), "mm_confidence")
    # (|0.7-0.9| + |0.7-0.45|)/2
    assert conf[("s1", "d1")] == pytest.approx((0.2 + 0.25) / 2)


def test_similarity_distance_sparse(spark, matrix):
    # dense dims 2x3: every row/col has implicit zeros → |sim-0| candidate.
    # s1 row neighbors: {0.9, 0.4} → (s1,d1): row min |0.9-0.4|=0.5;
    # col d1 has no other cell → implicit 0 → 0.9; least(0.5, 0.9, 0.9)=0.5…
    # but row s1 also has an implicit zero (2 of 3 cols filled) → 0.9 cand.
    out = _by_pair(
        similarity_distance(matrix, "src", "dst", "sim",
                            n_rows=2, n_cols=3).collect(),
        "sim_distance",
    )
    assert out[("s1", "d1")] == pytest.approx(0.5)
    # (s1,d2): row |0.4-0.9|=0.5, col |0.4-0.8|=0.4, zeros 0.4 → 0.4
    assert out[("s1", "d2")] == pytest.approx(0.4)
    # (s2,d2): row only cell → implicit zero 0.8; col |0.8-0.4|=0.4 → 0.4
    assert out[("s2", "d2")] == pytest.approx(0.4)


def test_similarity_distance_full_row_no_zero(spark):
    # 1x2 dense-full row: no implicit zero in the row; cols are 1-cell with
    # n_rows=1 → no implicit zero anywhere; min = row neighbor distance.
    m = spark.createDataFrame(
        [("s1", "d1", 0.9), ("s1", "d2", 0.2)],
        "src string, dst string, sim double",
    )
    out = _by_pair(
        similarity_distance(m, "src", "dst", "sim",
                            n_rows=1, n_cols=2).collect(),
        "sim_distance",
    )
    assert out[("s1", "d1")] == pytest.approx(0.7)
    assert out[("s1", "d2")] == pytest.approx(0.7)


@pytest.fixture()
def votes(spark):
    return spark.createDataFrame(
        [
            # (pair, pos, neg, sim)
            ("a", "x", 2, 2, 0.9),   # tie
            ("a", "y", 3, 0, 0.2),   # pos hits maxConsensus
            ("b", "x", 5, 0, 0.9),   # pos EXCEEDS maxConsensus (quirk)
            ("b", "y", 1, 0, 0.9),   # single validation (expansion case)
            ("c", "x", 0, 1, 0.1),   # single validation, low sim
            ("c", "y", 2, 0, 0.5),
        ],
        "src string, dst string, pos long, neg long, sim double",
    )


def test_consensus_quality(spark, votes):
    out = _by_pair(consensus_quality(votes, "pos", "neg", 5).collect(),
                   "consensus")
    assert out[("a", "x")] == 0.0                       # tie
    assert out[("a", "y")] == 1.0                       # == maxConsensus
    assert out[("b", "x")] == pytest.approx(5 / 3)      # quirk: > 1
    assert out[("c", "y")] == pytest.approx(2 / 3)


def test_expanded_consensus(spark, votes):
    out = _by_pair(
        expanded_consensus(votes, "pos", "neg", "sim", 0.7, 5).collect(),
        "expanded_consensus",
    )
    # (b,y): 1 validation, sim 0.9 > 0.7 → pos 2, neg 0 → |2|/3
    assert out[("b", "y")] == pytest.approx(2 / 3)
    # (c,x): 1 validation, sim 0.1 ≤ 0.7 → neg 2 → |0-2|/3
    assert out[("c", "x")] == pytest.approx(2 / 3)
    # multi-validation rows unchanged vs consensus
    assert out[("a", "x")] == 0.0
    assert out[("a", "y")] == 1.0


def test_propagation_impact(spark, votes):
    out = _by_pair(propagation_impact(votes, "pos", "neg", 5).collect(),
                   "propagation_impact")
    assert out[("a", "y")] == 0.0                       # hit maxConsensus
    assert out[("a", "x")] == pytest.approx(1.0)        # (3-2)/(3-2)… min=max
    # quirk: pos=5 → min(-2,3)/max(-2,3) = -2/3
    assert out[("b", "x")] == pytest.approx(-2 / 3)
    assert out[("c", "y")] == pytest.approx((3 - 2) / 3)


def test_revalidation_rate(spark, votes):
    # maxRepetition = max(pos)=5 + max(neg)=2 = 7
    out = _by_pair(revalidation_rate(votes, "pos", "neg").collect(),
                   "revalidation_rate")
    assert out[("a", "x")] == pytest.approx(4 / 7)
    assert out[("b", "x")] == pytest.approx(5 / 7)
    assert out[("c", "x")] == pytest.approx(1 / 7)


def test_user_disagreement(spark, votes):
    from ontologymatching_spark.operators.ufl import user_disagreement

    out = _by_pair(user_disagreement(votes, "pos", "neg").collect(),
                   "user_disagreement")
    assert out[("a", "x")] == pytest.approx(1.0)        # 2/2 split: max var
    assert out[("a", "y")] == pytest.approx(0.0)        # unanimous
    assert out[("c", "y")] == pytest.approx(0.0)
    assert out[("c", "x")] == pytest.approx(0.0)        # single vote
    # 4*p*(1-p) with p = 1/2... for ("b","y"): pos=1,neg=0 → 0
    assert out[("b", "y")] == pytest.approx(0.0)


def test_intra_coupling(spark):
    # rows s1,s2 argmax to the SAME target d1; s3 → d2: 2 distinct / 3 rows
    m = spark.createDataFrame(
        [("s1", "d1", 0.9), ("s1", "d2", 0.2),
         ("s2", "d1", 0.8), ("s3", "d2", 0.7)],
        "src string, dst string, sim double",
    )
    [row] = intra_coupling(m, "src", "dst", "sim").collect()
    assert row["intra_coupling"] == pytest.approx(2 / 3)


def test_intra_coupling_tie_break(spark):
    # equal sims in a row → deterministic argmax = smallest dst
    m = spark.createDataFrame(
        [("s1", "d2", 0.5), ("s1", "d1", 0.5), ("s2", "d1", 0.5)],
        "src string, dst string, sim double",
    )
    [row] = intra_coupling(m, "src", "dst", "sim").collect()
    # s1 → d1 (tie broken by dst asc), s2 → d1 → 1 distinct / 2 rows
    assert row["intra_coupling"] == pytest.approx(0.5)


def test_ufl_quality_query_runs(spark):
    """End-to-end smoke at sf0.001: schema + non-empty + metrics in-range
    (quirk columns excepted)."""
    from ontologymatching_spark.benchqueries import q_ufl_quality

    pdf = q_ufl_quality(spark, "/root/testdata/sf0.001").toPandas()
    assert len(pdf) > 0
    for c in ["cross_count", "cross_sum", "definiteness", "mm_confidence",
              "revalidation_rate", "user_disagreement"]:
        assert pdf[c].between(0.0, 1.0 + 1e-9).all(), c
    assert (pdf["sim_distance"] >= 0).all()
    assert pdf["intra_coupling"].nunique() == 1
    assert not pdf.isnull().any().any()


def test_similarity_distance_equals_bruteforce(spark):
    """Property: the sorted-adjacent-difference window computation equals
    the reference's O(row+col) brute-force scan (min |sim - other| over the
    cell's row and column, plus implicit zeros in sparse form) on a batch
    of seeded random sparse matrices."""
    import itertools
    import random

    for seed in range(6):
        rng = random.Random(seed)
        n_rows, n_cols = rng.randint(2, 5), rng.randint(2, 5)
        cells = [
            (f"s{i}", f"d{j}", round(rng.random(), 3))
            for i in range(n_rows) for j in range(n_cols)
            if rng.random() < 0.6
        ]
        if not cells:
            continue
        m = spark.createDataFrame(cells, "src string, dst string, sim double")
        got = _by_pair(
            similarity_distance(m, "src", "dst", "sim",
                                n_rows=n_rows, n_cols=n_cols).collect(),
            "sim_distance",
        )
        by_src = {}
        by_dst = {}
        for s, d, v in cells:
            by_src.setdefault(s, []).append((d, v))
            by_dst.setdefault(d, []).append((s, v))
        for s, d, v in cells:
            cands = [abs(v - v2) for d2, v2 in by_src[s] if d2 != d]
            cands += [abs(v - v2) for s2, v2 in by_dst[d] if s2 != s]
            if len(by_src[s]) < n_cols:
                cands.append(abs(v))   # implicit zero in the row
            if len(by_dst[d]) < n_rows:
                cands.append(abs(v))   # implicit zero in the column
            want = min(cands) if cands else 1.0e9
            assert got[(s, d)] == pytest.approx(want, abs=1e-12), (
                seed, s, d, v, got[(s, d)], want,
            )
