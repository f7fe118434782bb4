"""Connected-components tests: chains (FIXTURES.md §3.8), multiple components,
convergence, canonical id = min member."""

import pandas as pd

from ontologymatching_spark.operators import components


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src_id", "dst_id"])
    )


def test_chain(spark):
    # a→b→c→d chain: one component, label = min id
    out = components.connected_components(
        _edges(spark, [(1, 2), (2, 3), (3, 4)])
    ).toPandas()
    assert set(out["component_id"]) == {1}
    assert len(out) == 4


def test_two_components_and_cycle(spark):
    out = components.connected_components(
        _edges(spark, [(10, 20), (20, 30), (30, 10), (5, 6)])
    ).toPandas()
    comp = dict(zip(out["entity_id"], out["component_id"]))
    assert comp[10] == comp[20] == comp[30] == 10
    assert comp[5] == comp[6] == 5


def test_long_chain_converges(spark):
    n = 33
    out = components.connected_components(
        _edges(spark, [(i, i + 1) for i in range(n)]), max_rounds=50
    ).toPandas()
    assert set(out["component_id"]) == {0}
    assert len(out) == n + 1


def test_star_equals_hash_min_random_graphs(spark):
    """Large-star/small-star must produce the identical (entity, min-label)
    table as plain hash-min propagation on random graphs."""
    import numpy as np

    for seed in (3, 17):
        rng = np.random.default_rng(seed)
        n = 60
        pairs = [
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(80, 2))
            if a != b
        ]
        star = components.connected_components(_edges(spark, pairs)).toPandas()
        ref = components.hash_min_components(_edges(spark, pairs)).toPandas()
        got = dict(zip(star["entity_id"], star["component_id"]))
        want = dict(zip(ref["entity_id"], ref["component_id"]))
        assert got == want


def test_star_chain_round_count(spark):
    """The planted 1000-chain: hash-min needs O(diameter) ≈ 1000 rounds
    (it cannot converge under any sane cap); the star alternation finishes
    in O(log n) rounds with the correct single component."""
    n = 1000
    stats: dict = {}
    out = components.connected_components(
        _edges(spark, [(i, i + 1) for i in range(n)]),
        max_rounds=50,
        stats=stats,
    ).toPandas()
    assert set(out["component_id"]) == {0}
    assert len(out) == n + 1
    assert stats["rounds"] <= 15  # log-scale, not diameter-scale

    # hash-min on a short chain for the round-count contrast (a full 1000
    # chain would need ~1000 rounds — the very pathology star removes)
    h: dict = {}
    components.hash_min_components(
        _edges(spark, [(i, i + 1) for i in range(32)]),
        max_rounds=50, stats=h,
    )
    assert h["rounds"] > 15  # diameter-bound


def test_matrix_algebra(spark):
    """Sparse pair-table matrix ops: transpose / plus / times vs dense numpy."""
    import numpy as np
    import pytest

    from ontologymatching_spark.operators import matrix as M

    # A: 2x3 sparse (one zero cell), B: 3x2
    a_rows = [(0, 0, 1.0), (0, 1, 2.0), (1, 1, 3.0), (1, 2, 4.0)]
    b_rows = [(0, 0, 5.0), (1, 0, 6.0), (1, 1, 7.0), (2, 1, 8.0)]
    A = spark.createDataFrame(a_rows, "row_id long, col_id long, v double")
    B = spark.createDataFrame(b_rows, "row_id long, col_id long, v double")

    def dense(df, shape):
        out = np.zeros(shape)
        for r in df.collect():
            out[r.row_id][r.col_id] = r.v
        return out

    An = dense(A, (2, 3))
    Bn = dense(B, (3, 2))
    assert np.allclose(dense(M.transpose(A), (3, 2)), An.T)
    # plus over same-shape matrices (missing cells are zeros)
    C = spark.createDataFrame(
        [(0, 0, 10.0), (1, 0, 20.0)], "row_id long, col_id long, v double"
    )
    Cn = dense(C, (2, 3))
    assert np.allclose(dense(M.plus(A, C), (2, 3)), An + Cn)
    # relational matmul == dense matmul; zero-product cells absent
    P = M.times(A, B)
    assert np.allclose(dense(P, (2, 2)), An @ Bn)
    got_cells = {(r.row_id, r.col_id) for r in P.collect()}
    want_cells = {(i, j) for i in range(2) for j in range(2)
                  if (An @ Bn)[i][j] != 0}
    assert got_cells == want_cells
    # Gram matrix is symmetric
    G = M.times(A, M.transpose(A)).toPandas()
    g = {(r.row_id, r.col_id): r.v for r in G.itertuples()}
    assert g[(0, 1)] == pytest.approx(g[(1, 0)])
