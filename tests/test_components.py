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
