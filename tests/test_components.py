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
