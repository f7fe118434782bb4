"""Bucketed-table co-located joins: same-key/same-count bucketed tables
must sort-merge-join with NO shuffle exchange (the write-once-join-many
layout lever described in SCALE.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ontologymatching_spark.plans import layout


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, no_broadcast):
    a = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    layout.write_bucketed(a, "t_bkt_a", "k", 8)
    layout.write_bucketed(b, "t_bkt_b", "k", 8)
    j = layout.read_table(spark, "t_bkt_a").join(
        layout.read_table(spark, "t_bkt_b"), "k"
    )
    assert layout.join_is_shuffle_free(j)
    assert j.count() == 5000

    # negative control: the same join over plain (unbucketed) frames DOES
    # shuffle — the assertion helper actually discriminates
    plain = a.join(b, "k")
    assert not layout.join_is_shuffle_free(plain)
    assert plain.count() == 5000
