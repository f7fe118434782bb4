"""Approximate nearest neighbor over an embedding column (array<float>).

Baseline: brute-force cosine top-k (JVM-side zip_with/aggregate dot products,
broadcast probe side — no Python in the hot path). Scale path: random-
hyperplane LSH — bucket vectors by sign bits, join within buckets only; at
100 TB the bucket equi-join replaces the quadratic cross join, trading
recall (measured, see tests) for a shuffle-sized-by-bucket plan.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.spark_sims import cosine_array_col


def brute_force_topk(
    probes: DataFrame, candidates: DataFrame, k: int = 10
) -> DataFrame:
    """probes(probe_id, embedding) x candidates(cand_id, embedding) →
    (probe_id, cand_id, cosine, rnk<=k). Probe side is broadcast — the
    candidate scan stays partition-parallel with no shuffle of the big side."""
    p = probes.select(
        F.col("probe_id"), F.col("embedding").alias("pe")
    )
    c = candidates.select(F.col("cand_id"), F.col("embedding").alias("ce"))
    scored = (
        F.broadcast(p).crossJoin(c)
        .filter(F.col("probe_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(cosine_array_col(F.col("pe"), F.col("ce")), 9))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("probe_id", "cand_id", "cosine", "rnk")
    )


def _planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic hyperplanes from md5 (no RNG → identical across runs,
    engines and cluster sizes)."""
    return [
        [
            (int(hashlib.md5(f"plane{j}_{i}".encode()).hexdigest()[:8], 16)
             % 2001 - 1000) / 1000.0
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def lsh_bucket_col(emb, n_planes: int, dim: int):
    bits = []
    for j, plane in enumerate(_planes(n_planes, dim)):
        pl = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(emb, pl, lambda x, p: x.cast("double") * p),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    return sum(bits[1:], bits[0]).cast("long")


def lsh_topk(
    vectors: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 2,
) -> DataFrame:
    """All-pairs ANN: bucket with ``n_tables`` independent LSH tables (plane
    sets offset per table), self-join within (table, bucket), cosine + top-k.
    More tables → higher recall, linearly more join work."""
    outs = None
    for t in range(n_tables):
        planes_offset = t * n_planes
        bits = []
        for j, plane in enumerate(_planes(planes_offset + n_planes, dim)[planes_offset:]):
            pl = F.array(*[F.lit(v) for v in plane])
            dot = F.aggregate(
                F.zip_with(F.col("embedding"), pl, lambda x, p: x.cast("double") * p),
                F.lit(0.0), lambda acc, v: acc + v,
            )
            bits.append(F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)))
        b = vectors.select(
            F.col("vec_id"),
            F.col("embedding"),
            F.lit(t).alias("tbl"),
            sum(bits[1:], bits[0]).cast("long").alias("bucket"),
        )
        outs = b if outs is None else outs.unionByName(b)

    a = outs.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe"),
        "tbl", "bucket",
    )
    c = outs.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"),
        "tbl", "bucket",
    )
    pairs = (
        a.join(c, ["tbl", "bucket"])
        .filter(F.col("probe_id") != F.col("cand_id"))
        .select("probe_id", "cand_id", "pe", "ce")
        .dropDuplicates(["probe_id", "cand_id"])
        .withColumn("cosine", F.round(cosine_array_col(F.col("pe"), F.col("ce")), 9))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("probe_id", "cand_id", "cosine", "rnk")
    )


def recall_at_k(approx: DataFrame, exact: DataFrame, k: int = 10) -> float:
    """Fraction of exact top-k pairs recovered by the approximate search."""
    e = exact.filter(F.col("rnk") <= k).select("probe_id", "cand_id")
    a = approx.filter(F.col("rnk") <= k).select("probe_id", "cand_id")
    n_exact = e.count()
    if n_exact == 0:
        return 1.0
    return a.join(e, ["probe_id", "cand_id"]).count() / n_exact
