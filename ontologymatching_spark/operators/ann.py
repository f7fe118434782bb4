"""Approximate nearest neighbor over an embedding column (array<float>).

Baseline: brute-force cosine top-k (JVM-side zip_with/aggregate dot products,
broadcast probe side — no Python in the hot path). Scale paths:

- random-hyperplane LSH — bucket vectors by sign bits, join within buckets
  only; at 100 TB the bucket equi-join replaces the quadratic cross join,
  trading recall (measured, see tests) for a shuffle-sized-by-bucket plan.
- IVF (inverted-file index, the FAISS-style coarse quantizer) — k-means
  centroids partition the space; each vector lands in its nearest-centroid
  cell, probes scan only their ``nprobe`` nearest cells. The centroid table
  is tiny and broadcast; the candidate join is an equi-join on cell id, so
  pair count is driven by cell size × nprobe, never corpus². Training is
  deterministic (md5-ordered seed sample, bounded Lloyd rounds, all values
  floored onto a 2^-b binary grid so sums are exact and engine/partition-
  order independent — the MSSG k-means recipe).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.spark_sims import cosine_array_col


def _pair_parts(df: DataFrame) -> int:
    """Partition count for the compute-dense candidate-pair joins. The pair
    rows are tiny in BYTES (ids + two array<float>) but heavy in CPU (a
    64-dim cosine each), so AQE's byte-targeted coalescing collapses them
    onto a handful of tasks (profiled at bench SF: the IVF cell join ran
    35.9 s of cosine work on 5 tasks, the LSH bucket join 15.3 s on 2).
    An explicit keyed repartition pins the join parallelism — user-specified
    repartitions are exempt from AQE coalescing. Scale-adaptive (derived
    from the session), env-overridable."""
    from ..partitions import fan_parts

    return fan_parts(df)


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

    # r6 NOTE: a salted variant of this join (probe exploded 8x, candidates
    # pmod-salted, keyed repartition) was measured and REVERTED — with the
    # caller's scan fanned the candidate side broadcasts and the probe side
    # carries the scan's parallelism, so the salt's 8x probe replication was
    # pure overhead (interleaved A/B at bench SF: salted ~4.0 s, unsalted
    # ~2.5-3.5 s, both stable). The round-5 2-task pathology came from the
    # single-split scan upstream, not from this join's key count.
    a = outs.select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe"),
        "tbl", "bucket",
    )
    c = outs.select(
        F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"),
        "tbl", "bucket",
    )
    # score BEFORE deduplicating: cosine is deterministic, so duplicate
    # (probe,cand) rows from different tables dedup identically on the
    # 3-column narrow row — shipping the two 64-float arrays through the
    # dropDuplicates shuffle instead cost ~4x (the disagreement-variance
    # recompute-vs-materialize lesson applied to a shuffle boundary)
    pairs = (
        a.join(c, ["tbl", "bucket"])
        .filter(F.col("probe_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(cosine_array_col(F.col("pe"), F.col("ce")), 9))
        .select("probe_id", "cand_id", "cosine")
        .dropDuplicates(["probe_id", "cand_id"])
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("probe_id", "cand_id", "cosine", "rnk")
    )


def _quantize_col(emb, grid: float):
    """array<float> → array<double> floored onto the 2^-b binary grid
    (exact cross-engine products/sums; float→double widening is exact)."""
    return F.transform(emb, lambda x: F.floor(x.cast("double") * grid) / grid)


def _dot_col(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_train_centroids(
    vectors: DataFrame,
    n_centroids: int = 8,
    n_iter: int = 3,
    sample: int = 128,
    grid_bits: int = 20,
) -> DataFrame:
    """Deterministic k-means coarse quantizer → (cid, ce: array<double>).

    Seeds = the ``n_centroids`` sample vectors with smallest md5(vec_id)
    (engine-portable pseudo-random draw); ``n_iter`` bounded Lloyd rounds on
    the md5-smallest ``sample`` vectors; assignment = max quantized dot
    (ties → smaller cid); update = per-dim exact mean re-floored onto the
    grid; a cell that loses all members keeps its previous centroid. Every
    arithmetic step stays on the binary grid, so centroids are bit-identical
    across engines, partitionings and summation orders."""
    from ..functions.spark_sims import md5int_col

    grid = float(1 << grid_bits)
    h = md5int_col(F.col("vec_id").cast("string"))
    train = (
        vectors.select("vec_id", _quantize_col(F.col("embedding"), grid).alias("qe"))
        .withColumn("_h", h)
        .orderBy("_h", "vec_id")
        .limit(sample)
        .withColumn(
            "_rn", F.row_number().over(Window.orderBy("_h", "vec_id"))
        )
        .localCheckpoint()
    )
    centroids = train.filter(F.col("_rn") <= n_centroids).select(
        (F.col("_rn") - 1).cast("long").alias("cid"), F.col("qe").alias("ce")
    ).localCheckpoint()
    for _ in range(n_iter):
        w = Window.partitionBy("vec_id").orderBy(
            F.desc("_dot"), F.asc("cid")
        )
        assigned = (
            train.crossJoin(F.broadcast(centroids))
            .withColumn("_dot", _dot_col(F.col("qe"), F.col("ce")))
            .withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("cid", "qe")
        )
        means = (
            assigned.select("cid", F.posexplode("qe").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg((F.floor(F.avg("x") * grid) / grid).alias("m"))
        )
        updated = means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"],
            ).alias("ce")
        )
        centroids = updated.unionByName(
            centroids.join(updated.select("cid"), "cid", "left_anti")
        ).localCheckpoint()
    return centroids


def derive_ivf_params(
    n_vectors: int, shuffle_partitions: int = 32
) -> tuple[int, int, int]:
    """(n_centroids, n_salt, sample) for an IVF index over ``n_vectors``.

    n_centroids ≈ √N (the FAISS guidance: cells of ~√N vectors balance
    probe cost against cell-scan cost); n_salt subdivides cells until
    cid×salt task keys ≥ 4× the shuffle partitions (few-key equi-joins
    otherwise cap parallelism at the cell count, the round-2 lesson),
    capped at 64; the training sample covers ≥ 8 vectors per centroid
    (bounded at 4096 so the driver-free Lloyd loop stays cheap)."""
    import math

    n_centroids = max(1, int(round(math.sqrt(max(n_vectors, 1)))))
    n_salt = max(1, min(64, -(-4 * shuffle_partitions // n_centroids)))
    sample = max(128, min(4096, 8 * n_centroids))
    return n_centroids, n_salt, sample


def ivf_topk(
    vectors: DataFrame,
    k: int = 10,
    n_centroids: int | None = 8,
    nprobe: int = 2,
    n_iter: int = 3,
    sample: int = 128,
    grid_bits: int = 20,
    n_salt: int | None = None,
) -> DataFrame:
    """All-pairs ANN via an IVF index: every vector is indexed under its
    nearest centroid cell (rank-1 quantized dot); every probe scans its
    ``nprobe`` nearest cells; candidates come from the cell equi-join (pair
    count = Σ probe-cell sizes, never corpus²); exact cosine re-ranks
    within candidates. Output schema matches lsh_topk:
    (probe_id, cand_id, cosine, rnk).

    ``n_centroids=None`` derives production parameters from one count of
    the corpus via ``derive_ivf_params`` (≈√N centroids, salt sized to
    the session's shuffle parallelism) — the explicit-int default keeps
    small benches deterministic, but scale runs should pass None so
    bench-sized cells can't leak into a 100-TB index."""
    if n_centroids is None:
        spark = vectors.sparkSession
        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        n_centroids, derived_salt, sample = derive_ivf_params(
            vectors.count(), parts
        )
        if n_salt is None:
            n_salt = derived_salt
    if n_salt is None:
        n_salt = 8
    centroids = ivf_train_centroids(
        vectors, n_centroids=n_centroids, n_iter=n_iter, sample=sample,
        grid_bits=grid_bits,
    )
    # narrow (vec_id, cid, rk) assignment, checkpointed once — the probe
    # and cell branches both read it (the plan otherwise rebuilds the
    # crossJoin + window per branch), and no array rides its windows
    ranked = ivf_assign(
        vectors, centroids, nprobe=nprobe, grid_bits=grid_bits
    ).localCheckpoint()
    return ivf_probe_topk(vectors, ranked, k=k, n_salt=n_salt)


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    grid_bits: int = 20,
) -> DataFrame:
    """→ (vec_id, cid, _rk≤nprobe): nearest-centroid cell assignment.
    VECTOR-LOCAL given the centroid table (rank-1 quantized dot, ties →
    smaller cid) — this is the incremental-reuse boundary: a corpus
    snapshot that keeps its centroids keeps every unchanged vector's
    assignment rows bit-exactly (plans/incremental_dedup.py)."""
    grid = float(1 << grid_bits)
    w = Window.partitionBy("vec_id").orderBy(F.desc("_dot"), F.asc("cid"))
    return (
        vectors.select(
            "vec_id", _quantize_col(F.col("embedding"), grid).alias("qe")
        )
        .crossJoin(F.broadcast(centroids))
        .withColumn("_dot", _dot_col(F.col("qe"), F.col("ce")))
        .select("vec_id", "cid", "_dot")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= nprobe)
        .select("vec_id", "cid", "_rk")
    )


def ivf_probe_topk(
    vectors: DataFrame,
    ranked: DataFrame,
    k: int = 10,
    n_salt: int = 8,
) -> DataFrame:
    """IVF tail: cell equi-join + exact cosine re-rank from a precomputed
    assignment table ``ranked`` (vec_id, cid, _rk). Global — recomputes
    fully in the incremental plan (pair set depends on every cell's
    membership)."""
    emb = vectors.select("vec_id", "embedding")
    # salt the cell join: with few cells (small benches / early index
    # builds) the cid key alone caps join parallelism at n_centroids tasks;
    # replicating each probe across n_salt sub-cells while each candidate
    # keeps exactly one (cand_id-derived, pmod so negative ids land in
    # [0, n_salt) too) salt preserves the pair set and spreads a hot cell
    # across tasks (same trick as blocking.salted_*; at production scale
    # n_centroids ~ sqrt(N) already gives cardinality, salting then simply
    # subdivides the largest cells). Embeddings ride the salted join INPUTS
    # (N + N·n_salt rows with arrays) — measured 2.5× cheaper than joining
    # narrow id pairs first and attaching arrays after, because the join
    # OUTPUT (Σ cell-size × nprobe pair rows, the big number) is consumed
    # in-stage by the cosine + the narrow top-k window and never shuffles;
    # attach-after would push every pair row through two more SMJ shuffles.
    cells = (
        ranked.filter(F.col("_rk") == 1)
        .join(emb, "vec_id")
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("ce2"), "cid",
            F.pmod(F.col("vec_id"), F.lit(n_salt)).cast("int").alias("_salt"),
        )
    )
    probes = (
        ranked.join(emb, "vec_id")
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("pe"), "cid",
            F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt"),
        )
    )
    pairs = (
        # keyed repartition pins the cosine stage's parallelism (AQE's
        # byte-targeted coalescing otherwise collapses the tiny-but-CPU-
        # heavy pair rows onto a handful of tasks — see _pair_parts)
        probes.repartition(_pair_parts(probes), "cid", "_salt")
        .join(cells, ["cid", "_salt"])
        .filter(F.col("probe_id") != F.col("cand_id"))
        .withColumn(
            "cosine", F.round(cosine_array_col(F.col("pe"), F.col("ce2")), 9)
        )
        .select("probe_id", "cand_id", "cosine")
    )
    wk = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(wk))
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
