"""Connected-components canonicalization: hash-min label propagation over the
selected alignment, as iterative DataFrame self-joins (north rule; same shape
as the reference's SimilarityFlooding fixpoint, structuralMatchers/
SimilarityFlooding.java:472-575 — bounded rounds + convergence check +
per-round checkpoint to cut lineage).

Canonical id of a cluster = min(entity_id) over the component → stable across
runs and parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src_col: str = "src_id",
    dst_col: str = "dst_id",
    max_rounds: int = 50,
) -> DataFrame:
    """edges → (entity_id, component_id) with component_id = min member id.

    Hash-min label propagation: every vertex starts labeled with its own id;
    each round every vertex takes the min label in its closed neighborhood;
    converged when no label changes. Large-star/small-star would cut rounds
    for pathological chains; plain hash-min converges in O(diameter) rounds,
    and alignment components are shallow (selection is 1-1 per matcher pair),
    so diameter is small by construction."""
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .unionByName(
            edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("a").alias("entity_id"))
        .distinct()
        .withColumn("component_id", F.col("entity_id"))
        .localCheckpoint()
    )

    for _ in range(max_rounds):
        # min label over neighbors
        nbr_min = (
            sym.join(labels, sym.b == labels.entity_id)
            .groupBy("a")
            .agg(F.min("component_id").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.entity_id == nbr_min.a, "left")
            .select(
                "entity_id",
                F.least(
                    F.col("component_id"),
                    F.coalesce(F.col("nbr_label"), F.col("component_id")),
                ).alias("component_id"),
                F.col("component_id").alias("old"),
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("component_id") != F.col("old")).count()
        labels = new_labels.drop("old")
        if changed == 0:
            break
    return labels


def canonicalize(alignment: DataFrame, entities: DataFrame) -> DataFrame:
    """alignment(src_id, dst_id) + entities → entities with ``canonical_id``
    (= component min id; singletons keep their own id)."""
    comps = connected_components(alignment)
    return entities.join(
        comps, entities.entity_id == comps.entity_id, "left"
    ).select(
        entities["*"],
        F.coalesce(F.col("component_id"), entities.entity_id).alias("canonical_id"),
    )
