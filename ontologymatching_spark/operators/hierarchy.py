"""Hierarchy matcher: derive relation-typed (⊂ / ⊃) correspondences from an
equivalence alignment plus the parent structure of each side.

Reference analog: the LinkedOpenData hierarchy matchers
(Matcher-LinkedOpenData/.../hierarchy/HierarchyMatcherModified.java) which
emit subclass-relation mappings, with relations from the MappingRelation
enum (mappingEngine/Mapping.java:37-47). Rules (sound for any equivalence
alignment s ≡ d):

  c ⊂ s ∧ s ≡ d  ⟹  c subClassOf d     (source child of an aligned source)
  c' ⊂ d ∧ s ≡ d ⟹  s superClassOf c'  (target child of an aligned target)

Both rules are plain equi-joins on the parent edge tables — relation-typed
rows instead of scored rows, otherwise the same pair-table shape as every
other matcher.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hierarchy_mappings(
    alignment: DataFrame,
    src_parents: DataFrame,
    dst_parents: DataFrame,
) -> DataFrame:
    """alignment(src_id, dst_id) + parents(child_id, parent_id) per side →
    (src_id, dst_id, rel) with rel ∈ {subClassOf, superClassOf}."""
    al = alignment.select("src_id", "dst_id")
    sub = (
        al.join(
            src_parents.select(
                F.col("child_id"), F.col("parent_id").alias("src_id")
            ),
            "src_id",
        )
        .select(
            F.col("child_id").alias("src_id"),
            "dst_id",
            F.lit("subClassOf").alias("rel"),
        )
    )
    sup = (
        al.join(
            dst_parents.select(
                F.col("child_id"), F.col("parent_id").alias("dst_id")
            ),
            "dst_id",
        )
        .select(
            "src_id",
            F.col("child_id").alias("dst_id"),
            F.lit("superClassOf").alias("rel"),
        )
    )
    return sub.unionByName(sup).dropDuplicates(["src_id", "dst_id", "rel"])
