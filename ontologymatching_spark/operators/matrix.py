"""Sparse similarity-matrix algebra over the pair-table representation
(SURVEY.md §2.5 tail — the reference's dense ``SimilarityMatrix`` helpers
``transpose`` / ``plus`` / ``times``, ArraySimilarityMatrix.java; here each
matrix is a DataFrame (row_id, col_id, v) and absent cells are implicit
zeros, so the ops are joins/aggregations instead of dense loops):

  transpose — swap row/col (free: a projection)
  plus      — cell-wise addition: full-outer join, missing cells = 0
  times     — matrix product: equi-join on the inner dimension + groupBy
              sum (the relational matmul — shuffles on the inner key, which
              is the partition-friendly contraction at lake scale)

The pair-table form never materializes zero cells: ``times`` over two
blocked similarity matrices costs |A| x avg-fanout, not n^2 x m.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAT_COLS = ("row_id", "col_id", "v")


def transpose(m: DataFrame) -> DataFrame:
    """Mᵀ: swap the row/col ids."""
    return m.select(
        F.col("col_id").alias("row_id"),
        F.col("row_id").alias("col_id"),
        "v",
    )


def plus(a: DataFrame, b: DataFrame) -> DataFrame:
    """A + B cell-wise; a cell present in one side only keeps its value
    (implicit zero on the other side)."""
    aa = a.select("row_id", "col_id", F.col("v").alias("_va"))
    bb = b.select("row_id", "col_id", F.col("v").alias("_vb"))
    return aa.join(bb, ["row_id", "col_id"], "full_outer").select(
        "row_id", "col_id",
        (
            F.coalesce(F.col("_va"), F.lit(0.0))
            + F.coalesce(F.col("_vb"), F.lit(0.0))
        ).alias("v"),
    )


def times(a: DataFrame, b: DataFrame) -> DataFrame:
    """A × B: contract A.col_id against B.row_id — equi-join + sum.
    Zero-product cells are never produced (sparse semantics)."""
    aa = a.select(F.col("row_id"), F.col("col_id").alias("_k"),
                  F.col("v").alias("_va"))
    bb = b.select(F.col("row_id").alias("_k"), F.col("col_id"),
                  F.col("v").alias("_vb"))
    return (
        aa.join(bb, "_k")
        .groupBy("row_id", "col_id")
        .agg(F.sum(F.col("_va") * F.col("_vb")).alias("v"))
    )
