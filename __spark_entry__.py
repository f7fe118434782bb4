"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (blocked TF-IDF cosine + mutual-best 1-1
selection, the core matcher+selection shape of the engine) at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator family
(SURVEY.md §2), DuckDB-checked at sf0.01 by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may exec this file from another cwd — anchor the package path
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ontologymatching_spark import benchqueries as B  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: candidate blocking → corpus TF-IDF cosine → mutual-best 1-1
    selection over /root/testdata/sf0.001 documents."""
    return B.q_mutual_best_selection(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(B.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(B.ORACLE_SQL)
