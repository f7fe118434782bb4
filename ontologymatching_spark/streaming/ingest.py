"""Incremental corpus ingest via Structured Streaming.

The reference is strictly batch (SURVEY.md §2.10); the streaming surface here
is the one piece a continuously-fed lake needs: newly landed source files are
parsed into triples/entities incrementally and appended to the lake, with
exactly-once semantics from the checkpoint location. Downstream matching
remains batch over snapshots (the reference's semantics), re-run via the
pipeline's resume mechanism.

``ingest_available_now`` uses Trigger.AvailableNow: drains everything
currently in the source directory and stops — the testable batch-of-streams
mode that behaves identically to a long-running stream."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

SRC_SCHEMA = StructType(
    [
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
    ]
)


def read_src_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over a directory of src_files parquet drops."""
    return (
        spark.readStream.schema(SRC_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(src_dir)
    )


def triples_stream(src_stream: DataFrame) -> DataFrame:
    """Same extraction operator as batch — extract_triples is a pure
    DataFrame transform, so it applies unchanged to the streaming plan."""
    from ..operators.extract import extract_triples

    return extract_triples(src_stream)


def ingest_available_now(
    spark: SparkSession, src_dir: str, out_dir: str, checkpoint_dir: str
) -> None:
    """Drain the current directory contents into the triples lake and stop.
    Restart-safe: the streaming checkpoint makes re-runs exactly-once."""
    q = (
        triples_stream(read_src_stream(spark, src_dir))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
