"""Streaming exact-dedup for a continuously-fed training-data lake
(beyond the strictly-batch reference, SURVEY.md §2.10): drop re-landed
duplicate documents ACROSS microbatches with bounded state.

Spark-first shape: ``dropDuplicatesWithinWatermark`` on the content
fingerprint — the built-in stateful dedup operator. The watermark bounds
how long a fingerprint is remembered, so state is O(unique docs per
watermark horizon), not O(corpus): at lake scale the state store holds one
compact (fingerprint → expiry) entry per recent doc, partitioned by
fingerprint hash across executors, and eviction is automatic when the
watermark passes. The batch twin (`dedup_batch_twin`) is first-arrival
keep: row_number over (fingerprint ORDER BY ts, doc_id) = 1 — the streaming
output equals it whenever duplicates land inside the watermark horizon
(the tested regime; a dup arriving later than the horizon is the
documented, bounded-state tradeoff).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOC_COLS = ("doc_id", "ts", "text")


def fingerprinted(docs: DataFrame) -> DataFrame:
    """(doc_id, ts, text) → + fingerprint (md5 of raw text, engine-portable,
    computed JVM-side). Shared by the stream and its batch twin."""
    return docs.withColumn("fingerprint", F.md5(F.col("text")))


def dedup_stream(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup plan: keep the first arrival of each fingerprint,
    remember fingerprints for ``watermark`` of event time, then evict.
    Works on a streaming DataFrame (file source / rate / kafka alike);
    appliable to a batch frame too (dropDuplicatesWithinWatermark needs a
    stream, so batch callers use dedup_batch_twin)."""
    return (
        fingerprinted(docs)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def dedup_batch_twin(docs: DataFrame) -> DataFrame:
    """First-arrival-keep batch semantics the stream converges to when dups
    land within the watermark horizon: one deterministic window, no state."""
    w = Window.partitionBy("fingerprint").orderBy(
        F.asc("ts"), F.asc("doc_id")
    )
    return (
        fingerprinted(docs)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def run_dedup_available_now(
    spark, src_dir: str, out_dir: str, checkpoint_dir: str,
    watermark: str = "1 hour",
) -> None:
    """Drain the current parquet drops through the stateful dedup and stop
    (Trigger.AvailableNow — real microbatches, exactly-once on restart via
    the checkpoint, same harness shape as run_sessionize_available_now)."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        dedup_stream(stream, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
