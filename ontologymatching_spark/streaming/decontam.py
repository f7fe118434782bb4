"""Streaming decontamination-at-ingest for a continuously-fed training-data
lake (beyond the strictly-batch reference, SURVEY.md §2.10): every
microbatch of newly-landed documents is checked against a static held-out
benchmark gram set and only clean documents are admitted.

Spark-first shape: ``foreachBatch`` applies the full BATCH
``text.ngram_contamination`` operator to each microbatch — the standard
production pattern for running batch-only logic inside a stream. The
benchmark side is static and tiny (distinct 60-bit gram hashes), so each
microbatch costs one broadcast membership pass; contamination is per-doc
and memoryless, so the stream carries NO state store at all (contrast the
dedup stream's fingerprint state). Exactly-once the source side via the
checkpoint; the parquet append in foreachBatch is at-least-once on a
mid-write crash — a production deployment writes an epoch-keyed
transactional table (Iceberg/Delta) instead, same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_decontam_available_now(
    spark,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    benchmark: DataFrame,
    n: int = 5,
) -> None:
    """Drain the current parquet drops, admitting only documents with zero
    exact word-n-gram collisions against ``benchmark`` (Trigger.AvailableNow
    — real microbatches; one file per trigger)."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampType,
    )

    from ..operators.text import ngram_contamination

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("text", StringType()),
        ]
    )

    def _admit_clean(batch_df: DataFrame, epoch_id: int) -> None:
        from ..partitions import fan_parts

        # a microbatch is ONE drop file = one scan split: without the
        # repartition the whole gram-hash + membership pass runs on a
        # single task (the round-3 single-file gotcha applied to the
        # stream side; profiled 8-10 s per batch at bench SF)
        b = batch_df.repartition(fan_parts(batch_df))
        flags = ngram_contamination(b.select("doc_id", "text"), benchmark, n=n)
        clean = b.join(
            flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
        )
        clean.write.mode("append").parquet(out_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_admit_clean)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
