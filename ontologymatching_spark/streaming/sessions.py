"""Streaming event operators: watermarked windowed aggregation and a custom
stateful sessionizer (``applyInPandasWithState``).

The reference is strictly batch (SURVEY.md §2.10); these are the
training-data-pipeline streaming surfaces a continuously-fed lake needs on
top of `ingest.py`:

- ``windowed_event_counts`` — tumbling event-time windows with a watermark
  for late data (the streaming twin of the batch ``q_events_hourly``).
- ``sessionize_with_state`` — per-user session assembly as an arbitrary
  stateful operator. State = the open session (start, last_ts, n_events) per
  user; a session CLOSES and is emitted when a later event arrives more than
  ``gap_sec`` after the session's last event (same 30-min-gap semantics as
  the oracle-checked batch ``q_events_sessionize``), or when the event-time
  watermark passes last_ts + gap (EventTimeTimeout flush). Emitted rows are
  append-mode: each closed session exactly once, exactly-once end-to-end via
  the streaming checkpoint.

Scale: state is one tiny tuple per ACTIVE user (not per event), partitioned
by user_id across executors; the watermark bounds state lifetime, so state
size tracks concurrently-active users — the property that lets this run
indefinitely at 100 TB/day event volumes.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# open session per user: (start_us, last_us, n_events) in epoch microseconds
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling-window counts per event_type with a late-data
    watermark. Works identically on a batch or streaming DataFrame (the
    watermark is a no-op in batch) — tested by equating the two."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def sessionize_with_state(events: DataFrame, gap_sec: int = 1800,
                          watermark: str = "0 seconds") -> DataFrame:
    """Custom stateful operator: assemble per-user sessions (30-min gap by
    default) from a stream of events, emitting each CLOSED session once.

    The reference has no streaming ops; the batch twin of this semantics is
    the oracle-checked ``benchqueries.q_events_sessionize`` (lag + cumsum).
    """
    gap_us = gap_sec * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,  # pyspark.sql.streaming.state.GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def _emit(closed: list[tuple[int, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": pd.array(
                        [user_id] * len(closed), dtype="int64"
                    ),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s, _, _ in closed
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="us") for _, e, _ in closed
                    ],
                    "n_events": pd.array(
                        [n for _, _, n in closed], dtype="int64"
                    ),
                }
            )

        if state.hasTimedOut:
            # watermark passed last_ts + gap: flush the open session
            start_us, last_us, n = state.get
            state.remove()
            yield _emit([(start_us, last_us, n)])
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = (
            rows["ts"].astype("datetime64[us]").astype("int64").tolist()
        )

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0

        closed: list[tuple[int, int, int]] = []
        for t in ts_us:
            if last_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1

        state.update((start_us, last_us, n))
        # flush when the watermark passes the session's close point; the
        # timestamp must stay ahead of the current watermark
        timeout_ms = max(
            (last_us + gap_us) // 1000 + 1,
            state.getCurrentWatermarkMs() + 1000,
        )
        state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield _emit(closed)

    from pyspark.sql.streaming.state import GroupStateTimeout

    prepped = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select("user_id", "event_id", "ts")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def run_sessionize_available_now(
    spark, src_dir: str, out_dir: str, checkpoint_dir: str,
    gap_sec: int = 1800, max_files_per_trigger: int = 2,
) -> None:
    """Drain the events currently in ``src_dir`` through the stateful
    sessionizer into a parquet sink and stop. Re-runs with the same
    checkpoint continue the stream exactly-once (state carried over)."""
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    q = (
        sessionize_with_state(ev, gap_sec=gap_sec)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
