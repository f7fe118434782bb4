"""Streaming sessionization (applyInPandasWithState) and watermarked
windowed aggregation, verified against their batch twins.

Determinism strategy: after draining the real events (run 1), a sentinel
event far in the future is dropped per user and drained in run 2 with the
SAME checkpoint — the gap-break rule then closes every real session, so the
emitted set is exactly the batch sessionization's sessions (sentinel
sessions remain open in state and are filtered by timestamp). No reliance
on timer/timeout race conditions.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ontologymatching_spark.streaming.sessions import (
    run_sessionize_available_now,
    windowed_event_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def _write_drop(df, src_dir: str, name: str) -> None:
    """Write one single-file parquet 'drop' into the stream source dir via
    Spark (schema-exact, preserves timestamp_ntz — pandas.to_parquet does
    not round-trip it)."""
    import glob
    import shutil

    tmp = tempfile.mkdtemp(prefix="drop_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(part, os.path.join(src_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)


def test_stateful_sessionize_matches_batch(spark):
    events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    root = tempfile.mkdtemp(prefix="sess_stream_")
    src, out, chk = (os.path.join(root, d) for d in ("src", "out", "chk"))
    os.makedirs(src)

    # several time-ordered drops so AvailableNow runs multiple microbatches
    # (state must survive microbatch and query-restart boundaries); drops are
    # contiguous time ranges — a real feed delivers in arrival order, and
    # the batch twin has no late-data concept to compare against
    from pyspark.sql import Window

    w = Window.orderBy("ts", "event_id")
    ev_b = events.withColumn("bucket", F.ntile(4).over(w))
    for i in range(1, 5):
        _write_drop(
            ev_b.filter(F.col("bucket") == i).drop("bucket"),
            src,
            f"drop{i}.parquet",
        )
    run_sessionize_available_now(spark, src, out, chk)

    # sentinel flush: one far-future event per user closes every real session
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    sentinel = (
        events.select("user_id").distinct()
        .withColumn("event_id", 10_000_000 + F.col("user_id"))
        .withColumn(
            "ts",
            F.lit(max_ts + pd.Timedelta(days=30)).cast("timestamp_ntz"),
        )
        .withColumn("event_type", F.lit("sentinel"))
        .withColumn("value", F.lit(0.0))
        .withColumn("props", F.lit(""))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    _write_drop(sentinel, src, "zz_sentinel.parquet")
    run_sessionize_available_now(spark, src, out, chk)

    got = (
        spark.read.parquet(out)
        .filter(F.col("session_start") <= F.lit(max_ts))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
    )
    from ontologymatching_spark.benchqueries import q_events_sessionize

    want = q_events_sessionize(spark, SF_DIR)
    g = {r.user_id: (r.n_sessions, r.n_events) for r in got.collect()}
    w = {r.user_id: (r.n_sessions, r.n_events) for r in want.collect()}
    assert g == w

    # session internals: no emitted session violates the gap invariant
    sess = spark.read.parquet(out).filter(
        F.col("session_start") <= F.lit(max_ts)
    )
    bad = sess.filter(
        (F.col("session_end") < F.col("session_start"))
        | (F.col("n_events") < 1)
    ).count()
    assert bad == 0


def test_windowed_counts_stream_equals_batch(spark):
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in windowed_event_counts(batch).collect()
    }

    root = tempfile.mkdtemp(prefix="win_stream_")
    src = os.path.join(root, "src")
    os.makedirs(src)
    _write_drop(
        batch.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        ),
        src,
        "all.parquet",
    )
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(src)
    )
    q = (
        windowed_event_counts(ev)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.event_type): r.n_events
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got == want
