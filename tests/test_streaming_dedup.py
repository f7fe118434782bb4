"""Streaming exact-dedup (dropDuplicatesWithinWatermark) verified against
its batch twin: duplicates re-landed across microbatches — and across a
query RESTART with the same checkpoint — are suppressed; first arrivals
pass through unchanged."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from ontologymatching_spark.streaming.dedupstream import (
    dedup_batch_twin,
    run_dedup_available_now,
)


def _write_drop(df, src_dir: str, name: str) -> None:
    tmp = tempfile.mkdtemp(prefix="ddrop_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
    shutil.move(part, os.path.join(src_dir, name))
    shutil.rmtree(tmp, ignore_errors=True)


def _docs(spark, ids, base="2024-01-01 00:00:00"):
    """doc_id i → ts base+i minutes, text cycles over 25 unique bodies."""
    pdf = pd.DataFrame(
        {
            "doc_id": list(ids),
            "ts": [pd.Timestamp(base) + pd.Timedelta(minutes=i) for i in ids],
            "text": [f"document body number {i % 25}" for i in ids],
        }
    )
    return spark.createDataFrame(pdf).select(
        "doc_id", F.col("ts").cast("timestamp").alias("ts"), "text"
    )


def test_streaming_dedup_matches_batch_twin(spark):
    docs = _docs(spark, range(40))  # 25 unique texts, 15 cross-batch dups
    root = tempfile.mkdtemp(prefix="dedup_stream_")
    src, out, chk = (os.path.join(root, d) for d in ("src", "out", "chk"))
    os.makedirs(src)
    # four time-ordered drops → four microbatches; dups of drop-1 docs land
    # in drops 2-4, i.e. strictly across microbatch boundaries
    for b in range(4):
        _write_drop(
            docs.filter((F.col("doc_id") >= 10 * b)
                        & (F.col("doc_id") < 10 * (b + 1))),
            src, f"drop{b}.parquet",
        )
    run_dedup_available_now(spark, src, out, chk, watermark="2 hours")

    got = spark.read.parquet(out).toPandas()
    want = dedup_batch_twin(docs).toPandas()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    assert got["fingerprint"].nunique() == 25 == len(got)
    # first-arrival keep: every survivor is the minimum doc_id of its text
    assert (got["doc_id"] < 25).all()

    # restart with the SAME checkpoint: a re-landed dup (of doc 3) is still
    # suppressed by restored state; a brand-new doc passes through
    extra = _docs(spark, [100, 101]).withColumn(
        "text",
        F.when(F.col("doc_id") == 100, F.lit("document body number 3"))
        .otherwise(F.lit("genuinely new never seen body")),
    )
    _write_drop(extra, src, "drop_restart.parquet")
    run_dedup_available_now(spark, src, out, chk, watermark="2 hours")
    got2 = spark.read.parquet(out).toPandas()
    assert len(got2) == 26
    assert 101 in set(got2["doc_id"]) and 100 not in set(got2["doc_id"])
    shutil.rmtree(root, ignore_errors=True)


def test_streaming_decontam(spark, tmp_path):
    """foreachBatch decontamination-at-ingest: a doc sharing a 5-gram with
    the static benchmark is rejected in whichever microbatch it lands;
    clean docs in both drops are admitted."""
    import datetime
    import glob
    import os
    import shutil
    import tempfile

    import pandas as pd
    from pyspark.sql import functions as F

    from ontologymatching_spark.streaming.decontam import (
        run_decontam_available_now,
    )

    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0],
                      "text": ["the quick brown fox jumps over it"]})
    )
    t0 = datetime.datetime(2024, 1, 1)
    rows1 = [(1, t0, "prefix the quick brown fox jumps suffix words"),
             (2, t0, "totally clean content in the first drop here")]
    rows2 = [(3, t0, "another clean document in the second drop"),
             (4, t0, "again the quick brown fox jumps tail")]
    src = str(tmp_path / "src"); os.makedirs(src)
    out = str(tmp_path / "out"); chk = str(tmp_path / "chk")

    def _drop(rows, name):
        df = spark.createDataFrame(
            rows, "doc_id long, ts timestamp, text string"
        )
        tmp = tempfile.mkdtemp()
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(part, os.path.join(src, name))
        shutil.rmtree(tmp, ignore_errors=True)

    _drop(rows1, "d1.parquet")
    _drop(rows2, "d2.parquet")
    run_decontam_available_now(spark, src, out, chk, bench, n=5)
    admitted = sorted(
        r.doc_id for r in spark.read.parquet(out).select("doc_id").collect()
    )
    # docs 1 and 4 share "the quick brown fox jumps" with the benchmark —
    # rejected in their respective microbatches; 2 and 3 admitted
    assert admitted == [2, 3]
