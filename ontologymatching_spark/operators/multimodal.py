"""Multimodal columns for a training-data pipeline: image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

The decode kernels are STUBBED (image/audio libraries are not in this
container): ``decode`` raises ``NotImplementedError`` unless
``fake_decode=True``, in which case a deterministic fake (content-hash-seeded
byte grid) stands in so the Spark-side plumbing — schema, partitioning, UDF
signature, Arrow batch shape — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload_sha256", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_dim", IntegerType()),
        StructField("feature", StringType()),  # csv floats; arrays via split
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512))).astype(
            np.uint8
        ).tobytes()
        rows.append(
            (
                i, kind,
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                bytearray(payload),
                int(rng.integers(16, 256)) if kind != "audio" else None,
                int(rng.integers(16, 256)) if kind != "audio" else None,
                int(rng.integers(100, 60_000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder: bytes of
    sha256(payload) cycled into [0,1) floats."""
    h = hashlib.sha256(payload).digest()
    return [h[i % len(h)] / 256.0 for i in range(dim)]


def extract_features(
    media: DataFrame, dim: int = 16, fake_decode: bool = False
) -> DataFrame:
    """media → per-item feature rows via mapInPandas (one Arrow batch of
    binary payloads in, one batch of feature rows out). The real
    implementation would decode (PIL/librosa/pyav) and embed here; the
    partitioning/batching/lineage is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                if not fake_decode:
                    raise NotImplementedError(
                        "media decode requires image/audio libs not present "
                        "in this environment; pass fake_decode=True for the "
                        "deterministic stand-in"
                    )
                feat = _fake_feature(payload, dim)
                out.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "payload_sha256": hashlib.sha256(payload).hexdigest(),
                        "n_bytes": len(payload),
                        "feat_dim": dim,
                        "feature": ",".join(f"{v:.6f}" for v in feat),
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    timestamps JVM-side (sequence + explode); the decode of each frame is the
    stubbed kernel above. Shows the partitioning story: explode first, then
    decode per frame row, so frames of one video parallelize across tasks."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta_duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
