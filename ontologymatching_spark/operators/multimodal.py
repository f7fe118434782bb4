"""Multimodal columns for a training-data pipeline: image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

AUDIO decodes REAL bytes: payloads are genuine RIFF/WAVE PCM files and
``decode_audio_stats`` parses them with the pure-stdlib ``wave`` module
(duration, rms, peak, clipping ratio) inside the same mapInPandas plumbing.
Image/video decode kernels remain STUBBED (PIL/pyav are not in this
container): they raise ``NotImplementedError`` unless ``fake_decode=True``,
in which case a deterministic fake (content-hash-seeded byte grid) stands in
so the Spark-side plumbing — schema, partitioning, UDF signature, Arrow
batch shape — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
import io
import wave
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


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", IntegerType()),
        StructField("rms", StringType()),        # fixed 6-dec strings keep
        StructField("peak", StringType()),       # cross-engine hashes exact
        StructField("clip_ratio", StringType()),
    ]
)


def make_wav_bytes(
    freq_hz: float, ms: int, rate: int = 8000, amp: float = 0.5,
    n_channels: int = 1,
) -> bytes:
    """A genuine RIFF/WAVE file: 16-bit PCM sine at ``freq_hz`` — stdlib
    ``wave`` writer, no audio libs."""
    n = int(rate * ms / 1000)
    t = np.arange(n, dtype="float64") / rate
    samples = np.clip(
        np.sin(2 * np.pi * freq_hz * t) * amp * 32767.0, -32768, 32767
    ).astype("<i2")
    if n_channels > 1:
        samples = np.repeat(samples, n_channels)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _wav_stats(payload: bytes) -> dict:
    """Parse a real WAV byte stream (stdlib wave + struct): PCM stats."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype("float64") / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        samples = (
            np.frombuffer(raw, dtype="u1").astype("float64") - 128.0
        ) / 128.0
    else:
        fmt = {4: "<i4"}.get(width)
        if fmt is None:
            raise ValueError(f"unsupported sample width {width}")
        samples = np.frombuffer(raw, dtype=fmt).astype("float64") / float(
            1 << (8 * width - 1)
        )
    n = len(samples)
    rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
    peak = float(np.max(np.abs(samples))) if n else 0.0
    clip = float(np.mean(np.abs(samples) >= 0.999)) if n else 0.0
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "n_samples": nframes,
        "duration_ms": int(round(nframes * 1000.0 / rate)) if rate else 0,
        "rms": rms,
        "peak": peak,
        "clip_ratio": clip,
    }


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """Audio rows → real decoded PCM stats via mapInPandas (one Arrow batch
    of WAV payloads in, one stats batch out). This is a REAL decoder — no
    fake path: malformed WAV bytes raise, as a production pipeline would
    surface them. Floats are emitted as fixed 6-decimal strings so the
    values hash identically across engines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                st = _wav_stats(bytes(r.payload))
                out.append(
                    {
                        "media_id": r.media_id,
                        "sample_rate": st["sample_rate"],
                        "n_channels": st["n_channels"],
                        "n_samples": st["n_samples"],
                        "duration_ms": st["duration_ms"],
                        "rms": f"{st['rms']:.6f}",
                        "peak": f"{st['peak']:.6f}",
                        "clip_ratio": f"{st['clip_ratio']:.6f}",
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_STATS_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "audio").mapInPandas(
        run, AUDIO_STATS_SCHEMA
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table. Audio payloads are REAL WAV files
    (sine PCM, frequency/duration varied per row); image/video payloads
    stay opaque seeded bytes (their decoders are the stubbed kernels)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        dur_ms = int(rng.integers(100, 2_000))
        if kind == "audio":
            payload = make_wav_bytes(
                freq_hz=float(rng.integers(100, 2000)), ms=dur_ms
            )
        else:
            payload = rng.integers(
                0, 256, size=int(rng.integers(64, 512))
            ).astype(np.uint8).tobytes()
        rows.append(
            (
                i, kind,
                {"image": "image/png", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                bytearray(payload),
                int(rng.integers(16, 256)) if kind != "audio" else None,
                int(rng.integers(16, 256)) if kind != "audio" else None,
                dur_ms if kind != "image" else None,
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
                if r.kind == "audio":
                    # REAL decode: stdlib WAV parse → PCM-stat feature
                    st = _wav_stats(payload)
                    base = [
                        st["rms"], st["peak"], st["clip_ratio"],
                        st["duration_ms"] / 60000.0,
                        st["sample_rate"] / 48000.0,
                        st["n_channels"] / 8.0,
                    ]
                    feat = [base[i % len(base)] for i in range(dim)]
                elif not fake_decode:
                    raise NotImplementedError(
                        "image/video decode requires libs not present in "
                        "this environment; pass fake_decode=True for the "
                        "deterministic stand-in (audio decodes real bytes)"
                    )
                else:
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
