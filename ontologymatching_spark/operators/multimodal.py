"""Multimodal columns for a training-data pipeline: image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas`` UDFs.

AUDIO and IMAGE decode REAL bytes: audio payloads are genuine RIFF/WAVE PCM
files parsed with the pure-stdlib ``wave`` module (duration, rms, peak,
clipping ratio), and image payloads are genuine uncompressed 24-bit BMP
files parsed with ``struct`` + numpy (dimensions, per-channel means, luma
mean/std) — both inside the same mapInPandas plumbing. Only the VIDEO
decode kernel remains STUBBED (pyav/ffmpeg are not in this container): it
raises ``NotImplementedError`` unless ``fake_decode=True``, in which case a
deterministic fake (content-hash-seeded byte grid) stands in so the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
import io
import struct
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


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bpp", IntegerType()),
        StructField("mean_r", StringType()),     # fixed 6-dec strings keep
        StructField("mean_g", StringType()),     # cross-engine hashes exact
        StructField("mean_b", StringType()),
        StructField("luma_mean", StringType()),
        StructField("luma_std", StringType()),
    ]
)


def make_bmp_bytes(width: int, height: int, seed: int = 0) -> bytes:
    """A genuine uncompressed 24-bit BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER, bottom-up rows padded to 4 bytes): a deterministic
    gradient + seeded-noise pixel grid. stdlib ``struct`` + numpy, no
    image libs."""
    rng = np.random.default_rng(seed)
    x = np.arange(width, dtype="float64")[None, :]
    y = np.arange(height, dtype="float64")[:, None]
    r = (x * 255.0 / max(width - 1, 1)) + rng.integers(0, 16, (height, width))
    g = (y * 255.0 / max(height - 1, 1)) + rng.integers(0, 16, (height, width))
    b = ((x + y) * 127.0 / max(width + height - 2, 1)) + rng.integers(
        0, 16, (height, width)
    )
    pix = np.stack(
        [np.clip(b, 0, 255), np.clip(g, 0, 255), np.clip(r, 0, 255)], axis=-1
    ).astype("u1")  # BMP stores BGR
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    rows = []
    for i in range(height - 1, -1, -1):  # bottom-up storage order
        rows.append(pix[i].tobytes() + b"\x00" * pad)
    data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data), 2835, 2835,
        0, 0,
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return header + info + data


def _bmp_stats(payload: bytes) -> dict:
    """Parse a real uncompressed 24-bit BMP byte stream (struct + numpy):
    dimensions + per-channel means + luma (ITU-R BT.601) mean/std."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing BM magic)")
    _, _, _, _, data_off = struct.unpack("<2sIHHI", payload[:14])
    hdr_size, width, height = struct.unpack("<Iii", payload[14:26])
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    _, bpp, compression = struct.unpack("<HHI", payload[26:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    raw = np.frombuffer(payload, dtype="u1",
                        count=stride * height, offset=data_off)
    rows = raw.reshape(height, stride)[:, :row_bytes]
    if bottom_up:
        rows = rows[::-1]
    pix = rows.reshape(height, width, 3).astype("float64")  # B,G,R
    mean_b, mean_g, mean_r = (float(pix[..., i].mean()) for i in range(3))
    luma = 0.114 * pix[..., 0] + 0.587 * pix[..., 1] + 0.299 * pix[..., 2]
    return {
        "width": width,
        "height": height,
        "bpp": bpp,
        "mean_r": mean_r,
        "mean_g": mean_g,
        "mean_b": mean_b,
        "luma_mean": float(luma.mean()),
        "luma_std": float(luma.std()),
    }


def decode_image_stats(media: DataFrame) -> DataFrame:
    """Image rows → real decoded pixel stats via mapInPandas (one Arrow
    batch of BMP payloads in, one stats batch out). REAL decoder, no fake
    path: malformed BMP bytes raise, as a production pipeline would surface
    them. Floats are emitted as fixed 6-decimal strings so the values hash
    identically across engines."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                st = _bmp_stats(bytes(r.payload))
                out.append(
                    {
                        "media_id": r.media_id,
                        "width": st["width"],
                        "height": st["height"],
                        "bpp": st["bpp"],
                        "mean_r": f"{st['mean_r']:.6f}",
                        "mean_g": f"{st['mean_g']:.6f}",
                        "mean_b": f"{st['mean_b']:.6f}",
                        "luma_mean": f"{st['luma_mean']:.6f}",
                        "luma_std": f"{st['luma_std']:.6f}",
                    }
                )
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_STATS_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        run, IMAGE_STATS_SCHEMA
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
    (sine PCM, frequency/duration varied per row) and image payloads are
    REAL 24-bit BMP files (gradient+noise grid sized per row); only video
    payloads stay opaque seeded bytes (its decoder is the stubbed kernel)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        dur_ms = int(rng.integers(100, 2_000))
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        if kind == "audio":
            payload = make_wav_bytes(
                freq_hz=float(rng.integers(100, 2000)), ms=dur_ms
            )
        elif kind == "image":
            payload = make_bmp_bytes(w, h, seed=seed * 100_003 + i)
        else:
            payload = rng.integers(
                0, 256, size=int(rng.integers(64, 512))
            ).astype(np.uint8).tobytes()
        rows.append(
            (
                i, kind,
                {"image": "image/bmp", "audio": "audio/wav",
                 "video": "video/mp4"}[kind],
                bytearray(payload),
                w if kind != "audio" else None,
                h if kind != "audio" else None,
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
    binary payloads in, one batch of feature rows out). Audio (WAV) and
    image (BMP) rows decode REAL bytes; only video still needs
    ``fake_decode=True`` (pyav absent). A production embedder would slot
    into the same partitioning/batching/lineage."""

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
                elif r.kind == "image":
                    # REAL decode: struct+numpy BMP parse → pixel-stat feature
                    st = _bmp_stats(payload)
                    base = [
                        st["mean_r"] / 255.0, st["mean_g"] / 255.0,
                        st["mean_b"] / 255.0, st["luma_mean"] / 255.0,
                        st["luma_std"] / 255.0,
                        st["width"] / 4096.0, st["height"] / 4096.0,
                    ]
                    feat = [base[i % len(base)] for i in range(dim)]
                elif not fake_decode:
                    raise NotImplementedError(
                        "video decode requires pyav/ffmpeg, not present in "
                        "this environment; pass fake_decode=True for the "
                        "deterministic stand-in (audio+image decode real "
                        "bytes)"
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
