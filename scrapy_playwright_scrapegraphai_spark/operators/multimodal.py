"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

The Spark-side machinery (schemas, Arrow batch shape, partition-size
control, UDF signatures) is real and tested; the actual media decoding
is STUBBED — the sandbox ships no image/audio libraries — behind
``decode_stub`` (raises NotImplementedError) and
``fake_feature_extractor`` (deterministic byte-histogram features, used
by tests to validate the plumbing end-to-end).

Design for 100 TB: media bytes ride a ``binary`` column in the same
parquet rows as metadata, so predicate pushdown on metadata (width,
codec, duration) prunes row groups *before* any byte is decoded; decode
runs in ``mapInPandas`` with ``spark.sql.execution.arrow.maxRecordsPerBatch``
tuned down (big rows → small batches); outputs are fixed-width feature
arrays, never re-encoded media.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),     # opaque media bytes
        StructField("width", IntegerType()),      # typed metadata...
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-Python decode of an uncompressed 24-bit BMP → (H, W, 3) RGB
    uint8. Handles bottom-up (positive height) and top-down rows and the
    4-byte row stride padding; anything beyond BI_RGB/24bpp needs a real
    codec library and raises NotImplementedError."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP decodes here")
    top_down, h = height < 0, abs(height)
    stride = (width * 3 + 3) & ~3
    img = np.empty((h, width, 3), np.uint8)
    for row in range(h):
        line = np.frombuffer(
            payload, np.uint8, width * 3, data_offset + row * stride
        ).reshape(width, 3)
        img[row if top_down else h - 1 - row] = line[:, ::-1]  # BGR → RGB
    return img


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Pure-Python decode of a PCM WAV → (sample_rate, mono int16
    samples). Walks RIFF chunks (word-aligned), accepts 8/16-bit PCM,
    downmixes multi-channel by mean; compressed formats raise
    NotImplementedError."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1:
        raise NotImplementedError("only PCM WAV decodes here")
    if bits == 16:
        samples = np.frombuffer(data, "<i2")
    elif bits == 8:
        samples = (np.frombuffer(data, np.uint8).astype(np.int16) - 128) * 256
    else:
        raise NotImplementedError(f"{bits}-bit PCM not supported")
    if channels > 1:
        n = (len(samples) // channels) * channels
        samples = (
            samples[:n].reshape(-1, channels).mean(axis=1).astype(np.int16)
        )
    return rate, samples


def decode_stub(payload: bytes, mime: str):
    """Decoder slot: REAL pure-Python decoders for the codec-free
    formats (uncompressed 24-bit BMP, PCM WAV — magic-byte sniffed, so
    the decode path is exercised end-to-end inside mapInPandas without
    external libraries); every other format (JPEG/PNG/MP4/...) needs
    codec libraries the container doesn't ship and raises
    NotImplementedError — swap in PIL/libav here on a real cluster.
    Returns ("image", (H,W,3) uint8) or ("audio", (rate, int16 samples))."""
    if payload is not None and payload[:2] == b"BM":
        return "image", decode_bmp(payload)
    if (
        payload is not None
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        return "audio", decode_wav(payload)
    raise NotImplementedError(
        f"media decode for {mime!r} requires codec libraries not present "
        "in this environment (only BMP/WAV decode codec-free)"
    )


def decoded_features(kind: str, decoded) -> np.ndarray:
    """Fixed-width (16) feature vector from REAL decoded media:
    image → dims + per-channel mean/std; audio → rate/length/level
    stats + zero-crossing count. Deterministic (float64 numpy reductions
    on exact integer inputs, cast once to float32)."""
    out = np.zeros(16, dtype=np.float64)
    if kind == "image":
        arr = decoded
        flat = arr.reshape(-1, 3).astype(np.float64)
        out[0], out[1] = arr.shape[1], arr.shape[0]  # width, height
        out[2:5] = flat.mean(axis=0)
        out[5:8] = flat.std(axis=0)
    else:
        rate, samples = decoded
        s = samples.astype(np.float64)
        out[0], out[1] = rate, len(s)
        if len(s):
            out[2], out[3] = s.mean(), s.std()
            out[4], out[5] = s.min(), s.max()
            out[6] = np.sqrt((s ** 2).mean())
            out[7] = int(np.sum(np.signbit(s[1:]) != np.signbit(s[:-1])))
    return out.astype(np.float32)


def fake_feature_extractor(payload: bytes) -> np.ndarray:
    """Deterministic stand-in 'feature extractor': normalized 16-bin byte
    histogram. Exercises the full Arrow round-trip with realistic shapes."""
    if payload is None or len(payload) == 0:
        return np.zeros(16, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float32)
    return hist / len(arr)


def extract_features(media: DataFrame, use_stub_decoder: bool = False) -> DataFrame:
    """media rows → fixed-width feature rows via mapInPandas.

    ``use_stub_decoder=True`` routes through ``decode_stub``: BMP/WAV
    payloads decode FOR REAL (pure Python — see decode_bmp/decode_wav)
    and yield ``decoded_features``; any other format raises
    NotImplementedError exactly where a production decoder plugs in.
    Default uses the deterministic fake extractor so the distributed
    plumbing is testable on arbitrary bytes.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if use_stub_decoder:
                    kind, decoded = decode_stub(r.payload, r.mime)
                    feats = decoded_features(kind, decoded)
                else:
                    feats = fake_feature_extractor(r.payload)
                rows.append(
                    {
                        "media_id": r.media_id,
                        "kind": r.kind,
                        "n_bytes": len(r.payload) if r.payload is not None else 0,
                        "features": feats.tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select(
        "media_id", "kind", "mime", "payload"
    ).mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (media_id, ts_ms)
    to decode — the scheduling half of frame extraction, fully real; the
    decode half is the stub. Demonstrates metadata-only pruning: no
    payload column is touched, so the scan reads only duration_ms."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms)
            )
        ).alias("ts_ms"),
    )
