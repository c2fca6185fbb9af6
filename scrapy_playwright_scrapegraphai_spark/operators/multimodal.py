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


def decode_stub(payload: bytes, mime: str):
    """Real decoder slot. The container has no codec libraries, so this
    is intentionally unimplemented; swap in PIL/libav here on a real
    cluster. Kept as a function (not inline) so the mapInPandas plumbing
    is identical with a real decoder."""
    raise NotImplementedError(
        f"media decode for {mime!r} requires codec libraries not present "
        "in this environment"
    )


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

    ``use_stub_decoder=True`` routes through ``decode_stub`` (raises —
    documents exactly where a real decoder plugs in); default uses the
    deterministic fake extractor so the distributed plumbing is testable.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if use_stub_decoder:
                    decode_stub(r.payload, r.mime)  # raises NotImplementedError
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
