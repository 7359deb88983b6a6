"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched ``mapInPandas``.

Design for a 100 TB multimodal corpus:
- media lives in a ``payload: binary`` column (or object-store URIs for
  >~1 MB blobs) beside typed metadata columns;
- decode / feature-extract / resize / frame-sample run as mapInPandas
  stages — Arrow moves each partition batch into Python once, the UDF
  works on contiguous buffers, and the output schema is declared up
  front so Catalyst keeps planning around the stage;
- partition sizing: media batches are capped by bytes not rows
  (``maxRecordsPerBatch`` + repartition on a size-bucketed key) so an
  executor never materializes more than a few hundred MB of payloads.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this environment, so
``decode_stub`` is a clearly-marked deterministic fake: real byte-level
stats (length, first/last byte, sha-prefix) + a NotImplementedError gate
for the codec path. The Spark-side plumbing — schema, batching, UDF
signature — is real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("meta_width", LongType(), True),
        StructField("meta_height", LongType(), True),
        StructField("meta_duration_s", DoubleType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha_prefix", StringType(), True),
        StructField("first_byte", LongType(), True),
        StructField("byte_mean", DoubleType(), True),
    ]
)

REAL_CODECS_AVAILABLE = False  # PIL / ffmpeg / librosa are not installed here


def decode_stub(payload: bytes | None, kind: str) -> dict:
    """Deterministic fake 'decode': byte-level stats standing in for
    pixel/sample features. The real implementation would dispatch to the
    per-kind codec; that path is explicitly gated."""
    if REAL_CODECS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real image/audio/video codecs not wired in this env")
    if payload is None or len(payload) == 0:
        return {"n_bytes": 0, "sha_prefix": None, "first_byte": None, "byte_mean": None}
    return {
        "n_bytes": len(payload),
        "sha_prefix": hashlib.sha256(payload).hexdigest()[:12],
        "first_byte": payload[0],
        "byte_mean": sum(payload[:4096]) / min(len(payload), 4096),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one typed
    batch out; schema declared so downstream stays fully planned."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: computes per-row sample counts from
    metadata JVM-side (no Python), so the expensive decode stage sees an
    explicit budget column — the pattern that keeps 100 TB of video from
    being decoded wholesale."""
    return media.withColumn(
        "n_frames_to_sample",
        F.when(
            (F.col("kind") == "video") & F.col("meta_duration_s").isNotNull(),
            F.ceil(F.col("meta_duration_s") / F.lit(every_s)).cast("long"),
        ).otherwise(F.lit(0)),
    )
