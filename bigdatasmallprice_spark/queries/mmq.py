"""Multimodal queries: REAL codec round-trip, driver-verified.

``multimodal_wav_stats`` synthesizes a deterministic mono PCM signal per
document, encodes it into a genuine RIFF/WAVE container (stdlib ``wave``
writer), ships the bytes through an opaque ``binary`` column, decodes
them back (container parse + int16 frame extraction), and aggregates
exact integer sample stats — all inside two Arrow-batched mapInPandas
stages. Because the synthetic samples are a pure integer function of
(doc_id, i), an independent DuckDB oracle reproduces the decoded stats
from the closed form without ever touching the bytes: the driver's
hash-compare therefore proves the encode→binary-column→decode path is
byte-correct, not just that the plumbing runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.multimodal import (
    WAV_BASE_FRAMES,
    WAV_MUL,
    WAV_SAMPLE_RATE,
    WAV_STEP,
    synthesize_wav,
    wav_features,
)
from bigdatasmallprice_spark.queries.core import table
from bigdatasmallprice_spark.registry import register

_O_SAMPLE = f"((doc_id * {WAV_MUL} + i * {WAV_STEP}) % 65536) - 32768"


@register(
    "multimodal_wav_stats",
    f"""
WITH s AS (
  SELECT doc_id,
         unnest(range(0, CAST({WAV_BASE_FRAMES} + doc_id % 64 AS BIGINT))) AS i
  FROM documents
)
SELECT doc_id,
       COUNT(*) AS n_frames,
       CAST({WAV_SAMPLE_RATE} AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST(SUM({_O_SAMPLE}) AS BIGINT) AS sum_samples,
       CAST(MIN({_O_SAMPLE}) AS BIGINT) AS min_sample,
       CAST(MAX({_O_SAMPLE}) AS BIGINT) AS max_sample
FROM s GROUP BY 1
""",
    doc="Multimodal audio round-trip: per-doc deterministic PCM -> real "
    "WAV encode (stdlib wave) -> binary column -> real WAV decode -> "
    "exact integer sample stats, via two Arrow-batched mapInPandas "
    "stages (operators/multimodal.py). The oracle computes the same "
    "stats from the closed-form sample function, so a hash match proves "
    "byte-level codec correctness. At 100 TB the same plan holds: "
    "payloads stay columnar-binary, decode is batch-vectorized, stats "
    "are exact ints.",
    tags=("multimodal", "udf"),
)
def multimodal_wav_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    media = synthesize_wav(docs)
    return wav_features(media).select(
        "doc_id",
        "n_frames",
        "sample_rate",
        "n_channels",
        "sum_samples",
        "min_sample",
        "max_sample",
    )


def bmp_roundtrip_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image analog (test-covered, not driver-registered): deterministic
    8x8 24-bit BMP per doc, real encode + real pure-Python decode."""
    from bigdatasmallprice_spark.operators.multimodal import (
        decode_bmp_bytes,
        encode_bmp,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id")

    def _rt(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"].astype("int64"):
                px = [
                    [
                        (
                            (int(d) * 31 + x * 7 + y) % 256,
                            (int(d) * 17 + x) % 256,
                            (y * 13 + int(d)) % 256,
                        )
                        for x in range(8)
                    ]
                    for y in range(8)
                ]
                feat = decode_bmp_bytes(encode_bmp(px))
                feat["doc_id"] = int(d)
                rows.append(feat)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        _rt,
        "width long, height long, bpp long, n_pixels long, pixel_sum long, doc_id long",
    ).select("doc_id", "width", "height", "bpp", "n_pixels", "pixel_sum")
