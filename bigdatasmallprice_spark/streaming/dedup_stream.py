"""Streaming exact deduplication: watermarked ``dropDuplicates`` — the
continuous analog of the batch ``dedup_exact`` pass (queries/dedupq.py).

At 100 TB of incoming documents the batch dedup can't re-scan the corpus
per micro-batch; instead the stream keeps per-key state (the content
hash) bounded by an event-time watermark:

- ``dropDuplicates([key, ...])`` on a watermarked stream keeps the FIRST
  row per key and drops re-deliveries while state for keys older than
  the watermark is evicted — so memory is bounded by the lateness
  window, not the corpus;
- the content key is ``md5(text)`` (the same 16-byte key the batch pass
  groups on), so "same text re-ingested within the window" is dropped
  regardless of doc_id;
- exact-once output then feeds the downstream (MinHash, quality) stages
  incrementally — pair with queries/dedupq.py::dedup_incremental for
  the near-dup layer against the persisted corpus bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    time_col: str = "ts",
    text_col: str = "text",
    lateness: str = "1 hour",
) -> DataFrame:
    """First-writer-wins exact dedup by content hash within the
    watermark window. State per distinct hash is evicted once the
    watermark passes; duplicates arriving later than ``lateness`` are
    the documented residual (re-caught by the daily batch pass)."""
    return (
        stream.withWatermark(time_col, lateness)
        .withColumn("__th", F.md5(F.col(text_col)))
        .dropDuplicates(["__th"])
        .drop("__th")
    )
