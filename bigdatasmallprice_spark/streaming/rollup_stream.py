"""Structured Streaming analog of the continuous aggregates (T1/T4).

The reference's continuous aggregates refresh incrementally with a
lateness window (start_offset 2-3 d / end_offset 1 h schedule,
reference infra/db/init.sql:94-100,148-154,170-176): rows older than
start_offset are never re-aggregated. The streaming equivalent is a
watermarked tumbling-window aggregation:

- ``withWatermark(time, '2 days')``  == start_offset (late rows beyond
  it are dropped; state for closed windows is evicted)
- ``window(time, '1 hour')``         == time_bucket('1 hour', ...)
- append output mode                 == only finalized buckets emit,
  matching the end_offset "don't publish the still-open bucket" rule

Batch cadence (T5: daily 06:00/07:00 UTC DAGs) maps to
``trigger(availableNow=True)`` runs of the same query — identical code,
scheduled instead of continuous. For pure-batch refresh the partition-
scoped variant is operators/rollup.py::incremental_rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def hourly_rollup_stream(
    stream: DataFrame,
    time_col: str = "time",
    value_col: str = "price_chf_kwh",
    keys: tuple[str, ...] = ("tariff_type",),
    lateness: str = "2 days",
) -> DataFrame:
    """15-min stream -> hourly avg/min/max/count with a lateness
    watermark. One row per (hour, keys) on window close."""
    agg = (
        stream.withWatermark(time_col, lateness)
        .groupBy(F.window(F.col(time_col), "1 hour").alias("w"), *[F.col(k) for k in keys])
        .agg(
            F.avg(value_col).alias(f"{value_col}_avg"),
            F.min(value_col).alias(f"{value_col}_min"),
            F.max(value_col).alias(f"{value_col}_max"),
            F.count(F.lit(1)).alias("sample_count"),
        )
    )
    return agg.select(F.col("w.start").alias("hour"), *keys,
                      f"{value_col}_avg", f"{value_col}_min", f"{value_col}_max",
                      "sample_count")


def write_rollup(
    rolled: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
) -> DataStreamWriter:
    """Sink: parquet partitioned by date(hour) — partition pruning serves
    the serving-layer queries; availableNow replicates the daily batch
    cadence with exactly-once progress via the checkpoint."""
    w = (
        rolled.withColumn("d", F.to_date("hour"))
        .writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("d")
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w
