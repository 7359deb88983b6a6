"""Time-bucket rollups — the continuous-aggregate analog.

The reference maintains three 15-min → hourly continuous aggregates
(reference infra/db/init.sql:81-100,135-154,157-176): per (hour bucket,
tariff_type) AVG/MIN/MAX/COUNT with an incremental refresh policy.

In Spark the same rollup is a ``groupBy(date_trunc(...), keys)`` — a
single shuffle whose map-side partial aggregation does most of the work
(hash-agg before exchange), so at 100 TB the shuffle carries only one
row per (bucket, key) per input partition. Incremental refresh is
partition-scoped recompute (see ``incremental_rollup``); the streaming
analog lives in streaming/rollup_stream.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def time_bucket(t: Column, width: str = "1 hour") -> Column:
    """TimescaleDB time_bucket — left-closed bucket start (init.sql:84)."""
    unit = {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}.get(width)
    if unit is None:
        raise ValueError(f"unsupported bucket width {width!r}")
    return F.date_trunc(unit, t)


def hourly_rollup(
    df: DataFrame,
    time_col: str,
    value_col: str,
    keys: Sequence[str] = (),
    bucket_name: str = "bucket",
) -> DataFrame:
    """AVG/MIN/MAX/COUNT per (hour, keys) — init.sql:81-100 shape."""
    bucket = time_bucket(F.col(time_col)).alias(bucket_name)
    return df.groupBy(bucket, *[F.col(k) for k in keys]).agg(
        F.avg(value_col).alias(f"avg_{value_col}"),
        F.min(value_col).alias(f"min_{value_col}"),
        F.max(value_col).alias(f"max_{value_col}"),
        F.count(value_col).alias(f"count_{value_col}"),
    )


def incremental_rollup(
    spark_read_bronze: DataFrame,
    existing_rollup: DataFrame | None,
    time_col: str,
    value_col: str,
    keys: Sequence[str],
    refresh_start,
    refresh_end,
) -> DataFrame:
    """Continuous-aggregate refresh: recompute only buckets inside
    [refresh_start, refresh_end) and splice them over the existing
    materialization (init.sql refresh policies: start_offset 2-3 d,
    end_offset 1 h — rows older than start_offset are never touched
    again). With bronze data partitioned by date(time), the recompute
    scan prunes to ~3 daily partitions regardless of table size."""
    fresh = hourly_rollup(
        spark_read_bronze.filter(
            (F.col(time_col) >= F.lit(refresh_start))
            & (F.col(time_col) < F.lit(refresh_end))
        ),
        time_col,
        value_col,
        keys,
    )
    if existing_rollup is None:
        return fresh
    kept = existing_rollup.filter(
        ~(
            (F.col("bucket") >= F.lit(refresh_start))
            & (F.col("bucket") < F.lit(refresh_end))
        )
    )
    return kept.unionByName(fresh)
