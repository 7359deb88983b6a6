"""Backfill / date-range ingestion driver (reference lifecycle §3.2).

Replicates the reference's backfill semantics (airflow/dags/
backfill_dag.py:182-228 + base_collector.py:87-138): iterate a date
range, fetch each day with bounded retry, parse to records, and
idempotently append to a date-partitioned bronze table — re-running a
backfill over already-ingested days inserts nothing (ON CONFLICT DO
NOTHING, timescale_client.py:60-64).

Orchestration (the fetch loop) is driver-side by design — it is rate-
limited HTTP against external APIs, exactly as in the reference; all
data movement is Spark. The idempotency anti-join reads ONLY the
bronze partitions the batch can touch (partition pruning on p_date),
so a one-day top-up against a 10-year table scans one directory.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Iterable, Sequence
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatasmallprice_spark.catalog import write_bronze
from bigdatasmallprice_spark.operators.upsert import dedup_batch_first_wins


def fetch_with_retry(
    fetch: Callable[[date], list[dict]],
    d: date,
    retries: int = 3,
    backoff_s: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
) -> list[dict] | None:
    """Bounded exponential-backoff retry (1/2/4 s defaults — the
    reference's 5xx policy). Returns None when the day is unavailable
    after retries (the ENTSO-E 404 'skip day' path)."""
    delay = backoff_s
    for attempt in range(retries + 1):
        try:
            return fetch(d)
        except Exception:
            if attempt == retries:
                return None
            sleep(delay)
            delay *= 2
    return None


def backfill_dates(
    spark: SparkSession,
    fetch: Callable[[date], list[dict]],
    dates: Iterable[date],
    bronze_path: str,
    schema: str,
    keys: Sequence[str],
    time_col: str = "time",
    retries: int = 3,
    sleep: Callable[[float], None] = time.sleep,
) -> dict[date, int]:
    """Fetch each date, dedup within the batch (first row per key wins),
    anti-join against the existing bronze partitions for those dates,
    append only genuinely-new rows. Returns rows inserted per date;
    re-runs insert 0."""
    inserted: dict[date, int] = {}
    for d in dates:
        records = fetch_with_retry(fetch, d, retries=retries, sleep=sleep)
        if not records:
            inserted[d] = 0
            continue
        batch = dedup_batch_first_wins(
            spark.createDataFrame(records, schema), keys, [time_col]
        )
        new_rows = batch
        if os.path.isdir(bronze_path):
            touched = [
                r["p"]
                for r in batch.select(F.to_date(F.col(time_col)).alias("p")).distinct().collect()
            ]
            existing = (
                spark.read.parquet(bronze_path)
                .filter(F.col("p_date").isin(touched))  # prunes to touched partitions
                .select(*keys)
            )
            new_rows = batch.join(existing, on=list(keys), how="left_anti")
        n = new_rows.count()
        if n:
            write_bronze(new_rows, bronze_path, time_col)
        inserted[d] = n
    return inserted
