"""Streaming idempotent ingestion: foreachBatch + keyed dedup-append.

The reference ingests with ``INSERT ... ON CONFLICT (keys) DO NOTHING``
(reference src/db/timescale_client.py:53-240) and re-fetches whole days,
relying on the unique index to drop re-deliveries. The streaming analog
is a ``foreachBatch`` sink applying the same first-writer-wins contract
per micro-batch against the bronze table:

- rows whose key already exists in bronze are dropped (existing wins),
- duplicate keys WITHIN a batch keep the first by the caller's order,
- only the surviving rows append — so replaying a source directory (or
  a crashed batch retried by checkpoint recovery) never duplicates.

On plain parquet the existence probe is a left-anti join against the
key projection of bronze — at scale, with bronze partitioned by
date(time) and batches spanning a bounded lateness window, the probe
prunes to the recent partitions (the same bound the rollup watermark
uses). On Delta this whole function collapses to MERGE WHEN NOT
MATCHED; the semantics here are identical and storage-agnostic.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame

from bigdatasmallprice_spark.operators.upsert import upsert_do_nothing


def idempotent_batch_writer(
    bronze_path: str, keys: Sequence[str], order_by: Sequence[str]
):
    """Returns the foreachBatch function: (batch_df, batch_id) -> None."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if os.path.exists(bronze_path):
            existing = spark.read.parquet(bronze_path)
            merged = upsert_do_nothing(existing, batch_df, keys=list(keys), order_by=list(order_by))
            new_rows = merged.join(existing.select(*keys), list(keys), "left_anti")
        else:
            merged = upsert_do_nothing(
                batch_df.limit(0), batch_df, keys=list(keys), order_by=list(order_by)
            )
            new_rows = merged
        new_rows.write.mode("append").parquet(bronze_path)

    return write_batch


def ingest_stream(
    stream: DataFrame,
    bronze_path: str,
    checkpoint: str,
    keys: Sequence[str],
    order_by: Sequence[str],
    available_now: bool = True,
):
    """Attach the idempotent sink to a stream; returns the query writer."""
    w = (
        stream.writeStream.foreachBatch(idempotent_batch_writer(bronze_path, keys, order_by))
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    return w.trigger(availableNow=True) if available_now else w
