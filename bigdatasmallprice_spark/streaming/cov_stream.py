"""Streaming covariance moments: incremental PCA-prep state.

The covariance pass (``covariance_moments_vectorized``) emits exact
int64 moment rows — (i, j>=0) Gram products, (i, -1) linear sums,
(-1, -1) the row count. Integer sums merge associatively, so the
streaming fold is EXACT, not approximate: fold each micro-batch's
moments into the persisted summary by keyed addition and the state
equals the batch pass over all data seen, bit for bit (asserted in
tests/test_streaming.py). ``pca_fit``'s eigendecomposition then runs
on the persisted state at any point — continuous PCA without ever
re-scanning the corpus.

State is dim² + dim + 1 rows regardless of data volume (the same
model-not-data argument as the sketch and k-means states); the rewrite
is staged like the other incremental-state streams.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MOMENT_SCHEMA = "i long, j long, val long"


def update_moments(
    spark: SparkSession,
    summary_path: str,
    batch: DataFrame,
    vec_col: str = "embedding",
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: add this batch's exact moments into the
    persisted summary (keyed integer addition — associative, so any
    batching of the input yields identical state; NOT idempotent, so a
    foreachBatch retry with the same batch_id is skipped via the
    applied marker, streaming/state.py)."""
    from bigdatasmallprice_spark.operators.similarity import (
        covariance_moments_vectorized,
    )
    from bigdatasmallprice_spark.streaming.state import already_applied, mark_applied

    if batch_id is not None and already_applied(summary_path, batch_id):
        return

    m = covariance_moments_vectorized(batch, vec_col=vec_col)
    if os.path.isdir(summary_path):
        state = spark.read.schema(MOMENT_SCHEMA).parquet(summary_path)
        m = m.unionByName(state)
    new = m.groupBy("i", "j").agg(F.sum("val").cast("long").alias("val"))
    tmp = summary_path.rstrip("/") + ".__stage__"
    new.coalesce(1).write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(summary_path)
    shutil.rmtree(tmp, ignore_errors=True)
    if batch_id is not None:
        mark_applied(summary_path, batch_id)


def covariance_stream(
    spark: SparkSession,
    source: DataFrame,
    summary_path: str,
    checkpoint: str,
    vec_col: str = "embedding",
):
    """Wire an embedding stream into the incremental moment state."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_moments(spark, summary_path, batch, vec_col, batch_id=bid)

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )


def read_moments(spark: SparkSession, summary_path: str) -> DataFrame:
    return spark.read.schema(MOMENT_SCHEMA).parquet(summary_path)
