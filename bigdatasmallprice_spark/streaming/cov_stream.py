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
model-not-data argument as the sketch and k-means states); each fold
writes a fresh version directory and flips an atomic manifest, so the
rewrite is crash-atomic (streaming/state.py).
"""

from __future__ import annotations

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
    manifest watermark). The fold writes a fresh version directory and
    atomically flips the state manifest (streaming/state.py) — a crash
    at any point leaves either the old or the new complete state,
    never a torn one."""
    from bigdatasmallprice_spark.operators.similarity import (
        covariance_moments_vectorized,
    )
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        validate_pin_with_default,
        versioned_already_applied,
    )

    if versioned_already_applied(summary_path, batch_id):
        return
    # source-column pin (knlm_stream's rule): moments from two
    # different vector columns must never sum into one summary;
    # pre-pin states migrate under the default
    validate_pin_with_default(summary_path, "vec_col", vec_col, "embedding")

    m = covariance_moments_vectorized(batch, vec_col=vec_col)
    state_dir = resolve_state_dir(summary_path)
    if state_dir is not None:
        state = spark.read.schema(MOMENT_SCHEMA).parquet(state_dir)
        m = m.unionByName(state)
    new = m.groupBy("i", "j").agg(F.sum("val").cast("long").alias("val"))
    version = next_state_version(summary_path)
    new.coalesce(1).write.mode("overwrite").parquet(
        state_version_dir(summary_path, version)
    )
    publish_state(
        summary_path, version, batch_id, config={"vec_col": vec_col}
    )


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
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(summary_path)
    if state_dir is None:
        raise FileNotFoundError(f"no moment state at {summary_path}")
    return spark.read.schema(MOMENT_SCHEMA).parquet(state_dir)
