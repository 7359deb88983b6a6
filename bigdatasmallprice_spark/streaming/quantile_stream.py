"""Streaming quantile-sketch state: each micro-batch SUM-folds its
(event_type, bin) counts into the persisted histogram — the continuous
twin of ``queries/sketchq.quantile_sketch_by_type`` and the last member
of the sketch streaming family (bloom: OR, HLL: MAX, Count-Min /
Misra–Gries / THIS: SUM).

SUM folds are mergeable but NOT idempotent, so replay protection comes
from the batch-id watermark exactly as in the Count-Min stream; the
test replays a delivered id and proves the counters unchanged. The
state never exceeds types x 1024 rows regardless of history size, so a
running latency/price-quantile service costs one narrow map per
delivery plus a model-sized fold — never a history-wide sort. Bin
geometry is pinned in the manifest: counters built with a different
width would silently shift every estimate, so a mismatch raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

Q_STATE_SCHEMA = "event_type string, bin long, cnt long"


def update_quantile_hist(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    type_col: str = "event_type",
    value_col: str = "value",
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: SUM one micro-batch's histogram increments
    into the persisted state. NOT idempotent — replays must be (and
    are) skipped via the batch-id watermark."""
    from pyspark.sql import functions as F

    from bigdatasmallprice_spark.queries.sketchq import _HQ_B, _HQ_W, quantile_hist
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        validate_state_config,
        versioned_already_applied,
    )

    if versioned_already_applied(state_path, batch_id):
        return
    validate_state_config(state_path, {"w_cents": _HQ_W, "bins": _HQ_B})
    part = quantile_hist(batch, type_col=type_col, value_col=value_col)
    state_dir = resolve_state_dir(state_path)
    if state_dir is not None:
        state = spark.read.schema(Q_STATE_SCHEMA).parquet(state_dir)
        part = part.unionByName(state)
    new = part.groupBy("event_type", "bin").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    version = next_state_version(state_path)
    new.coalesce(1).write.mode("overwrite").parquet(
        state_version_dir(state_path, version)
    )
    publish_state(
        state_path, version, batch_id, config={"w_cents": _HQ_W, "bins": _HQ_B}
    )


def read_quantile_hist(spark: SparkSession, state_path: str) -> DataFrame:
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no quantile-sketch state at {state_path}")
    return spark.read.schema(Q_STATE_SCHEMA).parquet(state_dir)


def read_quantile_estimates(spark: SparkSession, state_path: str) -> DataFrame:
    """Per-type quantile estimates from the current state — the same
    readback fold the lean batch query runs (shared code), so the
    stream's answer over everything folded so far equals the batch
    answer over the union by construction: the state IS the summed
    histogram, and the estimate is a pure function of it."""
    from bigdatasmallprice_spark.queries.sketchq import (
        quantile_estimates_from_hist,
    )

    return quantile_estimates_from_hist(read_quantile_hist(spark, state_path))


def quantile_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    checkpoint: str,
    type_col: str = "event_type",
    value_col: str = "value",
):
    """Wire an event stream into the incremental quantile-sketch state
    (availableNow): restart-safe via the stream checkpoint + the replay
    watermark (the SUM fold is not idempotent)."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_quantile_hist(
            spark, state_path, batch, type_col, value_col, batch_id=bid
        )

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
