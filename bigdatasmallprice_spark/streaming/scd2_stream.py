"""Streaming SCD type-2: each micro-batch of dimension changes merges
into the persisted validity-interval history via operators/scd2.py's
incremental apply — the continuous twin of the scd2_history rebuild.

Cost per batch: the key-partitioned island window runs over (open
intervals of touched keys + batch changes); closed intervals pass
through as a scan. Exact under time-partitioned per-key delivery (the
watermark contract every incremental fold in streaming/ shares).
Replay-safe via the versioned-state markers: scd2_apply is NOT
idempotent (a replayed close would re-close), so the marker dedups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SCD2_STATE_SCHEMA_TMPL = (
    "{key} long, {attr} string, valid_from long, valid_to long, is_current boolean"
)


def update_scd2(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: merge one change batch into the history."""
    from bigdatasmallprice_spark.operators.scd2 import scd2_apply, scd2_reconstruct
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        versioned_already_applied,
    )

    if versioned_already_applied(state_path, batch_id):
        return
    schema = SCD2_STATE_SCHEMA_TMPL.format(key=key_col, attr=attr_col)
    state_dir = resolve_state_dir(state_path)
    if state_dir is not None:
        history = spark.read.schema(schema).parquet(state_dir)
        new = scd2_apply(history, batch, key_col, attr_col, ts_col, tiebreak_col)
    else:
        new = scd2_reconstruct(batch, key_col, attr_col, ts_col, tiebreak_col)
    version = next_state_version(state_path)
    new.select(
        key_col, attr_col, "valid_from", "valid_to", "is_current"
    ).write.mode("overwrite").parquet(state_version_dir(state_path, version))
    publish_state(state_path, version, batch_id)


def read_scd2_history(
    spark: SparkSession, state_path: str, key_col: str, attr_col: str
) -> DataFrame:
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no scd2 state at {state_path}")
    schema = SCD2_STATE_SCHEMA_TMPL.format(key=key_col, attr=attr_col)
    return spark.read.schema(schema).parquet(state_dir)


def scd2_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
):
    """Wire a change stream into the incremental history
    (availableNow)."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_scd2(
            spark, state_path, batch, key_col, attr_col, ts_col, tiebreak_col,
            batch_id=bid,
        )

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
