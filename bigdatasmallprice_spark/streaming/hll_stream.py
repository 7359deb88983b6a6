"""Streaming HyperLogLog state: each micro-batch MAX-merges its
per-source register maxima into a persisted register table — the
continuous twin of ``queries/sketchq.hll_distinct``.

The state is FIXED-SIZE per source (<= 2^p rows of (idx, m_rho)), and
the fold is a per-register MAX — associative, commutative and
IDEMPOTENT, so a replayed batch cannot corrupt the state even without
the version marker (still used, for config pinning and fewer wasted
folds). Same scale story as the bloom bitmap (``bloom_stream``): at
100 TB the running per-source cardinality estimate costs one narrow
map per delivery plus a register-sized fold, never a corpus-wide
distinct shuffle over history.

State layout follows streaming/state.py: each version is a fresh
directory, atomically published via the manifest — a crash leaves the
old complete register table or the new complete one, never a torn one.
``p`` is pinned in the manifest: registers built with a different
precision cannot be merged, so a mismatch raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HLL_STATE_SCHEMA = "source string, idx long, m_rho long"


def _batch_registers(batch: DataFrame, text_col: str) -> DataFrame:
    from bigdatasmallprice_spark.functions.texts import shingle_expr
    from bigdatasmallprice_spark.queries.sketchq import hll_registers

    words = batch.select(
        "source", F.split(text_col, " ").alias("ws")
    ).select("source", F.explode(F.expr(shingle_expr("ws", 3))).alias("wd"))
    return hll_registers(words)


def update_hll(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    text_col: str = "text",
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: MAX-merge one micro-batch's register maxima
    into the persisted per-source register table."""
    from bigdatasmallprice_spark.queries.sketchq import _HLL_P
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
    validate_state_config(state_path, {"p": _HLL_P})
    part = _batch_registers(batch, text_col)
    state_dir = resolve_state_dir(state_path)
    if state_dir is not None:
        state = spark.read.schema(HLL_STATE_SCHEMA).parquet(state_dir)
        part = part.unionByName(state)
    new = part.groupBy("source", "idx").agg(F.max("m_rho").alias("m_rho"))
    version = next_state_version(state_path)
    new.coalesce(1).write.mode("overwrite").parquet(
        state_version_dir(state_path, version)
    )
    publish_state(state_path, version, batch_id, config={"p": _HLL_P})


def read_hll_registers(spark: SparkSession, state_path: str) -> DataFrame:
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no hll state at {state_path}")
    return spark.read.schema(HLL_STATE_SCHEMA).parquet(state_dir)


def read_hll_estimate(spark: SparkSession, state_path: str) -> DataFrame:
    """Per-source cardinality estimate from the current state —
    (source, n_registers, v_zero, s_scaled, est_distinct)."""
    from bigdatasmallprice_spark.queries.sketchq import hll_estimate_from_registers

    return hll_estimate_from_registers(read_hll_registers(spark, state_path))


def hll_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    checkpoint: str,
    text_col: str = "text",
):
    """Wire a (source, text) stream into the incremental HLL state
    (availableNow): restart-safe via the stream checkpoint + the
    idempotent MAX fold."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_hll(spark, state_path, batch, text_col, batch_id=bid)

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
