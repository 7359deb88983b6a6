"""Streaming Count-Min state: each micro-batch SUM-folds its word
counts into the persisted d x w counter matrix — the continuous twin
of ``queries/sketchq.count_min_probe``.

Completes the mergeable-sketch streaming trio with distinct algebra in
each fold: bloom bitmap (OR, idempotent), HLL registers (MAX,
idempotent), and this one — counter SUMS, which are mergeable but NOT
idempotent: a replayed delivery would double-count. The fold therefore
leans on the replay watermark (versioned_already_applied) the same way
the Misra-Gries stream does; the test replays a batch id and proves
the counters unchanged.

The state never exceeds d*w rows regardless of corpus size, so at
100 TB a running per-term frequency service costs one narrow map per
delivery plus a 65k-row fold — never a vocabulary shuffle over
history. (w, d) are pinned in the manifest: counters built with a
different geometry would silently misroute increments, so a mismatch
raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CMS_STATE_SCHEMA = "r int, idx long, reg long"


def _batch_registers(batch: DataFrame, text_col: str) -> DataFrame:
    from bigdatasmallprice_spark.queries.sketchq import cms_registers

    words = batch.select(F.explode(F.split(text_col, " ")).alias("wd"))
    return cms_registers(words)


def update_cms(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    text_col: str = "text",
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: SUM one micro-batch's counter increments
    into the persisted matrix. NOT idempotent — replays must be (and
    are) skipped via the batch-id watermark."""
    from bigdatasmallprice_spark.queries.sketchq import _CMS_D, _CMS_W
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        validate_pin_with_default,
        validate_state_config,
        versioned_already_applied,
    )

    if versioned_already_applied(state_path, batch_id):
        return
    validate_state_config(state_path, {"w": _CMS_W, "d": _CMS_D})
    # source-column pin (knlm_stream's rule; migration per pre-pin states)
    validate_pin_with_default(state_path, "text_col", text_col, "text")
    part = _batch_registers(batch, text_col)
    state_dir = resolve_state_dir(state_path)
    if state_dir is not None:
        state = spark.read.schema(CMS_STATE_SCHEMA).parquet(state_dir)
        part = part.unionByName(state)
    new = part.groupBy("r", "idx").agg(F.sum("reg").cast("long").alias("reg"))
    version = next_state_version(state_path)
    new.coalesce(1).write.mode("overwrite").parquet(
        state_version_dir(state_path, version)
    )
    publish_state(
        state_path, version, batch_id,
        config={"w": _CMS_W, "d": _CMS_D, "text_col": text_col}
    )


def read_cms_registers(spark: SparkSession, state_path: str) -> DataFrame:
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no cms state at {state_path}")
    return spark.read.schema(CMS_STATE_SCHEMA).parquet(state_dir)


def read_cms_estimates(
    spark: SparkSession, state_path: str, terms: list[str]
) -> DataFrame:
    """Point-frequency estimates for ``terms`` from the current state —
    (term, est_cnt), est >= true count over everything folded so far."""
    from bigdatasmallprice_spark.queries.sketchq import cms_point_estimates

    tf = spark.createDataFrame([(t,) for t in terms], "term string")
    return cms_point_estimates(tf, read_cms_registers(spark, state_path))


def cms_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    checkpoint: str,
    text_col: str = "text",
):
    """Wire a text stream into the incremental CMS state
    (availableNow): restart-safe via the stream checkpoint + the
    replay watermark (the SUM fold is not idempotent)."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_cms(spark, state_path, batch, text_col, batch_id=bid)

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
