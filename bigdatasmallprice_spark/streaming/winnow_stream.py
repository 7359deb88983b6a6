"""Streaming incremental winnowing dedup: the fingerprint-state twin
of ``winnow_neardup_pairs`` (queries/dedupq.py) and the third member
of the incremental near-dup family (exact md5 dedup, MinHash+LSH
verify, and now winnowing's guarantee-carrying sparse fingerprints).

Per micro-batch:

1. fingerprint ONLY the batch's documents (winnow_fingerprints — pure
   codegen; corpus text is never re-read, the property that makes the
   gate viable at 100 TB),
2. equi-join the batch's fingerprints against the persisted corpus
   fingerprint table: any new document sharing >= ``min_shared``
   fingerprints with a seen document is flagged, and the MOSS
   guarantee transfers — a new document sharing a token run of
   >= k+w-1 = 8 tokens with ANY seen document is guaranteed to share
   at least one fingerprint with it,
3. also pairs the batch against ITSELF (within-batch near-dups),
4. writes pair verdicts into a per-version sink partition (overwrite — retry-idempotent) and folds the batch's
   fingerprints into the state (versioned crash-atomic swap). Two
   replay layers: the batch-id watermark skips RETRIED batches, and a
   per-doc anti-join against the state skips documents RE-DELIVERED
   under a new batch id (first-writer-wins, the LSH stream's rule) —
   so a doc folds and pairs exactly once however often it arrives.

Hub semantics: the boilerplate cap (WINNOW_HUB_MAX) is applied against
the state AS OF each fold — a fingerprint can emit pairs before its
document frequency crosses the cap, where the batch query (which sees
global frequencies) would drop it. On hub-free corpora the
incremental pair set EQUALS the batch query's exactly (proven in
tests/test_streaming.py over time-split deliveries); with hubs the
incremental gate is a superset — the safe direction for a dedup gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.dedup import (
    WINNOW_HUB_MAX,
    winnow_fingerprints,
)

W_STATE_SCHEMA = "doc_id long, fp long"


def _pairs_between(
    new_fps: DataFrame, old_fps: DataFrame, min_shared: int, hub_max: int
) -> DataFrame:
    """(new doc, seen doc, n_shared) — fingerprint equi-join of the
    batch against a fingerprint table, boilerplate fps (df > hub_max
    across BOTH sides) dropped first."""
    both = new_fps.select("fp").unionByName(old_fps.select("fp"))
    keep = (
        both.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= hub_max)
        .select("fp")
    )
    a = new_fps.join(keep, "fp").select(F.col("doc_id").alias("id_new"), "fp")
    b = old_fps.join(keep, "fp").select(F.col("doc_id").alias("id_seen"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_new") != F.col("id_seen"))
        .groupBy("id_new", "id_seen")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def update_winnow_state(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    verdict_path: str,
    min_shared: int = 4,
    hub_max: int = WINNOW_HUB_MAX,
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: emit the batch's near-dup pairs (vs state +
    within batch), then fold its fingerprints into the state."""
    from bigdatasmallprice_spark.streaming.state import (
        check_verdict_sink_layout,
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        validate_state_config,
        versioned_already_applied,
    )

    config = {"min_shared": min_shared, "hub_max": hub_max}
    check_verdict_sink_layout(verdict_path)
    if versioned_already_applied(state_path, batch_id):
        return
    validate_state_config(state_path, config)
    state_dir = resolve_state_dir(state_path)
    if state_dir is not None:
        old = spark.read.schema(W_STATE_SCHEMA).parquet(state_dir)
    else:
        old = spark.createDataFrame([], W_STATE_SCHEMA)
    # first-writer-wins, like the LSH stream's anti-join: a document
    # re-delivered in a LATER batch (at-least-once source under a new
    # batch id, so the watermark does not guard it) must fold and pair
    # exactly once — a bag union would double its fingerprints in the
    # state, double every n_shared it participates in (spurious pairs
    # past min_shared) and double-count it in the hub filter
    new_fps = (
        winnow_fingerprints(batch)
        .join(old.select("doc_id").distinct(), "doc_id", "left_anti")
        .persist()
    )

    # cross pairs (new vs seen): half-open by construction — id_seen is
    # never re-paired with another seen doc here (those pairs were
    # emitted when IT was new). Within-batch pairs use the symmetric
    # id < id form of the batch operator.
    cross = _pairs_between(new_fps, old, min_shared, hub_max).select(
        F.least("id_new", "id_seen").alias("id_a"),
        F.greatest("id_new", "id_seen").alias("id_b"),
        "n_shared",
    )
    from bigdatasmallprice_spark.operators.dedup import winnow_pairs

    within = winnow_pairs(new_fps, min_shared=min_shared, hub_max=hub_max)
    # verdicts land in a per-version subdirectory with OVERWRITE: a
    # crash between this write and publish_state makes the retry
    # recompute the same version number (the manifest did not move) and
    # replace — not re-append — the pair set, closing the
    # duplicate-verdict window a flat append would leave open
    version = next_state_version(state_path)
    cross.unionByName(within).write.mode("overwrite").parquet(
        f"{verdict_path}/batch={version}"
    )

    merged = old.unionByName(new_fps.select("doc_id", "fp"))
    merged.write.mode("overwrite").parquet(
        state_version_dir(state_path, version)
    )
    new_fps.unpersist()
    publish_state(state_path, version, batch_id, config=config)


def read_winnow_state(spark: SparkSession, state_path: str) -> DataFrame:
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no winnow state at {state_path}")
    return spark.read.schema(W_STATE_SCHEMA).parquet(state_dir)


def winnow_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    checkpoint: str,
    verdict_path: str,
    min_shared: int = 4,
):
    """Wire a (doc_id, text) stream into the incremental winnowing
    dedup gate (availableNow): restart-safe via the stream checkpoint
    + the replay watermark (pair appends are not idempotent)."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_winnow_state(
            spark,
            state_path,
            batch,
            verdict_path,
            min_shared=min_shared,
            batch_id=bid,
        )

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
