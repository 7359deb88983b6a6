"""Streaming bloom membership state: each micro-batch ORs its n-gram
bloom bits into a persisted bitmap — the continuous twin of
``operators/dedup.bloom_bits``.

This is the cheapest possible incremental-dedup state: the bitmap is
CORPUS-SIZE-INDEPENDENT (<= m/64 longs, 32 KB at the default m), and
the fold is a bitwise OR — associative, commutative and IDEMPOTENT, so
a replayed batch cannot corrupt the state even without the version
marker (it is still used, for config pinning and fewer wasted folds).
Contrast with the band-table state of ``neardup_stream`` (grows with
the corpus, exact candidates) — the two are the standard pairing: bloom
gate first, band join only for bloom survivors.

State layout follows streaming/state.py: each version is a fresh
directory, atomically published via the manifest — a crash leaves the
old complete bitmap or the new complete bitmap, never a torn one.
(m, k) are pinned in the manifest: probing a bitmap built with a
different geometry would silently return garbage, so a mismatch raises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BLOOM_STATE_SCHEMA = "word_idx long, bits long"


def update_bloom(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    text_col: str = "text",
    m: int | None = None,
    k: int | None = None,
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: OR one micro-batch's bloom bits into the
    persisted bitmap. Reads the (tiny) current version, unions the
    batch's partial bitmap, re-ORs per word, publishes a fresh
    version."""
    from bigdatasmallprice_spark.operators.dedup import BLOOM_K, BLOOM_M, bloom_bits
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        validate_pin_with_default,
        validate_state_config,
        versioned_already_applied,
    )

    m = BLOOM_M if m is None else m
    k = BLOOM_K if k is None else k
    if versioned_already_applied(state_path, batch_id):
        return
    validate_state_config(state_path, {"m": m, "k": k})
    # the source-column pin (knlm_stream's rule): bits hashed from one
    # column must never OR with another's; pre-pin states migrate
    # under the default and the pin re-publishes below
    validate_pin_with_default(state_path, "text_col", text_col, "text")
    part = bloom_bits(batch, text_col=text_col, m=m, k=k)
    state_dir = resolve_state_dir(state_path)
    if state_dir is not None:
        state = spark.read.schema(BLOOM_STATE_SCHEMA).parquet(state_dir)
        part = part.unionByName(state)
    new = part.groupBy("word_idx").agg(F.expr("bit_or(bits)").alias("bits"))
    version = next_state_version(state_path)
    new.coalesce(1).write.mode("overwrite").parquet(
        state_version_dir(state_path, version)
    )
    publish_state(
        state_path, version, batch_id,
        config={"m": m, "k": k, "text_col": text_col},
    )


def read_bloom_bits(spark: SparkSession, state_path: str) -> DataFrame:
    """Current bitmap as (word_idx, bits) — feed to
    operators/dedup.bloom_membership."""
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no bloom state at {state_path}")
    return spark.read.schema(BLOOM_STATE_SCHEMA).parquet(state_dir)


def bloom_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    checkpoint: str,
    text_col: str = "text",
    m: int | None = None,
    k: int | None = None,
):
    """Wire a text stream into the incremental bloom state
    (availableNow): restart-safe via the stream checkpoint + the
    idempotent OR fold."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_bloom(spark, state_path, batch, text_col, m, k, batch_id=bid)

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
