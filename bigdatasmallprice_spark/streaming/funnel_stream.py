"""Streaming funnel: incremental per-user stage times — the continuous
twin of ``queries/seqq.py::event_funnel``.

State is MINIMAL per user: the four stage timestamps (t_view, t_click,
t_signup, t_purchase), not the event history. Each micro-batch folds
its events into the state with the ordered-stage rule (stage k counts
only at-or-after the user's stage k-1 time), evaluated stage-by-stage
exactly like the batch query's CTE chain — so equal-timestamp
stage pairs (view and click at the same ts) resolve identically.

Exactness contract: the fold equals the batch funnel whenever batches
arrive time-partitioned per user (every event in batch b+1 is no
earlier than any event of batches <= b for that user) — what a
file/kafka stream with an event-time watermark delivers. Under that
ordering a later batch can never LOWER an already-achieved stage time,
so the stage-times-only state is sufficient; cross-batch stragglers
older than achieved stages are the watermark-late case and are dropped
by the same reasoning the watermarked rollup documents
(streaming/rollup_stream.py).

State versioning follows streaming/state.py: fresh directory per
version, atomic manifest flip, replayed batch ids skipped (the fold is
NOT idempotent, so the version marker does the replay dedup, exactly
like hh_stream)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FUNNEL_STATE_SCHEMA = (
    "user_id long, t_view timestamp, t_click timestamp, "
    "t_signup timestamp, t_purchase timestamp"
)

STAGES = ["view", "click", "signup", "purchase"]
_COLS = ["t_view", "t_click", "t_signup", "t_purchase"]


def _fold_user(times: dict, events: list[tuple]) -> dict:
    """Advance one user's stage times with their batch events,
    stage-by-stage (the batch query's CTE order): stage k's candidate
    set is its events at-or-after the (possibly just-updated) stage
    k-1 time; ties at equal timestamps qualify, matching `>=` in the
    batch SQL."""
    by_stage: dict[str, list] = {s: [] for s in STAGES}
    for ts, etype in events:
        by_stage[etype].append(ts)
    for i, stage in enumerate(STAGES):
        col = _COLS[i]
        prev = None if i == 0 else times[_COLS[i - 1]]
        cand = [
            ts
            for ts in by_stage[stage]
            if i == 0 or (prev is not None and ts >= prev)
        ]
        if cand:
            best = min(cand)
            if times[col] is None or best < times[col]:
                times[col] = best
    return times


def update_funnel(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: fold one micro-batch of (user_id, event_type,
    ts) into the per-user stage-time state. State is users-sized (4
    timestamps per user); the fold groups (state row + batch events)
    per user via applyInPandas — one user-keyed shuffle per batch, and
    only users PRESENT in the batch or the state appear in it."""
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        versioned_already_applied,
    )

    if versioned_already_applied(state_path, batch_id):
        return
    # keep ALL event types: a user whose events are entirely outside the
    # funnel stages still counts in n_users (matching the batch query,
    # which groups every user); non-stage types are ignored in the fold
    b = batch.select(
        "user_id",
        F.col("event_type").alias("ev_type"),
        F.col("ts").alias("ev_ts"),
    )
    state_dir = resolve_state_dir(state_path)
    if state_dir is not None:
        state = spark.read.schema(FUNNEL_STATE_SCHEMA).parquet(state_dir)
    else:
        state = spark.createDataFrame([], FUNNEL_STATE_SCHEMA)
    # one frame carries both state rows (ev_type null) and event rows
    ev_rows = b.select(
        "user_id",
        *[F.lit(None).cast("timestamp").alias(c) for c in _COLS],
        "ev_type",
        "ev_ts",
    )
    st_rows = state.select(
        "*",
        F.lit(None).cast("string").alias("ev_type"),
        F.lit(None).cast("timestamp").alias("ev_ts"),
    )
    merged = st_rows.unionByName(ev_rows)

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        uid = int(pdf["user_id"].iloc[0])
        srows = pdf[pdf["ev_type"].isna()]
        times = {c: None for c in _COLS}
        if len(srows):
            for c in _COLS:
                v = srows[c].iloc[0]
                times[c] = None if pd.isna(v) else v.to_pydatetime()
        events = [
            (r.ev_ts.to_pydatetime(), r.ev_type)
            for r in pdf[pdf["ev_type"].notna()].itertuples()
            if r.ev_type in STAGES
        ]
        times = _fold_user(times, events)
        return pd.DataFrame([{"user_id": uid, **times}])

    new = merged.groupBy("user_id").applyInPandas(_fold, FUNNEL_STATE_SCHEMA)
    version = next_state_version(state_path)
    new.write.mode("overwrite").parquet(state_version_dir(state_path, version))
    publish_state(state_path, version, batch_id)


def read_funnel_counts(spark: SparkSession, state_path: str) -> DataFrame:
    """Current funnel rollup from the state: same columns as the batch
    event_funnel query (users never seen don't exist in the state, so
    n_users counts observed users, as the batch query does)."""
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no funnel state at {state_path}")
    s = spark.read.schema(FUNNEL_STATE_SCHEMA).parquet(state_dir)
    flag = lambda c: F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0)).cast("long")  # noqa: E731
    return s.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        flag("t_view").alias("n_view"),
        flag("t_click").alias("n_click"),
        flag("t_signup").alias("n_signup"),
        flag("t_purchase").alias("n_purchase"),
        F.round(
            F.sum(F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)).cast(
                "double"
            )
            / F.count(F.lit(1)),
            6,
        ).alias("full_conversion"),
    )


def funnel_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    checkpoint: str,
):
    """Wire an event stream into the incremental funnel state
    (availableNow); restart-safe via checkpoint + version markers."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_funnel(spark, state_path, batch, batch_id=bid)

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
