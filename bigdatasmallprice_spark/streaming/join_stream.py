"""Watermarked stream-stream interval join (event-time attribution).

The reference is batch-only; this is the streaming analog of its
time-equi-joins (SURVEY §2.3) generalized to the attribution shape a
live event pipeline needs: match each right-side event (e.g. purchase)
to left-side events (e.g. clicks) of the same key that happened within
a bounded look-back interval.

Why the bounds matter at scale: Spark keeps join state for BOTH sides
until the watermark plus the interval passes, so an unbounded join
condition would accumulate state forever. The watermark (`lateness`)
caps how late data may arrive; the time-range predicate
(`max_delay`) caps how long a left row stays joinable — together they
give the state store an eviction horizon, which is what makes the
query runnable continuously on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "1 hour",
    lateness: str = "2 hours",
) -> DataFrame:
    """Inner interval join: right row at t matches left rows of the same
    key in [t - max_delay, t]. Both sides must carry distinct column
    names (rename before calling). Works identically under
    ``trigger(availableNow=True)`` for scheduled-batch cadence."""
    lw = left.withWatermark(left_ts, lateness)
    rw = right.withWatermark(right_ts, lateness)
    cond = (
        (lw[key] == rw[f"r_{key}"])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return lw.join(rw, cond, "inner")


def interval_join_batch(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    max_delay: str = "1 hour",
) -> DataFrame:
    """Batch reference of the same semantics (no watermark pruning)."""
    cond = (
        (left[key] == right[f"r_{key}"])
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    return left.join(right, cond, "inner")
