"""Slowly-changing-dimension type 2: validity-interval history
maintenance — the lakehouse dimension-table primitive the reference's
type-1 upsert (operators/upsert.py, ON CONFLICT DO NOTHING) does not
cover. Reference parity: the reference keeps only current tariff rows
(src/storage/tables.sql); SCD2 is the standard generalization a
warehouse needs for point-in-time joins (operators/asof.py consumes
exactly this shape).

Two forms, proven equivalent in tests:

- ``scd2_reconstruct``: batch rebuild from the full change log — the
  gaps-and-islands window computation (change rows where the tracked
  attribute differs from its lag; valid_to = next change's ts). One
  key-partitioned window, no self-join.
- ``scd2_apply``: ONE batch of changes merged into an existing
  history (close the open interval when the attribute changed, insert
  the new current row). This is the incremental form a daily pipeline
  runs; cost scales with |changes| + |open intervals of touched keys|,
  never with history size. Folding batches through scd2_apply equals
  scd2_reconstruct over the concatenated log whenever batches are
  time-partitioned per key (the same contract as the streaming folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_reconstruct(
    changes: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Full-log rebuild: (key, attr, valid_from, valid_to, is_current).

    Within a key, changes order by (ts, tiebreak); consecutive rows
    with the SAME attribute collapse into one interval (only island
    starts survive). valid_to is the next island's valid_from; the
    last island per key is open (valid_to NULL, is_current true).
    Deterministic for any input: the tiebreak column makes the order
    total, so equal-timestamp changes resolve identically everywhere."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    islands = (
        changes.withColumn("__prev", F.lag(attr_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
        .drop("__prev")
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    return islands.select(
        F.col(key_col),
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_apply(
    history: DataFrame,
    changes: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Merge ONE change batch into an existing SCD2 history.

    Closed intervals pass through untouched. For each touched key the
    open (current) interval and the batch's changes re-run the island
    computation together — the open row acts as the seed change at its
    valid_from — so in-batch duplicates collapse and a batch whose
    first change equals the current attribute is a no-op, exactly as
    the full rebuild would have it. Requires batch changes to be
    at-or-after the touched keys' valid_from (time-partitioned
    delivery); the plan is one key-partitioned window over
    (open rows + batch), plus a union with the untouched closed rows —
    history size only enters through the pass-through scan."""
    closed = history.filter(~F.col("is_current"))
    open_rows = history.filter(F.col("is_current"))
    seed = open_rows.select(
        F.col(key_col),
        F.col(attr_col),
        F.col("valid_from").alias(ts_col),
        # the seed must sort before any batch change at the same ts so
        # the open attribute stays the island baseline
        F.lit(-1).cast("long").alias(tiebreak_col),
    )
    log = seed.unionByName(
        changes.select(key_col, attr_col, ts_col, tiebreak_col)
    )
    rebuilt = scd2_reconstruct(log, key_col, attr_col, ts_col, tiebreak_col)
    return closed.unionByName(rebuilt)
