"""Chronological train/val/test splitters (reference
src/processing/export_pipeline.py:129-207,537-560,626-642).

Three variants, matching the reference exactly:
- ratio split: first floor(n*train) rows train, next floor(n*val) val,
  rest test — computed over a total time order;
- calendar split: date <= train_end / (train_end, val_end] / > val_end;
- rolling split: anchored at max(time): test = last ``test_days`` days,
  val = ``val_days`` before that.

Invariants tested in the reference (test_feature_pipeline.py:109-146):
ordering, exact sizes, no overlap, totality. The ratio split's global
row order is computed by the two-phase ``banded_global_rank`` (band =
the leading order column, ties = the rest), so no caller sorts the
corpus on one reducer; the calendar variants stay pure filters
(partition-prunable, no shuffle).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.topk import banded_global_rank


def split_label_by_ratio(
    df: DataFrame,
    order_by: list[str],
    train_frac: float = 0.7,
    val_frac: float = 0.15,
    label_col: str = "split",
) -> DataFrame:
    """Add 'train'/'val'/'test' labels by row position (export_pipeline
    .py:164-207: sizes floor(n*train_frac), floor(n*val_frac), remainder)."""
    if train_frac <= 0 or val_frac < 0 or train_frac + val_frac >= 1:
        raise ValueError(
            f"invalid split fractions train={train_frac} val={val_frac}: "
            "need train > 0, val >= 0, train + val < 1 (test is the remainder)"
        )
    # the global row order rides banded_global_rank: band = the leading
    # order column (a date/time — bounded distinct values), ties = the
    # remaining columns, so the corpus-scale sort is sharded by band and
    # the only unpartitioned window runs over the DISTINCT-band table —
    # bit-identical to ROW_NUMBER() OVER (ORDER BY *order_by) (for a
    # single-column order the within-band tie among equal values is
    # arbitrary, exactly as the plain window's is). n arrives as a
    # broadcast 1-row aggregate instead of a corpus-wide global window;
    # floor(n*frac) over doubles matches the reference's int(n*frac)
    # exactly for non-negative n.
    band, *ties = order_by
    ranked = banded_global_rank(
        df, band, ties or [band], out_col="__rn", band_desc=False
    )
    n1 = df.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    rn = F.col("__rn")
    n = F.col("__n")
    n_train = F.floor(n * F.lit(train_frac))
    n_val = F.floor(n * F.lit(val_frac))
    return (
        ranked.crossJoin(F.broadcast(n1))
        .withColumn(
            label_col,
            F.when(rn <= n_train, F.lit("train"))
            .when(rn <= n_train + n_val, F.lit("val"))
            .otherwise(F.lit("test")),
        )
        .drop("__rn", "__n")
    )


def split_by_dates(
    df: DataFrame,
    time_col: str,
    train_end: dt.date,
    val_end: dt.date,
    label_col: str = "split",
) -> DataFrame:
    """Calendar split (export_pipeline.py:537-560): train date <= train_end,
    val in (train_end, val_end], test after. Pure filter — prunes
    partitions at scale."""
    d = F.to_date(F.col(time_col))
    return df.withColumn(
        label_col,
        F.when(d <= F.lit(train_end), F.lit("train"))
        .when(d <= F.lit(val_end), F.lit("val"))
        .otherwise(F.lit("test")),
    )


def rolling_split_bounds(
    df: DataFrame, time_col: str, test_days: int = 7, val_days: int = 14
) -> tuple[dt.date, dt.date]:
    """Anchor at max(time) (export_pipeline.py:626-642): test = last
    test_days days, val = val_days before that. Returns (train_end,
    val_end) dates for split_by_dates."""
    mx = df.agg(F.max(F.to_date(F.col(time_col)))).collect()[0][0]
    val_end = mx - dt.timedelta(days=test_days)
    train_end = val_end - dt.timedelta(days=val_days)
    return train_end, val_end
