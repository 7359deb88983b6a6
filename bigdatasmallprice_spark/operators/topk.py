"""Sorts, limits, pagination, downsampling — the serving-query surface.

Reference: src/api/main.py — latest-row (``ORDER BY time DESC LIMIT 1``,
main.py:277-291), history top-k re-sorted ascending (main.py:355-372),
LIMIT/OFFSET row explorer (main.py:429-452), 10k guard (main.py:529-535),
stride downsample to <=500 chart points (main.py:1038-1045).

Scale note: Spark compiles ``orderBy(...).limit(k)`` to TakeOrderedAndProject
— a per-partition top-k plus a k-row merge on one reducer; no global sort
materializes. OFFSET pagination deep into a 100 TB table is inherently
driver-heavy; the row_number variant keeps it bounded by (offset+limit).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_rows(df: DataFrame, order_desc: Sequence[str | Column], n: int = 1) -> DataFrame:
    """ORDER BY ... DESC LIMIT n (main.py:277-291)."""
    return df.orderBy(*[F.col(c).desc() if isinstance(c, str) else c for c in order_desc]).limit(n)


def history(
    df: DataFrame, time_col: str, tiebreak: str, n: int
) -> DataFrame:
    """Take the newest n rows, then return them time-ascending
    (main.py:355-372: DESC LIMIT :hours then re-sort)."""
    newest = df.orderBy(F.col(time_col).desc(), F.col(tiebreak).desc()).limit(n)
    return newest.orderBy(F.col(time_col).asc(), F.col(tiebreak).asc())


def paginate(
    df: DataFrame, order_desc: Sequence[str], limit: int, offset: int
) -> DataFrame:
    """ORDER BY ... DESC LIMIT :l OFFSET :o (main.py:429-452).

    Spark >= 3.4 has a native offset(); row_number fallback kept for
    deterministic parity when the sort needs an explicit total order."""
    ordered = df.orderBy(*[F.col(c).desc() for c in order_desc])
    return ordered.offset(offset).limit(limit)


def stride_downsample(
    df: DataFrame, order_by: Sequence[str], max_points: int = 500
) -> DataFrame:
    """Keep every ceil(n/max_points)-th row in sort order
    (main.py:1038-1045).

    Single pass: the row count rides a count window beside the
    row_number (both globally partitioned, one Window stage) instead of
    a separate ``df.count()`` action — the input is scanned once, not
    twice (a round-2 review nit for cases where the serving frame is
    itself a view over a large scan)."""
    w = Window.orderBy(*order_by)
    n = F.count(F.lit(1)).over(Window.partitionBy(F.lit(1)))
    step = F.greatest(F.lit(1).cast("long"), F.ceil(n / F.lit(max_points)))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__step", step)
        .filter(((F.col("__rn") - 1) % F.col("__step")) == 0)
        .drop("__rn", "__step")
    )


def approx_quantile_buckets(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    relative_error: float = 0.001,
) -> DataFrame:
    """Scale path for ntile(n): assign quantile buckets WITHOUT a global
    sort.

    ntile needs a total order — one reducer sees everything. Here the
    cut points come from ``approxQuantile`` (Greenwald-Khanna sketch:
    one pass, mergeable per partition, driver gets n-1 doubles) and the
    assignment is a per-row broadcast comparison — no shuffle at all
    beyond the sketch's collect. Bucket sizes are equal to within the
    sketch's relative error instead of exactly equal; that is the
    trade every 100 TB binning pipeline makes.

    Returns ``df`` plus a ``bucket`` column in [1, n_buckets].
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cuts = df.approxQuantile(value_col, probs, relative_error)
    v = F.col(value_col)
    bucket = F.lit(1)
    for c in cuts:
        bucket = bucket + F.when(v > F.lit(c), 1).otherwise(0)
    return df.withColumn("bucket", bucket.cast("int"))


def banded_global_rank(
    df: DataFrame,
    band_col: str,
    tie_col: str | list[str],
    out_col: str = "rn",
    band_desc: bool = True,
) -> DataFrame:
    """The global dense ROW_NUMBER() OVER (ORDER BY band_col DESC,
    tie_col) WITHOUT a single-partition sort — the partitioned_lag_
    stitch lesson applied to ranking. ``tie_col`` accepts a list for a
    composite tie order (all ascending, matching the window default).

    Two phases, bit-identical to the global window:

    1. band bases: groupBy(band_col).count() collapses the corpus to
       its DISTINCT band values (document token counts: thousands of
       distinct values at any corpus size), then one window over THAT
       bounded frame computes each band's cumulative starting rank —
       the only unpartitioned window runs over the band table, never
       the corpus (the hourly-rollup global-window class, documented
       safe).
    2. within-band ranks: row_number() partitioned BY the band,
       ordered by the tie column — every partition is one band's
       documents, so the corpus-scale sort is sharded by band value.

    rank = base(band) + within-band rank. Total order (band DESC,
    tie ASC) is preserved exactly; callers' downstream arithmetic
    (round-robin bin = (rn-1) % n_bins) is unchanged.

    Skew note: a band with a huge population (every doc the same
    length) degrades to the single-partition case — for packing
    inputs, token counts spread over hundreds-to-thousands of values;
    if one band dominates, sub-salt on the tie column's hash and
    stitch, as partitioned_lag_stitch does for time.

    Cardinality note: the base table is broadcast, so the band
    column's DISTINCT count must stay broadcast-sized (true for token
    counts and cent-valued amounts — bounded by max document length /
    value range, not corpus size). For an unbounded band domain,
    coarsen through approx_quantile_buckets first and rank within
    buckets.

    NULL bands are first-class: the base-table join is null-safe
    (``eqNullSafe``), and the band ordering pins NULLS FIRST for ASC /
    NULLS LAST for DESC — exactly where the plain window's default
    ordering puts them — so a NULL band neither drops rows nor
    diverges from ``ROW_NUMBER() OVER (ORDER BY band, ties)``.
    """
    from pyspark.sql import Window

    ties = [tie_col] if isinstance(tie_col, str) else list(tie_col)
    bands = df.groupBy(band_col).agg(F.count(F.lit(1)).alias("__bn"))
    border = (
        F.col(band_col).desc_nulls_last()
        if band_desc
        else F.col(band_col).asc_nulls_first()
    )
    wb = Window.orderBy(border).rowsBetween(Window.unboundedPreceding, -1)
    base = bands.select(
        F.col(band_col).alias("__band"),
        F.coalesce(F.sum("__bn").over(wb), F.lit(0)).cast("long").alias("__base"),
    )
    ww = Window.partitionBy(band_col).orderBy(*[F.col(c) for c in ties])
    return (
        df.join(F.broadcast(base), F.col(band_col).eqNullSafe(F.col("__band")))
        .withColumn(out_col, (F.col("__base") + F.row_number().over(ww)).cast("long"))
        .drop("__band", "__base")
    )
