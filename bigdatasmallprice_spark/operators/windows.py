"""Lag / rolling-window operators — the heart of the reference's feature
engine (reference infra/db/init.sql:243-251,260-303,324-326,433-438).

Semantics preserved exactly (reference src/testing/unittests/
test_feature_pipeline.py:63-75): ``lag(n)`` of row i is the value at row
i-n with NULL for the first n rows; rolling means use ROW-based frames
(``ROWS BETWEEN k PRECEDING AND CURRENT ROW``) averaging *available*
rows — row 0's 24-row mean is itself, not NULL. ROWS, not RANGE: the
reference's hourly grid may have gaps and the features count rows.

Scale note (SURVEY §7.3): the reference's windows are global
``ORDER BY time`` — a single-partition window in Spark, the #1 scale
hazard at 100 TB. Two strategies are provided:

- ``lag_features`` / ``rolling_mean``: plain global window. Correct at
  any size but serializes one partition; acceptable for series that are
  small *after* aggregation (an hourly series for 30 years is ~260k rows
  — trivially one partition even at 100 TB of raw events, because the
  groupBy that produced it already reduced the data).
- ``partitioned_lag_stitch``: partitions by a coarse time bucket (e.g.
  month), computes windows per partition in parallel, and fixes the
  first ``max_lag`` rows of each partition with an overlap join. Use
  when the *windowed* series itself is huge (e.g. per-entity windows —
  then partition by entity instead, which Spark parallelizes natively).

When lagging per-key series (per domain / psr_type / tariff_type in the
reference), ALWAYS pass ``partition_by`` — that is embarrassingly
parallel and needs no stitching.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def ordered_window(
    order_by: Sequence[str | Column], partition_by: Sequence[str | Column] = ()
) -> WindowSpec:
    w = Window.orderBy(*order_by)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return w


def lag_features(
    df: DataFrame,
    value_col: str,
    lags: Sequence[int],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
    prefix: str | None = None,
) -> DataFrame:
    """Add ``{prefix}_lag_{n}`` columns (init.sql:243-245 LAG(price,1|24|168))."""
    prefix = prefix or value_col
    w = ordered_window(order_by, partition_by)
    for n in lags:
        df = df.withColumn(f"{prefix}_lag_{n}", F.lag(value_col, n).over(w))
    return df


def rolling_mean(
    df: DataFrame,
    value_col: str,
    windows: Sequence[int],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
    prefix: str | None = None,
) -> DataFrame:
    """Add ``{prefix}_roll_{k}`` = AVG over ROWS BETWEEN k-1 PRECEDING AND
    CURRENT ROW (init.sql:246-251: 24-row and 168-row means)."""
    prefix = prefix or value_col
    for k in windows:
        w = ordered_window(order_by, partition_by).rowsBetween(-(k - 1), 0)
        df = df.withColumn(f"{prefix}_roll_{k}", F.avg(value_col).over(w))
    return df


def rolling_int_mean(
    df: DataFrame,
    int_col: str,
    windows: Sequence[int],
    order_by: Sequence[str | Column],
    partition_by: Sequence[str | Column] = (),
    prefix: str | None = None,
    scale: float = 1.0,
) -> DataFrame:
    """Rolling mean computed as integer-sum / count — bit-reproducible
    across engines (used by oracle-checked queries; see registry.py).
    ``scale`` divides the result (e.g. 100.0 for cent-encoded money)."""
    prefix = prefix or int_col
    for k in windows:
        w = ordered_window(order_by, partition_by).rowsBetween(-(k - 1), 0)
        df = df.withColumn(
            f"{prefix}_roll_{k}",
            F.sum(int_col).over(w).cast("double")
            / (F.lit(scale) * F.count(int_col).over(w)),
        )
    return df


def partitioned_lag_stitch(
    df: DataFrame,
    value_col: str,
    lags: Sequence[int],
    time_col: str,
    bucket_expr: Column,
    prefix: str | None = None,
    validate: bool = True,
) -> DataFrame:
    """Scale-path lag: window inside coarse time buckets, then repair the
    first max(lags) rows of each bucket from the previous bucket's tail.

    Equivalent to the global window (proven in tests/test_operators.py)
    but runs one task per bucket instead of one task total. For a 100 TB
    event table bucketed by month this turns a single-partition sort into
    ~1200 parallel window tasks plus a broadcast-sized tail join.

    The repair reaches exactly one bucket back, so equivalence requires
    every non-final bucket to hold at least ``max(lags)`` rows; with
    ``validate=True`` (default) that precondition is checked eagerly
    (one small count-by-bucket job) and a ``ValueError`` names the
    offending buckets instead of silently emitting NULL lags.
    """
    prefix = prefix or value_col
    max_lag = max(lags)
    b = df.withColumn("__bucket", bucket_expr)

    if validate:
        sizes = b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
        w_chk = Window.orderBy(F.col("__bucket").desc())
        short = (
            sizes.withColumn("__rk", F.row_number().over(w_chk))
            .filter((F.col("__rk") > 1) & (F.col("__n") < max_lag))
            .select("__bucket")
            .collect()
        )
        if short:
            bad = sorted(str(r["__bucket"]) for r in short)
            raise ValueError(
                f"partitioned_lag_stitch: buckets {bad} hold fewer than "
                f"max(lags)={max_lag} rows; head repair only reaches one "
                "bucket back — coarsen bucket_expr or use the global window"
            )

    # per-bucket windows (parallel)
    w_in = Window.partitionBy("__bucket").orderBy(time_col)
    out = b
    for n in lags:
        out = out.withColumn(f"{prefix}_lag_{n}", F.lag(value_col, n).over(w_in))

    # tail of each bucket (last max_lag rows) shifted into the next bucket;
    # ranked from the end so row r of the tail fills lag n where needed.
    w_desc = Window.partitionBy("__bucket").orderBy(F.col(time_col).desc())
    tail = (
        b.withColumn("__rev", F.row_number().over(w_desc))
        .filter(F.col("__rev") <= max_lag)
        .select(
            F.col("__bucket").alias("__prev_bucket"),
            F.col("__rev"),
            F.col(value_col).alias("__tail_val"),
        )
    )
    # position of each row inside its bucket (1-based)
    w_asc = Window.partitionBy("__bucket").orderBy(time_col)
    out = out.withColumn("__pos", F.row_number().over(w_asc))

    # successor bucket mapping: distinct buckets sorted, joined shifted
    buckets = b.select("__bucket").distinct()
    w_b = Window.orderBy("__bucket")
    succ = buckets.withColumn("__next_bucket", F.lead("__bucket").over(w_b))
    tail = tail.join(
        F.broadcast(succ),
        tail["__prev_bucket"] == succ["__bucket"],
        "inner",
    ).select("__next_bucket", "__rev", "__tail_val")

    for n in lags:
        # row at position p (< n+1... p <= n) needs the previous bucket's
        # value at distance n-p+1 from its end, i.e. __rev == n - p + 1
        need = F.col("__pos") <= F.lit(n)
        t = tail.withColumnRenamed("__tail_val", f"__fill_{n}")
        out = out.join(
            F.broadcast(t),
            (out["__bucket"] == t["__next_bucket"])
            & (t["__rev"] == F.lit(n) - out["__pos"] + 1),
            "left",
        ).drop("__next_bucket", "__rev")
        out = out.withColumn(
            f"{prefix}_lag_{n}",
            F.when(need, F.col(f"__fill_{n}")).otherwise(F.col(f"{prefix}_lag_{n}")),
        ).drop(f"__fill_{n}")

    return out.drop("__bucket", "__pos")


def partitioned_rolling_stitch(
    df: DataFrame,
    value_col: str,
    k: int,
    time_col: str,
    bucket_expr: Column,
    out_sum: str,
    out_cnt: str,
    validate: bool = True,
) -> DataFrame:
    """Scale-path trailing-window aggregate: SUM/COUNT of ``value_col``
    over the last ``k`` rows (current included), computed inside coarse
    time buckets in parallel, with each bucket's first ``k-1`` rows
    repaired from the previous bucket's tail — the rolling-mean analog
    of ``partitioned_lag_stitch``. NULL values are skipped by both the
    in-bucket partial and the repair (matching SUM/COUNT window
    semantics). Equivalence requires every non-final bucket to hold at
    least ``k-1`` rows (checked eagerly when ``validate``).
    """
    b = df.withColumn("__bucket", bucket_expr)

    if validate and k > 1:
        sizes = b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
        w_chk = Window.orderBy(F.col("__bucket").desc())
        short = (
            sizes.withColumn("__rk", F.row_number().over(w_chk))
            .filter((F.col("__rk") > 1) & (F.col("__n") < k - 1))
            .select("__bucket")
            .collect()
        )
        if short:
            bad = sorted(str(r["__bucket"]) for r in short)
            raise ValueError(
                f"partitioned_rolling_stitch: buckets {bad} hold fewer than "
                f"k-1={k - 1} rows; head repair only reaches one bucket back"
            )

    w_in = Window.partitionBy("__bucket").orderBy(time_col).rowsBetween(-(k - 1), 0)
    w_asc = Window.partitionBy("__bucket").orderBy(time_col)
    part = (
        b.withColumn("__psum", F.sum(value_col).over(w_in))
        .withColumn("__pcnt", F.count(value_col).over(w_in))
        .withColumn("__pos", F.row_number().over(w_asc))
    )

    # previous-bucket tail, ranked from the end (rev=1 is the last row);
    # head row at pos p misses exactly the tail rows with rev <= k - p
    w_desc = Window.partitionBy("__bucket").orderBy(F.col(time_col).desc())
    tail = (
        b.withColumn("__rev", F.row_number().over(w_desc))
        .filter(F.col("__rev") <= k - 1)
        .select(
            F.col("__bucket").alias("__prev_bucket"),
            "__rev",
            F.col(value_col).alias("__tail_val"),
        )
    )
    buckets = b.select("__bucket").distinct()
    succ = buckets.withColumn(
        "__next_bucket", F.lead("__bucket").over(Window.orderBy("__bucket"))
    )
    tail = (
        tail.join(
            F.broadcast(succ),
            tail["__prev_bucket"] == succ["__bucket"],
            "inner",
        )
        .filter(F.col("__next_bucket").isNotNull())
        .select("__next_bucket", "__rev", "__tail_val")
    )

    head = part.filter(F.col("__pos") < k).select(
        F.col(time_col).alias("__ht"), F.col("__bucket").alias("__hb"), "__pos"
    )
    repair = (
        head.join(
            F.broadcast(tail),
            (head["__hb"] == tail["__next_bucket"])
            & (tail["__rev"] <= F.lit(k) - head["__pos"]),
            "inner",
        )
        .groupBy("__ht")
        .agg(
            F.sum("__tail_val").alias("__rsum"),
            F.count("__tail_val").alias("__rcnt"),
        )
    )
    out = part.join(repair, part[time_col] == repair["__ht"], "left").drop("__ht")
    total_cnt = F.col("__pcnt") + F.coalesce(F.col("__rcnt"), F.lit(0))
    total_sum = F.when(
        total_cnt > 0,
        F.coalesce(F.col("__psum"), F.lit(0)) + F.coalesce(F.col("__rsum"), F.lit(0)),
    )
    return (
        out.withColumn(out_sum, total_sum)
        .withColumn(out_cnt, total_cnt)
        .drop("__bucket", "__pos", "__psum", "__pcnt", "__rsum", "__rcnt")
    )


def partitioned_lead1_stitch(
    df: DataFrame,
    value_col: str,
    order_by: Sequence[str],
    bucket_expr: Column,
    out_col: str,
) -> DataFrame:
    """lead(value, 1) over a global (order_by) order WITHOUT the
    single-partition sort: lead inside coarse buckets, then repair each
    bucket's LAST row from the next bucket's FIRST value.

    PRECONDITION: ``bucket_expr`` must be monotone non-decreasing
    along ``order_by`` (e.g. ``date_trunc`` of the leading order
    column), so each bucket is one CONTIGUOUS run of the global order
    — the same contract as partitioned_lag_stitch's time buckets.

    Unlike partitioned_lag_stitch there is no minimum-bucket-size
    precondition: lead(1) only ever reaches one row forward, so the
    only rows a bucket boundary breaks are each bucket's last — and
    the repair value is exactly the successor bucket's head (1-row
    buckets chain correctly: the head IS the last row). The final
    bucket's last row keeps NULL, matching the global window's final
    row. Bucket/successor/head tables are all bounded by the bucket
    count — broadcast-sized at any corpus scale.

    The repair targets each bucket's last row BY POSITION (rk == n),
    never by NULL-ness of the in-bucket lead, so a nullable
    ``value_col`` is safe: an interior row whose true successor value
    is NULL keeps that NULL instead of being wrongly patched with the
    next bucket's head.
    """
    b = df.withColumn("__bucket", bucket_expr)
    w_in = Window.partitionBy("__bucket").orderBy(*order_by)
    b = b.withColumn("__rk", F.row_number().over(w_in)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy("__bucket"))
    )
    out = b.withColumn(out_col, F.lead(value_col).over(w_in))
    heads = b.filter(F.col("__rk") == 1).select(
        F.col("__bucket").alias("__hb"),
        F.col(value_col).alias("__head"),
    )
    w_b = Window.orderBy("__bucket")
    succ = (
        b.select("__bucket")
        .distinct()
        .withColumn("__next", F.lead("__bucket").over(w_b))
    )
    nxt = succ.join(heads, succ["__next"] == heads["__hb"]).select(
        "__bucket", F.col("__head").alias("__next_head")
    )
    out = out.join(F.broadcast(nxt), "__bucket", "left")
    return out.withColumn(
        out_col,
        F.when(F.col("__rk") == F.col("__n"), F.col("__next_head")).otherwise(
            F.col(out_col)
        ),
    ).drop("__bucket", "__next_head", "__rk", "__n")
