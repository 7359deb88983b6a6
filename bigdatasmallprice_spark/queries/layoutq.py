"""Data-layout queries: Z-order clustering vs time-linear append, and
the min/max file-skipping arithmetic that decides scan cost at 100 TB.

``zorder_pruning`` simulates the exact pruning a parquet reader does
with footer statistics, entirely inside the query so the driver's hash
gate verifies every step: bucket both dimensions, assign rows to 64
"files" under (a) the append/time-linear layout and (b) the Z-order
layout (ntile over the layout sort key — the deterministic stand-in
for ``repartitionByRange``, see operators/zorder.py for the real write
path), collect per-file min/max, overlap them with a fixed 2-D
predicate box, and report how many files/rows each layout must scan.
The losslessness of pruning (every matching row lives in a scanned
file) is itself an output column, so the oracle hash-checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.zorder import o_zvalue_sql, zvalue_sql
from bigdatasmallprice_spark.queries.core import table
from bigdatasmallprice_spark.registry import register

# 3-hour time buckets from 2024-01-01 UTC (events span January 2024:
# 240 buckets) and 256-cent value buckets, both 8-bit; the predicate
# box is bucket-aligned so bucket-level pruning is conservative-exact.
_BASE_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in micros
_XB_US = 10_800_000_000  # 3 h
_N_FILES = 64
_XB_LO, _XB_HI = 64, 175  # days 8..22
_VB_LO, _VB_HI = 39, 58  # cents 10_000..15_103 (256-cent buckets)


@register(
    "zorder_pruning",
    f"""
WITH base AS (
  SELECT event_id,
         epoch_us(ts) AS us,
         greatest(least((epoch_us(ts) - {_BASE_US}) // {_XB_US}, 255), 0) AS xb,
         greatest(least(CAST(round(value * 100) AS BIGINT) // 256, 255), 0) AS vb
  FROM events
),
zed AS (
  SELECT event_id, us, xb, vb, {o_zvalue_sql('xb', 'vb')} AS z,
         CASE WHEN xb BETWEEN {_XB_LO} AND {_XB_HI}
               AND vb BETWEEN {_VB_LO} AND {_VB_HI} THEN 1 ELSE 0 END AS matched
  FROM base
),
layouts AS (
  SELECT 'time_linear' AS layout, us AS k, * FROM zed
  UNION ALL
  SELECT 'zorder' AS layout, z AS k, * FROM zed
),
files AS (
  SELECT layout, ntile({_N_FILES}) OVER (PARTITION BY layout ORDER BY k, event_id) AS f,
         xb, vb, matched
  FROM layouts
),
stats AS (
  SELECT layout, f,
         MIN(xb) AS min_xb, MAX(xb) AS max_xb,
         MIN(vb) AS min_vb, MAX(vb) AS max_vb,
         CAST(COUNT(*) AS BIGINT) AS rows_,
         CAST(SUM(matched) AS BIGINT) AS matched_
  FROM files GROUP BY 1, 2
),
flagged AS (
  SELECT *, CASE WHEN max_xb >= {_XB_LO} AND min_xb <= {_XB_HI}
                  AND max_vb >= {_VB_LO} AND min_vb <= {_VB_HI}
            THEN 1 ELSE 0 END AS scan
  FROM stats
)
SELECT layout,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(scan) AS BIGINT) AS files_scanned,
       CAST(SUM(rows_) AS BIGINT) AS rows_total,
       CAST(SUM(CASE WHEN scan = 1 THEN rows_ ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST(SUM(matched_) AS BIGINT) AS rows_matched,
       CAST(SUM(CASE WHEN scan = 1 THEN matched_ ELSE 0 END) AS BIGINT) AS matched_in_scanned,
       round(CAST(SUM(CASE WHEN scan = 1 THEN rows_ ELSE 0 END) AS DOUBLE)
             / SUM(rows_), 4) AS scan_fraction
FROM flagged GROUP BY 1
""",
    doc="Z-order vs time-linear layout under min/max file skipping "
    "(Morton 1966; the Delta/Iceberg OPTIMIZE ZORDER design): rows "
    "are ntile'd into 64 files by each layout's sort key, per-file "
    "min/max bucket stats are overlapped with a bucket-aligned 2-D "
    "predicate box (a week range x a narrow value band), and the "
    "scan cost of both layouts comes out as verified integers — "
    "including matched_in_scanned == rows_matched, the losslessness "
    "proof that bucket pruning never drops a matching row. The "
    "z-value is a pure bit-interleave expression (whole-stage "
    "codegen, no UDF); the production write path is "
    "repartitionByRange on the same expression "
    "(operators/zorder.py:zorder_write), which needs no global sort.",
    tags=("layout", "scan", "window"),
)
def zorder_pruning_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        F.expr("unix_micros(ts)").alias("us"),
        # clamped on BOTH ends: the Morton interleave's documented
        # domain is non-negative 8-bit (zorder.py) — an event before
        # _BASE_US or a negative value must saturate to bucket 0, not
        # feed a negative into shiftright/% (clamp-after-div is safe
        # cross-engine: DuckDB floor-div and Spark trunc-div disagree
        # only on negatives, which greatest(0) collapses anyway)
        F.expr(
            f"greatest(least((unix_micros(ts) - {_BASE_US}) div {_XB_US}, 255), 0)"
        ).alias("xb"),
        F.expr(
            "greatest(least(CAST(round(value * 100) AS BIGINT) div 256, 255), 0)"
        ).alias("vb"),
    )
    zed = base.withColumn("z", F.expr(zvalue_sql("xb", "vb"))).withColumn(
        "matched",
        F.when(
            F.col("xb").between(_XB_LO, _XB_HI)
            & F.col("vb").between(_VB_LO, _VB_HI),
            1,
        ).otherwise(0),
    )
    layouts = zed.select(
        F.lit("time_linear").alias("layout"), F.col("us").alias("k"), "*"
    ).unionByName(
        zed.select(F.lit("zorder").alias("layout"), F.col("z").alias("k"), "*")
    )
    w = Window.partitionBy("layout").orderBy("k", "event_id")
    files = layouts.select(
        "layout", F.ntile(_N_FILES).over(w).alias("f"), "xb", "vb", "matched"
    )
    stats = files.groupBy("layout", "f").agg(
        F.min("xb").alias("min_xb"),
        F.max("xb").alias("max_xb"),
        F.min("vb").alias("min_vb"),
        F.max("vb").alias("max_vb"),
        F.count(F.lit(1)).cast("long").alias("rows_"),
        F.sum("matched").cast("long").alias("matched_"),
    )
    flagged = stats.withColumn(
        "scan",
        F.when(
            (F.col("max_xb") >= _XB_LO)
            & (F.col("min_xb") <= _XB_HI)
            & (F.col("max_vb") >= _VB_LO)
            & (F.col("min_vb") <= _VB_HI),
            1,
        ).otherwise(0),
    )
    scanned_rows = F.sum(F.when(F.col("scan") == 1, F.col("rows_")).otherwise(0))
    return flagged.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("scan").cast("long").alias("files_scanned"),
        F.sum("rows_").cast("long").alias("rows_total"),
        scanned_rows.cast("long").alias("rows_scanned"),
        F.sum("matched_").cast("long").alias("rows_matched"),
        F.sum(F.when(F.col("scan") == 1, F.col("matched_")).otherwise(0))
        .cast("long")
        .alias("matched_in_scanned"),
        F.round(
            scanned_rows.cast("double") / F.sum("rows_"),
            4,
        ).alias("scan_fraction"),
    )
