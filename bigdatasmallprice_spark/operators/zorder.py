"""Z-order (Morton) data layout: multi-dimensional clustering for
min/max file skipping.

A 100 TB table is pruned by file/row-group min-max statistics, and the
WRITE layout decides how much a 2-D predicate can skip: a time-ordered
(append) layout gives tight ranges on time only, so a
``time AND value`` box still scans every file in the time slice. A
Z-order layout interleaves the bits of both dimensions into one sort
key, so every file covers a small axis-aligned box in (time, value)
space and BOTH predicates prune (the Delta/Iceberg ``OPTIMIZE ZORDER
BY`` design; Morton 1966).

The z-value is a pure integer expression (sum of shifted bit
extracts) — whole-stage codegen in Spark, identical arithmetic in
DuckDB, no UDF anywhere. The write path is
``repartitionByRange(n_files, zvalue)``: Spark's sampled range
partitioner assigns contiguous z-ranges to files, which is exactly
"sort by z, cut into files" at any scale, without a global sort on one
machine.

No reference counterpart (the reference stores rows in TimescaleDB
chunks, i.e. the time-linear layout this operator improves on for
multi-dimensional scans).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """Spark-SQL Morton interleave of two ``bits``-bit non-negative
    integer expressions: x occupies even bit positions, y odd."""
    terms = []
    for i in range(bits):
        terms.append(f"(shiftright({x}, {i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(shiftright({y}, {i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def o_zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """DuckDB fragment computing the same z-value bit-for-bit."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) >> {i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def zvalue_col(x: Column, y: Column, bits: int = 8) -> Column:
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftright(x.cast("long"), i) % 2 * F.lit(1 << (2 * i))
            + F.shiftright(y.cast("long"), i) % 2 * F.lit(1 << (2 * i + 1))
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    x: Column,
    y: Column,
    n_files: int,
    bits: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned on
    the z-value of (x, y) — each file covers a compact box in both
    dimensions, so its min/max footer stats prune 2-D predicates. The
    z column itself is dropped before writing (layout metadata, not
    data)."""
    zed = df.withColumn("__z", zvalue_col(x, y, bits))
    (
        zed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
