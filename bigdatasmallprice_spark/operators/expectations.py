"""Data-contract expectations: declarative per-column checks evaluated
in ONE aggregation pass.

The reference enforces its contract piecemeal — UTC-aware time required
at ingest (base_collector.py:140-149), NOT NULL + unique indexes in DDL
(init.sql), freshness gates before export (export_pipeline.py:270-290).
This operator generalizes that into the form a 100 TB pipeline needs:
all rules collapse into a single ``agg`` over the table (map-side
combinable counters — one scan, no per-rule jobs), returning one row
per rule with its violation count, so a contract of 50 rules on a
petabyte table costs exactly one pass.

Rules: ``not_null(col)``, ``unique(cols)``, ``in_range(col, lo, hi)``,
``accepted_values(col, values)``, ``matches(col, regex)``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    violation: Column | None  # per-row boolean (True = violation); None => needs groupBy
    kind: str = "row"


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range({col},{lo},{hi})",
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi),
    )


def accepted_values(col: str, values) -> Rule:
    return Rule(
        f"accepted_values({col})",
        F.col(col).isNotNull() & ~F.col(col).isin(list(values)),
    )


def matches(col: str, regex: str) -> Rule:
    return Rule(
        f"matches({col})",
        F.col(col).isNotNull() & ~F.col(col).rlike(regex),
    )


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", None, kind="unique:" + ",".join(cols))


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule, violations, n_rows).

    Row rules share one aggregation pass. Each ``unique`` rule needs its
    own groupBy (a shuffle on its key — same cost as the dedup it
    guards); its violation count is rows-beyond-first per duplicate key,
    matching what an ON CONFLICT DO NOTHING sink would silently drop.
    """
    row_rules = [r for r in rules if r.violation is not None]
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.coalesce(F.sum(F.when(r.violation, 1)), F.lit(0)).cast("long").alias(f"__r{i}")
        for i, r in enumerate(row_rules)
    ]
    base = df.agg(*aggs)
    out = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r.name).alias("rule"),
                        F.col(f"__r{i}").alias("violations"),
                        F.col("__n").alias("n_rows"),
                    )
                    for i, r in enumerate(row_rules)
                ]
            )
        ).alias("c")
    ).select("c.rule", "c.violations", "c.n_rows")
    for r in rules:
        if r.violation is None:
            keys = r.kind.split(":", 1)[1].split(",")
            dup = (
                df.groupBy(*keys)
                .agg((F.count(F.lit(1)) - 1).alias("extra"))
                .agg(
                    F.coalesce(F.sum("extra"), F.lit(0)).cast("long").alias("violations"),
                    (F.coalesce(F.sum("extra"), F.lit(0)) + F.count(F.lit(1)))
                    .cast("long")
                    .alias("n_rows"),
                )
                .select(F.lit(r.name).alias("rule"), "violations", "n_rows")
            )
            out = out.unionByName(dup)
    return out
