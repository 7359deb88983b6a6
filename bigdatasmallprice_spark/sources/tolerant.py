"""Tolerant ingestion: malformed-record routing (dead-letter pattern).

At 100 TB a single corrupt record must neither kill the job (FAILFAST)
nor vanish silently (DROPMALFORMED). The pattern here is Spark's
PERMISSIVE contract made explicit: parse what parses, and route every
record that doesn't — with its raw payload and a reason — to a
dead-letter frame the ops side can re-drive after a fix. The reference
gets the same safety from per-collector try/except + ops-log rows
(reference src/collectors, src/utils/logging_helpers.py); this is the
declarative Spark equivalent, one pass, no Python in the row path.

Both halves come from ONE parse of the input (a cached projection), so
good/bad routing never re-reads the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_json_with_dead_letters(
    raw: DataFrame,
    payload_col: str,
    schema: str,
    required: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Parse a string payload column against ``schema``; return
    (good, dead) where ``dead`` keeps the raw payload plus a reason.

    A record is dead when it is not valid JSON for the schema
    (``from_json`` yields NULL — whole-row corruption) or when any
    ``required`` field is missing/null after parse (partial records:
    PERMISSIVE from_json null-fills absent fields, which downstream
    NOT-NULL contracts must not see). ``good`` is the parsed struct
    exploded to columns; ``dead`` carries (payload, reason) and any
    passthrough columns — the re-drive input.
    """
    # PERMISSIVE from_json null-FILLS fields on corrupt input rather than
    # nulling the struct, so whole-row corruption is only detectable via
    # an explicit corrupt-record column appended to the schema
    parsed = raw.withColumn(
        "__p",
        F.from_json(
            F.col(payload_col),
            f"{schema}, __corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "__corrupt"},
        ),
    )
    required = required or []
    any_missing = F.lit(False)
    for f in required:
        any_missing = any_missing | F.col(f"__p.{f}").isNull()
    reason = (
        F.when(
            F.col("__p").isNull() | F.col("__p.__corrupt").isNotNull(),
            F.lit("malformed_json"),
        )
        .when(any_missing, F.lit("missing_required_field"))
        .otherwise(F.lit(None))
    )
    tagged = parsed.withColumn("__reason", reason)
    good = (
        tagged.filter(F.col("__reason").isNull())
        .select(*[c for c in raw.columns if c != payload_col], F.col("__p.*"))
        .drop("__corrupt")
    )
    dead = tagged.filter(F.col("__reason").isNotNull()).select(
        *[c for c in raw.columns], F.col("__reason").alias("reason")
    )
    return good, dead


def dead_letter_summary(dead: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Ops rollup of the dead-letter frame: one row per reason with a
    count and a deterministic sample payload (min — stable across
    partitionings) — the monitoring row an on-call reads first."""
    return dead.groupBy("reason").agg(
        F.count(F.lit(1)).cast("long").alias("n_records"),
        F.min(payload_col).alias("sample"),
    )
