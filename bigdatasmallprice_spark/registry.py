"""Query registry: every implemented operator as (spark builder, oracle SQL).

The driver's correctness gate runs each registered Spark query at sf0.01
and hash-compares against the DuckDB oracle SQL (row count + schema +
order-insensitive value hash, columns sorted by name). Registration rules
that keep the comparison deterministic across two independent engines:

- Aggregate only *integers* (counts, money-as-cents BIGINT) or min/max;
  floating-point summation order differs between engines, integer sums
  do not. Per-row double arithmetic is safe (identical IEEE ops).
- Derive averages as ``int_sum / int_count`` at the end (identical
  doubles), never engine-native AVG over doubles in multi-row groups.
- Emit timestamps as formatted strings to remove tz/representation
  ambiguity between Spark TimestampType and DuckDB TIMESTAMP.
- Cast every aggregate output explicitly (DuckDB SUM(BIGINT) is
  HUGEINT, which Arrow would surface as double).
- Any ORDER BY ... LIMIT must be totally ordered (tie-break on a key).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # import side-effect populates the registry
    from bigdatasmallprice_spark import queries as _  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {n: s.oracle for n, s in all_queries().items() if s.oracle is not None}
