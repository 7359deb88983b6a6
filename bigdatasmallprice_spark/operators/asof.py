"""Point-in-time (as-of) join.

The reference has no as-of join (its J4 grain-aligning join is an
equi-join on a truncated timestamp, init.sql:452-455), but a
training-data pipeline needs the real thing: "the most recent source
row at or before this probe row's timestamp, per key" — feature
freshness joins, slowly-changing lookups, last-known-price enrichment.

Implementation is the union-sentinel pattern, chosen for scale:

- tag source rows 0 and probe rows 1, union them by name,
- ONE window per key ordered by (ts, tag) carries the last non-null
  source payload forward (``last(..., ignorenulls=True)`` over an
  unbounded-preceding row frame),
- keep the probe rows.

Cost is a single hash shuffle on the key (identical to a groupBy) plus
a per-key sort — fully parallel across keys. The alternative, a range
join ``probe.ts >= source.ts``, has no equi-predicate on time, so Spark
plans a broadcast-nested-loop or cartesian product: O(|probe|·|source|)
per key. The union-sentinel is O((|probe|+|source|) log) per key and
never materializes candidate pairs.

Tie semantics match DuckDB's ``ASOF JOIN ... ON a.ts >= b.ts`` (used as
the test oracle): a source row at exactly the probe timestamp matches,
because tag 0 sorts before tag 1 within the same timestamp.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    probe: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    payload: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: each probe row gains the payload of the latest
    source row with the same keys and ``source.ts <= probe.ts`` (NULL
    payload when no such row exists).

    ``source`` must be pre-shaped to exactly ``keys + [ts_col] +
    payload``, with payload names not colliding with probe columns.
    """
    src = source.select(*keys, ts_col, *payload).withColumn("__tag", F.lit(0))
    pr = probe.withColumn("__tag", F.lit(1))
    unioned = pr.unionByName(src, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "__tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for col in payload:
        unioned = unioned.withColumn(col, F.last(col, ignorenulls=True).over(w))
    return unioned.filter(F.col("__tag") == 1).drop("__tag")
