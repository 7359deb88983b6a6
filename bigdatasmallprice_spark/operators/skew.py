"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting (on in session.py) handles sort-merge join
skew at runtime, but two cases still need explicit salting at 100 TB:

- **Aggregation skew**: one hot key (a viral document id, a null-ish
  default user) funnels a partition-sized row stream into a single
  reducer. ``salted_agg`` runs the aggregation twice: phase 1 groups by
  (key, salt) — the hot key fans out over ``n_salts`` reducers — and
  phase 2 merges the per-salt partials. Works for any algebraic
  aggregate (sum/count/min/max, and avg as sum+count).
- **Join skew against a non-broadcastable build side**:
  ``salted_join_left_hot`` explodes the right side ``n_salts``× and
  salts the left side randomly, turning one hot reducer into
  ``n_salts`` evenly loaded ones. Only worth it when the build side is
  too big to broadcast AND AQE's split is defeated (e.g. a single key
  beyond any split granularity) — the docstring is the decision rule.

The salt is ``pmod(hash(monotonically_increasing_id()), n)`` — sprayed,
not derived from the key — so hot-key rows really do spread. Phase-2
merge restores exact semantics; tests prove result equality with the
unsalted plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(n_salts: int) -> Column:
    return F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))


# phase-1 partial / phase-2 merge pairs for the algebraic aggregates
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts add up
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output column -> (agg_name, input_col) with agg_name
    in {sum, count, min, max}. Derived measures (avg = sum/count) are
    built by the caller from these primitives, which is also how partial
    aggregation stays exact.
    """
    phase1_cols = []
    for out, (how, col) in aggs.items():
        if how not in _MERGE:
            raise ValueError(f"non-algebraic aggregate {how!r}; decompose it first")
        fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[how]
        phase1_cols.append(fn(col).alias(out))
    p1 = df.withColumn("__salt", _salt(n_salts)).groupBy(*keys, "__salt").agg(*phase1_cols)
    merged = [_MERGE[how](out).alias(out) for out, (how, _) in aggs.items()]
    return p1.groupBy(*keys).agg(*merged)


def salted_join_left_hot(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left`` has skewed key frequencies and ``right``
    is too large to broadcast: left rows get a random salt, right rows
    are replicated across all salts, and the join key becomes
    (keys..., salt). Right-side cost is ``n_salts``× its size — use only
    when the hot key defeats broadcast and AQE."""
    lsalted = left.withColumn("__salt", _salt(n_salts))
    rexp = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = lsalted.join(rexp, [*on, "__salt"], how)
    return out.drop("__salt")
