"""Regression metrics as distributed aggregations.

Reference semantics (reference src/modelling/evaluate.py:23-61, golden
tests test_model.py:66-120): MAE and RMSE plain; MAPE computed ONLY over
rows with |y_true| >= 10 with denominator |y_true|, and NULL/NaN when no
row qualifies. The reference computes these in numpy on a collected
frame; here they are one Spark aggregation — no collect, scales to any
row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAPE_MIN_ABS_Y = 10.0


def regression_metrics(
    df: DataFrame,
    y_col: str,
    yhat_col: str,
    group_by: list[str] | None = None,
) -> DataFrame:
    """MAE / RMSE / masked MAPE in a single pass."""
    y = F.col(y_col)
    err = F.col(yhat_col) - y
    qualifies = F.abs(y) >= F.lit(MAPE_MIN_ABS_Y)
    aggs = [
        F.avg(F.abs(err)).alias("mae"),
        F.sqrt(F.avg(err * err)).alias("rmse"),
        (
            F.lit(100.0)
            * F.sum(F.when(qualifies, F.abs(err) / F.abs(y)))
            / F.sum(F.when(qualifies, F.lit(1)))
        ).alias("mape_pct"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(qualifies, F.lit(1)).otherwise(F.lit(0))).alias("n_mape"),
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)
