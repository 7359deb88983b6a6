"""Classifier distillation (operators/distill.py): convergence,
held-out fidelity, determinism, all-integer trajectory invariants, and
the model-sized-aggregate shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.catalog import load_table
from bigdatasmallprice_spark.operators.distill import (
    DISTILL_ITERS,
    SCALE,
    fit_quality_classifier,
    quality_features,
    rdiv_py,
    score_keep_expr,
)

SF = "/root/testdata/sf0.001"


def _feats(spark):
    return quality_features(load_table(spark, SF, "documents"))


def test_loss_decreases_and_history_shape(spark):
    feats = _feats(spark).persist()
    try:
        hist = fit_quality_classifier(feats)
    finally:
        feats.unpersist()
    assert len(hist) == DISTILL_ITERS
    losses = [h["loss_micro"] for h in hist]
    # class-weighted squared-error GD at this lr: the objective must
    # fall substantially from the w=0 start and end at its minimum
    assert losses[-1] == min(losses), losses
    assert losses[-1] < losses[0] * 0.7, losses
    # iteration 1 starts from w=0 => z=0 exactly => p_milli=500 on
    # every row => e=±500 => per-row loss term is exactly 250000
    # micro-units; the class-weighted fold is therefore closed-form
    h0 = hist[0]
    expected = h0["npos"] * 250000 + rdiv_py(
        h0["cwm"] * h0["nneg"] * 250000, SCALE
    )
    assert losses[0] == expected, (losses[0], expected)


def test_heldout_discrimination(spark):
    """The class-weighted student must actually track the teacher's
    reject boundary on HELD-OUT docs: high negative-class recall (an
    always-keep model scores 0 here) while overall accuracy stays at
    or near the majority-class rate (the balanced-error tradeoff)."""
    feats = _feats(spark).persist()
    try:
        hist = fit_quality_classifier(feats)
        keep = score_keep_expr(hist[-1]["w"])
        ev = feats.filter("NOT train").selectExpr(
            "ym", f"{keep} AS keep"
        )
        row = ev.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("keep") == (F.col("ym") == 1000), 1).otherwise(0)
            ).alias("correct"),
            F.sum(F.when(F.col("ym") == 1000, 1).otherwise(0)).alias("pos"),
            F.sum(
                F.when((F.col("ym") == 0) & (~F.col("keep")), 1).otherwise(0)
            ).alias("true_neg"),
        ).collect()[0]
    finally:
        feats.unpersist()
    n_neg = row["n"] - row["pos"]
    majority = max(row["pos"], n_neg)
    assert n_neg > 0
    # catches most teacher rejects (always-keep would score 0/n_neg)
    assert row["true_neg"] * 10 >= n_neg * 8, (row["true_neg"], n_neg)
    # and does not pay more than 3pp of raw accuracy for it
    assert row["correct"] * 100 >= (majority - 0.03 * row["n"]) * 100, (
        row["correct"],
        majority,
        row["n"],
    )


def test_fit_is_deterministic(spark):
    feats = _feats(spark).persist()
    try:
        h1 = fit_quality_classifier(feats)
        h2 = fit_quality_classifier(feats)
    finally:
        feats.unpersist()
    # exact-integer gradient sums + integer driver-side updates: the
    # trajectories must be BIT-equal run-to-run (no float-accumulation
    # order dependence — there are no floats at all)
    assert h1 == h2


def test_trajectory_is_all_integer(spark):
    """Every number the fit holds or emits is a Python int — the
    invariant that makes the trajectory engine-build-proof."""
    feats = _feats(spark).persist()
    try:
        hist = fit_quality_classifier(feats, iters=3)
    finally:
        feats.unpersist()
    for h in hist:
        assert all(type(wj) is int for wj in h["w"]), h
        assert type(h["loss_micro"]) is int
        assert type(h["cwm"]) is int
    # and the feature frame itself is all-BIGINT (plus the bool mask)
    types = dict(feats.dtypes)
    for c in ("x1m", "x2m", "x3m", "x4m", "ym"):
        assert types[c] == "bigint", types


def test_each_iteration_is_one_model_sized_row(spark):
    # the per-iteration aggregate returns exactly one 13-number row
    # regardless of corpus size: driver state stays model-sized
    feats = _feats(spark).persist()
    try:
        train = feats.filter("train")
        n_train = train.count()
        hist = fit_quality_classifier(feats, iters=2)
    finally:
        feats.unpersist()
    assert all(h["n"] == n_train for h in hist)
    assert all(len(h["w"]) == 5 for h in hist)
    assert all(h["npos"] + h["nneg"] == n_train for h in hist)
