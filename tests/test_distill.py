"""Classifier distillation (operators/distill.py): convergence,
held-out fidelity, determinism, and the model-sized-aggregate shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.catalog import load_table
from bigdatasmallprice_spark.operators.distill import (
    DISTILL_ITERS,
    P_EXPR,
    Z_TMPL,
    fit_quality_classifier,
    quality_features,
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
    # iteration 1 starts from w=0 => p=0.5 everywhere => every keep
    # contributes exactly 250000 micro-units; rejects contribute the
    # class-weighted quarter (same rounding both engines)
    assert losses[0] >= hist[0]["n"] * 250000


def test_heldout_discrimination(spark):
    """The class-weighted student must actually track the teacher's
    reject boundary on HELD-OUT docs: high negative-class recall (an
    always-keep model scores 0 here) while overall accuracy stays at
    or near the majority-class rate (the balanced-error tradeoff)."""
    feats = _feats(spark).persist()
    try:
        hist = fit_quality_classifier(feats)
        w = hist[-1]["w"]
        z = Z_TMPL.format(
            w0=repr(w[0]), w1=repr(w[1]), w2=repr(w[2]), w3=repr(w[3]),
            w4=repr(w[4]),
        )
        ev = (
            feats.filter("NOT train")
            .selectExpr("y", f"{z} AS z")
            .selectExpr("y", f"{P_EXPR} AS p")
        )
        row = ev.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when((F.col("p") >= 0.5) == (F.col("y") == 1.0), 1).otherwise(0)
            ).alias("correct"),
            F.sum(F.when(F.col("y") == 1.0, 1).otherwise(0)).alias("pos"),
            F.sum(
                F.when((F.col("y") == 0.0) & (F.col("p") < 0.5), 1).otherwise(0)
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
    # exact-integer gradient sums + driver-side float updates: the
    # trajectories must be BIT-equal run-to-run (no float-accumulation
    # order dependence)
    assert h1 == h2


def test_each_iteration_is_one_model_sized_row(spark):
    # the per-iteration aggregate returns exactly one 6-number row
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
