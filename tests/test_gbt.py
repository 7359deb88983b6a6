"""Histogram gradient-boosted trees (operators/gbt.py, D5 completion).

Oracle parity for the registered ``train_gbt_model`` query is swept by
tests/test_oracle_parity.py like every registry entry; these tests pin
the semantics the oracle can't see: the boosted model actually BEATS
the linear baseline on nonlinear data (the reference's reason for
XGBoost over LinearRegression, BASELINE.md accuracy table), plus
determinism and degenerate-input behavior.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.gbt import (
    GbtModel,
    fit_gbt_cells,
    train_gbt,
)
from bigdatasmallprice_spark.operators.linreg import fit_linear_hour_dow


def _synthetic_nonlinear(spark, days=30):
    """One row per hour over `days` days; value is a STEP function of
    hour with a weekend interaction — linear in (hour, dow) cannot fit
    it, a depth-2 tree can. Deterministic small residual from a cheap
    integer mix so no two engines/fits can disagree."""
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i in range(days * 24):
        ts = t0 + dt.timedelta(hours=i)
        hour = ts.hour
        # Spark dayofweek: 1=Sunday..7=Saturday
        dow = (ts.weekday() + 1) % 7 + 1
        base = 100.0 if 8 <= hour < 18 else 20.0
        if dow in (1, 7):
            base *= 0.5
        noise = ((i * 7919) % 13 - 6) * 0.25
        rows.append((i, ts, base + noise))
    return spark.createDataFrame(rows, "event_id long, ts timestamp, value double")


def _val_mask(df, val_days=9):
    mx = df.agg(F.max(F.to_date("ts"))).collect()[0][0]
    train_end = mx - dt.timedelta(days=val_days)
    return F.to_date("ts") <= F.lit(train_end), train_end


def test_gbt_beats_linear_on_nonlinear(spark):
    df = _synthetic_nonlinear(spark)
    is_train, _ = _val_mask(df)

    out = train_gbt(df).collect()
    # best round by val MAE = the early-stopping pick
    gbt_val_mae = min(r["val_mae_c"] for r in out)

    # linear baseline trained on the same train split, scored on val
    train_df = df.filter(is_train).withColumn("k", F.lit("all"))
    coef = fit_linear_hour_dow(train_df, "k").collect()[0]
    val = df.filter(~is_train).select(
        F.hour("ts").alias("h"),
        F.dayofweek("ts").alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("yc"),
    )
    lin_val_mae = (
        val.select(
            F.abs(
                F.col("yc")
                - (
                    F.lit(coef["b0c"])
                    + F.lit(coef["b1c"]) * F.col("h")
                    + F.lit(coef["b2c"]) * F.col("d")
                )
            ).alias("ae")
        )
        .agg(F.avg("ae"))
        .collect()[0][0]
    )
    # the step function defeats the linear model; boosting halves its error
    assert gbt_val_mae < 0.5 * lin_val_mae, (gbt_val_mae, lin_val_mae)


def test_gbt_loss_history_improves(spark):
    df = _synthetic_nonlinear(spark)
    out = train_gbt(df).collect()
    by_round = {r["round"]: r for r in out}
    maes = [by_round[r]["train_mae_c"] for r in sorted(by_round)]
    # squared-error boosting on train data: monotone non-increasing
    assert all(a >= b for a, b in zip(maes, maes[1:])), maes
    # each round emits its tree: a root split and <=4 leaves
    for r in sorted(by_round):
        leaves = [row for row in out if row["round"] == r]
        assert 1 <= len(leaves) <= 4
        assert all(row["root_f"] in (0, 1) for row in leaves)


def test_gbt_deterministic(spark):
    df = _synthetic_nonlinear(spark, days=10)
    a = sorted(tuple(r) for r in train_gbt(df, val_days=3).collect())
    b = sorted(tuple(r) for r in train_gbt(df, val_days=3).collect())
    assert a == b


def test_gbt_degenerate_constant_features():
    # all rows in one (hour, dow) cell: no candidate splits anything
    with pytest.raises(ValueError, match="no valid candidate"):
        fit_gbt_cells({(3, 2): (100, 5000)})


def test_gbt_unsplit_child_collapses_to_left_leaf():
    # right side has a single distinct (hour, dow) cell -> child split
    # impossible there; its rows land on leaf side*2 (bit 0), and the
    # emitted child_f/child_t for that side must be absent (-1 in the
    # query output, None in the model)
    cells = {(h, 1): (10, 1000 * h) for h in range(4)}
    cells[(23, 1)] = (10, 90000)
    model: GbtModel = fit_gbt_cells(cells, n_rounds=1)
    rm = model.rounds[0]
    sides_with_child = set(rm.children)
    all_sides = {leaf // 2 for leaf in rm.leaf_values}
    for side in all_sides - sides_with_child:
        leaves = {l for l in rm.leaf_values if l // 2 == side}
        assert leaves == {side * 2}


def test_gbt_base_is_floor_of_train_mean():
    model = fit_gbt_cells({(0, 1): (3, 10), (1, 1): (3, 11)})
    assert model.base == 3  # floor(21/6)


def test_gbt_registry_roundtrip_and_scoring(spark, tmp_path):
    """save_gbt_model -> find-latest -> score_latest: predictions equal
    the fit's own per-cell cumulative predictions (the scoring column
    expression mirrors _leaf_of exactly) and need no key column."""
    from bigdatasmallprice_spark import modelstore
    from bigdatasmallprice_spark.operators.gbt import fit_gbt

    df = _synthetic_nonlinear(spark, days=12)
    model, _ = fit_gbt(df, val_days=3)
    d = str(tmp_path / "models")
    modelstore.save_gbt_model(d, "model_epex", model, version="20260214T000000")
    modelstore.save_gbt_model(d, "model_epex", model, version="20260215T000000")
    assert modelstore.find_latest(d, "model_epex").endswith("_v20260215T000000.json")

    scored = modelstore.score_latest(spark, d, "model_epex", df, key="unused")
    rows = scored.select(
        F.hour("ts").alias("h"), F.dayofweek("ts").alias("d"), "prediction", "model_version"
    ).collect()
    assert all(r["model_version"] == "20260215T000000" for r in rows)
    for r in rows:
        want = model.cell_preds[(r["h"], r["d"])][-1] / 100.0
        assert r["prediction"] == round(want, 6), (r, want)


def test_forecast_serves_gbt_price_model(spark, tmp_path):
    """forecast() end-to-end with the boosted model as Model B — the
    reference's actual serving configuration (XGB for EPEX price)."""
    from bigdatasmallprice_spark import modelstore
    from bigdatasmallprice_spark.operators.gbt import fit_gbt
    from bigdatasmallprice_spark.serving import forecast

    feats = _synthetic_nonlinear(spark, days=12).withColumnRenamed("ts", "time")
    feats.createOrReplaceTempView("training_features")
    model, _ = fit_gbt(
        feats.withColumnRenamed("time", "ts"), val_days=3
    )
    d = str(tmp_path / "models")
    modelstore.save_gbt_model(d, "model_epex", model, version="20260214T000000")
    out = forecast(spark, d, load_view="does_not_exist")
    assert out["net_load_available"] is False
    assert out["price_level"] in {"low", "medium", "high"}
    # predicted price equals the tree's prediction for the newest row's cell
    newest = feats.orderBy(F.col("time").desc()).limit(1).collect()[0]["time"]
    cell = ((newest.hour), (newest.weekday() + 1) % 7 + 1)
    assert out["predicted_price_eur_mwh"] == round(
        round(model.cell_preds[cell][-1] / 100.0, 6), 2
    )


# ---------------------------------------------------------------------------
# generalized histogram GBT (train_gbt_full)
# ---------------------------------------------------------------------------


def test_gbt_full_beats_linear_val_mae(spark):
    """The VERDICT r3 gate: the general boosted model's best-round
    (early-stopping) val MAE must beat a least-squares linear fit on
    the SAME featurized hourly frame — the reference's XGB-beats-linear
    ordering (BASELINE.md accuracy table) reproduced engine-side."""
    import math

    import numpy as np

    from bigdatasmallprice_spark.operators.gbt import (
        featurize_hourly_series,
        train_gbt_full,
    )
    from bigdatasmallprice_spark.queries.core import events

    ev = events(spark, "/root/testdata/sf0.01")
    feat = featurize_hourly_series(ev).toPandas()
    tr, va = feat[feat.is_train], feat[~feat.is_train]

    def lin_val_mae(cols):
        X = np.stack([np.ones(len(tr))] + [tr[c] for c in cols], 1).astype(float)
        beta, *_ = np.linalg.lstsq(X, tr.y.astype(float), rcond=None)
        Xv = np.stack([np.ones(len(va))] + [va[c] for c in cols], 1).astype(float)
        return math.floor(np.abs(va.y - Xv @ beta).mean())

    out = train_gbt_full(ev, n_rounds=10, depth=3, lr=0.2).toPandas()
    best_val = out.groupby("round").val_mae_c.first().min()
    # beat linear on the calendar pair AND on all five features
    assert best_val < lin_val_mae(["x0", "x1"]), best_val
    assert best_val < lin_val_mae(["x0", "x1", "x2", "x3", "x4"]), best_val


def test_gbt_full_leaf_partition_is_exact(spark):
    """Per round: leaf counts must partition the train split and the
    leaf residual means must reproduce leaf_value_c (floor(lr*s/n))."""
    from bigdatasmallprice_spark.operators.gbt import train_gbt_full
    from bigdatasmallprice_spark.queries.core import events

    ev = events(spark, "/root/testdata/sf0.001")
    out = train_gbt_full(ev, n_rounds=3, depth=3, lr=0.2).toPandas()
    n_train = None
    for _, g in out.groupby("round"):
        total = g.n_leaf.sum()
        if n_train is None:
            n_train = total
        assert total == n_train  # every train row in exactly one leaf
        assert g.leaf.is_unique


def test_gbt_full_deterministic(spark):
    from bigdatasmallprice_spark.operators.gbt import train_gbt_full
    from bigdatasmallprice_spark.queries.core import events

    ev = events(spark, "/root/testdata/sf0.001")
    a = sorted(map(tuple, train_gbt_full(ev, n_rounds=2, depth=3).collect()))
    b = sorted(map(tuple, train_gbt_full(ev, n_rounds=2, depth=3).collect()))
    assert a == b


def test_gbt_full_exact_rank_thresholds_match_sorted_ranks(spark):
    """Thresholds must equal the values at ranks 1+(j*n)//B of the
    sorted train column — checked against a literal Python sort."""
    from bigdatasmallprice_spark.operators.gbt import (
        _exact_rank_thresholds,
        featurize_hourly_series,
    )
    from bigdatasmallprice_spark.queries.core import events

    ev = events(spark, "/root/testdata/sf0.001")
    tr = featurize_hourly_series(ev).filter("is_train")
    B = 16
    got = _exact_rank_thresholds(tr, [2, 3], [F.col(f"x{i}") for i in range(4)], B)
    pdf = tr.select("x2", "x3").toPandas()
    n = len(pdf)
    for f, col in ((2, "x2"), (3, "x3")):
        vs = sorted(pdf[col])
        want = sorted({vs[(1 + (j * n) // B) - 1] for j in range(1, B)})
        assert got[f] == [int(v) for v in want], (f, got[f], want)


def test_gbt_full_beats_linear_on_flagship_view(spark):
    """The reference's headline model trains on the full
    training_features view (export_pipeline.py FEATURE_COLS), not the
    toy series — so reproduce the XGB-beats-linear ordering THERE: the
    boosted model's best-round val MAE must beat least squares on the
    SAME 16 leak-safe flagship features (lags, trailing rolls,
    calendar, lagged exogenous, signup forecast)."""
    import math

    import numpy as np

    from bigdatasmallprice_spark.operators.gbt import (
        FLAGSHIP_GBT_FEATURES,
        featurize_flagship_view,
        train_gbt_on_features,
    )
    from bigdatasmallprice_spark.registry import all_queries

    tf = all_queries()["training_features"].fn(spark, "/root/testdata/sf0.01")
    feat, fixed = featurize_flagship_view(tf)
    m = len(FLAGSHIP_GBT_FEATURES)
    pdf = feat.toPandas()
    tr, va = pdf[pdf.is_train], pdf[~pdf.is_train]
    assert len(tr) > 200 and len(va) > 80  # split is real on both sides

    X = np.stack([np.ones(len(tr))] + [tr[f"x{i}"] for i in range(m)], 1).astype(float)
    beta, *_ = np.linalg.lstsq(X, tr.y.astype(float), rcond=None)
    Xv = np.stack([np.ones(len(va))] + [va[f"x{i}"] for i in range(m)], 1).astype(float)
    lin_val = math.floor(np.abs(va.y - Xv @ beta).mean())

    out = train_gbt_on_features(
        feat, m, n_rounds=10, depth=3, lr=0.2, n_bins=16, fixed_thresholds=fixed
    ).toPandas()
    best_val = out.groupby("round").val_mae_c.first().min()
    assert best_val < lin_val, (best_val, lin_val)


def test_gbt_full_paths_identical(spark, monkeypatch):
    """The collected fast path and the distributed per-level histogram
    path must produce byte-identical output (same splits, leaf values,
    MAE history) — the fast path is an optimization, not a semantic."""
    from bigdatasmallprice_spark.operators import gbt
    from bigdatasmallprice_spark.queries.core import events

    ev = events(spark, "/root/testdata/sf0.001")
    local = sorted(map(tuple, gbt.train_gbt_full(ev, n_rounds=3, depth=3).collect()))
    monkeypatch.setattr(gbt, "GBT_FULL_COLLECT_MAX", 0)
    dist = sorted(map(tuple, gbt.train_gbt_full(ev, n_rounds=3, depth=3).collect()))
    assert local == dist


def test_gbt_full_artifact_round_trip_and_serving(spark, tmp_path):
    """Train -> artifact -> registry -> serve must reproduce the fit's
    own numbers: the artifact round-trips losslessly, score_latest
    resolves the newest gbt_full artifact, and the served literal
    column's val MAE at the stored best_round equals the val_mae_c the
    fit recorded for that round (train/serve bit-parity)."""
    import math

    from bigdatasmallprice_spark import modelstore
    from bigdatasmallprice_spark.operators.gbt import (
        artifact_to_full_model,
        featurize_hourly_series,
        fit_gbt_on_features,
        full_model_to_artifact,
        predict_full_cents_column,
    )
    from bigdatasmallprice_spark.queries.core import events

    ev = events(spark, "/root/testdata/sf0.001")
    feat = (
        featurize_hourly_series(ev)
        .select("y", "x0", "x1", "x2", "x3", "x4", "is_train")
        .coalesce(1)
    )
    model, mae = fit_gbt_on_features(
        feat, 5, n_rounds=4, depth=3, lr=0.2,
        fixed_thresholds={0: list(range(1, 24)), 1: list(range(2, 8))},
    )
    doc = full_model_to_artifact(model, mae)
    rt = artifact_to_full_model(doc)
    assert rt.base == model.base and rt.depth == model.depth
    assert [t.splits for t in rt.trees] == [t.splits for t in model.trees]
    assert [t.leaf_values for t in rt.trees] == [t.leaf_values for t in model.trees]
    best = doc["best_round"]
    assert best == min(range(1, 5), key=lambda r: (mae[("val", r)], r))

    modelstore.save_gbt_full_model(str(tmp_path), "gbt_full_test", model, mae)
    scored = modelstore.score_latest(
        spark, str(tmp_path), "gbt_full_test", feat, key="unused",
        feature_cols=["x0", "x1", "x2", "x3", "x4"],
    )
    rows = scored.filter(~F.col("is_train")).select("y", "prediction").collect()
    served_val_mae = math.floor(
        sum(abs(r["y"] - int(round(r["prediction"] * 100))) for r in rows) / len(rows)
    )
    assert served_val_mae == mae[("val", best)]

    # NULL feature -> NULL prediction
    from pyspark.sql import functions as SF
    one = feat.limit(1).withColumn("x2", SF.lit(None).cast("long"))
    p = one.select(
        predict_full_cents_column(doc, [SF.col(f"x{i}") for i in range(5)]).alias("p")
    ).collect()[0]["p"]
    assert p is None


def test_gbt_full_approx_bins_close_to_exact(spark):
    """The approx-quantile binning path (the 100 TB production
    variant) must train end-to-end and land within a few percent of
    the exact-rank fit's best val MAE on the same frame — the sketch
    moves thresholds by at most the rank error, not the model shape."""
    from bigdatasmallprice_spark.operators.gbt import (
        featurize_hourly_series,
        fit_gbt_on_features,
    )
    from bigdatasmallprice_spark.queries.core import events

    ev = events(spark, "/root/testdata/sf0.01")
    feat = (
        featurize_hourly_series(ev)
        .select("y", "x0", "x1", "x2", "x3", "x4", "is_train")
        .coalesce(1)
    )
    fixed = {0: list(range(1, 24)), 1: list(range(2, 8))}
    _, mae_exact = fit_gbt_on_features(
        feat, 5, n_rounds=6, depth=3, lr=0.2, fixed_thresholds=fixed
    )
    _, mae_approx = fit_gbt_on_features(
        feat, 5, n_rounds=6, depth=3, lr=0.2, fixed_thresholds=fixed,
        approx_bins=True,
    )
    best_exact = min(v for (s, r), v in mae_exact.items() if s == "val")
    best_approx = min(v for (s, r), v in mae_approx.items() if s == "val")
    assert best_approx <= best_exact * 1.05, (best_approx, best_exact)


# ---------------------------------------------------------------------------
# Model A twin: net-load GBT at reference shape (depth 7, early stopping)
# ---------------------------------------------------------------------------


def _load_feat_sf001(spark):
    from bigdatasmallprice_spark.operators.gbt import featurize_net_load_series
    from bigdatasmallprice_spark.queries.core import events

    ev = events(spark, "/root/testdata/sf0.01")
    return featurize_net_load_series(ev, val_days=7, test_days=4)


def test_gbt_load_beats_linear_val_mae(spark):
    """The reference's XGB-beats-linear ordering on the SECOND model
    surface (Model A, train.py:168-246): the boosted net-load model's
    best-round val MAE must beat least squares on the same 9 features.
    (On this synthetic series the train-mean naive predictor beats
    both — the hourly net target is noise-dominated at sf0.01 — but
    the reference's ordering claim is XGB < linear, which holds.)"""
    import math

    import numpy as np

    from bigdatasmallprice_spark.operators.gbt import (
        LOAD_GBT_FIXED,
        LOAD_GBT_N_FEATURES,
        fit_gbt_on_features,
    )

    feat = _load_feat_sf001(spark)
    m = LOAD_GBT_N_FEATURES
    pdf = feat.toPandas()
    tr, va = pdf[pdf.split == "train"], pdf[pdf.split == "val"]
    assert len(tr) > 150 and len(va) > 80  # the 3-way split is real

    X = np.stack([np.ones(len(tr))] + [tr[f"x{i}"] for i in range(m)], 1).astype(float)
    beta, *_ = np.linalg.lstsq(X, tr.y.astype(float), rcond=None)
    Xv = np.stack([np.ones(len(va))] + [va[f"x{i}"] for i in range(m)], 1).astype(float)
    lin_val = math.floor(np.abs(va.y - Xv @ beta).mean())

    _, mae = fit_gbt_on_features(
        feat, m, n_rounds=15, depth=7, lr=0.05,
        fixed_thresholds=LOAD_GBT_FIXED, patience=3,
    )
    best_val = min(v for (s, _), v in mae.items() if s == "val")
    assert best_val < lin_val, (best_val, lin_val)


def test_gbt_load_reference_capacity_early_stops(spark):
    """The reference Model-A config — up to 300 rounds, early stopping
    20 (train.py:145-157) — must run end-to-end and stop itself: the
    executed round count is exactly best_round + 20, far below the
    cap, and every round after best_round never improves val MAE."""
    from bigdatasmallprice_spark.operators.gbt import (
        LOAD_GBT_FIXED,
        LOAD_GBT_N_FEATURES,
        fit_gbt_on_features,
    )

    feat = _load_feat_sf001(spark)
    model, mae = fit_gbt_on_features(
        feat, LOAD_GBT_N_FEATURES, n_rounds=300, depth=7, lr=0.05,
        fixed_thresholds=LOAD_GBT_FIXED, patience=20,
    )
    executed = len(model.trees)
    vals = {r: v for (s, r), v in mae.items() if s == "val"}
    best_r = min(sorted(vals), key=lambda r: (vals[r], r))
    assert executed < 300, executed
    assert executed == best_r + 20, (executed, best_r)
    assert all(vals[r] >= vals[best_r] for r in vals if r > best_r)


def test_gbt_load_depth7_histograms_model_sized(spark, monkeypatch):
    """The scale claim behind depth 7: every per-level histogram
    groupBy collects <= 2^level * features * (bins + 1) rows — model-
    sized, never corpus-sized — so deeper trees widen the groupBy, not
    the corpus-side scan. Forces the distributed path and checks the
    recorded per-level sizes against the bound."""
    from bigdatasmallprice_spark.operators import gbt

    feat = _load_feat_sf001(spark)
    monkeypatch.setattr(gbt, "GBT_FULL_COLLECT_MAX", 0)
    stats: dict = {}
    model, _ = gbt.fit_gbt_on_features(
        feat, gbt.LOAD_GBT_N_FEATURES, n_rounds=3, depth=7, lr=0.05,
        fixed_thresholds=gbt.LOAD_GBT_FIXED, patience=None, stats=stats,
    )
    assert model.depth == 7 and len(model.trees) == 3
    sizes = stats["hist_rows_by_level"]
    assert len(sizes) == 3 * 7
    m, bins = gbt.LOAD_GBT_N_FEATURES, 16
    for _r, lvl, n_rows in sizes:
        assert n_rows <= (1 << lvl) * m * (bins + 1), (lvl, n_rows)
    assert stats["hist_rows_max"] <= (1 << 7) * m * (bins + 1)


def test_gbt_load_paths_identical(spark, monkeypatch):
    """Collected fast path vs distributed per-level path at depth 7
    with early stopping: byte-identical output (same trees, same
    executed-round count, same 3-way MAE history)."""
    from bigdatasmallprice_spark.operators import gbt
    from bigdatasmallprice_spark.queries.core import events

    ev = events(spark, "/root/testdata/sf0.001")
    kw = dict(n_rounds=6, depth=7, lr=0.05, val_days=7, test_days=4, patience=3)
    local = sorted(map(tuple, gbt.train_gbt_load(ev, **kw).collect()))
    monkeypatch.setattr(gbt, "GBT_FULL_COLLECT_MAX", 0)
    dist = sorted(map(tuple, gbt.train_gbt_load(ev, **kw).collect()))
    assert local == dist


def test_distributed_fit_releases_all_cached_state(spark, monkeypatch):
    """Back-to-back DISTRIBUTED fits must leave zero new persistent
    RDDs: DataFrame.unpersist() on a frame derived from the persisted
    one is a silent no-op, so the fit releases its binned frame and
    every round's localCheckpoint RDD by RDD id instead (and spares
    caches that existed before the fit)."""
    from bigdatasmallprice_spark.caching import persistent_rdd_ids
    from bigdatasmallprice_spark.operators import gbt
    from bigdatasmallprice_spark.queries.core import events

    ev = events(spark, "/root/testdata/sf0.001")
    pre = ev.limit(50).persist()
    pre.count()  # materialize a pre-existing cache the fit must spare
    try:
        base = persistent_rdd_ids(spark)
        assert base  # the sentinel cache is registered
        monkeypatch.setattr(gbt, "GBT_FULL_COLLECT_MAX", 0)  # force distributed
        for _ in range(2):
            gbt.train_gbt_full(ev, n_rounds=3, depth=2).collect()
            assert persistent_rdd_ids(spark) == base
    finally:
        pre.unpersist()


def test_gbt_full_failed_fit_releases_caches(spark, monkeypatch):
    """A fit that dies mid-rounds (executor failure, cancellation, bad
    input discovered late) must release its persisted binned frame and
    any checkpoint RDDs — the try/finally, not just the success path."""
    from bigdatasmallprice_spark.caching import persistent_rdd_ids
    from bigdatasmallprice_spark.operators import gbt
    from bigdatasmallprice_spark.operators.gbt import (
        featurize_hourly_series,
        fit_gbt_full,
    )
    from bigdatasmallprice_spark.queries.core import events

    feat = featurize_hourly_series(events(spark, "/root/testdata/sf0.001"))
    thresholds = gbt._exact_rank_thresholds(
        feat.filter("is_train"), [2, 3], [F.col(f"x{i}") for i in range(4)], 8
    )
    thresholds.setdefault(0, [12])
    thresholds.setdefault(1, [4])

    boom = RuntimeError("mid-fit failure")

    def exploding(*a, **k):
        raise boom

    monkeypatch.setattr(gbt, "_best_general_split", exploding)
    before = persistent_rdd_ids(spark)
    with pytest.raises(RuntimeError):
        fit_gbt_full(feat, 4, thresholds, n_rounds=3, depth=2, lr=0.2)
    assert persistent_rdd_ids(spark) - before == set()


def _structured_net_load_feat(spark, days=120):
    """A deterministic hourly net-load series with the reference's
    PROBLEM SHAPE at fit-frame scale: two different nonmonotone hour
    profiles (weekday double-peak, weekend midday hump) over a noise
    floor — the hour x weekend interaction a linear model cannot
    express and a depth-7 tree can. Returns the 9-feature fit frame
    (y, x0..x8, split, is_train) directly: featurization itself is
    covered by the driver-green train_gbt_load query; this frame
    exists to exercise the FIT at reference capacity. Everything is
    integer and index-derived (LCG pseudo-noise), so the fit is
    bit-reproducible."""
    import math

    hs_wd = [
        int(8000 * math.exp(-((h - 8) ** 2) / 10))
        + int(15000 * math.exp(-((h - 19) ** 2) / 8))
        for h in range(24)
    ]
    hs_we = [int(11000 * math.exp(-((h - 13) ** 2) / 18)) for h in range(24)]
    n = days * 24
    v = []
    for i in range(n):
        h, d = i % 24, i // 24
        we = 1 if d % 7 >= 5 else 0
        noise = ((i * 1103515245 + 12345) % 2001) - 1000  # +-10_00 cents
        v.append(50000 + (hs_we[h] if we else hs_wd[h]) + noise)
    rows = []
    for i in range(168, n):
        h, d = i % 24, i // 24
        we = 1 if d % 7 >= 5 else 0
        day_from_end = (n - 1 - i) // 24
        split = (
            "test"
            if day_from_end < 14
            else ("val" if day_from_end < 28 else "train")
        )
        rows.append(
            (
                v[i], h, d % 7 + 1, 1 + (d // 30) % 12,
                1 + ((d // 30) % 12) // 3, we,
                v[i - 1], v[i - 24], v[i - 168], sum(v[i - 24 : i]), split,
            )
        )
    cols = (
        "y long, x0 long, x1 long, x2 long, x3 long, x4 long, "
        "x5 long, x6 long, x7 long, x8 long, split string"
    )
    return spark.createDataFrame(rows, cols).withColumn(
        "is_train", F.col("split") == "train"
    )


def test_gbt_load_reference_capacity_margin_and_convergence(spark):
    """The fit at the FULL reference Model-A config (n_estimators=300,
    early_stopping_rounds=20, max_depth=7, lr=0.05 — reference
    train.py:144-157) on a structured series: convergence must be deep
    (best round past 50 — a 15-round demo cannot reach it), early
    stopping must cut the 300-round cap, the train-MAE history must
    collapse by an order of magnitude, the boosted model must beat
    least squares ON THE SAME 9 FEATURES by the reference's margin on
    BOTH held-out splits (reference: XGB 217 vs linear 299 kWh test
    MAE, ~27% better — models/metrics_load_20260321.json), and every
    executed round's tree must stay inside the per-level node bound
    that keeps the distributed histogram model-sized (<= 2^lvl nodes
    -> <= 2^lvl * m * (bins+1) histogram rows at every one of the
    ~1100 (round, level) aggregates; the 3-round distributed-stats
    test measures that mapping, this asserts it across ALL capacity
    rounds). Measured here (recorded in BASELINE.md): executed 158 of
    300, best round 138, fit wall ~17s local-path.
    """
    import math

    import numpy as np

    from bigdatasmallprice_spark.operators.gbt import (
        LOAD_GBT_FIXED,
        LOAD_GBT_N_FEATURES,
        fit_gbt_on_features,
    )

    feat = _structured_net_load_feat(spark)
    m = LOAD_GBT_N_FEATURES
    model, mae = fit_gbt_on_features(
        feat, m, n_rounds=300, depth=7, lr=0.05,
        fixed_thresholds=LOAD_GBT_FIXED, patience=20,
    )
    executed = len(model.trees)
    vals = {r: v for (s, r), v in mae.items() if s == "val"}
    tsts = {r: v for (s, r), v in mae.items() if s == "test"}
    trns = {r: v for (s, r), v in mae.items() if s == "train"}
    best = min(sorted(vals), key=lambda r: (vals[r], r))

    # capacity actually exercised: deep convergence + a real early stop
    assert executed < 300 and executed == best + 20, (executed, best)
    assert best >= 50, best
    assert trns[1] > 10 * trns[best], (trns[1], trns[best])

    # reference-margin claim on the SAME features, val AND test
    pdf = feat.toPandas()
    tr = pdf[pdf.split == "train"]
    X = np.stack(
        [np.ones(len(tr))] + [tr[f"x{i}"] for i in range(m)], 1
    ).astype(float)
    beta, *_ = np.linalg.lstsq(X, tr.y.astype(float), rcond=None)
    lin = {}
    for name in ("val", "test"):
        d = pdf[pdf.split == name]
        Xd = np.stack(
            [np.ones(len(d))] + [d[f"x{i}"] for i in range(m)], 1
        ).astype(float)
        lin[name] = math.floor(np.abs(d.y - Xd @ beta).mean())
    assert vals[best] <= 0.80 * lin["val"], (vals[best], lin["val"])
    assert tsts[best] <= 0.85 * lin["test"], (tsts[best], lin["test"])

    # the distributed histogram keyspace bound holds for EVERY executed
    # round: nodes split at level lvl never exceed 2^lvl
    for tree in model.trees:
        for lvl, lvl_splits in enumerate(tree.splits):
            assert len(lvl_splits) <= (1 << lvl), (lvl, len(lvl_splits))
            assert all(0 <= nd < (1 << lvl) for nd in lvl_splits), lvl_splits
