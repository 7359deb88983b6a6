"""Engine-side gradient-boosted regression trees (D5 completion).

Reference semantics: src/modelling/train.py:124-165 trains the headline
XGBRegressor (squared-error boosting, shrinkage, depth-limited trees,
validation-split early-stopping via evaluate.py) and logs a per-round
loss history (train.py:312-318). The reference trains driver-side on a
collected pandas frame; here the same *algorithm family* — histogram
gradient boosting — is re-derived for Spark's execution model:

- Features are the calendar ints the reference's feature views expose
  (hour 0-23, Postgres-style dow 1-7), the target is exact integer
  cents. The ENTIRE per-round fit state is the joint (hour, dow)
  histogram: n and Σy per cell, ≤ 24*7 = 168 cells of exact BIGINTs.
  One groupBy shuffle with map-side partials produces it — that is the
  only corpus-wide pass the fit needs, because a tree over (hour, dow)
  predicts per cell, so residual sums per cell update in closed form
  (rs = s - n*pred). This is the classic histogram-GBT factorization
  (LightGBM/XGBoost 'hist'): at 100 TB the scan is embarrassingly
  parallel and the fit itself touches 168 rows.
- Split search, performed on the collected histogram (model-sized, like
  kmeans' centroid frame), maximizes the exact variance-reduction
  surrogate  sL²/nL + sR²/nR  over all (feature, threshold) candidates
  with deterministic (gain DESC, feature, threshold) tie-breaking.
- All counts/sums are exact int64 (order-independent); doubles appear
  only in the gain and leaf-value formulas, which are written as the
  SAME IEEE-754 expression tree here and in the DuckDB oracle
  (queries/mlq.py::_o_gbt_sql), so both engines pick identical splits
  and identical integer leaf values:
      gain = (float(sL)*float(sL))/float(nL)
           + (float(sR)*float(sR))/float(nR)
      leaf = floor((lr * float(S_res)) / float(N))
- Early stopping mirrors the reference's reporting shape: rounds are
  fixed (unrollable in SQL), the per-round train/val MAE history is
  emitted, and the best round is the val-MAE argmin — the reference's
  early_stopping_rounds picks the same round when improvement stops.
- The train/val split is the reference's rolling split (anchored at
  max(date), operators/splits.py::rolling_split_bounds): train =
  date <= max_date - val_days.
"""

from __future__ import annotations

import datetime as dt
import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# feature ids and candidate threshold ranges ("x < t" splits)
_CANDS: list[tuple[int, range]] = [
    (0, range(1, 24)),  # hour in 0..23
    (1, range(2, 8)),  # dow in 1..7 (Spark dayofweek: 1=Sunday)
]
HOUR_RANGE = range(0, 24)
DOW_RANGE = range(1, 8)


@dataclass(frozen=True)
class Split:
    feature: int  # 0 = hour, 1 = dow
    threshold: int  # goes left iff x[feature] < threshold


@dataclass
class RoundModel:
    root: Split
    children: dict[int, Split]  # side (0=left,1=right) -> split; may be absent
    leaf_values: dict[int, int]  # leaf id (side*2 + bit) -> value (cents)
    leaf_counts: dict[int, int]


@dataclass
class GbtModel:
    base: int  # train-mean prediction, floor'd to integer cents
    rounds: list[RoundModel]
    # per-cell cumulative predictions: (hour, dow) -> [pred_r1, ..., pred_rR]
    cell_preds: dict[tuple[int, int], list[int]]


def _fval(cell: tuple[int, int], feature: int) -> int:
    return cell[0] if feature == 0 else cell[1]


def _best_split(
    cells: dict[tuple[int, int], tuple[int, int]],
) -> Split | None:
    """Argmax variance-reduction split over (feature, threshold) candidates.

    ``cells`` maps (hour, dow) -> (n, residual_sum), all exact ints.
    Returns None when no candidate puts >=1 row on each side. The float
    arithmetic mirrors the DuckDB oracle's expression tree exactly:
    each exact int is cast to double first, then multiplied/divided in
    the same order, so argmax (with gain DESC, f, t tie-break) agrees.
    """
    best: tuple[float, int, int] | None = None  # (-gain, f, t)
    for f, ts in _CANDS:
        for t in ts:
            n_l = s_l = n_t = s_t = 0
            for cell, (n, rs) in cells.items():
                n_t += n
                s_t += rs
                if _fval(cell, f) < t:
                    n_l += n
                    s_l += rs
            n_r = n_t - n_l
            if n_l <= 0 or n_r <= 0:
                continue
            s_r = s_t - s_l
            gain = (float(s_l) * float(s_l)) / float(n_l) + (
                float(s_r) * float(s_r)
            ) / float(n_r)
            key = (-gain, f, t)
            if best is None or key < best:
                best = key
    return None if best is None else Split(feature=best[1], threshold=best[2])


def _leaf_of(cell: tuple[int, int], root: Split, children: dict[int, Split]) -> int:
    side = 0 if _fval(cell, root.feature) < root.threshold else 1
    child = children.get(side)
    if child is None:
        bit = 0
    else:
        bit = 0 if _fval(cell, child.feature) < child.threshold else 1
    return side * 2 + bit


def fit_gbt_cells(
    train_cells: dict[tuple[int, int], tuple[int, int]],
    n_rounds: int = 3,
    lr: float = 0.5,
) -> GbtModel:
    """Fit depth-2 boosted trees on the exact-int (hour, dow) histogram.

    ``train_cells`` maps (hour, dow) -> (n, sum_y_cents). Predictions
    are maintained for EVERY (hour, dow) combination so validation rows
    falling in train-empty cells still score (leaf value defaults to 0
    for train-empty leaves, COALESCE'd identically in the oracle).
    """
    n_tot = sum(n for n, _ in train_cells.values())
    s_tot = sum(s for _, s in train_cells.values())
    if n_tot <= 0:
        raise ValueError("gbt fit needs a non-empty training split")
    base = math.floor(float(s_tot) / float(n_tot))

    all_cells = [(h, d) for h in HOUR_RANGE for d in DOW_RANGE]
    pred: dict[tuple[int, int], int] = {c: base for c in all_cells}
    cell_preds: dict[tuple[int, int], list[int]] = {c: [] for c in all_cells}
    rounds: list[RoundModel] = []

    for _ in range(n_rounds):
        res = {
            c: (n, s - n * pred[c]) for c, (n, s) in train_cells.items() if n > 0
        }
        root = _best_split(res)
        if root is None:
            raise ValueError(
                "gbt root split found no valid candidate: training data is "
                "constant in both hour and dow (degenerate input)"
            )
        sides: dict[int, dict[tuple[int, int], tuple[int, int]]] = {0: {}, 1: {}}
        for c, nv in res.items():
            sides[0 if _fval(c, root.feature) < root.threshold else 1][c] = nv
        children = {
            side: sp
            for side, cells in sides.items()
            if cells and (sp := _best_split(cells)) is not None
        }
        leaf_n: dict[int, int] = {}
        leaf_s: dict[int, int] = {}
        for c, (n, rs) in res.items():
            leaf = _leaf_of(c, root, children)
            leaf_n[leaf] = leaf_n.get(leaf, 0) + n
            leaf_s[leaf] = leaf_s.get(leaf, 0) + rs
        leaf_values = {
            leaf: math.floor((lr * float(leaf_s[leaf])) / float(n))
            for leaf, n in leaf_n.items()
        }
        for c in all_cells:
            leaf = _leaf_of(c, root, children)
            pred[c] += leaf_values.get(leaf, 0)
            cell_preds[c].append(pred[c])
        rounds.append(
            RoundModel(
                root=root,
                children=children,
                leaf_values=leaf_values,
                leaf_counts=leaf_n,
            )
        )
    return GbtModel(base=base, rounds=rounds, cell_preds=cell_preds)


def _featurized(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    y = F.round(F.col(value_col) * 100, 0).cast("long")
    return df.select(
        F.hour(F.col(ts_col)).cast("long").alias("h"),
        F.dayofweek(F.col(ts_col)).cast("long").alias("d"),
        y.alias("y"),
        F.col("is_train"),
    )


def fit_gbt(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    n_rounds: int = 3,
    lr: float = 0.5,
    val_days: int = 9,
) -> tuple[GbtModel, DataFrame]:
    """Histogram pass + driver-side fit; returns (model, featurized
    frame with is_train) so callers can score/evaluate without
    re-deriving the split."""
    mx = df.agg(F.max(F.to_date(F.col(ts_col)))).collect()[0][0]
    if mx is None:
        raise ValueError("gbt fit needs a non-empty training split")
    train_end = mx - dt.timedelta(days=val_days)
    feat = _featurized(
        df.withColumn(
            "is_train", F.to_date(F.col(ts_col)) <= F.lit(train_end)
        ),
        ts_col,
        value_col,
    )
    hist = (
        feat.groupBy("h", "d", "is_train")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("s"))
        .collect()
    )
    train_cells: dict[tuple[int, int], tuple[int, int]] = {}
    for r in hist:
        if r["is_train"]:
            train_cells[(r["h"], r["d"])] = (r["n"], r["s"])
    return fit_gbt_cells(train_cells, n_rounds=n_rounds, lr=lr), feat


def model_to_artifact(model: GbtModel) -> dict:
    """JSON-serializable tree document for the model registry
    (modelstore.save_gbt_model). Cell predictions are derivable from
    the trees, so only base + rounds persist."""
    return {
        "base": model.base,
        "rounds": [
            {
                "root": [rm.root.feature, rm.root.threshold],
                "children": {
                    str(side): [sp.feature, sp.threshold]
                    for side, sp in rm.children.items()
                },
                "leaves": {str(leaf): v for leaf, v in rm.leaf_values.items()},
            }
            for rm in model.rounds
        ],
    }


def predict_cents_column(artifact: dict, ts_col: str) -> Column:
    """Scoring as ONE literal column expression (pure codegen: the tree
    is constants, no join, no UDF, nothing shuffled — the cheapest
    possible serving path at any scale). Mirrors _leaf_of exactly."""
    h = F.hour(F.col(ts_col)).cast("long")
    d = F.dayofweek(F.col(ts_col)).cast("long")

    def fv(f: int):
        return h if f == 0 else d

    pred = F.lit(int(artifact["base"]))
    for rm in artifact["rounds"]:
        rf, rt = rm["root"]
        side_left = fv(rf) < F.lit(rt)
        val = F.lit(0)
        for side in (0, 1):
            child = rm["children"].get(str(side))
            if child is None:
                bit_left = F.lit(True)
            else:
                bit_left = fv(child[0]) < F.lit(child[1])
            on_side = side_left if side == 0 else ~side_left
            for bit in (0, 1):
                leaf = rm["leaves"].get(str(side * 2 + bit))
                if leaf is None:
                    continue
                on_bit = bit_left if bit == 0 else ~bit_left
                val = F.when(on_side & on_bit, F.lit(int(leaf))).otherwise(val)
        pred = pred + val
    # NULL timestamp -> NULL prediction (matching the linear path, where
    # hour(NULL) propagates); without this every F.when condition is
    # NULL-false and a corrupt row silently scores as the base value
    return F.when(F.col(ts_col).isNotNull(), pred)


# ---------------------------------------------------------------------------
# generalized histogram GBT: binned continuous features, arbitrary depth
# ---------------------------------------------------------------------------
#
# The depth-2 (hour, dow) model above collects the JOINT feature
# histogram, which only works while the joint space is tiny (168 cells).
# The general model below is the real histogram-GBT factorization
# (LightGBM / XGBoost 'hist', reference src/modelling/train.py:124-165):
# per-NODE per-FEATURE bin histograms, one small groupBy per tree LEVEL,
# split search on the collected model-sized histogram. Costs per round =
# depth histogram passes over the persisted featurized frame — each an
# embarrassingly-parallel scan plus a <= nodes*features*bins-group
# shuffle — so the same code runs at 100 TB with the scan as the only
# corpus-sized work. Continuous features are quantile-binned with EXACT
# rank thresholds (t_j = min value whose cumulative train count reaches
# 1 + (j*n)//B) so the DuckDB oracle derives bit-identical candidates;
# a production deployment would swap approx_percentile in and drop the
# oracle-parity constraint.


@dataclass(frozen=True)
class GSplit:
    feature: int
    threshold: int  # goes left iff x[feature] < threshold (exact ints)


@dataclass
class GTree:
    splits: list[dict[int, GSplit]]  # splits[level][node] (missing = unsplit)
    leaf_values: dict[int, int]  # leaf id at level `depth` -> value (cents)
    leaf_counts: dict[int, int]


@dataclass
class GbtFullModel:
    base: int
    depth: int
    trees: list[GTree]


def _node_col(tree_splits: list[dict[int, GSplit]], upto_level: int, xcols) -> "Column":
    """Node id at ``upto_level`` as a literal column (pure codegen).

    Semantics: node_0 = 0; node_{l+1} = node_l * 2 + bit, bit = 1 right
    of that node's split (always 0 when the node is unsplit). Built by
    ENUMERATING each node's path conjunction rather than nesting the
    node expression level-by-level: the recursive form duplicates the
    whole level-l expression inside every level-(l+1) when-condition,
    which is exponential in depth and OOMs analysis at depth 7; the
    path-conjunction form is O(depth * 2^depth) simple comparisons —
    ~900 terms at depth 7, comfortably codegen-able. The mapping is
    bit-identical to the recursive definition (asserted by
    tests/test_gbt.py::test_gbt_full_paths_identical and the
    depth-7 twin)."""
    expr = F.lit(0)
    for node in range(1, 1 << upto_level):
        cond = None
        reachable = True
        for lvl in range(upto_level):
            anc = node >> (upto_level - lvl)
            bit = (node >> (upto_level - lvl - 1)) & 1
            sp = tree_splits[lvl].get(anc)
            if sp is None:
                if bit == 1:
                    reachable = False  # unsplit nodes send every row left
                    break
                continue  # bit 0 under an unsplit node: vacuously true
            c = (
                (xcols[sp.feature] >= F.lit(sp.threshold))
                if bit
                else (xcols[sp.feature] < F.lit(sp.threshold))
            )
            cond = c if cond is None else (cond & c)
        if not reachable or cond is None:
            continue
        expr = F.when(cond, F.lit(node)).otherwise(expr)
    return expr


def _exact_rank_thresholds(
    tr: DataFrame, cont_features: list[int], xcols, n_bins: int
) -> dict[int, list[int]]:
    """B-1 exact order-statistic thresholds per continuous feature over
    the TRAIN rows: t_j = min v with cum_count(v) >= 1 + (j*n)//B.
    Computed distributively (value-histogram + per-feature cumulative
    window + broadcast rank join); only the <= features*(B-1) result
    rows reach the driver. Deterministic in values (ties in the sort
    cannot change the value at a rank)."""
    from pyspark.sql import Window

    n = tr.count()
    stacked = tr.select(
        F.posexplode(F.array(*[xcols[f] for f in cont_features])).alias("fi", "v")
    )
    dist = stacked.groupBy("fi", "v").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("fi").orderBy("v")
    cum = dist.withColumn("cum", F.sum("c").over(w))
    ranks = [(j, 1 + (j * n) // n_bins) for j in range(1, n_bins)]
    rdf = tr.sparkSession.createDataFrame(ranks, "j long, r long")
    thr = (
        cum.join(F.broadcast(rdf), cum["cum"] >= rdf["r"])
        .groupBy("fi", "j")
        .agg(F.min("v").alias("t"))
        .select("fi", "t")
        .distinct()
        .collect()
    )
    out: dict[int, list[int]] = {f: [] for f in cont_features}
    for row in thr:
        out[cont_features[row["fi"]]].append(int(row["t"]))
    return {f: sorted(set(ts)) for f, ts in out.items()}


def _approx_quantile_thresholds(
    tr: DataFrame, cont_features: list[int], n_bins: int, rel_err: float = 0.001
) -> dict[int, list[int]]:
    """Approximate-quantile thresholds (Greenwald–Khanna via Spark's
    approxQuantile) — the production binning path at 100 TB, where the
    exact variant's per-feature value histogram + rank window is an
    avoidable full-cardinality pass. One sketch pass over the train
    frame covers all features; the thresholds land within ``rel_err``
    rank error of the exact ones. NOT oracle-replayable (the sketch is
    engine-specific), so the registered parity queries keep exact
    binning and this path is differential-tested against it
    (tests/test_gbt.py::test_gbt_full_approx_bins_close_to_exact)."""
    probs = [j / n_bins for j in range(1, n_bins)]
    cols = [f"x{f}" for f in cont_features]
    qs = tr.approxQuantile(cols, probs, rel_err)
    return {
        f: sorted({int(v) for v in vals})
        for f, vals in zip(cont_features, qs)
    }


def _best_general_split(
    bins: dict[tuple[int, int], tuple[int, int]], thresholds: dict[int, list[int]]
) -> GSplit | None:
    """Argmax variance-reduction split for ONE node from its per-
    (feature, bin) histogram. ``bins`` maps (feature, bin) -> (n, rs);
    bin(x) = #{thresholds <= x}, so candidate 'x < t_j' puts bins
    0..j-1 on the left. Gain/tie-break arithmetic is the same IEEE
    expression tree as the oracle (gain DESC, feature, threshold)."""
    best: tuple[float, int, int] | None = None
    for f, ts in thresholds.items():
        k = len(ts)
        pref = [(0, 0)] * (k + 2)
        n_t = s_t = 0
        acc_n = acc_s = 0
        by_bin = {b: (n, s) for (ff, b), (n, s) in bins.items() if ff == f}
        for b in range(0, k + 1):
            n_b, s_b = by_bin.get(b, (0, 0))
            acc_n += n_b
            acc_s += s_b
            pref[b + 1] = (acc_n, acc_s)
        n_t, s_t = acc_n, acc_s
        for j in range(1, k + 1):
            n_l, s_l = pref[j]
            n_r = n_t - n_l
            if n_l <= 0 or n_r <= 0:
                continue
            s_r = s_t - s_l
            gain = (float(s_l) * float(s_l)) / float(n_l) + (
                float(s_r) * float(s_r)
            ) / float(n_r)
            key = (-gain, f, ts[j - 1])
            if best is None or key < best:
                best = key
    return None if best is None else GSplit(feature=best[1], threshold=best[2])


def fit_gbt_full(
    feat: DataFrame,
    n_features: int,
    thresholds: dict[int, list[int]],
    n_rounds: int,
    depth: int,
    lr: float,
    patience: int | None = None,
    stats: dict | None = None,
) -> tuple[GbtFullModel, dict]:
    """Fit boosted depth-``depth`` trees on a featurized frame with
    columns x0..x{m-1} (exact BIGINT), y (exact cents), and is_train —
    or a 3-way ``split`` column ('train'/'val'/'test', the reference's
    rolling load split, export_pipeline.py run_load_export) from which
    is_train is derived.

    Distributed work per round: ``depth`` histogram passes, each ONE
    groupBy(node, feature, bin) with map-side partials over the
    persisted frame (<= 2^depth * m * B groups — model-sized); split
    search and leaf values run driver-side on the collected histogram;
    one more model-sized aggregate per round folds |y - pred| into the
    per-split MAE history. Returns (model, mae) with mae keyed
    (split_name, round) in floor'd integer cents.

    ``patience`` is the reference's early_stopping_rounds
    (train.py:124-165): training stops after the first round r with
    r - argmin(val MAE over 1..r) >= patience (earliest argmin on
    ties, matching the strict-improvement update), and the model
    carries only the executed rounds. ``stats`` (optional dict)
    records 'hist_rows_max' / 'hist_rows_by_level' — the test hook
    proving the per-level groupBy stays model-sized at depth 7."""
    from bigdatasmallprice_spark.caching import persistent_rdd_ids

    xcols = [F.col(f"x{i}") for i in range(n_features)]
    bin_cols = []
    for f in range(n_features):
        b = F.lit(0)
        for t in thresholds[f]:
            b = b + F.when(xcols[f] >= F.lit(t), 1).otherwise(0)
        bin_cols.append(b.alias(f"__b{f}"))
    if "split" not in feat.columns:
        feat = feat.withColumn(
            "split", F.when(F.col("is_train"), "train").otherwise("val")
        )
    if "is_train" not in feat.columns:
        feat = feat.withColumn("is_train", F.col("split") == "train")
    # snapshot BEFORE the persist: everything this fit caches (the
    # binned frame + one localCheckpoint RDD per round) is released in
    # the finally below by RDD id. Calling .unpersist() on the derived
    # frames would be a silent no-op — Spark only uncaches a plan that
    # sameResult-matches the exact persisted DataFrame, and checkpoint
    # RDDs are not plan-cached at all.
    spark = feat.sparkSession
    rdds_before = persistent_rdd_ids(spark)
    try:
        return _fit_gbt_full_rounds(
            spark, feat, bin_cols, xcols, n_features, thresholds,
            n_rounds, depth, lr, patience, stats
        )
    finally:
        # release the binned frame and every round's checkpoint RDD by
        # id (bounded within one fit: R model-sized hourly frames) so
        # back-to-back fits — INCLUDING failed ones (executor loss,
        # cancellation) — never accumulate executor state
        from bigdatasmallprice_spark.caching import _unpersist_added

        _unpersist_added(spark, rdds_before)


def _fit_gbt_full_rounds(
    spark, feat, bin_cols, xcols, n_features, thresholds, n_rounds, depth,
    lr, patience, stats
):
    """The round loop of ``fit_gbt_full`` — separated so the caller's
    try/finally releases every cached/checkpointed RDD even when a
    round fails mid-fit."""
    cur = feat.select("*", *bin_cols).persist()

    agg = cur.filter("is_train").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    ).collect()[0]
    if not agg["n"]:
        raise ValueError("gbt_full fit needs a non-empty training split")
    base = math.floor(float(agg["s"]) / float(agg["n"]))

    trees: list[GTree] = []
    mae: dict = {}
    best_val: int | None = None
    best_round = 0
    pred = F.lit(base)
    for r in range(1, n_rounds + 1):
        cur = cur.withColumn("__rs", F.col("y") - pred)
        splits: list[dict[int, GSplit]] = []
        last_hist: dict[tuple[int, int, int], tuple[int, int]] = {}
        for lvl in range(depth):
            nd = _node_col(splits, lvl, xcols)
            hist_rows = (
                cur.filter("is_train")
                .select(
                    nd.alias("nd"),
                    F.col("__rs"),
                    F.posexplode(
                        F.array(*[F.col(f"__b{f}") for f in range(n_features)])
                    ).alias("f", "b"),
                )
                .groupBy("nd", "f", "b")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("__rs").cast("long").alias("s"),
                )
                .collect()
            )
            if stats is not None:
                stats.setdefault("hist_rows_by_level", []).append(
                    (r, lvl, len(hist_rows))
                )
                stats["hist_rows_max"] = max(
                    stats.get("hist_rows_max", 0), len(hist_rows)
                )
            last_hist = {
                (row["nd"], row["f"], row["b"]): (row["n"], row["s"])
                for row in hist_rows
            }
            lvl_splits: dict[int, GSplit] = {}
            for node in sorted({k[0] for k in last_hist}):
                node_bins = {
                    (f, b): v
                    for (nd_, f, b), v in last_hist.items()
                    if nd_ == node
                }
                sp = _best_general_split(node_bins, thresholds)
                if sp is not None:
                    lvl_splits[node] = sp
            splits.append(lvl_splits)

        # leaf stats from the LAST level's histogram + its chosen splits
        leaf_n: dict[int, int] = {}
        leaf_s: dict[int, int] = {}
        for (node, f, b), (n, s) in last_hist.items():
            sp = splits[depth - 1].get(node)
            # the per-feature histograms count every row once PER
            # feature; take only the split feature's rows (feature 0's
            # for unsplit nodes) so each row contributes once
            if f != (sp.feature if sp is not None else 0):
                continue
            bit = 0 if sp is None or b < _bin_of_threshold(thresholds, sp) else 1
            leaf = node * 2 + bit
            leaf_n[leaf] = leaf_n.get(leaf, 0) + n
            leaf_s[leaf] = leaf_s.get(leaf, 0) + s
        leaf_values = {
            leaf: math.floor((lr * float(leaf_s[leaf])) / float(n))
            for leaf, n in leaf_n.items()
        }
        tree = GTree(splits=splits, leaf_values=leaf_values, leaf_counts=leaf_n)
        trees.append(tree)

        # materialize the leaf id ONCE, then map leaf -> value off the
        # tiny __leaf column: chaining the whens directly on the node
        # cascade duplicates the ~900-term path expression once PER
        # LEAF (~115k expression nodes at depth 7), and every
        # downstream action re-analyzes/codegens it (the arithmetic is
        # unchanged; the local-path identity tests pin the values)
        cur = cur.withColumn("__leaf", _node_col(splits, depth, xcols))
        val = F.lit(0)
        for lf, v in leaf_values.items():
            val = F.when(F.col("__leaf") == F.lit(lf), F.lit(v)).otherwise(val)
        pred = pred + val
        cur = cur.withColumn("__p", pred)
        # sever lineage EVERY round, and BEFORE the MAE aggregate:
        # leaving the when-cascades stacked makes each downstream job
        # re-analyze and re-codegen a projection that grows with the
        # leaf map (measured: the whole fit is analysis/codegen-bound,
        # not data-bound — the __leaf materialization above plus
        # aggregating off the checkpointed frame took a depth-7
        # distributed round from ~21s to ~6s; the residual is the 7
        # per-level histogram jobs plus the one cascade evaluation the
        # checkpoint itself must run). The early-stop decision needs
        # this round's val MAE, so the checkpoint runs unconditionally
        # for r < n_rounds — a stop wastes exactly one final
        # checkpoint of the model-sized hourly frame.
        if r < n_rounds:
            cur = cur.localCheckpoint(eager=True)
            pred = F.col("__p")
        # fold this round's |y - pred| into the MAE history: one
        # model-sized aggregate per round (map-side partials, <=3
        # groups) over the materialized frame
        err = (
            cur.groupBy("split")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.abs(F.col("y") - F.col("__p"))).alias("sa"),
            )
            .collect()
        )
        for row in err:
            mae[(row["split"], r)] = math.floor(
                float(row["sa"]) / float(row["cnt"])
            )
        v = mae.get(("val", r))
        if v is not None and (best_val is None or v < best_val):
            best_val, best_round = v, r
        if (
            patience is not None
            and v is not None
            and r - best_round >= patience
        ):
            break

    return GbtFullModel(base=base, depth=depth, trees=trees), mae


def _bin_of_threshold(thresholds: dict[int, list[int]], sp: GSplit) -> int:
    """bin(x) < j  <=>  x < t_j: the left side of split (f, t_j) is
    exactly bins 0..j-1 of feature f."""
    return thresholds[sp.feature].index(sp.threshold) + 1


GBT_FULL_CONT_FEATURES = [2, 3, 4]  # x2=lag1c, x3=lag24c, x4=roll24c

# fit frames up to this many rows take the collected fast path (the
# reference trains driver-side on a pandas frame, train.py:124-165);
# larger frames use the distributed per-level histogram passes. Both
# paths share the split-search/leaf arithmetic and are test-asserted
# identical (tests/test_gbt.py::test_gbt_full_paths_identical).
GBT_FULL_COLLECT_MAX = 200_000


def _fit_gbt_full_local(
    rows: list,
    n_features: int,
    thresholds: dict[int, list[int]],
    n_rounds: int,
    depth: int,
    lr: float,
    patience: int | None = None,
) -> tuple[GbtFullModel, dict]:
    """Driver-side twin of ``fit_gbt_full`` over collected feature rows:
    identical binning, split search (shared _best_general_split), leaf
    arithmetic, MAE floors, and early-stopping rule — one distributed
    pass total (the collect), the rest pure Python on the model-sized
    frame."""
    fields = rows[0].__fields__ if rows else []
    xs = [[int(r[f"x{i}"]) for i in range(n_features)] for r in rows]
    ys = [int(r["y"]) for r in rows]
    if "split" in fields:
        labels = [r["split"] for r in rows]
    else:
        labels = ["train" if r["is_train"] else "val" for r in rows]
    trains = [s == "train" for s in labels]
    bins = [
        [sum(1 for t in thresholds[f] if x[f] >= t) for f in range(n_features)]
        for x in xs
    ]
    n_tr = sum(trains)
    if not n_tr:
        raise ValueError("gbt_full fit needs a non-empty training split")
    base = math.floor(float(sum(y for y, t in zip(ys, trains) if t)) / float(n_tr))

    preds = [base] * len(rows)
    trees: list[GTree] = []
    mae: dict = {}
    best_val: int | None = None
    best_round = 0
    for r in range(1, n_rounds + 1):
        rs = [y - p for y, p in zip(ys, preds)]
        nodes = [0] * len(rows)
        splits: list[dict[int, GSplit]] = []
        for lvl in range(depth):
            hist: dict[tuple[int, int, int], list[int]] = {}
            for i in range(len(rows)):
                if not trains[i]:
                    continue
                for f in range(n_features):
                    k = (nodes[i], f, bins[i][f])
                    e = hist.setdefault(k, [0, 0])
                    e[0] += 1
                    e[1] += rs[i]
            lvl_splits: dict[int, GSplit] = {}
            for node in sorted({k[0] for k in hist}):
                node_bins = {
                    (f, b): (n, s)
                    for (nd, f, b), (n, s) in hist.items()
                    if nd == node
                }
                sp = _best_general_split(node_bins, thresholds)
                if sp is not None:
                    lvl_splits[node] = sp
            splits.append(lvl_splits)
            for i in range(len(rows)):
                sp = lvl_splits.get(nodes[i])
                bit = 1 if sp is not None and xs[i][sp.feature] >= sp.threshold else 0
                nodes[i] = nodes[i] * 2 + bit
        leaf_n: dict[int, int] = {}
        leaf_s: dict[int, int] = {}
        for i in range(len(rows)):
            if not trains[i]:
                continue
            leaf_n[nodes[i]] = leaf_n.get(nodes[i], 0) + 1
            leaf_s[nodes[i]] = leaf_s.get(nodes[i], 0) + rs[i]
        leaf_values = {
            leaf: math.floor((lr * float(leaf_s[leaf])) / float(n))
            for leaf, n in leaf_n.items()
        }
        trees.append(GTree(splits=splits, leaf_values=leaf_values, leaf_counts=leaf_n))
        for i in range(len(rows)):
            preds[i] += leaf_values.get(nodes[i], 0)
        for split_name in sorted(set(labels)):
            sel = [
                abs(y - p)
                for y, p, s in zip(ys, preds, labels)
                if s == split_name
            ]
            if sel:
                mae[(split_name, r)] = math.floor(
                    float(sum(sel)) / float(len(sel))
                )
        v = mae.get(("val", r))
        if v is not None and (best_val is None or v < best_val):
            best_val, best_round = v, r
        if patience is not None and v is not None and r - best_round >= patience:
            break
    return GbtFullModel(base=base, depth=depth, trees=trees), mae


def featurize_hourly_series(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    event_type: str = "purchase",
    val_days: int = 9,
) -> DataFrame:
    """The flagship feature view's shape as EXACT integers: the hourly
    '{event_type}' cents series with its lag-1h / lag-24h values and the
    trailing-24h rolling SUM (24 PRECEDING..1 PRECEDING — no target
    leakage, P6), plus the calendar pair. Sums instead of means keep
    every feature int64 so the whole fit replays in the oracle. The
    global-order window runs over the post-aggregation hourly frame
    (bounded by the covered hours, not corpus rows; see
    plans/feature_views.py scale notes / partitioned_lag_stitch)."""
    from pyspark.sql import Window

    hp = (
        df.filter(F.col("event_type") == event_type)
        .groupBy(F.date_trunc("hour", F.col(ts_col)).alias("h"))
        .agg(F.sum(F.round(F.col(value_col) * 100, 0).cast("long")).alias("pc"))
    )
    w = Window.orderBy("h")
    f0 = hp.select(
        "h",
        F.col("pc").alias("y"),
        F.hour("h").cast("long").alias("x0"),
        F.dayofweek("h").cast("long").alias("x1"),
        F.lag("pc", 1).over(w).alias("x2"),
        F.lag("pc", 24).over(w).alias("x3"),
        F.sum("pc").over(w.rowsBetween(-24, -1)).alias("x4"),
    )
    f1 = f0.filter(
        F.col("x2").isNotNull() & F.col("x3").isNotNull() & F.col("x4").isNotNull()
    )
    mx = f1.agg(F.max(F.to_date("h"))).collect()[0][0]  # scalar extent read
    if mx is None:
        raise ValueError("gbt_full featurization produced no rows")
    train_end = mx - dt.timedelta(days=val_days)
    return f1.withColumn("is_train", F.to_date("h") <= F.lit(train_end))


def train_gbt_full(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    n_rounds: int = 10,
    depth: int = 3,
    lr: float = 0.5,
    val_days: int = 9,
    n_bins: int = 16,
) -> DataFrame:
    """General histogram-GBT training over the hourly feature view:
    ``n_rounds`` depth-``depth`` trees on (hour, dow, lag1c, lag24c,
    roll24c), continuous features quantile-binned into ``n_bins``
    buckets, squared-error boosting with shrinkage ``lr``, rolling
    train/val split anchored at max(date) (operators/splits.py
    semantics), per-round integer train/val MAE history — the val-MAE
    argmin is the early-stopping round (reference train.py:312-318).

    Output: one row per (round, non-empty leaf), all BIGINT: round,
    leaf, the (feature, threshold) pair at each path level (l{i}_f /
    l{i}_t, -1 where the node is unsplit), n_leaf, leaf_value_c,
    train_mae_c, val_mae_c.
    """
    # the fit frame here is the HOURLY rollup — bounded by the covered
    # time extent, not corpus rows (the corpus-sized work is the one
    # groupBy inside featurize). One partition turns each distributed
    # histogram job into a single task over ~720 rows. For a
    # corpus-sized feature frame (per-entity features), drop the
    # coalesce: every histogram pass is embarrassingly parallel.
    feat = (
        featurize_hourly_series(
            df, ts_col=ts_col, value_col=value_col, val_days=val_days
        )
        .select("y", "x0", "x1", "x2", "x3", "x4", "is_train")
        .coalesce(1)
    )
    return train_gbt_on_features(
        feat,
        n_features=5,
        n_rounds=n_rounds,
        depth=depth,
        lr=lr,
        n_bins=n_bins,
        fixed_thresholds={0: list(range(1, 24)), 1: list(range(2, 8))},
    )


def fit_gbt_on_features(
    feat: DataFrame,
    n_features: int,
    n_rounds: int = 10,
    depth: int = 3,
    lr: float = 0.5,
    n_bins: int = 16,
    fixed_thresholds: dict[int, list[int]] | None = None,
    approx_bins: bool = False,
    patience: int | None = None,
    stats: dict | None = None,
) -> tuple[GbtFullModel, dict]:
    """Fit the histogram GBT over ANY featurized frame with columns y
    (exact cents BIGINT), x0..x{m-1} (exact BIGINT features), is_train,
    returning (model, mae history {(split, round): floor-MAE cents}).
    ``fixed_thresholds`` pins candidate split sets for features with a
    known small domain (calendar fields); every other feature gets
    ``n_bins`` quantile thresholds from the training split — exact rank
    statistics by default (oracle-replayable), or one
    Greenwald–Khanna sketch pass with ``approx_bins=True`` (the 100 TB
    path; see _approx_quantile_thresholds). The train/serve pair is
    :func:`full_model_to_artifact` + :func:`predict_full_cents_column`."""
    xcols = [F.col(f"x{i}") for i in range(n_features)]
    fixed = fixed_thresholds or {}
    cont = [f for f in range(n_features) if f not in fixed]
    # accept the documented split-only contract here too (fit_gbt_full
    # normalizes internally, but the threshold pass below needs it now)
    if "is_train" not in feat.columns:
        feat = feat.withColumn("is_train", F.col("split") == "train")
    feat = feat.persist()
    tr = feat.filter("is_train")
    cont_thresholds = (
        _approx_quantile_thresholds(tr, cont, n_bins)
        if approx_bins
        else _exact_rank_thresholds(tr, cont, xcols, n_bins)
    )
    thresholds = {
        **{f: list(v) for f, v in fixed.items()},
        **cont_thresholds,
    }

    # decide the path with a BOUNDED count (one cheap aggregate) before
    # collecting anything: on a corpus-sized frame the old
    # limit(cap+1).collect() shipped 200k full feature rows to the
    # driver just to learn it should not have collected them
    # feat is persisted above: the threshold pass materialized it, so
    # the bounded count and the (small-path) collect read the cache
    # instead of recomputing the featurization per action
    try:
        n_feat_rows = feat.limit(GBT_FULL_COLLECT_MAX + 1).count()
        if n_feat_rows <= GBT_FULL_COLLECT_MAX:
            # model-sized frame: fit driver-side in one pass (the
            # reference trains on a collected pandas frame too);
            # arithmetic identical to the distributed path, asserted by
            # test_gbt_full_paths_identical
            rows = feat.collect()
            model, mae = _fit_gbt_full_local(
                rows, n_features, thresholds, n_rounds, depth, lr,
                patience=patience,
            )
        else:
            model, mae = fit_gbt_full(
                feat,
                n_features,
                thresholds,
                n_rounds,
                depth,
                lr,
                patience=patience,
                stats=stats,
            )
    finally:
        feat.unpersist()
    return model, mae


def _format_gbt_output(
    spark, model: GbtFullModel, mae: dict, mae_splits: tuple[str, ...]
) -> DataFrame:
    """The boosted fit as one row per (round, non-empty leaf), all
    BIGINT: round, leaf, the (feature, threshold) pair at each path
    level, n_leaf, leaf_value_c, and one ``{split}_mae_c`` column per
    name in ``mae_splits``."""
    depth = model.depth
    out_rows = []
    for r, tree in enumerate(model.trees, start=1):
        for leaf in sorted(tree.leaf_values):
            path = []
            for lvl in range(depth):
                node = leaf >> (depth - lvl)
                sp = tree.splits[lvl].get(node)
                path += [sp.feature, sp.threshold] if sp else [-1, -1]
            out_rows.append(
                (
                    r,
                    leaf,
                    *path,
                    tree.leaf_counts[leaf],
                    tree.leaf_values[leaf],
                    *[mae.get((s, r)) for s in mae_splits],
                )
            )
    names = ["round", "leaf"]
    for i in range(1, depth + 1):
        names += [f"l{i}_f", f"l{i}_t"]
    names += ["n_leaf", "leaf_value_c"] + [f"{s}_mae_c" for s in mae_splits]
    schema = T.StructType([T.StructField(n, T.LongType(), True) for n in names])
    return spark.createDataFrame(out_rows, schema)


def train_gbt_on_features(
    feat: DataFrame,
    n_features: int,
    n_rounds: int = 10,
    depth: int = 3,
    lr: float = 0.5,
    n_bins: int = 16,
    fixed_thresholds: dict[int, list[int]] | None = None,
    patience: int | None = None,
) -> DataFrame:
    """:func:`fit_gbt_on_features` formatted as the train_gbt_full
    output frame — one row per (round, non-empty leaf) with the split
    path, leaf value, and the integer train/val MAE history. The
    generic entry the flagship-view fit uses (tests/test_gbt.py::
    test_gbt_full_beats_linear_on_flagship_view trains on the
    ``training_features`` columns of export.FEATURE_COLS shape)."""
    spark = feat.sparkSession
    model, mae = fit_gbt_on_features(
        feat,
        n_features,
        n_rounds=n_rounds,
        depth=depth,
        lr=lr,
        n_bins=n_bins,
        fixed_thresholds=fixed_thresholds,
        patience=patience,
    )
    return _format_gbt_output(spark, model, mae, ("train", "val"))


def full_model_to_artifact(model: GbtFullModel, mae: dict | None = None) -> dict:
    """JSON-serializable document for the model registry
    (modelstore.save_gbt_full_model): base + depth + per-tree split
    paths and leaf values. When the fit's MAE history is supplied, the
    val-MAE argmin round is stored as ``best_round`` — the
    early-stopping cut the scorer applies (reference train.py:312-318,
    where XGBoost's best_iteration serves, not the last round)."""
    doc = {
        "base": model.base,
        "depth": model.depth,
        "trees": [
            {
                "splits": [
                    {str(nd): [sp.feature, sp.threshold] for nd, sp in lvl.items()}
                    for lvl in t.splits
                ],
                "leaves": {str(leaf): v for leaf, v in t.leaf_values.items()},
            }
            for t in model.trees
        ],
    }
    if mae:
        val = {r: v for (s, r), v in mae.items() if s == "val"}
        if val:
            doc["best_round"] = min(sorted(val), key=lambda r: (val[r], r))
        # full per-round curves, servable as the validation endpoint's
        # loss_history (the reference persists the same thing as a
        # <model>_loss_<date>.json next to the joblib, main.py:1052-1063)
        doc["mae_history"] = {
            split: [v for (_, r), v in sorted(per.items(), key=lambda kv: kv[0][1])]
            for split in ("train", "val")
            if (per := {k: v for k, v in mae.items() if k[0] == split})
        }
    return doc


def artifact_to_full_model(doc: dict) -> GbtFullModel:
    """Inverse of :func:`full_model_to_artifact` (best_round is the
    caller's to apply; the reconstituted model carries every tree)."""
    return GbtFullModel(
        base=int(doc["base"]),
        depth=int(doc["depth"]),
        trees=[
            GTree(
                splits=[
                    {int(nd): GSplit(int(ft[0]), int(ft[1])) for nd, ft in lvl.items()}
                    for lvl in t["splits"]
                ],
                leaf_values={int(k): int(v) for k, v in t["leaves"].items()},
                leaf_counts={},
            )
            for t in doc["trees"]
        ],
    )


def predict_full_cents_column(doc: dict, xcols: list[Column]) -> Column:
    """Score the general boosted model as ONE literal column over the
    feature columns — the same pure-codegen serving path as the
    depth-2 model's predict_cents_column: trees are constants, no
    join, no UDF, nothing shuffles at any scale. Only the first
    ``best_round`` trees contribute (all, when the artifact carries no
    early-stopping pick). Routing mirrors the fit's _node_col exactly,
    so train-time predictions and served predictions are bit-equal
    (tests/test_gbt.py::test_gbt_full_artifact_round_trip_and_serving)."""
    model = artifact_to_full_model(doc)
    n_use = int(doc.get("best_round", len(model.trees)))
    pred = F.lit(model.base)
    for tree in model.trees[:n_use]:
        leaf_col = _node_col(tree.splits, model.depth, xcols)
        val = F.lit(0)
        for lf, v in tree.leaf_values.items():
            val = F.when(leaf_col == F.lit(lf), F.lit(v)).otherwise(val)
        pred = pred + val
    nn = F.lit(True)
    for c in xcols:
        nn = nn & c.isNotNull()
    return F.when(nn, pred)


# The flagship view's model features, leak-safe (P6): lags and trailing
# rolls of the target plus lagged exogenous series and the one
# known-at-forecast-time forecast column — the export.FEATURE_COLS shape
# (reference export_pipeline.py:33-74) restated on the testdata analog
# columns. Contemporaneous actuals (clicks, errgen, net_pos at t) stay
# out for the same reason the reference keeps actual load out: unknown
# at forecast time.
FLAGSHIP_GBT_FEATURES: tuple[str, ...] = (
    "price_lag_1h", "price_lag_24h", "price_lag_168h",
    "price_roll_24h", "price_roll_168h",
    "hour", "day_of_week", "month", "is_weekend", "is_peak_hour",
    "clicks_lag_24h", "errgen_lag_24h", "errgen_lag_168h",
    "net_pos_lag_24h", "net_pos_lag_168h", "signups_forecast",
)

# features with a small fixed domain -> pinned candidate thresholds
# (every split point is a candidate, no binning loss)
FLAGSHIP_GBT_FIXED: dict[str, list[int]] = {
    "hour": list(range(1, 24)),
    "day_of_week": list(range(2, 8)),
    "month": list(range(2, 13)),
    "is_weekend": [1],
    "is_peak_hour": [1],
}


def featurize_flagship_view(
    tf: DataFrame,
    target_col: str = "price",
    feature_cols: tuple[str, ...] = FLAGSHIP_GBT_FEATURES,
    val_days: int = 6,
) -> tuple[DataFrame, dict[int, list[int]]]:
    """Turn the ``training_features`` view into the exact-integer fit
    frame ``train_gbt_on_features`` consumes: y = target cents, x{i} =
    feature i in cents (calendar ints pass through exactly: n*100 is
    still order-isomorphic, so splits are unchanged), rows with any
    NULL feature dropped (the first 168 warm-up hours), chronological
    is_train split anchored ``val_days`` before max(date). Returns
    (frame, fixed_thresholds) with the calendar features' pinned
    candidate sets scaled to match."""
    cents_of = lambda c: F.round(F.col(c).cast("double") * 100, 0).cast("long")  # noqa: E731
    cols = [cents_of(target_col).alias("y")] + [
        cents_of(c).alias(f"x{i}") for i, c in enumerate(feature_cols)
    ]
    f0 = tf.select(F.to_date("t").alias("d"), *cols).na.drop()
    mx = f0.agg(F.max("d")).collect()[0][0]  # scalar extent read
    if mx is None:
        raise ValueError("flagship featurization produced no rows")
    train_end = mx - dt.timedelta(days=val_days)
    feat = f0.withColumn("is_train", F.col("d") <= F.lit(train_end)).drop("d")
    fixed = {
        i: [t * 100 for t in FLAGSHIP_GBT_FIXED[c]]
        for i, c in enumerate(feature_cols)
        if c in FLAGSHIP_GBT_FIXED
    }
    return feat.coalesce(1), fixed


def train_gbt(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    n_rounds: int = 3,
    lr: float = 0.5,
    val_days: int = 9,
) -> DataFrame:
    """Train boosted trees over a rolling train/val split; return the
    model + per-round loss history as one small DataFrame.

    Output (one row per non-empty leaf per round, all BIGINT):
      round, leaf, root_f, root_t, child_f, child_t (-1 when the side
      is unsplit), n_leaf, leaf_value_c, train_mae_c, val_mae_c.

    Distributed work is exactly two passes regardless of data size:
    (1) the (h, d, is_train) histogram groupBy (<=336 groups, map-side
    partials); (2) one broadcast-join + aggregate computing every
    round's train/val MAE from exact integer |y - pred| sums. The fit
    itself runs on the collected histogram (model-sized, 168 cells).
    """
    spark = df.sparkSession
    model, feat = fit_gbt(
        df, ts_col=ts_col, value_col=value_col, n_rounds=n_rounds, lr=lr,
        val_days=val_days,
    )

    pred_schema = T.StructType(
        [T.StructField("h", T.LongType(), False), T.StructField("d", T.LongType(), False)]
        + [T.StructField(f"p{r}", T.LongType(), False) for r in range(1, n_rounds + 1)]
    )
    pm = spark.createDataFrame(
        [(h, d, *model.cell_preds[(h, d)]) for h in HOUR_RANGE for d in DOW_RANGE],
        pred_schema,
    )
    err = (
        feat.join(F.broadcast(pm), ["h", "d"])
        .groupBy("is_train")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                F.sum(F.abs(F.col("y") - F.col(f"p{r}"))).alias(f"sa{r}")
                for r in range(1, n_rounds + 1)
            ],
        )
        .collect()
    )
    mae = {}
    for row in err:
        split = "train" if row["is_train"] else "val"
        for r in range(1, n_rounds + 1):
            # identical to the oracle: floor(double(sum_abs) / double(n))
            mae[(split, r)] = math.floor(float(row[f"sa{r}"]) / float(row["cnt"]))

    out_rows = []
    for r, rm in enumerate(model.rounds, start=1):
        for leaf in sorted(rm.leaf_values):
            child = rm.children.get(leaf // 2)
            out_rows.append(
                (
                    r,
                    leaf,
                    rm.root.feature,
                    rm.root.threshold,
                    child.feature if child is not None else -1,
                    child.threshold if child is not None else -1,
                    rm.leaf_counts[leaf],
                    rm.leaf_values[leaf],
                    mae.get(("train", r)),
                    mae.get(("val", r)),
                )
            )
    out_schema = T.StructType(
        [
            T.StructField(n, T.LongType(), True)
            for n in (
                "round",
                "leaf",
                "root_f",
                "root_t",
                "child_f",
                "child_t",
                "n_leaf",
                "leaf_value_c",
                "train_mae_c",
                "val_mae_c",
            )
        ]
    )
    return spark.createDataFrame(out_rows, out_schema)


# ---------------------------------------------------------------------------
# Model A: net-load forecasting twin (reference train.py:124-246,
# export_pipeline.py:374-400,563-660)
# ---------------------------------------------------------------------------

# the winterthur_net_load_features surface restated on the testdata
# analog (net = purchase - signup cents): net-load lags 1h/1d/7d + the
# trailing 24h roll, and the calendar block (hour, weekday, month,
# quarter, is_weekend). The reference view's load_rolling_avg_24h spans
# 23 PRECEDING..CURRENT ROW (features.sql:357-359) — that includes the
# target, so this engine keeps its P6 leakage guard and uses
# 24 PRECEDING..1 PRECEDING (an exact-int trailing SUM), the same
# deliberate deviation the flagship features make.
LOAD_GBT_N_FEATURES = 9

# hourly-row count at or above which the long lag is the full 168h week
# (below it, 48h — a sparse series would lose every row to warmup)
LOAD_GBT_LONG_LAG_MIN = 400

# calendar features -> pinned candidate thresholds (full small domains)
LOAD_GBT_FIXED: dict[int, list[int]] = {
    0: list(range(1, 24)),  # hour 0..23
    1: list(range(2, 8)),   # dow 1..7 (Spark dayofweek, 1=Sunday)
    2: list(range(2, 13)),  # month
    3: list(range(2, 5)),   # quarter
    4: [1],                 # is_weekend
}


def featurize_net_load_series(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    val_days: int = 14,
    test_days: int = 7,
) -> DataFrame:
    """Model A's fit frame as EXACT integers: the hourly net series
    (purchase cents - signup cents where the hour has load rows — the
    net_load_features view's J5/F4 arithmetic), its lags 1/24/168 and
    trailing-24h SUM, the calendar block, and the reference's 3-way
    rolling split (run_load_export: test = last ``test_days`` days,
    val = the ``val_days`` before, train = the rest, anchored at
    max(date))."""
    from pyspark.sql import Window

    from bigdatasmallprice_spark.queries.core import cents

    c = cents(F.col(value_col))
    et = F.col("event_type")
    hourly = df.groupBy(F.date_trunc("hour", F.col(ts_col)).alias("h")).agg(
        F.sum(F.when(et == "purchase", c)).alias("lc"),
        F.count(F.when(et == "purchase", F.lit(1))).alias("lcnt"),
        F.sum(F.when(et == "signup", c)).alias("pv_c"),
    )
    net = hourly.filter(F.col("lcnt") > 0).select(
        "h", (F.col("lc") - F.coalesce(F.col("pv_c"), F.lit(0))).alias("net_c")
    )
    # the 7-day lag's ROW warmup (168 rows) would consume a sparse
    # series whole (sf0.001 has ~170 purchase-hours), so the long-lag
    # horizon scales with the series: the full week when >= LONG_LAG_MIN
    # hourly rows exist, else 48h — an integer comparison on COUNT(*)
    # the oracle replays exactly (the scaled_plane_count pattern)
    n_series = net.count()  # scalar extent read
    long_lag = 168 if n_series >= LOAD_GBT_LONG_LAG_MIN else 48
    w = Window.orderBy("h")
    f0 = net.select(
        "h",
        F.col("net_c").alias("y"),
        F.hour("h").cast("long").alias("x0"),
        F.dayofweek("h").cast("long").alias("x1"),
        F.month("h").cast("long").alias("x2"),
        F.quarter("h").cast("long").alias("x3"),
        F.when(F.dayofweek("h").isin(1, 7), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("x4"),
        F.lag("net_c", 1).over(w).alias("x5"),
        F.lag("net_c", 24).over(w).alias("x6"),
        F.lag("net_c", long_lag).over(w).alias("x7"),
        F.sum("net_c").over(w.rowsBetween(-24, -1)).alias("x8"),
    )
    f1 = f0.filter(
        F.col("x5").isNotNull()
        & F.col("x6").isNotNull()
        & F.col("x7").isNotNull()
        & F.col("x8").isNotNull()
    )
    mx = f1.agg(F.max(F.to_date("h"))).collect()[0][0]  # scalar extent read
    if mx is None:
        raise ValueError("net-load featurization produced no rows")
    val_end = mx - dt.timedelta(days=test_days)
    train_end = val_end - dt.timedelta(days=val_days)
    d = F.to_date("h")
    return f1.select(
        "y",
        *[f"x{i}" for i in range(LOAD_GBT_N_FEATURES)],
        F.when(d <= F.lit(train_end), F.lit("train"))
        .when(d <= F.lit(val_end), F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    ).withColumn("is_train", F.col("split") == "train")


def train_gbt_load(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    n_rounds: int = 15,
    depth: int = 7,
    lr: float = 0.05,
    val_days: int = 14,
    test_days: int = 7,
    n_bins: int = 16,
    patience: int | None = 3,
) -> DataFrame:
    """Model A: the net-load boosted model at reference shape —
    depth-``depth`` trees (reference max_depth=7, train.py:145), up to
    ``n_rounds`` rounds with val-MAE early stopping after ``patience``
    rounds without improvement (early_stopping_rounds, train.py:157),
    the reference's rolling 3-way split (test = last week), and the
    9-feature net-load surface. Output: one row per (round, non-empty
    leaf) for the EXECUTED rounds only, with train/val/test integer
    MAE per round — the test column is the reference's held-out
    evaluate_all metric (train.py:227-238)."""
    feat = featurize_net_load_series(
        df, ts_col=ts_col, value_col=value_col, val_days=val_days,
        test_days=test_days,
    ).coalesce(1)
    model, mae = fit_gbt_on_features(
        feat,
        n_features=LOAD_GBT_N_FEATURES,
        n_rounds=n_rounds,
        depth=depth,
        lr=lr,
        n_bins=n_bins,
        fixed_thresholds=LOAD_GBT_FIXED,
        patience=patience,
    )
    return _format_gbt_output(
        df.sparkSession, model, mae, ("train", "val", "test")
    )
