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
