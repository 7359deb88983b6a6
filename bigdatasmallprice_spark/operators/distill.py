"""Classifier distillation for corpus curation: train a linear
quality classifier on a labeled slice, apply it to the whole corpus.

The modern curation pattern (CCNet; FineWeb-Edu; DCLM): an expensive
labeler — a heuristic stack, an LLM judge, human raters — labels a
small slice, a CHEAP linear model is fit to imitate it, and the cheap
model filters the full corpus at scan speed. Here the teacher is the
engine's own quality heuristic (functions/texts.quality_score, the
keep rule of the ``quality_filter`` query) over the doc_id%4 slice,
and the student is a 5-weight linear model over four exact-integer-
derived features (raw + saturated length, type-token ratio, stopword
ratio). Negative examples (teacher rejects) are ~8x rarer than keeps,
so the fit weights them by the EXACT npos/nneg ratio — unweighted GD
learns the class prior and degenerates to keep-everything (measured).
The reference has no trained curation model; this extends the
engine's D5 training surface (linreg, GBT) to classification.

Engine-portable training math (the house parity rules):

- The link is the RATIONAL sigmoid  p = 0.5*(1 + z/(1+|z|))  — same
  shape and range as the logistic link but built from +,-,*,/,abs
  only, so Spark and DuckDB evaluate bit-identical doubles. exp() is
  deliberately avoided: libm implementations differ in the last ulp
  across engines, which would make a GD weight trajectory
  engine-dependent. (Same reasoning as md5-slice standing in for
  xxhash64 elsewhere: the portable twin of the textbook primitive.)
- Gradient descent on class-weighted squared error over p: per-row
  gradient d = cw * (p - y) / (1+|z|)^2  (the 2 and the 0.5 of dp/dz
  cancel), cw = 1 for keeps and npos/nneg (a double ratio of exact
  counts, identical in both engines) for rejects.
  Per-row contributions are rounded to integer MICRO-UNITS and summed
  as exact BIGINTs — float accumulation is order-dependent and would
  differ between engines/partitionings; integer sums are not (the
  linreg MAPE-gate trick). Both engines round half away from zero
  (verified), and the per-row double math upstream of the rounding is
  the identical expression tree.
- The weight update  w - lr*((g/1e6)/n)  is computed driver-side in
  Python floats from the exact integer sums; the oracle computes the
  textually identical expression from its CTE columns. Python, Spark
  and DuckDB all perform the same IEEE-754 double ops in the same
  order, so the weight trajectories are bit-equal.

Scale shape: the feature frame is a 7-slim-column projection of the
corpus, persisted once; each GD iteration is ONE map-side-combined
global aggregate producing a single 7-number row (model-sized driver
state, like the GBT per-level histograms). T iterations = T passes
over the cached slim frame — no collect of data rows, no shuffle wider
than the aggregate's partials, unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DISTILL_ITERS = 16
DISTILL_LR = "4.0"  # literal text — shared verbatim by both engines
N_FEATURES = 5  # bias + 4

# shared expression templates; {w*} become column refs in the oracle
# and repr'd double literals on the Spark side — identical structure,
# identical IEEE evaluation order
Z_TMPL = "({w0} + {w1} * x1 + {w2} * x2 + {w3} * x3 + {w4} * x4)"
P_EXPR = "(0.5 * (1.0 + z / (1.0 + abs(z))))"
DZ_EXPR = "((1.0 + abs(z)) * (1.0 + abs(z)))"
# class weight: negatives are ~8x rarer than positives in this corpus;
# unweighted GD learns the prior and degenerates to keep-everything
# (measured: model_keep == n_docs at sf0.1). Weighting the negative
# class by the EXACT npos/nneg ratio makes the student actually track
# the teacher's reject boundary (neg-recall >= 0.89 at every sf).
CW_EXPR = (
    "(CASE WHEN y = CAST(1.0 AS DOUBLE) THEN CAST(1.0 AS DOUBLE) "
    "ELSE {wneg} END)"
)
WNEG_TMPL = (
    "(CASE WHEN {nneg} = 0 THEN CAST(1.0 AS DOUBLE) "
    "ELSE CAST({npos} AS DOUBLE) / CAST({nneg} AS DOUBLE) END)"
)
_XJ = ("1.0", "x1", "x2", "x3", "x4")


def g_term(j: int) -> str:
    return (
        "CAST(round(1000000.0 * "
        f"(((cw * (p - y)) / dz) * {_XJ[j]})) AS BIGINT)"
    )


LOSS_TERM = "CAST(round(1000000.0 * (cw * ((p - y) * (p - y)))) AS BIGINT)"
W_UPDATE_TMPL = (
    "({w} - {lr} * ((CAST({g} AS DOUBLE) / 1000000.0) / CAST({n} AS DOUBLE)))"
)

# feature/label construction on top of exact-integer text stats; the
# teacher label is quality_filter's keep rule
X1_EXPR = "(CAST(n_tok AS DOUBLE) / 100.0)"
X2_EXPR = "(CAST(n_uniq AS DOUBLE) / CAST(n_tok AS DOUBLE))"
X3_EXPR = "(CAST(sh AS DOUBLE) / CAST(n_tok AS DOUBLE))"
# the teacher's length term is SATURATED; giving the student the same
# basis makes the target (almost) linearly separable in (x4, x2, x3)
X4_EXPR = "(least((CAST(n_tok AS DOUBLE) / 100.0), CAST(1.0 AS DOUBLE)))"
Y_EXPR = (
    "(CASE WHEN q >= 0.55 AND n_tok >= 20 "
    "THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)"
)
TRAIN_PRED = "(doc_id % 4 = 0)"


def quality_features(docs: DataFrame) -> DataFrame:
    """Slim per-doc frame (source, train, x1..x3, y) — the only
    corpus-width projection of the fit; persist-worthy."""
    from bigdatasmallprice_spark.functions.texts import (
        STOPWORDS_EN,
        n_tokens,
        n_unique_tokens,
        quality_score,
        stopword_hits,
    )

    t = F.col("text")
    base = docs.select(
        "doc_id",
        "source",
        n_tokens(t).alias("n_tok"),
        n_unique_tokens(t).alias("n_uniq"),
        stopword_hits(t, STOPWORDS_EN).alias("sh"),
    ).withColumn(
        "q",
        quality_score(F.col("n_tok"), F.col("n_uniq"), F.col("sh")),
    )
    return base.selectExpr(
        "source",
        f"{TRAIN_PRED} AS train",
        f"{X1_EXPR} AS x1",
        f"{X2_EXPR} AS x2",
        f"{X3_EXPR} AS x3",
        f"{X4_EXPR} AS x4",
        f"{Y_EXPR} AS y",
    )


def _z_expr(w: list[float]) -> str:
    return Z_TMPL.format(
        w0=repr(w[0]), w1=repr(w[1]), w2=repr(w[2]), w3=repr(w[3]),
        w4=repr(w[4]),
    )


def fit_quality_classifier(
    feats: DataFrame,
    iters: int = DISTILL_ITERS,
    lr: str = DISTILL_LR,
) -> list[dict]:
    """GD on the persisted slim frame: one global exact-integer
    aggregate per iteration, weights held driver-side (model-sized).
    Returns per-iteration records: updated weights + the pre-update
    training loss (micro-units) + n."""
    train = feats.filter("train")
    cnt = train.selectExpr(
        "SUM(CASE WHEN y = CAST(1.0 AS DOUBLE) THEN 1 ELSE 0 END) AS npos",
        "SUM(CASE WHEN y = CAST(1.0 AS DOUBLE) THEN 0 ELSE 1 END) AS nneg",
    ).collect()[0]
    npos, nneg = int(cnt["npos"] or 0), int(cnt["nneg"] or 0)
    # same division the oracle's cw0 CTE performs on the same exact ints
    wneg = 1.0 if nneg == 0 else npos / nneg
    cw = CW_EXPR.format(wneg=repr(wneg))
    w = [0.0] * N_FEATURES
    history: list[dict] = []
    for it in range(1, iters + 1):
        row = (
            train.selectExpr(
                "y", "x1", "x2", "x3", "x4", f"{_z_expr(w)} AS z"
            )
            .selectExpr(
                "y", "x1", "x2", "x3", "x4",
                f"{P_EXPR} AS p", f"{DZ_EXPR} AS dz", f"{cw} AS cw",
            )
            .selectExpr(
                "CAST(count(1) AS BIGINT) AS n",
                *[f"SUM({g_term(j)}) AS g{j}" for j in range(N_FEATURES)],
                f"SUM({LOSS_TERM}) AS loss_micro",
            )
            .collect()[0]
        )
        n = row["n"]
        # textually the same update the oracle runs on its CTE columns
        lrf = float(lr)
        w = [
            w[j] - lrf * ((row[f"g{j}"] / 1000000.0) / float(n))
            for j in range(N_FEATURES)
        ]
        history.append(
            {
                "iter": it,
                "w": list(w),
                "loss_micro": row["loss_micro"],
                "n": n,
                "npos": npos,
                "nneg": nneg,
            }
        )
    return history


def o_distill_chain_sql(iters: int = DISTILL_ITERS, lr: str = DISTILL_LR) -> str:
    """DuckDB CTE chain replaying the identical fit: feat projection,
    then per iteration one exact-integer aggregate + one weight-update
    row. Ends with CTEs w0..w{iters} (w{t} carries the updated weights
    plus that iteration's pre-update loss_micro and n)."""
    from bigdatasmallprice_spark.functions.texts import (
        STOPWORDS_EN,
        o_n_tokens,
        o_n_unique_tokens,
        o_quality_score,
        o_stopword_hits,
    )

    nt = o_n_tokens("text")
    nu = o_n_unique_tokens("text")
    sh = o_stopword_hits("text", STOPWORDS_EN)
    q = o_quality_score("n_tok", "n_uniq", "sh")
    parts = [
        f"""f0 AS (
  SELECT doc_id, source, {nt} AS n_tok, {nu} AS n_uniq, {sh} AS sh
  FROM documents
),
f1 AS (SELECT doc_id, source, n_tok, n_uniq, sh, {q} AS q FROM f0),
feat AS MATERIALIZED (
  -- MATERIALIZED: referenced by every iteration CTE; inlining would
  -- re-scan the parquet per reference (DuckDB runs out of file
  -- handles at 16 iterations). Mirrors the Spark side's persist().
  SELECT source, {TRAIN_PRED} AS train,
         {X1_EXPR} AS x1, {X2_EXPR} AS x2, {X3_EXPR} AS x3,
         {X4_EXPR} AS x4,
         {Y_EXPR} AS y
  FROM f1
),
cls AS (
  SELECT SUM(CASE WHEN y = CAST(1.0 AS DOUBLE) THEN 1 ELSE 0 END) AS npos,
         SUM(CASE WHEN y = CAST(1.0 AS DOUBLE) THEN 0 ELSE 1 END) AS nneg
  FROM feat WHERE train
),
cw0 AS MATERIALIZED (SELECT {WNEG_TMPL.format(npos="npos", nneg="nneg")} AS wneg FROM cls),
w0 AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)"""
    ]
    z = Z_TMPL.format(w0="w0", w1="w1", w2="w2", w3="w3", w4="w4")
    cw = CW_EXPR.format(wneg="wneg")
    for t in range(1, iters + 1):
        gsums = ",\n         ".join(
            f"SUM({g_term(j)}) AS g{j}" for j in range(N_FEATURES)
        )
        # update outputs get fresh names (nw*) then re-alias in a
        # wrapper CTE: aliasing the result back to w* in the same
        # SELECT would collide with the input columns under lateral
        # alias resolution
        # w{t-1} also carries loss_micro/n from its own round, so the
        # joined references must be table-qualified
        upd = ",\n         ".join(
            W_UPDATE_TMPL.format(
                w=f"w{t - 1}.w{j}", lr=lr, g=f"g{j}", n=f"g{t}.n"
            )
            + f" AS nw{j}"
            for j in range(N_FEATURES)
        )
        parts.append(f"""r{t} AS (
  SELECT y, x1, x2, x3, x4, {z} AS z FROM feat, w{t - 1} WHERE train
),
p{t} AS (
  SELECT y, x1, x2, x3, x4, {P_EXPR} AS p, {DZ_EXPR} AS dz,
         {cw} AS cw
  FROM r{t}, cw0
),
g{t} AS (
  SELECT CAST(count(1) AS BIGINT) AS n,
         {gsums},
         SUM({LOSS_TERM}) AS loss_micro
  FROM p{t}
),
u{t} AS (
  SELECT {upd},
         g{t}.loss_micro AS loss_micro, g{t}.n AS n
  FROM g{t}, w{t - 1}
),
w{t} AS MATERIALIZED (
  -- MATERIALIZED: each w CTE is referenced twice (next round's z and
  -- its update); inlining doubles the plan per iteration -> 2^T blowup
  SELECT nw0 AS w0, nw1 AS w1, nw2 AS w2, nw3 AS w3, nw4 AS w4,
         loss_micro, n
  FROM u{t}
)""")
    return ",\n".join(parts)
