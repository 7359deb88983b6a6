"""Classifier distillation for corpus curation: train a linear
quality classifier on a labeled slice, apply it to the whole corpus.

The modern curation pattern (CCNet; FineWeb-Edu; DCLM): an expensive
labeler — a heuristic stack, an LLM judge, human raters — labels a
small slice, a CHEAP linear model is fit to imitate it, and the cheap
model filters the full corpus at scan speed. Here the teacher is the
engine's own quality heuristic (the keep rule of the
``quality_filter`` query, re-expressed as an EXACT integer
inequality) over the doc_id%4 slice, and the student is a 5-weight
linear model over four integer features (raw + saturated length,
type-token ratio, stopword ratio — all in micro-units). Negative
examples (teacher rejects) are ~8x rarer than keeps, so the fit
weights them by the npos/nneg ratio — unweighted GD learns the class
prior and degenerates to keep-everything (measured). The reference
has no trained curation model; this extends the engine's D5 training
surface (linreg, GBT) to classification.

ALL-INTEGER training math (the house parity rules, taken to their
conclusion): every number in the replayed trajectory — features,
labels, weights, z, the sigmoid, per-row gradients, their sums, the
weight update — is a BIGINT in fixed-point units, and every division
is an explicitly-rounded integer division. There is NO floating-point
operation anywhere in the chain, so no engine (Spark, DuckDB — any
build, any version) can diverge: FMA contraction, libm ulp
differences, vectorized-eval reassociation, round-half conventions on
doubles all have nothing to act on. (The previous design kept the
per-row z/p/dz math in doubles with "identical expression trees" —
bit-equal across the engines tested locally, but engine-VERSION-
sensitive by construction. kmeans_fit_scaled and the GBT splits
already follow the integer discipline; this brings the distillation
fit in line.)

Fixed-point layout (SCALE = 1e6 "micro", sigmoid in "milli"):

- features x_j: micro-units. x1 = n_tok/100 (clamped at 100 — far
  above the teacher's knee), x2 = n_uniq/n_tok, x3 = sh/n_tok,
  x4 = min(x1, 1) (the teacher's saturated-length basis). The ratio
  features are one round-half-up integer division each.
- teacher label: q >= 0.55 AND n_tok >= 20 multiplied through by
  1000*n_tok (> 0):  4*min(n_tok,100)*n_tok + 300*n_uniq +
  300*(n_tok-sh) >= 550*n_tok  — verified identical to the double
  rule on every row at sf0.001/0.01/0.1. y is 1000 (milli) or 0.
- link: the RATIONAL sigmoid p = 0.5*(1 + z/(1+|z|)) in milli-units:
  p_mil = 500 + rdiv(500*z_c, 1e6 + |z_c|), z_c = clamp(z, ±100e6).
  Same shape/range as the logistic link, zero libm.
- gradient of class-weighted squared error over p: per-row
  d_j = rdiv(1000 * e_mil * x_j_micro, dzsq_micro)  (micro-units of
  (p-y)*x_j/(1+|z|)^2 — the 2 and the 0.5 of dp/dz cancel), where
  dzsq_micro = pdiv((1e6+|z_c|)^2, 1e6). Summed as exact BIGINTs,
  positives and negatives SEPARATELY — so the class weight multiplies
  the summed integers once per iteration, not every row (tighter
  overflow bounds, one rounding site).
- class weight: cw_micro = rdiv(1e6*npos, nneg), clamped at 100e6.
- update (micro): w_j -= rdiv(4*gpos_j, n)
                        + rdiv(4*cw_micro*rdiv(gneg_j, n), 1e6)
  computed driver-side in PYTHON INTEGER arithmetic from the exact
  sums; the oracle computes the identical integer expression in its
  CTE chain. Arbitrary-precision Python ints == BIGINT SQL ints as
  long as the SQL side never overflows (bounds below).
- loss (micro, reported): lpos + rdiv(cw_micro*lneg, 1e6) with
  per-row e_mil^2 (exactly micro — no division).

rdiv(a, b) rounds half away from zero via sign split; pdiv is its
a>=0 fast path (2a+b) div 2b. Both engines only ever divide a
non-negative numerator by a positive denominator, where truncating
(Spark ``div``, Python ``//``) and flooring (DuckDB ``//``) integer
division coincide — the one dialect difference is the operator
spelling, parameterized below.

Overflow audit (BIGINT max 9.2e18): |x_j| <= 1e8, |z_c| <= 1e8,
dzh <= 1.01e8, dzh^2 <= 1.03e16, |e| <= 1000, per-row d_j numerator
<= 1e3*1e3*1e8 = 1e14 (*2 in pdiv), cw*rdiv(gneg,n)*4 <= 1e8*1e8*4 =
4e16. The tightest bound is the reported LOSS fold: lneg <= nneg*1e6
and cwm ~= npos*1e6/nneg make cwm*lneg ~= npos*1e12, so the oracle's
BIGINT fold holds through ~9 MILLION positive docs in the training
slice (equivalently nneg ~9e4 at the full CW_CLAMP) — far past every
tested sf; past that, switch the reported loss to the mean form (a
documented spec change; the weight trajectory itself is unaffected). n itself only enters as a divisor.

Scale shape: the feature frame is a 7-slim-column projection of the
corpus, persisted once; each GD iteration is ONE map-side-combined
global aggregate producing a single 13-number row (model-sized driver
state, like the GBT per-level histograms). T iterations = T passes
over the cached slim frame — no collect of data rows, no shuffle wider
than the aggregate's partials, unchanged at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DISTILL_ITERS = 16
DISTILL_LR = 4  # integer learning rate on micro-unit mean gradients
N_FEATURES = 5  # bias + 4
SCALE = 1_000_000
Z_CLAMP = 100_000_000  # |z| <= 100
X1_CLAMP = 100_000_000  # x1 <= 100 (teacher's knee is at 1.0)
CW_CLAMP = 100_000_000  # class-weight ratio <= 100

# integer-division operator spelling is the ONLY dialect difference:
# Spark spells truncating integer division `div`, DuckDB spells floor
# division `//`; both are applied only to non-negative numerators
# (positive denominators), where the two semantics coincide.
SPARK_DIV = "DIV"
DUCK_DIV = "//"


def pdiv(a: str, b: str, op: str) -> str:
    """Round-half-up integer division for a >= 0, b > 0."""
    return f"((({a}) * 2 + ({b})) {op} (({b}) * 2))"


def rdiv(a: str, b: str, op: str) -> str:
    """Round-half-away-from-zero integer division, b > 0."""
    return (
        f"(CASE WHEN ({a}) < 0 THEN -{pdiv(f'-({a})', b, op)} "
        f"ELSE {pdiv(a, b, op)} END)"
    )


# --- feature/label construction on exact integer text stats ---------------
X1M_EXPR = f"least(n_tok * 10000, {X1_CLAMP})"


def x2m_expr(op: str) -> str:
    return pdiv(f"n_uniq * {SCALE}", "n_tok", op)


def x3m_expr(op: str) -> str:
    return pdiv(f"sh * {SCALE}", "n_tok", op)


X4M_EXPR = f"least(x1m, {SCALE})"
# the quality_filter keep rule (q >= 0.55 AND n_tok >= 20) multiplied
# through by 1000*n_tok — exact integers, verified row-identical to
# the double form at every sf
YM_EXPR = (
    "CAST(CASE WHEN 4 * least(n_tok, 100) * n_tok + 300 * n_uniq "
    "+ 300 * (n_tok - sh) >= 550 * n_tok AND n_tok >= 20 "
    "THEN 1000 ELSE 0 END AS BIGINT)"
)
TRAIN_PRED = "(doc_id % 4 = 0)"


# --- per-iteration per-row chain (micro/milli fixed point) -----------------
def z_expr(w: list[str], op: str) -> str:
    """z in micro-units from micro-unit weights (literals on the Spark
    side, w{t-1} column refs in the oracle)."""
    dot = " + ".join(f"({w[j]}) * x{j}m" for j in range(1, N_FEATURES))
    return f"(({w[0]}) + {rdiv(dot, str(SCALE), op)})"


def zc_expr(z: str = "z") -> str:
    """Clamped-score expression over a named column. Parameterized so
    callers with suffixed column names (langid's per-class z{i}) build
    the SQL directly instead of string-replacing rendered text."""
    return f"least(greatest({z}, -{Z_CLAMP}), {Z_CLAMP})"


def dzh_expr(zc: str = "zc") -> str:
    return f"({SCALE} + abs({zc}))"


ZC_EXPR = zc_expr()
DZH = dzh_expr()


def dzsq_expr(op: str, zc: str = "zc") -> str:
    d = dzh_expr(zc)
    return pdiv(f"{d} * {d}", str(SCALE), op)


def pm_expr(op: str, zc: str = "zc") -> str:
    return f"(500 + {rdiv(f'{zc} * 500', dzh_expr(zc), op)})"


def d_term(j: int, op: str) -> str:
    """Micro-units of (p - y) * x_j / (1+|z|)^2 for one row."""
    xj = str(SCALE) if j == 0 else f"x{j}m"
    return rdiv(f"em * 1000 * {xj}", "dzsq", op)


def grad_sums(op: str) -> list[str]:
    """The 13 aggregate expressions of one GD iteration: n, the five
    gradient sums split by class, and the split loss sums."""
    outs = ["CAST(count(1) AS BIGINT) AS n"]
    for j in range(N_FEATURES):
        d = d_term(j, op)
        outs.append(
            f"CAST(SUM(CASE WHEN ym = 1000 THEN {d} ELSE 0 END) AS BIGINT)"
            f" AS gp{j}"
        )
        outs.append(
            f"CAST(SUM(CASE WHEN ym = 0 THEN {d} ELSE 0 END) AS BIGINT)"
            f" AS gn{j}"
        )
    outs.append(
        "CAST(SUM(CASE WHEN ym = 1000 THEN em * em ELSE 0 END) AS BIGINT)"
        " AS lp"
    )
    outs.append(
        "CAST(SUM(CASE WHEN ym = 0 THEN em * em ELSE 0 END) AS BIGINT)"
        " AS ln_"
    )
    return outs


def step_expr(j: int, cwm: str, op: str, n: str = "n") -> str:
    """The integer weight-update step for feature j from the split sums."""
    neg_mean = rdiv(f"gn{j}", n, op)
    return (
        f"({rdiv(f'{DISTILL_LR} * gp{j}', n, op)} "
        f"+ {rdiv(f'{DISTILL_LR} * ({cwm}) * {neg_mean}', str(SCALE), op)})"
    )


def loss_expr(cwm: str, op: str) -> str:
    return f"(lp + {rdiv(f'({cwm}) * ln_', str(SCALE), op)})"


def cwm_expr(npos: str, nneg: str, op: str) -> str:
    return (
        f"(CASE WHEN {nneg} = 0 THEN {SCALE} "
        f"ELSE least({pdiv(f'{npos} * {SCALE}', nneg, op)}, {CW_CLAMP}) END)"
    )


# --- Python twins of the integer primitives (driver-side fold) -------------
def pdiv_py(a: int, b: int) -> int:
    return (a * 2 + b) // (b * 2)


def rdiv_py(a: int, b: int) -> int:
    return -pdiv_py(-a, b) if a < 0 else pdiv_py(a, b)


def quality_features(docs: DataFrame, extra_cols: tuple = ()) -> DataFrame:
    """Slim per-doc frame (source, train, x1m..x4m, ym — all exact
    BIGINTs) — the only corpus-width projection of the fit;
    persist-worthy. ``extra_cols`` passes identity columns (e.g.
    doc_id) through for serving callers; the fit itself never needs
    them."""
    from bigdatasmallprice_spark.functions.texts import (
        STOPWORDS_EN,
        n_tokens,
        n_unique_tokens,
        stopword_hits,
    )

    t = F.col("text")
    base = docs.select(
        "doc_id",
        "source",
        n_tokens(t).alias("n_tok"),
        n_unique_tokens(t).alias("n_uniq"),
        stopword_hits(t, STOPWORDS_EN).alias("sh"),
    )
    op = SPARK_DIV
    return base.selectExpr(
        *extra_cols,
        "source",
        f"{TRAIN_PRED} AS train",
        f"{X1M_EXPR} AS x1m",
        f"{x2m_expr(op)} AS x2m",
        f"{x3m_expr(op)} AS x3m",
        f"{YM_EXPR} AS ym",
    ).selectExpr(
        *extra_cols,
        "source", "train", "x1m", "x2m", "x3m", f"{X4M_EXPR} AS x4m", "ym"
    )


def fit_quality_classifier(
    feats: DataFrame,
    iters: int = DISTILL_ITERS,
) -> list[dict]:
    """GD on the persisted slim frame: one global exact-integer
    aggregate per iteration, micro-unit BIGINT weights held driver-side
    (model-sized). Returns per-iteration records: updated weights (int
    micro-units) + the pre-update class-weighted training loss
    (micro-units) + n."""
    op = SPARK_DIV
    train = feats.filter("train")
    cnt = train.selectExpr(
        "SUM(CASE WHEN ym = 1000 THEN 1 ELSE 0 END) AS npos",
        "SUM(CASE WHEN ym = 0 THEN 1 ELSE 0 END) AS nneg",
    ).collect()[0]
    npos, nneg = int(cnt["npos"] or 0), int(cnt["nneg"] or 0)
    # same integer expression the oracle's cw0 CTE computes
    cwm = SCALE if nneg == 0 else min(pdiv_py(npos * SCALE, nneg), CW_CLAMP)
    w = [0] * N_FEATURES
    history: list[dict] = []
    for it in range(1, iters + 1):
        w_lits = [str(wj) for wj in w]
        cur = train.selectExpr(
            "x1m", "x2m", "x3m", "x4m", "ym", f"{z_expr(w_lits, op)} AS z"
        ).selectExpr(
            "x1m", "x2m", "x3m", "x4m", "ym", f"{ZC_EXPR} AS zc"
        ).selectExpr(
            "x1m", "x2m", "x3m", "x4m", "ym",
            f"{pm_expr(op)} AS pm", f"{dzsq_expr(op)} AS dzsq",
        ).selectExpr(
            "x1m", "x2m", "x3m", "x4m", "ym", "dzsq", "(pm - ym) AS em"
        )
        row = cur.selectExpr(*grad_sums(op)).collect()[0]
        n = int(row["n"])
        # the identical integer fold the oracle's u{t} CTE performs
        w = [
            w[j]
            - (
                rdiv_py(DISTILL_LR * int(row[f"gp{j}"]), n)
                + rdiv_py(
                    DISTILL_LR * cwm * rdiv_py(int(row[f"gn{j}"]), n),
                    SCALE,
                )
            )
            for j in range(N_FEATURES)
        ]
        history.append(
            {
                "iter": it,
                "w": list(w),
                "loss_micro": int(row["lp"])
                + rdiv_py(cwm * int(row["ln_"]), SCALE),
                "n": n,
                "npos": npos,
                "nneg": nneg,
                "cwm": cwm,
            }
        )
    return history


def keep_expr_for(wrefs: list[str], op: str) -> str:
    """Boolean scoring expr (keep <=> p_mil >= 500) for either engine:
    the ONE definition of the clamp/sigmoid scoring chain, shared by
    the Spark literal-codegen path and the oracle's column-ref path so
    a sigmoid/clamp change cannot desynchronize them."""
    z = z_expr(wrefs, op)
    zc = f"least(greatest({z}, -{Z_CLAMP}), {Z_CLAMP})"
    dzh = f"({SCALE} + abs({zc}))"
    return f"(500 + {rdiv(f'({zc}) * 500', dzh, op)}) >= 500"


def score_keep_expr(w: list[int]) -> str:
    """Spark boolean expr: does the integer model keep this row of the
    feature frame?"""
    return keep_expr_for([str(wj) for wj in w], SPARK_DIV)


def o_distill_chain_sql(iters: int = DISTILL_ITERS) -> str:
    """DuckDB CTE chain replaying the identical all-integer fit: feat
    projection, then per iteration one exact-integer aggregate + one
    integer weight-update row. Ends with CTEs w0..w{iters} (w{t}
    carries the updated micro-unit weights plus that iteration's
    pre-update loss_micro and n)."""
    from bigdatasmallprice_spark.functions.texts import (
        STOPWORDS_EN,
        o_n_tokens,
        o_n_unique_tokens,
        o_stopword_hits,
    )

    op = DUCK_DIV
    nt = o_n_tokens("text")
    nu = o_n_unique_tokens("text")
    sh = o_stopword_hits("text", STOPWORDS_EN)
    parts = [
        f"""f0 AS (
  SELECT doc_id, source, {nt} AS n_tok, {nu} AS n_uniq, {sh} AS sh
  FROM documents
),
f1 AS (
  SELECT source, {TRAIN_PRED} AS train,
         {X1M_EXPR} AS x1m, {x2m_expr(op)} AS x2m, {x3m_expr(op)} AS x3m,
         {YM_EXPR} AS ym
  FROM f0
),
feat AS MATERIALIZED (
  -- MATERIALIZED: referenced by every iteration CTE; inlining would
  -- re-scan the parquet per reference (DuckDB runs out of file
  -- handles at 16 iterations). Mirrors the Spark side's persist().
  SELECT source, train, x1m, x2m, x3m, {X4M_EXPR} AS x4m, ym FROM f1
),
cls AS (
  SELECT CAST(SUM(CASE WHEN ym = 1000 THEN 1 ELSE 0 END) AS BIGINT) AS npos,
         CAST(SUM(CASE WHEN ym = 0 THEN 1 ELSE 0 END) AS BIGINT) AS nneg
  FROM feat WHERE train
),
cw0 AS MATERIALIZED (SELECT {cwm_expr("npos", "nneg", op)} AS cwm FROM cls),
w0 AS MATERIALIZED (
  SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
         CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3,
         CAST(0 AS BIGINT) AS w4
)"""
    ]
    wrefs = [f"w{{t}}.w{j}" for j in range(N_FEATURES)]
    for t in range(1, iters + 1):
        z = z_expr([w.format(t=t - 1) for w in wrefs], op)
        gsums = ",\n         ".join(grad_sums(op))
        # update outputs get fresh names (nw*) then re-alias in a
        # wrapper CTE: aliasing the result back to w* in the same
        # SELECT would collide with the input columns under lateral
        # alias resolution. w{t-1} also carries loss_micro/n from its
        # own round, so the joined references are table-qualified.
        upd = ",\n         ".join(
            f"w{t - 1}.w{j} - {step_expr(j, 'cwm', op, n=f'g{t}.n')} AS nw{j}"
            for j in range(N_FEATURES)
        )
        parts.append(f"""r{t} AS (
  SELECT x1m, x2m, x3m, x4m, ym, {z} AS z FROM feat, w{t - 1} WHERE train
),
s{t} AS (SELECT x1m, x2m, x3m, x4m, ym, {ZC_EXPR} AS zc FROM r{t}),
p{t} AS (
  SELECT x1m, x2m, x3m, x4m, ym,
         {pm_expr(op)} AS pm, {dzsq_expr(op)} AS dzsq
  FROM s{t}
),
e{t} AS (
  SELECT x1m, x2m, x3m, x4m, ym, dzsq, (pm - ym) AS em FROM p{t}
),
g{t} AS (
  SELECT {gsums}
  FROM e{t}
),
u{t} AS (
  SELECT {upd},
         {loss_expr("cwm", op)} AS loss_micro, g{t}.n AS n
  FROM g{t}, w{t - 1}, cw0
),
w{t} AS MATERIALIZED (
  -- MATERIALIZED: each w CTE is referenced twice (next round's z and
  -- its update); inlining doubles the plan per iteration -> 2^T blowup
  SELECT nw0 AS w0, nw1 AS w1, nw2 AS w2, nw3 AS w3, nw4 AS w4,
         loss_micro, n
  FROM u{t}
)""")
    return ",\n".join(parts)


def o_score_keep_expr(t: int = DISTILL_ITERS) -> str:
    """DuckDB boolean expr scoring the feat frame against w{t}'s
    columns (join feat, w{t} first)."""
    return keep_expr_for([f"w{j}" for j in range(N_FEATURES)], DUCK_DIV)
