"""Remaining §2 coverage: distribution stats (A9), median imputation
(F12), by-name union (U2), and Arrow-vectorized model scoring (D3)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from bigdatasmallprice_spark.queries.core import cents, events, o_cents
from bigdatasmallprice_spark.registry import register


@register(
    "value_distribution",
    f"""
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM({o_cents('value')}) AS BIGINT) AS sum_c,
         CAST(SUM({o_cents('value')} * {o_cents('value')}) AS BIGINT) AS sumsq_c,
         MIN(value) AS min_value,
         MAX(value) AS max_value
  FROM events GROUP BY 1
)
SELECT event_type, n, min_value, max_value,
       CAST(sum_c AS DOUBLE) / (100.0 * n) AS mean_value,
       sqrt((CAST(sumsq_c AS DOUBLE) - CAST(sum_c AS DOUBLE) * sum_c / n) / (n - 1)) / 100.0 AS stddev_value
FROM s
""",
    doc="Distribution stats (A9, inspect_api.py:48-60): count/min/max/"
    "mean/sample-stddev per key. Variance from exact integer sums of "
    "cents and squared cents — order-independent, unlike naive float "
    "accumulation.",
    tags=("agg", "stats"),
)
def value_distribution_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    c = cents(F.col("value"))
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(c).alias("sum_c"),
        F.sum(c * c).alias("sumsq_c"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )
    return s.select(
        "event_type",
        "n",
        "min_value",
        "max_value",
        (F.col("sum_c").cast("double") / (F.lit(100.0) * F.col("n"))).alias("mean_value"),
        (
            F.sqrt(
                (F.col("sumsq_c").cast("double") - F.col("sum_c").cast("double") * F.col("sum_c") / F.col("n"))
                / (F.col("n") - 1)
            )
            / 100.0
        ).alias("stddev_value"),
    )


@register(
    "median_impute",
    """
WITH masked AS (
  SELECT event_type, CASE WHEN value > 90 THEN NULL ELSE value END AS v
  FROM events
)
SELECT event_type,
       CAST(COALESCE(SUM(CASE WHEN v IS NULL THEN 1 END), 0) AS BIGINT) AS n_missing,
       round(quantile_cont(v, 0.5), 6) AS median_fill
FROM masked GROUP BY 1
""",
    doc="Median imputation strategy (F12, train.py:46/predict.py:66): "
    "missing values (simulated by masking value>90) fill with the "
    "column median — interpolated percentile, identical in both engines.",
    tags=("agg", "stats"),
)
def median_impute_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    v = F.when(F.col("value") > 90, F.lit(None)).otherwise(F.col("value"))
    return ev.select("event_type", v.alias("v")).groupBy("event_type").agg(
        F.coalesce(F.sum(F.when(F.col("v").isNull(), F.lit(1))), F.lit(0))
        .cast("long")
        .alias("n_missing"),
        F.round(F.expr("percentile(v, 0.5)"), 6).alias("median_fill"),
    )


@register(
    "union_by_name",
    f"""
WITH a AS (
  SELECT event_type AS kind, value, 'hi' AS band FROM events WHERE value > 50
),
b AS (
  SELECT 'lo' AS band, value, event_type AS kind FROM events WHERE value <= 50
),
u AS (
  SELECT kind, value, band FROM a
  UNION ALL
  SELECT kind, value, band FROM b
)
SELECT kind, band, COUNT(*) AS n,
       CAST(SUM({o_cents('value')}) AS DOUBLE) / 100.0 AS value_sum
FROM u GROUP BY 1, 2
""",
    doc="Union of differently-ordered projections by column NAME (U2, "
    "the EKZ two-response combine, ekz_collector.py:53-71): "
    "unionByName, not positional union.",
    tags=("union", "agg"),
)
def union_by_name_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    a = ev.filter(F.col("value") > 50).select(
        F.col("event_type").alias("kind"), F.col("value"), F.lit("hi").alias("band")
    )
    b = ev.filter(F.col("value") <= 50).select(
        F.lit("lo").alias("band"), F.col("value"), F.col("event_type").alias("kind")
    )
    u = a.unionByName(b)
    return u.groupBy("kind", "band").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(cents(F.col("value"))).cast("double") / 100.0).alias("value_sum"),
    )


# D3 — model scoring as an Arrow-vectorized pandas_udf. The "model" is a
# fixed linear form so the oracle can replay it in SQL; the execution
# path (Arrow batch in -> numpy math -> Arrow batch out) is exactly how
# a joblib-loaded regressor scores at scale (predict.py:60-88).
_W = {"price_lag_1h": 2.0, "clicks": 0.5, "net_pos": 0.01}
_B = 10.0


def _make_linear_score():
    # Built lazily: decorating with a DDL-string return type parses it
    # through the active SparkSession, which doesn't exist at import time.
    @pandas_udf("double")
    def _linear_score(
        price_lag_1h: pd.Series, clicks: pd.Series, net_pos: pd.Series
    ) -> pd.Series:
        return (
            _W["price_lag_1h"] * price_lag_1h
            + _W["clicks"] * clicks.astype("float64")
            + _W["net_pos"] * net_pos
            + _B
        )

    return _linear_score


def _flagship_oracle() -> str:
    from bigdatasmallprice_spark.queries.timeseries import _FLAGSHIP_ORACLE

    return _FLAGSHIP_ORACLE


@register(
    "model_score",
    None,  # oracle attached below after import-order-safe construction
    doc="Batch model scoring via Arrow-vectorized pandas_udf (D3, "
    "predict.py:60-88): feature frame -> per-row prediction; linear "
    "stand-in model so the SQL oracle can verify the pipeline.",
    tags=("ml", "udf"),
)
def model_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.queries.timeseries import training_features

    base = training_features(spark, sf_dir)
    linear_score = _make_linear_score()
    scored = base.filter(
        F.col("price_lag_1h").isNotNull() & F.col("clicks").isNotNull() & F.col("net_pos").isNotNull()
    ).select(
        "t",
        F.round(
            linear_score(F.col("price_lag_1h"), F.col("clicks"), F.col("net_pos")), 6
        ).alias("score"),
    )
    return scored


def _attach_model_score_oracle() -> None:
    from bigdatasmallprice_spark.queries.timeseries import _FLAGSHIP_ORACLE
    from bigdatasmallprice_spark.registry import _REGISTRY

    _REGISTRY["model_score"].oracle = f"""
WITH base AS ({_FLAGSHIP_ORACLE})
SELECT t,
       round({_W['price_lag_1h']} * price_lag_1h
             + {_W['clicks']} * CAST(clicks AS DOUBLE)
             + {_W['net_pos']} * net_pos + {_B}, 6) AS score
FROM base
WHERE price_lag_1h IS NOT NULL AND clicks IS NOT NULL AND net_pos IS NOT NULL
"""


_attach_model_score_oracle()


# deterministic LCG-hash sampling: the 100 TB-scale substitute for
# rand()-based sampling — reproducible across engines, partitionings,
# and reruns, and pushable into any engine as plain arithmetic
_SAMPLE_A = 48271
_SAMPLE_B = 11
_SAMPLE_P = 1_000_000_007
_SAMPLE_PCT = 10  # keep ~10%


@register(
    "hash_sample_summary",
    f"""
SELECT event_type,
       COUNT(*) AS n_total,
       CAST(COALESCE(SUM(CASE WHEN (event_id * {_SAMPLE_A} + {_SAMPLE_B}) % {_SAMPLE_P}
                                   < {_SAMPLE_P} // {_SAMPLE_PCT} THEN 1 END), 0) AS BIGINT) AS n_sampled,
       CAST(COALESCE(SUM(CASE WHEN (event_id * {_SAMPLE_A} + {_SAMPLE_B}) % {_SAMPLE_P}
                                   < {_SAMPLE_P} // {_SAMPLE_PCT} THEN {o_cents('value')} END), 0) AS DOUBLE) / 100.0 AS value_sum_sampled
FROM events
GROUP BY 1
""",
    doc="Deterministic ~10% sample via keyed LCG hash predicate "
    "((id*a+b) mod p < p/10): reproducible across engines/partitions/"
    "reruns, unlike rand() — the sampling primitive for corpus "
    "subsetting and split assignment at scale. Summarized per type.",
    tags=("sample", "agg"),
)
def hash_sample_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    sampled = ((F.col("event_id") * _SAMPLE_A + _SAMPLE_B) % _SAMPLE_P) < (
        _SAMPLE_P // _SAMPLE_PCT
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.coalesce(F.sum(F.when(sampled, F.lit(1))), F.lit(0)).cast("long").alias("n_sampled"),
        (
            F.coalesce(F.sum(F.when(sampled, cents(F.col("value")))), F.lit(0)).cast("double")
            / 100.0
        ).alias("value_sum_sampled"),
    )


@register(
    "value_trend_regression",
    f"""
WITH s AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(EXTRACT(hour FROM ts)) AS BIGINT) AS sx,
         CAST(SUM(EXTRACT(hour FROM ts) * EXTRACT(hour FROM ts)) AS BIGINT) AS sxx,
         CAST(SUM({o_cents('value')}) AS BIGINT) AS sy,
         CAST(SUM(EXTRACT(hour FROM ts) * {o_cents('value')}) AS BIGINT) AS sxy
  FROM events GROUP BY 1
)
SELECT event_type, n,
       round(CAST(n * sxy - sx * sy AS DOUBLE) / (100.0 * (n * sxx - sx * sx)), 6) AS slope,
       round((CAST(sy AS DOUBLE) / 100.0 - (CAST(n * sxy - sx * sy AS DOUBLE) / (100.0 * (n * sxx - sx * sx))) * sx) / n, 6) AS intercept
FROM s
""",
    doc="Least-squares trend per key (value vs hour-of-day): slope and "
    "intercept from EXACT integer moment sums (n, Sx, Sxx, Sy, Sxy in "
    "hours x cents) — the regression aggregates pattern without "
    "regr_slope's engine-specific float accumulation. One shuffle, "
    "map-side partials, order-independent.",
    tags=("ml", "agg", "stats"),
)
def value_trend_regression_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    x = F.hour(F.col("ts")).cast("long")
    y = cents(F.col("value"))
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.lit(100.0) * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    slope = num / den
    intercept = (F.col("sy").cast("double") / 100.0 - slope * F.col("sx")) / F.col("n")
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


# per-stratum keep rates (percent): downsample the over-represented
# interaction classes, keep all of the rare ones — class rebalancing
_STRATA_PCT = {"view": 10, "click": 20, "purchase": 100, "signup": 100, "error": 50}


def _o_strata_threshold() -> str:
    cases = " ".join(
        f"WHEN event_type = '{k}' THEN {_SAMPLE_P // 100 * v}"
        for k, v in sorted(_STRATA_PCT.items())
    )
    return f"CASE {cases} ELSE 0 END"


@register(
    "stratified_sample_summary",
    f"""
SELECT event_type,
       COUNT(*) AS n_total,
       CAST(COALESCE(SUM(CASE WHEN (event_id * {_SAMPLE_A} + {_SAMPLE_B}) % {_SAMPLE_P}
                                   < {_o_strata_threshold()} THEN 1 END), 0) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN (event_id * {_SAMPLE_A} + {_SAMPLE_B}) % {_SAMPLE_P}
                                   < {_o_strata_threshold()} THEN {o_cents('value')} END), 0) AS DOUBLE) / 100.0 AS value_kept
FROM events
GROUP BY 1
""",
    doc="Stratified deterministic sampling: per-class keep rates (view "
    "10%, click 20%, error 50%, purchase/signup 100%) applied through "
    "the same keyed LCG hash — class rebalancing for training-data "
    "curation. A pure per-row predicate: no shuffle, no rand(), "
    "identical sample membership on any engine or partitioning.",
    tags=("sample", "agg"),
)
def stratified_sample_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    h = (F.col("event_id") * _SAMPLE_A + _SAMPLE_B) % _SAMPLE_P
    thr = F.lit(0)
    for k, v in sorted(_STRATA_PCT.items()):
        thr = F.when(F.col("event_type") == k, F.lit(_SAMPLE_P // 100 * v)).otherwise(thr)
    kept = h < thr
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.coalesce(F.sum(F.when(kept, F.lit(1))), F.lit(0)).cast("long").alias("n_kept"),
        (
            F.coalesce(F.sum(F.when(kept, cents(F.col("value")))), F.lit(0)).cast("double")
            / 100.0
        ).alias("value_kept"),
    )


_QS = (0.25, 0.5, 0.75, 0.95)


@register(
    "value_quantiles_by_type",
    f"""
SELECT event_type,
       {", ".join(f"round(quantile_cont({o_cents('value')}, {q}) / 100.0, 6) AS p{int(q*100)}" for q in _QS)}
FROM events
GROUP BY 1
""",
    doc="Exact per-group quantiles (p25/p50/p75/p95) of the value "
    "distribution, computed over integer cents so both engines "
    "interpolate between identical integers (float inputs would make "
    "the sort ties engine-dependent). Exact quantiles shuffle the full "
    "group; the approx_percentile variant (bounds-tested in "
    "tests/test_operators.py) is the 100 TB substitute.",
    tags=("agg", "stats"),
)
def value_quantiles_by_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    pct = F.percentile(cents(F.col("value")), F.lit(list(_QS)))
    cols = [
        F.round(F.element_at(pct, i + 1) / 100.0, 6).alias(f"p{int(q * 100)}")
        for i, q in enumerate(_QS)
    ]
    return ev.groupBy("event_type").agg(*cols)


@register(
    "value_deciles",
    f"""
WITH t AS (
  SELECT event_type, {o_cents('value')} AS vc, event_id,
         ntile(10) OVER (ORDER BY {o_cents('value')}, event_id) AS decile
  FROM events
)
SELECT decile,
       COUNT(*) AS n,
       CAST(MIN(vc) AS DOUBLE) / 100.0 AS lo,
       CAST(MAX(vc) AS DOUBLE) / 100.0 AS hi,
       CAST(SUM(vc) AS DOUBLE) / 100.0 AS value_sum
FROM t GROUP BY 1
""",
    doc="Decile assignment via ntile(10) over a total order (cents, "
    "event_id tie-break — float ordering with duplicate values would "
    "be engine-dependent): equal-count value buckets with per-bucket "
    "range and mass. The calibration/binning primitive. ntile is "
    "computed WITHOUT a global sort: the banded two-phase rank "
    "(operators/topk.py::banded_global_rank, cents band + event_id "
    "tie) plus the closed-form bucket function of (rank, N) — "
    "bit-identical to engine ntile, corpus never sorts in one "
    "partition. approx_percentile cut points remain the sketch "
    "alternative (bounds-tested in tests/test_operators.py).",
    tags=("window", "agg", "stats"),
)
def value_deciles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.topk import banded_global_rank

    ev = events(spark, sf_dir)
    vc = cents(F.col("value"))
    # ntile(10) WITHOUT the global sort: the banded two-phase rank
    # (cents band ASC, event_id tie) gives the global 1-based rank,
    # and ntile is a closed-form function of (rank, N): the first
    # N%10 buckets hold ceil(N/10) rows, the rest floor(N/10) — the
    # SQL-standard semantics both engines already agree on (this
    # query has hash-matched DuckDB's ntile since r2).
    r = banded_global_rank(
        ev.select(vc.alias("vc"), "event_id"), "vc", "event_id",
        band_desc=False,
    )
    n_tot = r.agg(F.count(F.lit(1)).cast("long").alias("n_tot"))
    t = r.crossJoin(F.broadcast(n_tot)).selectExpr(
        "vc",
        """CAST(CASE
             WHEN rn <= (n_tot % 10) * (n_tot DIV 10 + 1)
             THEN (rn - 1) DIV (n_tot DIV 10 + 1) + 1
             ELSE (n_tot % 10)
                  + (rn - (n_tot % 10) * (n_tot DIV 10 + 1) - 1)
                    DIV (n_tot DIV 10) + 1
           END AS INT) AS decile""",
    )
    return t.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        (F.min("vc").cast("double") / 100.0).alias("lo"),
        (F.max("vc").cast("double") / 100.0).alias("hi"),
        (F.sum("vc").cast("double") / 100.0).alias("value_sum"),
    )


# argmax packing: BIGINT composite (vc * 1e10 + event_id) makes the
# argmax total-ordered and engine-independent — max_by/arg_max leave
# ties implementation-defined, a composite integer does not.
# Safe while vc < 9e8 cents and event_id < 1e10 (documented bound).
_PACK = 10_000_000_000


@register(
    "argmax_event_per_type",
    f"""
WITH p AS (
  SELECT event_type,
         MAX({o_cents('value')} * {_PACK} + event_id) AS packed
  FROM events GROUP BY 1
)
SELECT event_type,
       CAST(packed // {_PACK} AS DOUBLE) / 100.0 AS max_value,
       CAST(packed % {_PACK} AS BIGINT) AS argmax_event_id
FROM p
""",
    doc="Deterministic argmax (which row attains the group max): pack "
    "(value_cents, event_id) into one BIGINT so MAX resolves ties by "
    "id instead of engine whim — max_by/arg_max tie-breaking is "
    "implementation-defined in both engines. One map-side-combinable "
    "aggregate; unpack at the end. The pattern generalizes to any "
    "bounded (score, id) argmax at 100 TB.",
    tags=("agg",),
)
def argmax_event_per_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    packed = F.max(cents(F.col("value")) * _PACK + F.col("event_id")).alias("packed")
    return (
        ev.groupBy("event_type")
        .agg(packed)
        .select(
            "event_type",
            # integer `div` stays exact on longs; `/` promotes to double and
            # is lossy above 2^53 while packed reaches ~9e18 in-bound
            (F.expr(f"packed div {_PACK}").cast("double") / 100.0).alias("max_value"),
            (F.col("packed") % _PACK).cast("long").alias("argmax_event_id"),
        )
    )


# ---------------------------------------------------------------------------
# engine-side training (D5 slice): closed-form linear fit + MAPE gate
# ---------------------------------------------------------------------------

from bigdatasmallprice_spark.operators.linreg import (  # noqa: E402
    APE_MICRO,
    B0C,
    B1C,
    B2C,
    MAPE_GATE_PCT,
    MAPE_MASK_CENTS,
    fit_linear_hour_dow,
    mape_gate,
)

_O_X1 = "EXTRACT(hour FROM ts)"
_O_X2 = "(EXTRACT(dow FROM ts) + 1)"  # DuckDB dow is 0=Sun; Spark dayofweek is 1=Sun
_O_MAPE = "round(CAST(g.sum_micro AS DOUBLE) / (10000.0 * g.n_scored), 6)"


@register(
    "train_linear_model",
    f"""
WITH m AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM({_O_X1}) AS BIGINT) AS s1,
         CAST(SUM({_O_X2}) AS BIGINT) AS s2,
         CAST(SUM({_O_X1} * {_O_X1}) AS BIGINT) AS s11,
         CAST(SUM({_O_X1} * {_O_X2}) AS BIGINT) AS s12,
         CAST(SUM({_O_X2} * {_O_X2}) AS BIGINT) AS s22,
         CAST(SUM({o_cents('value')}) AS BIGINT) AS sy,
         CAST(SUM({_O_X1} * {o_cents('value')}) AS BIGINT) AS s1y,
         CAST(SUM({_O_X2} * {o_cents('value')}) AS BIGINT) AS s2y
  FROM events GROUP BY 1
), md AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
         CAST(s11 AS DOUBLE) AS s11d, CAST(s12 AS DOUBLE) AS s12d, CAST(s22 AS DOUBLE) AS s22d,
         CAST(sy AS DOUBLE) AS syd, CAST(s1y AS DOUBLE) AS s1yd, CAST(s2y AS DOUBLE) AS s2yd
  FROM m
), c AS (
  SELECT event_type, n, {B0C} AS b0c, {B1C} AS b1c, {B2C} AS b2c FROM md
), scored AS (
  SELECT e.event_type,
         {o_cents('e.value')} AS yc,
         c.b0c + c.b1c * EXTRACT(hour FROM e.ts) + c.b2c * (EXTRACT(dow FROM e.ts) + 1) AS pred_c
  FROM events e JOIN c ON e.event_type = c.event_type
), g AS (
  SELECT event_type,
         SUM(CASE WHEN abs(yc) >= {MAPE_MASK_CENTS} THEN {APE_MICRO} END) AS sum_micro,
         CAST(COALESCE(SUM(CASE WHEN abs(yc) >= {MAPE_MASK_CENTS} THEN 1 END), 0) AS BIGINT) AS n_scored
  FROM scored GROUP BY 1
)
SELECT c.event_type, c.n,
       round(c.b0c / 100.0, 6) AS b_intercept,
       round(c.b1c / 100.0, 6) AS b_hour,
       round(c.b2c / 100.0, 6) AS b_dow,
       CASE WHEN g.n_scored > 0 THEN {_O_MAPE} END AS mape_pct,
       g.n_scored,
       CASE WHEN g.n_scored > 0 THEN {_O_MAPE} < {MAPE_GATE_PCT} END AS gate_pass
FROM c JOIN g ON c.event_type = g.event_type
""",
    doc="Engine-side model training (reference train.py:124-165) + the "
    "MAPE<8% quality gate (evaluate.py:126-145): per-key multivariate "
    "linear fit  value ~ intercept + hour + dow  solved in closed form "
    "from exact integer moment sums (one shuffle, map-side partials, no "
    "collect, no iteration — trains unchanged over 100 TB), then the "
    "masked MAPE computed from per-row integer micro-units so the gate "
    "is order-independent. Cramer formulas are shared verbatim with the "
    "oracle (operators/linreg.py) for bit-identical float results.",
    tags=("ml", "agg", "train"),
)
def train_linear_model_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    coef = fit_linear_hour_dow(ev, "event_type")
    gate = mape_gate(ev, coef, "event_type")
    return coef.join(gate, "event_type").select(
        "event_type",
        "n",
        F.round(F.col("b0c") / 100.0, 6).alias("b_intercept"),
        F.round(F.col("b1c") / 100.0, 6).alias("b_hour"),
        F.round(F.col("b2c") / 100.0, 6).alias("b_dow"),
        "mape_pct",
        "n_scored",
        "gate_pass",
    )


@register(
    "password_hash_audit",
    """
SELECT c_custkey,
       sha256('pw-' || CAST(c_custkey AS VARCHAR)) AS pw_hash,
       CAST(length(sha256('pw-' || CAST(c_custkey AS VARCHAR))) AS BIGINT) AS hash_len
FROM customer
WHERE c_custkey % 20 = 0
""",
    doc="F14 auth surface engine-side (reference main.py:169-204 "
    "_hash_pw): bulk SHA-256 credential hashing as a pure-codegen "
    "column op (F.sha2 — no Python in the plan), audited row-by-row "
    "against DuckDB's independent sha256(). JWT mint/verify (HS256, "
    "keyed HMAC that neither engine has as a builtin) lives in "
    "functions/auth.py as Arrow-batched pandas UDFs with round-trip + "
    "tamper + expiry tests (tests/test_export_serving.py).",
    tags=("auth", "functions"),
)
def password_hash_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.functions.auth import hash_password
    from bigdatasmallprice_spark.queries.core import table

    cust = table(spark, sf_dir, "customer")
    return cust.where(F.col("c_custkey") % 20 == 0).select(
        "c_custkey",
        hash_password(F.concat(F.lit("pw-"), F.col("c_custkey").cast("string"))).alias(
            "pw_hash"
        ),
        F.length(
            hash_password(F.concat(F.lit("pw-"), F.col("c_custkey").cast("string")))
        ).cast("long").alias("hash_len"),
    )


_MAD_SIGMA = 1.4826  # normal-consistency constant
_MAD_CUT = 3.0


@register(
    "robust_outliers_mad",
    f"""
WITH v AS (
  SELECT event_type, {o_cents('value')} AS vc FROM events
),
med AS (
  SELECT event_type, quantile_cont(vc, 0.5) AS med_c FROM v GROUP BY 1
),
dev AS (
  SELECT v.event_type, v.vc, med.med_c, abs(v.vc - med.med_c) AS ad
  FROM v JOIN med USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(ad, 0.5) AS mad_c FROM dev GROUP BY 1
)
SELECT d.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(MAX(d.med_c) / 100.0, 6) AS median_value,
       round(MAX(m.mad_c) / 100.0, 6) AS mad_value,
       CAST(COALESCE(SUM(CASE WHEN m.mad_c > 0
                 AND d.ad > {_MAD_CUT} * {_MAD_SIGMA} * m.mad_c
                 THEN 1 END), 0) AS BIGINT) AS n_outliers,
       round(MAX(d.ad) / 100.0, 6) AS max_abs_dev
FROM dev d JOIN mad m USING (event_type)
GROUP BY 1
""",
    doc="Robust outlier detection per event type: median / MAD robust "
    "z-score (|x - med| > 3 * 1.4826 * MAD) — the data-cleaning "
    "primitive that, unlike mean/stddev, is not dragged by the "
    "outliers it hunts. Both quantiles interpolate over integer cents "
    "(then deviations are identical doubles), so the flag is exact "
    "cross-engine. Two grouped exact quantiles + broadcast join-backs; "
    "at 100 TB the substitute is approx_percentile cut points, same "
    "shape as the decile path.",
    tags=("stats", "agg", "quality"),
)
def robust_outliers_mad_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    v = ev.select("event_type", cents(F.col("value")).alias("vc"))
    med = v.groupBy("event_type").agg(
        F.percentile(F.col("vc"), F.lit(0.5)).alias("med_c")
    )
    dev = v.join(F.broadcast(med), "event_type").withColumn(
        "ad", F.abs(F.col("vc") - F.col("med_c"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("ad"), F.lit(0.5)).alias("mad_c")
    )
    out = F.when(
        (F.col("mad_c") > 0)
        & (F.col("ad") > _MAD_CUT * _MAD_SIGMA * F.col("mad_c")),
        1,
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.max("med_c") / 100.0, 6).alias("median_value"),
            F.round(F.max("mad_c") / 100.0, 6).alias("mad_value"),
            F.coalesce(F.sum(out), F.lit(0)).cast("long").alias("n_outliers"),
            F.round(F.max("ad") / 100.0, 6).alias("max_abs_dev"),
        )
    )


@register(
    "spend_concentration_gini",
    f"""
WITH v AS (
  SELECT event_type, {o_cents('value')} AS vc, event_id
  FROM events WHERE value >= 0
),
r AS (
  SELECT event_type, vc,
         row_number() OVER (
           PARTITION BY event_type ORDER BY vc, event_id
         ) AS rnk
  FROM v
),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(vc) AS BIGINT) AS total_c,
         CAST(SUM(rnk * vc) AS BIGINT) AS rank_mass
  FROM r GROUP BY 1
)
SELECT event_type, n,
       round(total_c / 100.0, 6) AS total_value,
       CASE WHEN total_c > 0 THEN
         round((2.0 * rank_mass) / (CAST(n AS DOUBLE) * total_c)
               - (CAST(n AS DOUBLE) + 1) / n, 6)
       END AS gini
FROM g
""",
    doc="Spend-concentration Gini per event type — the imbalance audit "
    "for mixture/domain weighting (a Gini near 1 means a handful of "
    "rows carry the mass). Exact-integer formulation of the "
    "rank-weighted identity G = 2*sum(i*x_(i))/(n*sum(x)) - (n+1)/n "
    "over a TOTAL order (cents, event_id tie-break): every aggregate "
    "is an int64 sum (rank_mass bounded by n_type^2 * max_cents — "
    "safe through sf1; beyond that, promote to decimal), the two "
    "divisions at the end are identical IEEE ops. Per-group ranking "
    "shuffles once; at 100 TB the same identity runs on "
    "approx-percentile bucket midpoints.",
    tags=("stats", "agg", "quality"),
)
def spend_concentration_gini_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events(spark, sf_dir)
    v = ev.filter(F.col("value") >= 0).select(
        "event_type", cents(F.col("value")).alias("vc"), "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("vc", "event_id")
    r = v.withColumn("rnk", F.row_number().over(w))
    g = r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("vc").cast("long").alias("total_c"),
        F.sum(F.col("rnk") * F.col("vc")).cast("long").alias("rank_mass"),
    )
    gini = F.when(
        F.col("total_c") > 0,
        F.round(
            (2.0 * F.col("rank_mass")) / (F.col("n").cast("double") * F.col("total_c"))
            - (F.col("n").cast("double") + 1) / F.col("n"),
            6,
        ),
    )
    return g.select(
        "event_type",
        "n",
        F.round(F.col("total_c") / 100.0, 6).alias("total_value"),
        gini.alias("gini"),
    )


# ---------------------------------------------------------------------------
# engine-side training (D5 completion): histogram gradient-boosted trees
# ---------------------------------------------------------------------------

_GBT_ROUNDS = 3
_GBT_VAL_DAYS = 9


def _o_gbt_gain(n_l: str, s_l: str, n_t: str, s_t: str) -> str:
    """Variance-reduction gain over exact-int candidate sums — the SAME
    IEEE expression tree as operators/gbt.py::_best_split (cast each
    exact int to double, then multiply/divide left-to-right)."""
    return (
        f"((CAST({s_l} AS DOUBLE) * CAST({s_l} AS DOUBLE)) / CAST({n_l} AS DOUBLE)"
        f" + (CAST({s_t} - {s_l} AS DOUBLE) * CAST({s_t} - {s_l} AS DOUBLE))"
        f" / CAST({n_t} - {n_l} AS DOUBLE))"
    )


def _o_gbt_sql(rounds: int, val_days: int) -> str:
    """Unrolled boosting rounds as a DuckDB CTE chain mirroring
    operators/gbt.py exactly: per-round greedy depth-2 tree over the
    (hour, dow) train histogram, floor'd integer leaf values with
    lr=0.5, integer-exact per-round train/val MAE."""
    gain = _o_gbt_gain("n_l", "s_l", "n_t", "s_t")
    fv = "(CASE WHEN cd.f = 0 THEN c.h ELSE c.d END)"
    parts = [
        f"""
WITH rows0 AS MATERIALIZED (
  SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS h,
         CAST(EXTRACT(dow FROM ts) + 1 AS BIGINT) AS d,
         {o_cents('value')} AS y,
         CAST(ts AS DATE) <= (SELECT MAX(CAST(ts AS DATE)) - {val_days} FROM events) AS is_train
  FROM events
), cells AS MATERIALIZED (
  SELECT h, d, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s
  FROM rows0 WHERE is_train GROUP BY 1, 2
), cands AS MATERIALIZED (
  SELECT 0 AS f, CAST(range AS BIGINT) AS t FROM range(1, 24)
  UNION ALL
  SELECT 1 AS f, CAST(range AS BIGINT) AS t FROM range(2, 8)
), pm0 AS MATERIALIZED (
  SELECT CAST(hh.range AS BIGINT) AS h, CAST(dd.range AS BIGINT) AS d,
         (SELECT CAST(floor(CAST(SUM(s) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)) AS BIGINT) FROM cells) AS pred
  FROM range(0, 24) hh, range(1, 8) dd
)"""
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""", c{r} AS MATERIALIZED (
  SELECT c.h, c.d, c.n, c.s - c.n * p.pred AS rs
  FROM cells c JOIN pm{p} p ON c.h = p.h AND c.d = p.d
), rstat{r} AS MATERIALIZED (
  SELECT cd.f, cd.t,
         CAST(COALESCE(SUM(CASE WHEN {fv} < cd.t THEN c.n END), 0) AS BIGINT) AS n_l,
         CAST(COALESCE(SUM(CASE WHEN {fv} < cd.t THEN c.rs END), 0) AS BIGINT) AS s_l,
         CAST(SUM(c.n) AS BIGINT) AS n_t,
         CAST(SUM(c.rs) AS BIGINT) AS s_t
  FROM c{r} c CROSS JOIN cands cd GROUP BY 1, 2
), br{r} AS MATERIALIZED (
  SELECT f, t FROM rstat{r}
  WHERE n_l > 0 AND n_t - n_l > 0
  ORDER BY {gain} DESC, f, t LIMIT 1
), sc{r} AS MATERIALIZED (
  SELECT c.h, c.d, c.n, c.rs,
         CASE WHEN (CASE WHEN b.f = 0 THEN c.h ELSE c.d END) < b.t THEN 0 ELSE 1 END AS side
  FROM c{r} c CROSS JOIN br{r} b
), cstat{r} AS MATERIALIZED (
  SELECT c.side, cd.f, cd.t,
         CAST(COALESCE(SUM(CASE WHEN {fv} < cd.t THEN c.n END), 0) AS BIGINT) AS n_l,
         CAST(COALESCE(SUM(CASE WHEN {fv} < cd.t THEN c.rs END), 0) AS BIGINT) AS s_l,
         CAST(SUM(c.n) AS BIGINT) AS n_t,
         CAST(SUM(c.rs) AS BIGINT) AS s_t
  FROM sc{r} c CROSS JOIN cands cd GROUP BY 1, 2, 3
), bc{r} AS MATERIALIZED (
  SELECT side, f, t FROM (
    SELECT side, f, t,
           row_number() OVER (PARTITION BY side ORDER BY {gain} DESC, f, t) AS rn
    FROM cstat{r} WHERE n_l > 0 AND n_t - n_l > 0
  ) WHERE rn = 1
), lf{r} AS MATERIALIZED (
  SELECT s.h, s.d, s.n, s.rs,
         CAST(s.side * 2 + (CASE WHEN b.f IS NULL THEN 0
                       WHEN (CASE WHEN b.f = 0 THEN s.h ELSE s.d END) < b.t THEN 0
                       ELSE 1 END) AS BIGINT) AS leaf
  FROM sc{r} s LEFT JOIN bc{r} b ON s.side = b.side
), lv{r} AS MATERIALIZED (
  SELECT leaf, CAST(SUM(n) AS BIGINT) AS n_leaf,
         CAST(floor((0.5 * CAST(SUM(rs) AS DOUBLE)) / CAST(SUM(n) AS DOUBLE)) AS BIGINT) AS v
  FROM lf{r} GROUP BY 1
), pm{r} AS MATERIALIZED (
  SELECT q.h, q.d, q.pred + COALESCE(lv.v, 0) AS pred
  FROM (
    SELECT p.h, p.d, p.pred,
           CAST((CASE WHEN (CASE WHEN b.f = 0 THEN p.h ELSE p.d END) < b.t THEN 0 ELSE 1 END) * 2
           + (CASE WHEN bb.f IS NULL THEN 0
                   WHEN (CASE WHEN bb.f = 0 THEN p.h ELSE p.d END) < bb.t THEN 0
                   ELSE 1 END) AS BIGINT) AS leaf
    FROM pm{p} p CROSS JOIN br{r} b
    LEFT JOIN bc{r} bb
      ON bb.side = CASE WHEN (CASE WHEN b.f = 0 THEN p.h ELSE p.d END) < b.t THEN 0 ELSE 1 END
  ) q LEFT JOIN lv{r} lv ON lv.leaf = q.leaf
), err{r} AS MATERIALIZED (
  SELECT r0.is_train,
         CAST(SUM(ABS(r0.y - p.pred)) AS BIGINT) AS sa,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM rows0 r0 JOIN pm{r} p ON r0.h = p.h AND r0.d = p.d
  GROUP BY 1
), out{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS round, lv.leaf,
         CAST(b.f AS BIGINT) AS root_f, CAST(b.t AS BIGINT) AS root_t,
         CAST(COALESCE(bc.f, -1) AS BIGINT) AS child_f,
         CAST(COALESCE(bc.t, -1) AS BIGINT) AS child_t,
         lv.n_leaf, lv.v AS leaf_value_c,
         (SELECT CAST(floor(CAST(sa AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)
          FROM err{r} WHERE is_train) AS train_mae_c,
         (SELECT CAST(floor(CAST(sa AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)
          FROM err{r} WHERE NOT is_train) AS val_mae_c
  FROM lv{r} lv CROSS JOIN br{r} b
  LEFT JOIN bc{r} bc ON bc.side = lv.leaf // 2
)"""
        )
    parts.append(
        "\n"
        + "\nUNION ALL\n".join(f"SELECT * FROM out{r}" for r in range(1, rounds + 1))
    )
    return "".join(parts)


@register(
    "train_gbt_model",
    _o_gbt_sql(_GBT_ROUNDS, _GBT_VAL_DAYS),
    doc="Engine-side gradient-boosted trees (the reference's headline "
    "model, train.py:124-165): squared-error histogram boosting — "
    f"{_GBT_ROUNDS} rounds of depth-2 trees over (hour, dow), lr=0.5, "
    "rolling train/val split anchored at max(date), per-round loss "
    "history like train.py:312-318 (best round = val-MAE argmin, the "
    "early-stopping choice). The whole fit reads the corpus twice "
    "regardless of size: one 168-cell exact-int histogram groupBy, one "
    "broadcast-join MAE pass; split search runs on the model-sized "
    "histogram with deterministic gain/tie-break arithmetic shared "
    "op-for-op with the oracle (operators/gbt.py).",
    tags=("ml", "agg", "train", "iterative"),
)
def train_gbt_model_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.gbt import train_gbt

    ev = events(spark, sf_dir)
    return train_gbt(
        ev, n_rounds=_GBT_ROUNDS, val_days=_GBT_VAL_DAYS
    )


# ---------------------------------------------------------------------------
# generalized GBT (binned continuous features, depth 3, 10 rounds)
# ---------------------------------------------------------------------------

_GBTF_ROUNDS = 10
_GBTF_DEPTH = 3
_GBTF_LR = 0.2
_GBTF_VAL_DAYS = 9
_GBTF_BINS = 16


def _o_gbt_full_sql(
    rounds: int, depth: int, lr: float, val_days: int, n_bins: int
) -> str:
    """Unrolled general histogram-GBT as a DuckDB CTE chain mirroring
    operators/gbt.py::train_gbt_full op-for-op: hourly purchase-cents
    feature view (calendar + int lag/rolling-sum features), exact-rank
    quantile thresholds, per-round greedy depth-``depth`` trees via one
    (node, candidate) stats + argmax stage per level, floor'd integer
    leaf values with shrinkage, integer-exact per-round train/val MAE."""
    gain = _o_gbt_gain("n_l", "s_l", "n_t", "s_t")

    def fv(alias: str, fcol: str) -> str:
        return (
            f"(CASE {fcol} WHEN 0 THEN {alias}.x0 WHEN 1 THEN {alias}.x1 "
            f"WHEN 2 THEN {alias}.x2 WHEN 3 THEN {alias}.x3 ELSE {alias}.x4 END)"
        )

    thr_blocks = "\n    UNION ALL\n".join(
        f"""    SELECT {f} AS f, MIN(v) AS t
    FROM (SELECT v, SUM(c) OVER (ORDER BY v) AS cum
          FROM (SELECT x{f} AS v, COUNT(*) AS c FROM tr GROUP BY 1)) dv,
         (SELECT COUNT(*) AS n FROM tr) nn,
         range(1, {n_bins}) j
    WHERE dv.cum >= 1 + (j.range * nn.n) // {n_bins}
    GROUP BY j.range"""
        for f in (2, 3, 4)
    )
    xs = "x0, x1, x2, x3, x4"
    parts = [
        f"""
WITH hp AS MATERIALIZED (
  SELECT date_trunc('hour', ts) AS h, CAST(SUM({o_cents('value')}) AS BIGINT) AS pc
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
f0 AS (
  SELECT h, pc AS y,
         CAST(EXTRACT(hour FROM h) AS BIGINT) AS x0,
         CAST(EXTRACT(dow FROM h) + 1 AS BIGINT) AS x1,
         lag(pc, 1) OVER w AS x2,
         lag(pc, 24) OVER w AS x3,
         SUM(pc) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS x4
  FROM hp WINDOW w AS (ORDER BY h)
),
f1 AS MATERIALIZED (
  SELECT * FROM f0 WHERE x2 IS NOT NULL AND x3 IS NOT NULL AND x4 IS NOT NULL
),
rows0 AS MATERIALIZED (
  SELECT y, {xs},
         CAST(h AS DATE) <= (SELECT MAX(CAST(h AS DATE)) - {val_days} FROM f1) AS is_train
  FROM f1
),
tr AS MATERIALIZED (SELECT * FROM rows0 WHERE is_train),
thr AS MATERIALIZED (
  SELECT DISTINCT f, t FROM (
{thr_blocks}
  )
),
cands AS MATERIALIZED (
  SELECT CAST(0 AS BIGINT) AS f, CAST(range AS BIGINT) AS t FROM range(1, 24)
  UNION ALL SELECT CAST(1 AS BIGINT), CAST(range AS BIGINT) FROM range(2, 8)
  UNION ALL SELECT CAST(f AS BIGINT), CAST(t AS BIGINT) FROM thr
),
pm0 AS MATERIALIZED (
  SELECT y, {xs}, is_train,
         (SELECT CAST(floor(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) FROM tr) AS pred
  FROM rows0
)"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""", a{r}_0 AS MATERIALIZED (
  SELECT y, {xs}, is_train, pred, CAST(0 AS BIGINT) AS nd, y - pred AS rs
  FROM pm{r - 1}
)"""
        )
        for lv in range(depth):
            parts.append(
                f""", st{r}_{lv} AS MATERIALIZED (
  SELECT a.nd, cd.f, cd.t,
         CAST(COALESCE(SUM(CASE WHEN {fv('a', 'cd.f')} < cd.t THEN 1 END), 0) AS BIGINT) AS n_l,
         CAST(COALESCE(SUM(CASE WHEN {fv('a', 'cd.f')} < cd.t THEN a.rs END), 0) AS BIGINT) AS s_l,
         CAST(COUNT(*) AS BIGINT) AS n_t,
         CAST(SUM(a.rs) AS BIGINT) AS s_t
  FROM a{r}_{lv} a CROSS JOIN cands cd
  WHERE a.is_train
  GROUP BY 1, 2, 3
), bs{r}_{lv} AS MATERIALIZED (
  SELECT nd, f, t FROM (
    SELECT nd, f, t,
           row_number() OVER (PARTITION BY nd ORDER BY {gain} DESC, f, t) AS rn
    FROM st{r}_{lv} WHERE n_l > 0 AND n_t - n_l > 0
  ) WHERE rn = 1
), a{r}_{lv + 1} AS MATERIALIZED (
  SELECT a.y, a.x0, a.x1, a.x2, a.x3, a.x4, a.is_train, a.pred, a.rs,
         a.nd * 2 + (CASE WHEN b.f IS NULL THEN 0
                          WHEN {fv('a', 'b.f')} < b.t THEN 0 ELSE 1 END) AS nd
  FROM a{r}_{lv} a LEFT JOIN bs{r}_{lv} b ON a.nd = b.nd
)"""
            )
        path_joins = "\n".join(
            f"  LEFT JOIN bs{r}_{lv} p{lv} ON p{lv}.nd = lv.leaf // {1 << (depth - lv)}"
            for lv in range(depth)
        )
        path_cols = ",\n".join(
            f"         CAST(COALESCE(p{lv}.f, -1) AS BIGINT) AS l{lv + 1}_f,\n"
            f"         CAST(COALESCE(p{lv}.t, -1) AS BIGINT) AS l{lv + 1}_t"
            for lv in range(depth)
        )
        parts.append(
            f""", lv{r} AS MATERIALIZED (
  SELECT nd AS leaf, CAST(COUNT(*) AS BIGINT) AS n_leaf,
         CAST(floor(({lr} * CAST(SUM(rs) AS DOUBLE)) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS v
  FROM a{r}_{depth} WHERE is_train GROUP BY 1
), pm{r} AS MATERIALIZED (
  SELECT a.y, a.x0, a.x1, a.x2, a.x3, a.x4, a.is_train,
         a.pred + COALESCE(lv.v, 0) AS pred
  FROM a{r}_{depth} a LEFT JOIN lv{r} lv ON a.nd = lv.leaf
), err{r} AS MATERIALIZED (
  SELECT is_train, CAST(SUM(ABS(y - pred)) AS BIGINT) AS sa,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pm{r} GROUP BY 1
), out{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS round, lv.leaf,
{path_cols},
         lv.n_leaf, lv.v AS leaf_value_c,
         (SELECT CAST(floor(CAST(sa AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)
          FROM err{r} WHERE is_train) AS train_mae_c,
         (SELECT CAST(floor(CAST(sa AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)
          FROM err{r} WHERE NOT is_train) AS val_mae_c
  FROM lv{r} lv
{path_joins}
)"""
        )
    parts.append(
        "\n"
        + "\nUNION ALL\n".join(f"SELECT * FROM out{r}" for r in range(1, rounds + 1))
    )
    return "".join(parts)


@register(
    "train_gbt_full",
    _o_gbt_full_sql(_GBTF_ROUNDS, _GBTF_DEPTH, _GBTF_LR, _GBTF_VAL_DAYS, _GBTF_BINS),
    doc="Generalized engine-side gradient-boosted trees — the full "
    "reference model shape (train.py:124-165: many features, deeper "
    f"trees, many rounds): {_GBTF_ROUNDS} rounds of depth-{_GBTF_DEPTH} "
    "trees over (hour, dow, lag-1h, lag-24h, rolling-24h-sum) of the "
    f"hourly purchase-cents series, lr={_GBTF_LR}, continuous features "
    f"quantile-binned into {_GBTF_BINS} buckets via exact rank "
    "thresholds. This is the real histogram-GBT factorization (per-"
    "NODE per-feature bin histograms, one model-sized groupBy per tree "
    "level — NOT the joint-histogram shortcut of train_gbt_model, "
    "which only works while the joint feature space is 168 cells): at "
    "100 TB each level pass is an embarrassingly-parallel scan of the "
    "persisted featurized frame plus a <= nodes*features*bins-group "
    "shuffle, and the fit itself runs on collected model-sized "
    "histograms. Beats the linear baseline's val MAE on the same "
    "features (tests/test_gbt.py::test_gbt_full_beats_linear_val_mae) "
    "— the reference's XGB-beats-linear ordering.",
    tags=("ml", "agg", "train", "iterative"),
)
def train_gbt_full_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.gbt import train_gbt_full

    ev = events(spark, sf_dir)
    return train_gbt_full(
        ev,
        n_rounds=_GBTF_ROUNDS,
        depth=_GBTF_DEPTH,
        lr=_GBTF_LR,
        val_days=_GBTF_VAL_DAYS,
        n_bins=_GBTF_BINS,
    )


# ---------------------------------------------------------------------------
# Model A twin: net-load GBT at reference shape (depth 7, early stopping)
# ---------------------------------------------------------------------------

_GBTL_ROUNDS = 15
_GBTL_DEPTH = 7
_GBTL_LR = 0.05  # the reference's learning_rate (train.py:144)
# the reference's rolling load split is test=7d/val=14d over months of
# data (export_pipeline.py:563-660); the 30-day testdata extent minus
# the 168h lag warmup leaves ~23 feature days, so the registered query
# scales the windows proportionally (train ~12d / val 7d / test 4d) —
# train_gbt_load's DEFAULTS keep the reference's 14/7
_GBTL_VAL_DAYS = 7
_GBTL_TEST_DAYS = 4
_GBTL_BINS = 16
_GBTL_PATIENCE = 3


def _o_gbt_load_sql(
    rounds: int,
    depth: int,
    lr: float,
    val_days: int,
    test_days: int,
    n_bins: int,
    patience: int,
) -> str:
    """Unrolled Model-A histogram GBT as a DuckDB CTE chain mirroring
    operators/gbt.py::train_gbt_load op-for-op: the 9-feature net-load
    view (net cents + lags 1/24/168 + trailing-24 sum + calendar
    block), the reference's 3-way rolling split, exact-rank quantile
    thresholds, per-round greedy depth-``depth`` trees, per-split
    integer MAE — and the early-stopping rule replayed in SQL: executed
    rounds = first r with r - (earliest prefix-argmin of val MAE) >=
    ``patience``, else all ``rounds``."""
    from bigdatasmallprice_spark.operators.gbt import LOAD_GBT_LONG_LAG_MIN

    long_lag_min = LOAD_GBT_LONG_LAG_MIN
    gain = _o_gbt_gain("n_l", "s_l", "n_t", "s_t")

    def fv(alias: str, fcol: str) -> str:
        whens = " ".join(
            f"WHEN {i} THEN {alias}.x{i}" for i in range(8)
        )
        return f"(CASE {fcol} {whens} ELSE {alias}.x8 END)"

    thr_blocks = "\n    UNION ALL\n".join(
        f"""    SELECT {f} AS f, MIN(v) AS t
    FROM (SELECT v, SUM(c) OVER (ORDER BY v) AS cum
          FROM (SELECT x{f} AS v, COUNT(*) AS c FROM tr GROUP BY 1)) dv,
         (SELECT COUNT(*) AS n FROM tr) nn,
         range(1, {n_bins}) j
    WHERE dv.cum >= 1 + (j.range * nn.n) // {n_bins}
    GROUP BY j.range"""
        for f in (5, 6, 7, 8)
    )
    xs = ", ".join(f"x{i}" for i in range(9))
    parts = [
        f"""
WITH hp AS MATERIALIZED (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN {o_cents('value')} END) AS BIGINT) AS lc,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS lcnt,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN {o_cents('value')} END) AS BIGINT) AS pv_c
  FROM events GROUP BY 1
),
net AS (
  SELECT h, lc - COALESCE(pv_c, 0) AS net_c FROM hp WHERE lcnt > 0
),
f0 AS (
  SELECT h, net_c AS y,
         CAST(EXTRACT(hour FROM h) AS BIGINT) AS x0,
         CAST(EXTRACT(dow FROM h) + 1 AS BIGINT) AS x1,
         CAST(EXTRACT(month FROM h) AS BIGINT) AS x2,
         CAST(EXTRACT(quarter FROM h) AS BIGINT) AS x3,
         CAST(CASE WHEN EXTRACT(dow FROM h) IN (0, 6) THEN 1 ELSE 0 END AS BIGINT) AS x4,
         lag(net_c, 1) OVER w AS x5,
         lag(net_c, 24) OVER w AS x6,
         -- long-lag horizon scales with the series length, replaying
         -- featurize_net_load_series's integer rule exactly
         CASE WHEN (SELECT COUNT(*) FROM net) >= {long_lag_min}
              THEN lag(net_c, 168) OVER w
              ELSE lag(net_c, 48) OVER w END AS x7,
         SUM(net_c) OVER (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS x8
  FROM net WINDOW w AS (ORDER BY h)
),
f1 AS MATERIALIZED (
  SELECT * FROM f0
  WHERE x5 IS NOT NULL AND x6 IS NOT NULL AND x7 IS NOT NULL AND x8 IS NOT NULL
),
rows0 AS MATERIALIZED (
  SELECT y, {xs},
         CASE WHEN CAST(h AS DATE) <= (SELECT MAX(CAST(h AS DATE)) - {val_days + test_days} FROM f1) THEN 'train'
              WHEN CAST(h AS DATE) <= (SELECT MAX(CAST(h AS DATE)) - {test_days} FROM f1) THEN 'val'
              ELSE 'test' END AS split
  FROM f1
),
tr AS MATERIALIZED (SELECT * FROM rows0 WHERE split = 'train'),
thr AS MATERIALIZED (
  SELECT DISTINCT f, t FROM (
{thr_blocks}
  )
),
cands AS MATERIALIZED (
  SELECT CAST(0 AS BIGINT) AS f, CAST(range AS BIGINT) AS t FROM range(1, 24)
  UNION ALL SELECT CAST(1 AS BIGINT), CAST(range AS BIGINT) FROM range(2, 8)
  UNION ALL SELECT CAST(2 AS BIGINT), CAST(range AS BIGINT) FROM range(2, 13)
  UNION ALL SELECT CAST(3 AS BIGINT), CAST(range AS BIGINT) FROM range(2, 5)
  UNION ALL SELECT CAST(4 AS BIGINT), CAST(1 AS BIGINT)
  UNION ALL SELECT CAST(f AS BIGINT), CAST(t AS BIGINT) FROM thr
),
pm0 AS MATERIALIZED (
  SELECT y, {xs}, split,
         (SELECT CAST(floor(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) FROM tr) AS pred
  FROM rows0
)"""
    ]
    axs = ", ".join(f"a.x{i}" for i in range(9))
    for r in range(1, rounds + 1):
        parts.append(
            f""", a{r}_0 AS MATERIALIZED (
  SELECT y, {xs}, split, pred, CAST(0 AS BIGINT) AS nd, y - pred AS rs
  FROM pm{r - 1}
)"""
        )
        for lv in range(depth):
            parts.append(
                f""", st{r}_{lv} AS MATERIALIZED (
  SELECT a.nd, cd.f, cd.t,
         CAST(COALESCE(SUM(CASE WHEN {fv('a', 'cd.f')} < cd.t THEN 1 END), 0) AS BIGINT) AS n_l,
         CAST(COALESCE(SUM(CASE WHEN {fv('a', 'cd.f')} < cd.t THEN a.rs END), 0) AS BIGINT) AS s_l,
         CAST(COUNT(*) AS BIGINT) AS n_t,
         CAST(SUM(a.rs) AS BIGINT) AS s_t
  FROM a{r}_{lv} a CROSS JOIN cands cd
  WHERE a.split = 'train'
  GROUP BY 1, 2, 3
), bs{r}_{lv} AS MATERIALIZED (
  SELECT nd, f, t FROM (
    SELECT nd, f, t,
           row_number() OVER (PARTITION BY nd ORDER BY {gain} DESC, f, t) AS rn
    FROM st{r}_{lv} WHERE n_l > 0 AND n_t - n_l > 0
  ) WHERE rn = 1
), a{r}_{lv + 1} AS MATERIALIZED (
  SELECT a.y, {axs}, a.split, a.pred, a.rs,
         a.nd * 2 + (CASE WHEN b.f IS NULL THEN 0
                          WHEN {fv('a', 'b.f')} < b.t THEN 0 ELSE 1 END) AS nd
  FROM a{r}_{lv} a LEFT JOIN bs{r}_{lv} b ON a.nd = b.nd
)"""
            )
        path_joins = "\n".join(
            f"  LEFT JOIN bs{r}_{lv} p{lv} ON p{lv}.nd = lv.leaf // {1 << (depth - lv)}"
            for lv in range(depth)
        )
        path_cols = ",\n".join(
            f"         CAST(COALESCE(p{lv}.f, -1) AS BIGINT) AS l{lv + 1}_f,\n"
            f"         CAST(COALESCE(p{lv}.t, -1) AS BIGINT) AS l{lv + 1}_t"
            for lv in range(depth)
        )
        parts.append(
            f""", lv{r} AS MATERIALIZED (
  SELECT nd AS leaf, CAST(COUNT(*) AS BIGINT) AS n_leaf,
         CAST(floor(({lr} * CAST(SUM(rs) AS DOUBLE)) / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS v
  FROM a{r}_{depth} WHERE split = 'train' GROUP BY 1
), pm{r} AS MATERIALIZED (
  SELECT a.y, {axs}, a.split,
         a.pred + COALESCE(lv.v, 0) AS pred
  FROM a{r}_{depth} a LEFT JOIN lv{r} lv ON a.nd = lv.leaf
), err{r} AS MATERIALIZED (
  SELECT split, CAST(SUM(ABS(y - pred)) AS BIGINT) AS sa,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pm{r} GROUP BY 1
), out{r} AS MATERIALIZED (
  SELECT CAST({r} AS BIGINT) AS round, lv.leaf,
{path_cols},
         lv.n_leaf, lv.v AS leaf_value_c,
         (SELECT CAST(floor(CAST(sa AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)
          FROM err{r} WHERE split = 'train') AS train_mae_c,
         (SELECT CAST(floor(CAST(sa AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)
          FROM err{r} WHERE split = 'val') AS val_mae_c,
         (SELECT CAST(floor(CAST(sa AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)
          FROM err{r} WHERE split = 'test') AS test_mae_c
  FROM lv{r} lv
{path_joins}
)"""
        )
    vh_rows = "\n  UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS r, "
        f"(SELECT CAST(floor(CAST(sa AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT) "
        f"FROM err{r} WHERE split = 'val') AS v"
        for r in range(1, rounds + 1)
    )
    parts.append(
        f""", vh AS MATERIALIZED (
  {vh_rows}
), bst AS (
  SELECT h.r,
         (SELECT MIN(h2.r) FROM vh h2
          WHERE h2.r <= h.r
            AND h2.v = (SELECT MIN(h3.v) FROM vh h3 WHERE h3.r <= h.r)) AS best_r
  FROM vh h
), stp AS (
  SELECT COALESCE(MIN(r), {rounds}) AS stop_r FROM bst WHERE r - best_r >= {patience}
)
SELECT * FROM (
{chr(10).join("SELECT * FROM out" + str(r) + (" UNION ALL" if r < rounds else "") for r in range(1, rounds + 1))}
) u WHERE u.round <= (SELECT stop_r FROM stp)"""
    )
    return "".join(parts)


@register(
    "train_gbt_load",
    _o_gbt_load_sql(
        _GBTL_ROUNDS, _GBTL_DEPTH, _GBTL_LR, _GBTL_VAL_DAYS, _GBTL_TEST_DAYS,
        _GBTL_BINS, _GBTL_PATIENCE,
    ),
    doc="Model A twin — the net-load boosted model at reference shape "
    f"(train.py:168-246): depth-{_GBTL_DEPTH} trees (reference "
    f"max_depth=7), up to {_GBTL_ROUNDS} rounds with TRUE val-MAE "
    f"early stopping after {_GBTL_PATIENCE} stale rounds "
    "(early_stopping_rounds semantics — the executed-round count is "
    "data-dependent and the oracle REPLAYS the stop rule in SQL from "
    "the same val-MAE history), the reference's rolling 3-way split "
    "(run_load_export: test = the last days, val before it), and the "
    "9-feature net-load surface (net cents, lags 1/24/168, trailing-24 "
    "sum, hour/dow/month/quarter/is_weekend). Per-round integer MAE "
    "for train/val/test — test is the reference's held-out "
    "evaluate_all metric. Same per-level model-sized histogram "
    "factorization as train_gbt_full; at depth 7 each level groupBy "
    "is still <= 2^7 x features x bins groups "
    "(tests/test_gbt.py::test_gbt_load_depth7_histograms_model_sized).",
    tags=("ml", "agg", "train", "iterative"),
)
def train_gbt_load_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.gbt import train_gbt_load

    ev = events(spark, sf_dir)
    return train_gbt_load(
        ev,
        n_rounds=_GBTL_ROUNDS,
        depth=_GBTL_DEPTH,
        lr=_GBTL_LR,
        val_days=_GBTL_VAL_DAYS,
        test_days=_GBTL_TEST_DAYS,
        n_bins=_GBTL_BINS,
        patience=_GBTL_PATIENCE,
    )


# ---------------------------------------------------------------------------
# rolling-origin backtest: the forecast-model evaluation protocol
# ---------------------------------------------------------------------------

# (fold, train-end %, val-end %) over the event-time extent
_BT_FOLDS = [(1, 60, 80), (2, 80, 100)]


def _o_backtest_fold(fold: int, tp: int, vp: int) -> str:
    from bigdatasmallprice_spark.operators.linreg import (
        APE_MICRO,
        B0C,
        B1C,
        B2C,
        MAPE_GATE_PCT,
        MAPE_MASK_CENTS,
    )

    t_end = f"(SELECT lo + ((hi - lo) * {tp}) // 100 FROM ext)"
    v_end = f"(SELECT lo + ((hi - lo) * {vp}) // 100 + {1 if vp == 100 else 0} FROM ext)"
    x1 = "EXTRACT(hour FROM ts)"
    x2 = "(EXTRACT(dow FROM ts) + 1)"
    mape = "round(CAST(g.sum_micro AS DOUBLE) / (10000.0 * g.n_scored), 6)"
    return f"""
SELECT CAST({fold} AS BIGINT) AS fold, c.event_type,
       c.n AS n_train, g.n_scored,
       CASE WHEN g.n_scored > 0 THEN {mape} END AS mape_pct,
       CASE WHEN g.n_scored > 0 THEN {mape} < {MAPE_GATE_PCT} END AS gate_pass
FROM (
  SELECT event_type, n, {B0C} AS b0c, {B1C} AS b1c, {B2C} AS b2c FROM (
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
           CAST(s11 AS DOUBLE) AS s11d, CAST(s12 AS DOUBLE) AS s12d, CAST(s22 AS DOUBLE) AS s22d,
           CAST(sy AS DOUBLE) AS syd, CAST(s1y AS DOUBLE) AS s1yd, CAST(s2y AS DOUBLE) AS s2yd
    FROM (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM({x1}) AS BIGINT) AS s1, CAST(SUM({x2}) AS BIGINT) AS s2,
             CAST(SUM({x1} * {x1}) AS BIGINT) AS s11, CAST(SUM({x1} * {x2}) AS BIGINT) AS s12,
             CAST(SUM({x2} * {x2}) AS BIGINT) AS s22,
             CAST(SUM({o_cents('value')}) AS BIGINT) AS sy,
             CAST(SUM({x1} * {o_cents('value')}) AS BIGINT) AS s1y,
             CAST(SUM({x2} * {o_cents('value')}) AS BIGINT) AS s2y
      FROM events WHERE CAST(epoch_us(ts) AS BIGINT) < {t_end}
      GROUP BY 1)
  )
) c JOIN (
  SELECT event_type,
         SUM(CASE WHEN abs(yc) >= {MAPE_MASK_CENTS} THEN {APE_MICRO} END) AS sum_micro,
         CAST(COALESCE(SUM(CASE WHEN abs(yc) >= {MAPE_MASK_CENTS} THEN 1 END), 0) AS BIGINT) AS n_scored
  FROM (
    SELECT e.event_type, {o_cents('e.value')} AS yc,
           c2.b0c + c2.b1c * EXTRACT(hour FROM e.ts) + c2.b2c * (EXTRACT(dow FROM e.ts) + 1) AS pred_c
    FROM events e JOIN (
      SELECT event_type, {B0C} AS b0c, {B1C} AS b1c, {B2C} AS b2c FROM (
        SELECT event_type,
               CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
               CAST(s11 AS DOUBLE) AS s11d, CAST(s12 AS DOUBLE) AS s12d, CAST(s22 AS DOUBLE) AS s22d,
               CAST(sy AS DOUBLE) AS syd, CAST(s1y AS DOUBLE) AS s1yd, CAST(s2y AS DOUBLE) AS s2yd
        FROM (
          SELECT event_type, COUNT(*) AS n,
                 CAST(SUM({x1}) AS BIGINT) AS s1, CAST(SUM({x2}) AS BIGINT) AS s2,
                 CAST(SUM({x1} * {x1}) AS BIGINT) AS s11, CAST(SUM({x1} * {x2}) AS BIGINT) AS s12,
                 CAST(SUM({x2} * {x2}) AS BIGINT) AS s22,
                 CAST(SUM({o_cents('value')}) AS BIGINT) AS sy,
                 CAST(SUM({x1} * {o_cents('value')}) AS BIGINT) AS s1y,
                 CAST(SUM({x2} * {o_cents('value')}) AS BIGINT) AS s2y
          FROM events WHERE CAST(epoch_us(ts) AS BIGINT) < {t_end}
          GROUP BY 1)
      )
    ) c2 ON e.event_type = c2.event_type
    WHERE CAST(epoch_us(e.ts) AS BIGINT) >= {t_end}
      AND CAST(epoch_us(e.ts) AS BIGINT) < {v_end}
  ) GROUP BY 1
) g ON c.event_type = g.event_type
"""


def _o_backtest() -> str:
    folds = " UNION ALL ".join(
        "(" + _o_backtest_fold(f, tp, vp) + ")" for f, tp, vp in _BT_FOLDS
    )
    return (
        "WITH ext AS (SELECT CAST(epoch_us(MIN(ts)) AS BIGINT) AS lo, "
        "CAST(epoch_us(MAX(ts)) AS BIGINT) AS hi FROM events)\n" + folds
    )


@register(
    "rolling_backtest",
    _o_backtest(),
    doc="Rolling-origin backtest (the forecast-model evaluation "
    "protocol): two chronological folds over the event-time extent — "
    "train on the first 60% / validate on the next 20%, then train on "
    "80% / validate on the last 20% — each fold fitting the per-type "
    "closed-form linear model on ONLY past data and scoring masked "
    "MAPE on the held-out future slice. No leakage by construction "
    "(boundaries are exact integer microsecond cuts of the extent). "
    "Per fold: one moment-sum shuffle + one broadcast score join — "
    "the full backtest is 2 passes, no iteration, no collect of data "
    "rows; at 100 TB folds share the same date-partition pruning as "
    "the chrono splits (operators/splits.py).",
    tags=("ml", "eval", "train"),
)
def rolling_backtest_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from bigdatasmallprice_spark.operators.linreg import (
        fit_linear_hour_dow,
        mape_gate,
    )

    ev = events(spark, sf_dir)
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    span = int(hi) - int(lo)
    outs = []
    for fold, tp, vp in _BT_FOLDS:
        t_end = int(lo) + (span * tp) // 100
        v_end = int(lo) + (span * vp) // 100 + (1 if vp == 100 else 0)
        train = ev.filter(F.unix_micros("ts") < F.lit(t_end))
        val = ev.filter(
            (F.unix_micros("ts") >= F.lit(t_end))
            & (F.unix_micros("ts") < F.lit(v_end))
        )
        coef = fit_linear_hour_dow(train, "event_type")
        gate = mape_gate(val, coef, "event_type")
        outs.append(
            coef.join(gate, "event_type").select(
                F.lit(fold).cast("long").alias("fold"),
                "event_type",
                F.col("n").cast("long").alias("n_train"),
                "n_scored",
                "mape_pct",
                "gate_pass",
            )
        )
    return reduce(lambda a, b: a.unionByName(b), outs)


# ---------------------------------------------------------------------------
# distribution-rank profile: percent_rank / cume_dist window coverage
# ---------------------------------------------------------------------------


@register(
    "user_spend_rank",
    f"""
WITH s AS (
  SELECT user_id, event_type,
         CAST(SUM({o_cents('value')}) AS BIGINT) AS spend_c
  FROM events GROUP BY 1, 2
)
SELECT user_id, event_type, spend_c,
       round(percent_rank() OVER (PARTITION BY event_type
                                  ORDER BY spend_c, user_id), 6) AS pr,
       round(cume_dist() OVER (PARTITION BY event_type
                               ORDER BY spend_c, user_id), 6) AS cd
FROM s
""",
    doc="Per-type user spend rank profile: percent_rank + cume_dist "
    "over exact integer cents with a (spend, user_id) total order — "
    "the distributional-position features a personalization or "
    "anomaly pipeline derives per entity. Rank arithmetic is pure "
    "integer; the two final ratios are identical IEEE ops. The window "
    "partitions by type over the PRE-AGGREGATED per-user frame (users "
    "x types rows, not raw events), so the sort is entity-scale, not "
    "event-scale, at 100 TB.",
    tags=("ml", "window", "agg"),
)
def user_spend_rank_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = events(spark, sf_dir)
    s = ev.groupBy("user_id", "event_type").agg(
        F.sum(cents(F.col("value"))).cast("long").alias("spend_c")
    )
    w = Window.partitionBy("event_type").orderBy("spend_c", "user_id")
    return s.select(
        "user_id",
        "event_type",
        "spend_c",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )
