"""Time-series operator queries over the synthetic ``events`` table.

Each query re-expresses one or more SURVEY §2 operators on the
driver's TPC-H-ish tables, with a DuckDB oracle. The ``events`` table
plays the role of the reference's time-keyed hypertables: the
``purchase`` series stands in for day-ahead prices, ``click`` for actual
load, ``error`` for generation, ``signup`` for the load forecast —
mirroring the CTE structure of the reference feature view
(reference infra/db/init.sql:236-368).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatasmallprice_spark.functions.calendar import ORACLE_CALENDAR, calendar_columns
from bigdatasmallprice_spark.functions.tariffs import (
    energiepreis,
    gesamttarif,
    netzpreis,
    traffic_light,
)
from bigdatasmallprice_spark.queries.core import (
    cents,
    events,
    fmt_ts,
    fmt_ts_us,
    hourly_cents,
    o_cents,
    o_fmt_ts,
    o_fmt_ts_us,
    o_hourly_cents,
    safe_div,
)
from bigdatasmallprice_spark.registry import register

# ---------------------------------------------------------------------------
# flagship: the training_features analog (W1-W6, A2, F1-F3, J2, J3)
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""
WITH p AS ({o_hourly_cents('purchase')}),
pw AS (
  SELECT h,
         CAST(pc AS DOUBLE) / (100.0 * cnt) AS price,
         lag(CAST(pc AS DOUBLE) / (100.0 * cnt), 1)   OVER w AS price_lag_1h,
         lag(CAST(pc AS DOUBLE) / (100.0 * cnt), 24)  OVER w AS price_lag_24h,
         lag(CAST(pc AS DOUBLE) / (100.0 * cnt), 168) OVER w AS price_lag_168h,
         CAST(SUM(pc) OVER w24 AS DOUBLE) / (100.0 * SUM(cnt) OVER w24) AS price_roll_24h,
         CAST(SUM(pc) OVER w168 AS DOUBLE) / (100.0 * SUM(cnt) OVER w168) AS price_roll_168h
  FROM p
  WINDOW w AS (ORDER BY h),
         w24 AS (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW),
         w168 AS (ORDER BY h ROWS BETWEEN 167 PRECEDING AND CURRENT ROW)
),
c AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS clicks
  FROM events WHERE event_type = 'click' GROUP BY 1
),
cw AS (
  SELECT h, clicks, lag(clicks, 24) OVER (ORDER BY h) AS clicks_lag_24h FROM c
),
g AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM({o_cents('value')}) AS BIGINT) AS gc
  FROM events WHERE event_type = 'error' GROUP BY 1
),
gw AS (
  SELECT h,
         CAST(gc AS DOUBLE) / 100.0 AS errgen,
         lag(CAST(gc AS DOUBLE) / 100.0, 24)  OVER w AS errgen_lag_24h,
         lag(CAST(gc AS DOUBLE) / 100.0, 168) OVER w AS errgen_lag_168h
  FROM g WINDOW w AS (ORDER BY h)
),
np AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN {o_cents('value')} ELSE 0 END) AS BIGINT) AS buy,
         CAST(SUM(CASE WHEN event_type = 'error' THEN {o_cents('value')} ELSE 0 END) AS BIGINT) AS err
  FROM events GROUP BY 1
),
npw AS (
  SELECT h,
         CAST(buy - err AS DOUBLE) / 100.0 AS net_pos,
         lag(CAST(buy - err AS DOUBLE) / 100.0, 24)  OVER w AS net_pos_lag_24h,
         lag(CAST(buy - err AS DOUBLE) / 100.0, 168) OVER w AS net_pos_lag_168h
  FROM np WINDOW w AS (ORDER BY h)
),
s AS (
  SELECT date_trunc('hour', ts) AS h, COUNT(*) AS signups
  FROM events WHERE event_type = 'signup' GROUP BY 1
)
SELECT {o_fmt_ts('pw.h')} AS t,
       pw.price, pw.price_lag_1h, pw.price_lag_24h, pw.price_lag_168h,
       pw.price_roll_24h, pw.price_roll_168h,
       {ORACLE_CALENDAR.format(t='pw.h')},
       cw.clicks, cw.clicks_lag_24h,
       CASE WHEN COUNT(cw.clicks) OVER wb > 0
            THEN CAST(SUM(cw.clicks) OVER wb AS DOUBLE) / COUNT(cw.clicks) OVER wb
       END AS clicks_roll_24h,
       gw.errgen, gw.errgen_lag_24h, gw.errgen_lag_168h,
       npw.net_pos, npw.net_pos_lag_24h, npw.net_pos_lag_168h,
       s.signups AS signups_forecast
FROM pw
LEFT JOIN cw ON pw.h = cw.h
LEFT JOIN gw ON pw.h = gw.h
LEFT JOIN npw ON pw.h = npw.h
LEFT JOIN s ON pw.h = s.h
WINDOW wb AS (ORDER BY pw.h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
"""


@register(
    "training_features",
    _FLAGSHIP_ORACLE,
    doc="Flagship feature view: lags (W1,W3-W5), rolling means (W2,W6), "
    "calendar block (F1-F3), conditional net-position agg (A2), multi-way "
    "left time-joins (J2,J3) — the Spark re-expression of the reference's "
    "training_features view (init.sql:236-368).",
    tags=("window", "join", "agg", "flagship"),
)
def training_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan plan: ONE groupBy(hour) with conditional aggregates
    replaces five per-type scans+shuffles of the fact table — at 100 TB
    the difference between reading the corpus once and five times. The
    per-series lag windows then run over *filtered* slices of the tiny
    hourly frame (per-type row sets, preserving the reference's
    per-CTE window semantics), and the slices re-join on hour."""
    ev = events(spark, sf_dir)
    c = cents(F.col("value"))
    et = F.col("event_type")

    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.sum(F.when(et == "purchase", c)).alias("pc"),
        F.count(F.when(et == "purchase", F.lit(1))).alias("cnt"),
        F.count(F.when(et == "click", F.lit(1))).alias("clicks_n"),
        F.sum(F.when(et == "error", c)).alias("gc"),
        F.count(F.when(et == "error", F.lit(1))).alias("err_n"),
        F.count(F.when(et == "signup", F.lit(1))).alias("signup_n"),
        F.coalesce(F.sum(F.when(et == "purchase", c)), F.lit(0)).alias("buy_all"),
        F.coalesce(F.sum(F.when(et == "error", c)), F.lit(0)).alias("err_all"),
    )
    hourly = hourly.persist()

    # price CTE analog: rows where purchases exist (cnt > 0)
    p = hourly.filter(F.col("cnt") > 0)
    price = F.col("pc").cast("double") / (F.lit(100.0) * F.col("cnt"))
    w = Window.orderBy("h")
    w24 = w.rowsBetween(-23, 0)
    w168 = w.rowsBetween(-167, 0)
    pw = p.select(
        "h",
        price.alias("price"),
        F.lag(price, 1).over(w).alias("price_lag_1h"),
        F.lag(price, 24).over(w).alias("price_lag_24h"),
        F.lag(price, 168).over(w).alias("price_lag_168h"),
        (F.sum("pc").over(w24).cast("double") / (F.lit(100.0) * F.sum("cnt").over(w24))).alias("price_roll_24h"),
        (F.sum("pc").over(w168).cast("double") / (F.lit(100.0) * F.sum("cnt").over(w168))).alias("price_roll_168h"),
    )

    # actual-load analog (W4): click-hour slice
    cw = (
        hourly.filter(F.col("clicks_n") > 0)
        .select("h", F.col("clicks_n").alias("clicks"))
        .select("h", "clicks", F.lag("clicks", 24).over(Window.orderBy("h")).alias("clicks_lag_24h"))
    )

    # generation analog (W3): error-hour slice
    errgen = F.col("gc").cast("double") / 100.0
    gw = hourly.filter(F.col("err_n") > 0).select(
        "h",
        errgen.alias("errgen"),
        F.lag(errgen, 24).over(Window.orderBy("h")).alias("errgen_lag_24h"),
        F.lag(errgen, 168).over(Window.orderBy("h")).alias("errgen_lag_168h"),
    )

    # net position (A2 + W5): all event hours
    net = (F.col("buy_all") - F.col("err_all")).cast("double") / 100.0
    npw = hourly.select(
        "h",
        net.alias("net_pos"),
        F.lag(net, 24).over(Window.orderBy("h")).alias("net_pos_lag_24h"),
        F.lag(net, 168).over(Window.orderBy("h")).alias("net_pos_lag_168h"),
    )

    # load-forecast analog (J3): signup-hour slice
    s = hourly.filter(F.col("signup_n") > 0).select(
        "h", F.col("signup_n").alias("signups_forecast")
    )

    joined = (
        pw.join(cw, "h", "left")
        .join(gw, "h", "left")
        .join(npw, "h", "left")
        .join(s, "h", "left")
    )

    # W6 analog: rolling mean computed AFTER the joins, over the base order
    wb = Window.orderBy("h").rowsBetween(-23, 0)
    n_clicks = F.count("clicks").over(wb)
    clicks_roll = F.when(n_clicks > 0, F.sum("clicks").over(wb).cast("double") / n_clicks)

    cal = calendar_columns(F.col("h"))
    return joined.select(
        fmt_ts(F.col("h")).alias("t"),
        "price",
        "price_lag_1h",
        "price_lag_24h",
        "price_lag_168h",
        "price_roll_24h",
        "price_roll_168h",
        *[c.alias(n) for n, c in cal.items()],
        "clicks",
        "clicks_lag_24h",
        clicks_roll.alias("clicks_roll_24h"),
        "errgen",
        "errgen_lag_24h",
        "errgen_lag_168h",
        "net_pos",
        "net_pos_lag_24h",
        "net_pos_lag_168h",
        "signups_forecast",
    )


def _stitch_bucket_hours(hourly: DataFrame, start: int) -> int:
    """Coarsen the stitch bucket width until EVERY slice the stitched
    flagship windows over (price/click/error/all-hours) holds at least
    its max lag (168 or 24 rows — which also covers the rolling k-1
    requirements) in every non-final occupied bucket, so head repair
    from one bucket back is always sufficient. One bucket-count-sized
    collect per doubling over the persisted post-aggregation hourly
    frame — ~1200 rows for a century of monthly buckets even at 100 TB
    of raw events; terminates because a width spanning the whole range
    leaves a single bucket (degenerating to the global-window task
    count of 1, which sparse data needs anyway). Dense production data
    keeps the starting width and its full parallelism."""
    reqs = (("p", 168), ("c", 24), ("e", 168), ("a", 168))
    bh = start
    while True:
        rows = (
            hourly.groupBy(
                F.floor(F.unix_timestamp(F.col("h")) / F.lit(bh * 3600)).alias("bk")
            )
            .agg(
                F.sum(F.when(F.col("cnt") > 0, 1).otherwise(0)).alias("p"),
                F.sum(F.when(F.col("clicks_n") > 0, 1).otherwise(0)).alias("c"),
                F.sum(F.when(F.col("err_n") > 0, 1).otherwise(0)).alias("e"),
                F.count(F.lit(1)).alias("a"),
            )
            .collect()
        )
        if len(rows) <= 1:
            return bh
        ok = True
        for col, need in reqs:
            occupied = [(r["bk"], r[col]) for r in rows if r[col] > 0]
            if not occupied:
                continue
            last = max(bk for bk, _ in occupied)
            if any(n < need for bk, n in occupied if bk != last):
                ok = False
                break
        if ok:
            return bh
        bh *= 2


@register(
    "training_features_stitched",
    _FLAGSHIP_ORACLE,
    doc="The SCALE-SAFE flagship (SURVEY §7.3's declared hazard, closed): "
    "bit-identical output to training_features with ZERO unpartitioned "
    "windows — every lag / rolling mean runs inside coarse time buckets "
    "in parallel and bucket heads are repaired from the previous "
    "bucket's tail (partitioned_lag_stitch / partitioned_rolling_stitch). "
    "Shares the flagship's oracle verbatim because the results are "
    "bit-equal (also asserted at sf0.1 in tests/test_operators.py); the "
    "plan guard in tests/test_plans.py proves no Window in the executed "
    "plan lacks a partition spec.",
    tags=("window", "join", "agg", "flagship", "scale"),
)
def training_features_stitched(
    spark: SparkSession, sf_dir: str, bucket_hours: int = 240
) -> DataFrame:
    """The 100×-scale path for the flagship: identical output to
    ``training_features`` with ZERO global windows — every lag and
    rolling mean runs inside ``bucket_hours``-wide time buckets in
    parallel, heads repaired from the previous bucket's tail
    (operators/windows.py::partitioned_lag_stitch /
    partitioned_rolling_stitch). Hash-identity with the global-window
    version is asserted at sf0.1 in tests/test_operators.py; at 1000
    executors this plan runs ~n_buckets window tasks instead of one.

    ``bucket_hours`` is the STARTING width; _stitch_bucket_hours
    coarsens it (doubling) until every windowed slice satisfies the
    one-bucket-back head-repair precondition, so the query is correct
    at any hour density and keeps full parallelism on dense data.
    """
    from bigdatasmallprice_spark.operators.windows import (
        partitioned_lag_stitch,
        partitioned_rolling_stitch,
    )

    ev = events(spark, sf_dir)
    c = cents(F.col("value"))
    et = F.col("event_type")

    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.sum(F.when(et == "purchase", c)).alias("pc"),
        F.count(F.when(et == "purchase", F.lit(1))).alias("cnt"),
        F.count(F.when(et == "click", F.lit(1))).alias("clicks_n"),
        F.sum(F.when(et == "error", c)).alias("gc"),
        F.count(F.when(et == "error", F.lit(1))).alias("err_n"),
        F.count(F.when(et == "signup", F.lit(1))).alias("signup_n"),
        F.coalesce(F.sum(F.when(et == "purchase", c)), F.lit(0)).alias("buy_all"),
        F.coalesce(F.sum(F.when(et == "error", c)), F.lit(0)).alias("err_all"),
    )
    hourly = hourly.persist()
    bucket_hours = _stitch_bucket_hours(hourly, bucket_hours)
    bucket = F.floor(F.unix_timestamp(F.col("h")) / F.lit(bucket_hours * 3600))

    price = F.col("pc").cast("double") / (F.lit(100.0) * F.col("cnt"))
    p = hourly.filter(F.col("cnt") > 0).withColumn("price", price)
    # Each stitch call references its input ~3x (in-bucket windows, tail
    # extraction, head repair), so CHAINED stitches grow the logical
    # plan ~3^n — at 5 stages Catalyst re-analyzes an exponentially
    # duplicated tree (measured: 153s wall, MB-scale task binaries at
    # sf0.1). localCheckpoint between stages truncates lineage to the
    # materialized hourly-grain frame (post-aggregation: ~720 rows at
    # sf0.1, ~260k rows for 30 years even at 100 TB of raw events), the
    # same lineage discipline connected_components applies per round.
    # _stitch_bucket_hours already validated EVERY slice at the chosen
    # width (strictly covering each stitch's own precondition), so all
    # stitch calls skip their per-call validation job
    p = partitioned_lag_stitch(
        p, "price", [1, 24, 168], "h", bucket, validate=False
    )
    p = p.localCheckpoint()
    p = partitioned_rolling_stitch(
        p, "pc", 24, "h", bucket, "__ps24", "__pn24", validate=False
    )
    p = partitioned_rolling_stitch(
        p, "cnt", 24, "h", bucket, "__cs24", "__cn24", validate=False
    ).localCheckpoint()
    p = partitioned_rolling_stitch(
        p, "pc", 168, "h", bucket, "__ps168", "__pn168", validate=False
    )
    p = partitioned_rolling_stitch(
        p, "cnt", 168, "h", bucket, "__cs168", "__cn168", validate=False
    ).localCheckpoint()
    pw = p.select(
        "h",
        "price",
        "price_lag_1",
        "price_lag_24",
        "price_lag_168",
        (F.col("__ps24").cast("double") / (F.lit(100.0) * F.col("__cs24"))).alias(
            "price_roll_24h"
        ),
        (F.col("__ps168").cast("double") / (F.lit(100.0) * F.col("__cs168"))).alias(
            "price_roll_168h"
        ),
    ).withColumnsRenamed(
        {
            "price_lag_1": "price_lag_1h",
            "price_lag_24": "price_lag_24h",
            "price_lag_168": "price_lag_168h",
        }
    )

    cw = (
        hourly.filter(F.col("clicks_n") > 0)
        .select("h", F.col("clicks_n").alias("clicks"))
    )
    cw = partitioned_lag_stitch(
        cw, "clicks", [24], "h", bucket, validate=False
    ).withColumnRenamed(
        "clicks_lag_24", "clicks_lag_24h"
    )

    errgen = F.col("gc").cast("double") / 100.0
    gw = (
        hourly.filter(F.col("err_n") > 0)
        .select("h", errgen.alias("errgen"))
    )
    gw = partitioned_lag_stitch(
        gw, "errgen", [24, 168], "h", bucket, validate=False
    ).withColumnsRenamed(
        {"errgen_lag_24": "errgen_lag_24h", "errgen_lag_168": "errgen_lag_168h"}
    )

    net = (F.col("buy_all") - F.col("err_all")).cast("double") / 100.0
    npw = hourly.select("h", net.alias("net_pos"))
    npw = partitioned_lag_stitch(
        npw, "net_pos", [24, 168], "h", bucket, validate=False
    ).withColumnsRenamed(
        {"net_pos_lag_24": "net_pos_lag_24h", "net_pos_lag_168": "net_pos_lag_168h"}
    )

    s = hourly.filter(F.col("signup_n") > 0).select(
        "h", F.col("signup_n").alias("signups_forecast")
    )

    joined = (
        pw.join(cw, "h", "left")
        .join(gw, "h", "left")
        .join(npw, "h", "left")
        .join(s, "h", "left")
    ).localCheckpoint()
    joined = partitioned_rolling_stitch(
        joined, "clicks", 24, "h", bucket, "__crs", "__crn", validate=False
    )
    clicks_roll = F.when(
        F.col("__crn") > 0, F.col("__crs").cast("double") / F.col("__crn")
    )

    cal = calendar_columns(F.col("h"))
    return joined.select(
        fmt_ts(F.col("h")).alias("t"),
        "price",
        "price_lag_1h",
        "price_lag_24h",
        "price_lag_168h",
        "price_roll_24h",
        "price_roll_168h",
        *[c.alias(n) for n, c in cal.items()],
        "clicks",
        "clicks_lag_24h",
        clicks_roll.alias("clicks_roll_24h"),
        "errgen",
        "errgen_lag_24h",
        "errgen_lag_168h",
        "net_pos",
        "net_pos_lag_24h",
        "net_pos_lag_168h",
        "signups_forecast",
    )


# ---------------------------------------------------------------------------
# A1/A6/T4: hourly continuous-aggregate rollup
# ---------------------------------------------------------------------------


@register(
    "hourly_rollup",
    f"""
SELECT {o_fmt_ts("date_trunc('hour', ts)")} AS t,
       event_type,
       CAST(SUM({o_cents('value')}) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value,
       COUNT(*) AS n
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    doc="15-min→hourly continuous-aggregate analog (A1/A6/T4): per (hour, "
    "key) avg/min/max/count, init.sql:81-100. Map-side partial agg does "
    "the heavy lifting at scale.",
    tags=("agg", "rollup"),
)
def hourly_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), F.col("event_type")
    ).agg(
        (F.sum(cents(F.col("value"))).cast("double") / (F.lit(100.0) * F.count(F.lit(1)))).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count(F.lit(1)).alias("n"),
    ).select(fmt_ts(F.col("h")).alias("t"), "event_type", "avg_value", "min_value", "max_value", "n")


# ---------------------------------------------------------------------------
# A2: conditional-aggregation net position, standalone
# ---------------------------------------------------------------------------


@register(
    "net_position",
    f"""
SELECT {o_fmt_ts("date_trunc('hour', ts)")} AS t,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN {o_cents('value')} ELSE 0 END) AS DOUBLE) / 100.0 AS purchase_sum,
       CAST(SUM(CASE WHEN event_type = 'error' THEN {o_cents('value')} ELSE 0 END) AS DOUBLE) / 100.0 AS error_sum,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN {o_cents('value')}
                     WHEN event_type = 'error' THEN -{o_cents('value')}
                     ELSE 0 END) AS DOUBLE) / 100.0 AS net_pos
FROM events
GROUP BY 1
""",
    doc="SUM(CASE WHEN out=CH)−SUM(CASE WHEN in=CH) net-position agg (A2, "
    "init.sql:288-297) on event flows.",
    tags=("agg",),
)
def net_position_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    c = cents(F.col("value"))
    return ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        (F.sum(F.when(F.col("event_type") == "purchase", c).otherwise(F.lit(0))).cast("double") / 100.0).alias("purchase_sum"),
        (F.sum(F.when(F.col("event_type") == "error", c).otherwise(F.lit(0))).cast("double") / 100.0).alias("error_sum"),
        (
            F.sum(
                F.when(F.col("event_type") == "purchase", c)
                .when(F.col("event_type") == "error", -c)
                .otherwise(F.lit(0))
            ).cast("double")
            / 100.0
        ).alias("net_pos"),
    ).select(fmt_ts(F.col("h")).alias("t"), "purchase_sum", "error_sum", "net_pos")


# ---------------------------------------------------------------------------
# O1/O2: newest-k history re-sorted ascending
# ---------------------------------------------------------------------------


@register(
    "price_history",
    f"""
WITH p AS ({o_hourly_cents('purchase')}),
newest AS (
  SELECT h, CAST(pc AS DOUBLE) / (100.0 * cnt) AS price
  FROM p ORDER BY h DESC LIMIT 96
)
SELECT {o_fmt_ts('h')} AS t, price FROM newest ORDER BY h
""",
    doc="ORDER BY time DESC LIMIT k then re-sort ascending (O1/O2, "
    "main.py:355-372). Spark compiles to TakeOrderedAndProject — "
    "per-partition top-k, no global sort.",
    tags=("topk",),
)
def price_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = hourly_cents(events(spark, sf_dir), "purchase")
    newest = (
        p.select("h", (F.col("pc").cast("double") / (F.lit(100.0) * F.col("cnt"))).alias("price"))
        .orderBy(F.col("h").desc())
        .limit(96)
    )
    return newest.orderBy("h").select(fmt_ts(F.col("h")).alias("t"), "price")


# ---------------------------------------------------------------------------
# O3: LIMIT/OFFSET pagination
# ---------------------------------------------------------------------------


@register(
    "row_explorer_page",
    f"""
SELECT event_id, {o_fmt_ts_us('ts')} AS t, user_id, event_type, value
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 100 OFFSET 200
""",
    doc="Row-explorer pagination ORDER BY time DESC LIMIT 100 OFFSET 200 "
    "(O3, main.py:429-452), totally ordered via (ts, event_id).",
    tags=("topk",),
)
def row_explorer_page_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .offset(200)
        .limit(100)
        .select("event_id", fmt_ts_us(F.col("ts")).alias("t"), "user_id", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# S10/J6 analog: pivot to wide per-hour traces
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "hourly_pivot",
    f"""
SELECT {o_fmt_ts("date_trunc('hour', ts)")} AS t,
       {', '.join(
           f"CAST(COALESCE(SUM(CASE WHEN event_type = '{t}' THEN {o_cents('value')} END), 0) AS DOUBLE) / 100.0 AS {t}_sum"
           for t in _EVENT_TYPES
       )}
FROM events
GROUP BY 1
""",
    doc="Pivot long→wide per time bucket (S10 BAFU pivot / pivot-to-traces "
    "main.py dashboard): groupBy(hour).pivot(event_type).",
    tags=("pivot", "agg"),
)
def hourly_pivot_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    wide = (
        ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.sum(cents(F.col("value"))))
    )
    return wide.select(
        fmt_ts(F.col("h")).alias("t"),
        *[
            (F.coalesce(F.col(t), F.lit(0)).cast("double") / 100.0).alias(f"{t}_sum")
            for t in _EVENT_TYPES
        ],
    )


# ---------------------------------------------------------------------------
# A4: FILTER'd aggregates
# ---------------------------------------------------------------------------


@register(
    "filtered_counts",
    f"""
SELECT event_type,
       COUNT(*) AS n,
       CAST(COALESCE(SUM(CASE WHEN value > 50 THEN 1 END), 0) AS BIGINT) AS n_high,
       {o_fmt_ts('MAX(CASE WHEN value > 50 THEN ts END)')} AS last_high_t
FROM events
GROUP BY event_type
""",
    doc="COUNT(*)/MAX(...) FILTER (WHERE ...) conditional aggregates (A4, "
    "main.py:589-597,666-674).",
    tags=("agg",),
)
def filtered_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    high = F.col("value") > 50
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.when(high, F.lit(1))), F.lit(0)).cast("long").alias("n_high"),
        fmt_ts(F.max(F.when(high, F.col("ts")))).alias("last_high_t"),
    )


# ---------------------------------------------------------------------------
# A3: per-table stats (catalog sweep)
# ---------------------------------------------------------------------------


@register(
    "table_stats",
    """
SELECT 'region' AS tbl, COUNT(*) AS n_rows FROM region
UNION ALL SELECT 'nation', COUNT(*) FROM nation
UNION ALL SELECT 'customer', COUNT(*) FROM customer
UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
UNION ALL SELECT 'part', COUNT(*) FROM part
UNION ALL SELECT 'orders', COUNT(*) FROM orders
UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
UNION ALL SELECT 'events', COUNT(*) FROM events
UNION ALL SELECT 'documents', COUNT(*) FROM documents
UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
""",
    doc="Per-table count sweep (A3, main.py:380-398) over the whole "
    "catalog — the /api/status analog.",
    tags=("agg", "union"),
)
def table_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.catalog import TESTDATA_TABLES, load_table

    out = None
    for name in TESTDATA_TABLES:
        df = load_table(spark, sf_dir, name).agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("tbl"), "n_rows"
        )
        out = df if out is None else out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# A7: daily-mean transform broadcast back to rows
# ---------------------------------------------------------------------------


@register(
    "daily_mean_deviation",
    f"""
WITH p AS (
  SELECT event_id, CAST(ts AS DATE) AS d, value,
         CAST(SUM({o_cents('value')}) OVER (PARTITION BY CAST(ts AS DATE)) AS DOUBLE)
           / (100.0 * COUNT(*) OVER (PARTITION BY CAST(ts AS DATE))) AS daily_avg
  FROM events WHERE event_type = 'purchase'
)
SELECT event_id, strftime(d, '%Y-%m-%d') AS d, value,
       daily_avg, value - daily_avg AS deviation
FROM p
""",
    doc="groupby(date).transform('mean') analog (A7, export_pipeline.py:"
    "619-621): windowed daily mean broadcast back, deviation per row. "
    "Partitioned window — fully parallel.",
    tags=("window", "agg"),
)
def daily_mean_deviation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    wd = Window.partitionBy(F.to_date(F.col("ts")))
    daily_avg = F.sum(cents(F.col("value"))).over(wd).cast("double") / (
        F.lit(100.0) * F.count(F.lit(1)).over(wd)
    )
    return ev.select(
        "event_id",
        F.date_format(F.to_date(F.col("ts")), "yyyy-MM-dd").alias("d"),
        "value",
        daily_avg.alias("daily_avg"),
        (F.col("value") - daily_avg).alias("deviation"),
    )


# ---------------------------------------------------------------------------
# F10/F15: tariff formulas + traffic-light bucketing
# ---------------------------------------------------------------------------

_TARIFF_ORACLE_BODY = f"""
  SELECT event_id,
         150.0 + value * 7.5 AS net_load,
         value * 2.0 - 20.0 AS epex,
         LEAST(GREATEST(15.0 * (LEAST(GREATEST((150.0 + value * 7.5 - 150.0) / 750.0, 0.0), 1.0))
                              * (LEAST(GREATEST((150.0 + value * 7.5 - 150.0) / 750.0, 0.0), 1.0)), 5.0), 25.0) AS netz,
         LEAST(GREATEST(0.15 * ((value * 2.0 - 20.0) / 10.0) + 2.0, 3.0), 13.0) AS energie
  FROM events WHERE event_type = 'purchase'
"""


@register(
    "tariff_breakdown",
    f"""
WITH t AS ({_TARIFF_ORACLE_BODY})
SELECT event_id, round(netz, 2) AS netzpreis_rp_kwh,
       round(energie, 2) AS energiepreis_rp_kwh,
       round(netz + energie, 2) AS gesamttarif_rp_kwh
FROM t
""",
    doc="Dynamic tariff formulas (F10, tariff_formulas.py:26-170): "
    "clip(alpha*L_norm^2) + clip(k_pe*EPEX/10+k_le), pure JVM column "
    "arithmetic, golden-tested vs the reference's constants.",
    tags=("scalar",),
)
def tariff_breakdown_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    net_load = F.lit(150.0) + F.col("value") * 7.5
    epex = F.col("value") * 2.0 - 20.0
    netz = netzpreis(net_load)
    energie = energiepreis(epex)
    return ev.select(
        "event_id",
        F.round(netz, 2).alias("netzpreis_rp_kwh"),
        F.round(energie, 2).alias("energiepreis_rp_kwh"),
        F.round(gesamttarif(netz, energie), 2).alias("gesamttarif_rp_kwh"),
    )


@register(
    "traffic_light",
    f"""
WITH t AS ({_TARIFF_ORACLE_BODY})
SELECT CASE WHEN netz + energie < 15.0 THEN 'low'
            WHEN netz + energie > 22.0 THEN 'high'
            ELSE 'medium' END AS level,
       COUNT(*) AS n
FROM t
GROUP BY 1
""",
    doc="Traffic-light tariff bucketing (F15, main.py:336-337) + count per "
    "level.",
    tags=("scalar", "agg"),
)
def traffic_light_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    net_load = F.lit(150.0) + F.col("value") * 7.5
    epex = F.col("value") * 2.0 - 20.0
    total = gesamttarif(netzpreis(net_load), energiepreis(epex))
    return ev.select(traffic_light(total).alias("level")).groupBy("level").agg(
        F.count(F.lit(1)).alias("n")
    )


# ---------------------------------------------------------------------------
# F11: forecast metrics with masked MAPE (naive lag-24 baseline)
# ---------------------------------------------------------------------------


@register(
    "forecast_metrics",
    f"""
WITH p AS ({o_hourly_cents('purchase')}),
m AS (
  SELECT h, CAST(round(pc * 1000.0 / cnt) AS BIGINT) AS p_milli FROM p
),
e AS (
  SELECT h, p_milli, lag(p_milli, 24) OVER (ORDER BY h) AS yhat_milli FROM m
),
v AS (SELECT * FROM e WHERE yhat_milli IS NOT NULL)
SELECT COUNT(*) AS n,
       CAST(SUM(abs(yhat_milli - p_milli)) AS DOUBLE) / (1000.0 * COUNT(*)) AS mae,
       sqrt(CAST(SUM((yhat_milli - p_milli) * (yhat_milli - p_milli)) AS DOUBLE) / COUNT(*)) / 1000.0 AS rmse,
       round(100.0 * SUM(CASE WHEN abs(p_milli) >= 10000
                              THEN CAST(abs(yhat_milli - p_milli) AS DOUBLE) / abs(p_milli) END)
                   / SUM(CASE WHEN abs(p_milli) >= 10000 THEN 1 END), 6) AS mape_pct,
       CAST(COALESCE(SUM(CASE WHEN abs(p_milli) >= 10000 THEN 1 END), 0) AS BIGINT) AS n_mape
FROM v
""",
    doc="MAE/RMSE/masked-MAPE metrics (F11, evaluate.py:23-61): MAPE only "
    "over |y|>=10, naive yhat = lag-24 price. Integer-milli encoding keeps "
    "both engines bit-identical.",
    tags=("metrics", "window", "agg"),
)
def forecast_metrics_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = hourly_cents(events(spark, sf_dir), "purchase")
    m = p.select(
        "h", F.round(F.col("pc") * 1000.0 / F.col("cnt"), 0).cast("long").alias("p_milli")
    )
    e = m.select("h", "p_milli", F.lag("p_milli", 24).over(Window.orderBy("h")).alias("yhat_milli"))
    v = e.filter(F.col("yhat_milli").isNotNull())
    err = F.col("yhat_milli") - F.col("p_milli")
    qual = F.abs(F.col("p_milli")) >= 10000
    return v.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.abs(err)).cast("double") / (F.lit(1000.0) * F.count(F.lit(1)))).alias("mae"),
        (F.sqrt(F.sum(err * err).cast("double") / F.count(F.lit(1))) / 1000.0).alias("rmse"),
        F.round(
            F.lit(100.0)
            * F.sum(F.when(qual, F.abs(err).cast("double") / F.abs(F.col("p_milli"))))
            / F.sum(F.when(qual, F.lit(1))),
            6,
        ).alias("mape_pct"),
        F.coalesce(F.sum(F.when(qual, F.lit(1))), F.lit(0)).cast("long").alias("n_mape"),
    )


# ---------------------------------------------------------------------------
# T3: freshness gate with injectable clock
# ---------------------------------------------------------------------------

_CLOCK = "2024-02-01 00:00:00"


@register(
    "freshness_gate",
    f"""
SELECT {o_fmt_ts('MAX(ts)')} AS last_t,
       MAX(ts) >= TIMESTAMP '{_CLOCK}' - INTERVAL 26 HOUR AS is_fresh,
       CAST(floor(epoch(TIMESTAMP '{_CLOCK}' - MAX(ts)) / 3600.0) AS BIGINT) AS hours_behind
FROM events
""",
    doc="Freshness gate (T3, export_pipeline.py:270-290): newest row must "
    "be younger than 26h relative to an injectable clock (fixed literal "
    "here for reproducibility).",
    tags=("agg",),
)
def freshness_gate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    clock = F.to_timestamp(F.lit(_CLOCK))
    mx = F.max("ts")
    return ev.agg(
        fmt_ts(mx).alias("last_t"),
        (mx >= clock - F.expr("INTERVAL 26 HOURS")).alias("is_fresh"),
        F.floor(
            (clock.cast("double") - mx.cast("double")) / 3600.0
        ).cast("long").alias("hours_behind"),
    )


# ---------------------------------------------------------------------------
# O7: stride downsample to <=500 chart points
# ---------------------------------------------------------------------------


@register(
    "chart_downsample",
    f"""
WITH p AS ({o_hourly_cents('purchase')}),
r AS (
  SELECT h, CAST(pc AS DOUBLE) / (100.0 * cnt) AS price,
         row_number() OVER (ORDER BY h) AS rn,
         COUNT(*) OVER () AS n
  FROM p
)
SELECT {o_fmt_ts('h')} AS t, price
FROM r
WHERE (rn - 1) % CAST(ceil(n / 500.0) AS BIGINT) = 0
""",
    doc="Chart downsample to <=500 points by stride sampling (O7, "
    "main.py:1038-1045).",
    tags=("topk", "window"),
)
def chart_downsample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = hourly_cents(events(spark, sf_dir), "purchase")
    w = Window.orderBy("h")
    r = p.select(
        "h",
        (F.col("pc").cast("double") / (F.lit(100.0) * F.col("cnt"))).alias("price"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    step = F.ceil(F.col("n") / 500.0).cast("long")
    return r.filter(((F.col("rn") - 1) % step) == 0).select(
        fmt_ts(F.col("h")).alias("t"), "price"
    )


# ---------------------------------------------------------------------------
# second feature view: net_load_features (W7, J5, F1-F4)
# ---------------------------------------------------------------------------


@register(
    "net_load_features",
    f"""
WITH l AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN {o_cents('value')} END) AS BIGINT) AS lc,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS lcnt,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN {o_cents('value')} END) AS BIGINT) AS pv_c
  FROM events GROUP BY 1
),
net AS (
  SELECT h, lc - COALESCE(pv_c, 0) AS net_c
  FROM l WHERE lcnt > 0
),
w AS (
  SELECT h, net_c,
         lag(net_c, 1)   OVER win AS net_lag_1,
         lag(net_c, 24)  OVER win AS net_lag_24,
         lag(net_c, 168) OVER win AS net_lag_168,
         CAST(SUM(net_c) OVER w24 AS DOUBLE) / (100.0 * COUNT(*) OVER w24) AS net_roll_24h
  FROM net
  WINDOW win AS (ORDER BY h),
         w24 AS (ORDER BY h ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT {o_fmt_ts('h')} AS t,
       CAST(net_c AS DOUBLE) / 100.0 AS net_load,
       CAST(net_lag_1 AS DOUBLE) / 100.0 AS net_load_lag_1h,
       CAST(net_lag_24 AS DOUBLE) / 100.0 AS net_load_lag_24h,
       CAST(net_lag_168 AS DOUBLE) / 100.0 AS net_load_lag_168h,
       net_roll_24h,
       {ORACLE_CALENDAR.format(t='h')}
FROM w
""",
    doc="Second feature view (winterthur_net_load_features, init.sql:"
    "421-455): derived target load - COALESCE(pv, 0) (J5/F4), lags "
    "1/24/168 + rolling-24 mean OF THE DERIVED EXPRESSION (W7), calendar "
    "block (F1-F2). Net stays integer cents through the windows, so "
    "lag/rolling arithmetic is exact in both engines.",
    tags=("window", "join", "agg"),
)
def net_load_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    c = cents(F.col("value"))
    et = F.col("event_type")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.sum(F.when(et == "purchase", c)).alias("lc"),
        F.count(F.when(et == "purchase", F.lit(1))).alias("lcnt"),
        F.sum(F.when(et == "signup", c)).alias("pv_c"),
    )
    net = hourly.filter(F.col("lcnt") > 0).select(
        "h", (F.col("lc") - F.coalesce(F.col("pv_c"), F.lit(0))).alias("net_c")
    )
    win = Window.orderBy("h")
    w24 = win.rowsBetween(-23, 0)
    w = net.select(
        "h",
        "net_c",
        F.lag("net_c", 1).over(win).alias("net_lag_1"),
        F.lag("net_c", 24).over(win).alias("net_lag_24"),
        F.lag("net_c", 168).over(win).alias("net_lag_168"),
        (F.sum("net_c").over(w24).cast("double") / (F.lit(100.0) * F.count(F.lit(1)).over(w24))).alias(
            "net_roll_24h"
        ),
    )
    cal = calendar_columns(F.col("h"))
    return w.select(
        fmt_ts(F.col("h")).alias("t"),
        (F.col("net_c").cast("double") / 100.0).alias("net_load"),
        (F.col("net_lag_1").cast("double") / 100.0).alias("net_load_lag_1h"),
        (F.col("net_lag_24").cast("double") / 100.0).alias("net_load_lag_24h"),
        (F.col("net_lag_168").cast("double") / 100.0).alias("net_load_lag_168h"),
        "net_roll_24h",
        *[col.alias(n) for n, col in cal.items()],
    )


# ---------------------------------------------------------------------------
# gap filling: dense hourly grid + forward fill (time-series repair)
# ---------------------------------------------------------------------------


@register(
    "gap_fill_hourly",
    f"""
WITH sparse AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM({o_cents('value')}) AS BIGINT) AS pc,
         COUNT(*) AS cnt
  FROM events WHERE event_type = 'purchase' AND value > 90
  GROUP BY 1
),
grid AS (
  SELECT unnest(generate_series((SELECT MIN(h) FROM sparse), (SELECT MAX(h) FROM sparse), INTERVAL 1 HOUR)) AS h
),
joined AS (
  SELECT g.h, s.pc, s.cnt FROM grid g LEFT JOIN sparse s ON g.h = s.h
),
filled AS (
  SELECT h,
         CASE WHEN cnt IS NULL THEN 1 ELSE 0 END AS is_filled,
         last_value(CASE WHEN cnt IS NOT NULL THEN CAST(pc AS DOUBLE) / (100.0 * cnt) END IGNORE NULLS)
           OVER (ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS price_ff
  FROM joined
)
SELECT {o_fmt_ts('h')} AS t, CAST(is_filled AS INT) AS is_filled, round(price_ff, 6) AS price_ff
FROM filled
""",
    doc="Gap filling: sparse hourly series (high-value purchases) -> "
    "dense hourly grid via sequence+explode, then forward fill with "
    "last(ignorenulls) — the time-series repair step before row-frame "
    "windows can assume a gap-free grid (SURVEY §7.3). Grid generation "
    "is O(span) rows, not a cross join.",
    tags=("window", "gapfill"),
)
def gap_fill_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    sparse = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 90))
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.sum(cents(F.col("value"))).alias("pc"), F.count(F.lit(1)).alias("cnt"))
    )
    bounds = sparse.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    joined = grid.join(sparse, "h", "left")
    price = F.when(
        F.col("cnt").isNotNull(), F.col("pc").cast("double") / (F.lit(100.0) * F.col("cnt"))
    )
    w = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        fmt_ts(F.col("h")).alias("t"),
        F.when(F.col("cnt").isNull(), 1).otherwise(0).cast("int").alias("is_filled"),
        F.round(F.last(price, ignorenulls=True).over(w), 6).alias("price_ff"),
    )


# ---------------------------------------------------------------------------
# interval (range) join via date expansion
# ---------------------------------------------------------------------------

_RANGES = [
    ("new_year", "2024-01-01", "2024-01-02"),
    ("sports_week", "2024-01-08", "2024-01-14"),
    ("promo", 	"2024-01-17", "2024-01-19"),
    ("month_end", "2024-01-28", "2024-01-31"),
]


@register(
    "holiday_range_join",
    f"""
WITH ranges(label, d_start, d_end) AS (
  VALUES {', '.join(f"('{l}', DATE '{s}', DATE '{e}')" for l, s, e in _RANGES)}
),
j AS (
  SELECT r.label, e.user_id, {o_cents('e.value')} AS c
  FROM events e
  JOIN ranges r ON CAST(e.ts AS DATE) BETWEEN r.d_start AND r.d_end
)
SELECT label, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(c) AS DOUBLE) / 100.0 AS value_sum
FROM j GROUP BY 1
""",
    doc="Interval/range join (the D2 school-holiday-ranges shape, "
    "export_pipeline.py:409-534): the range dim EXPANDS to one row per "
    "covered date (sequence+explode) and the join becomes a broadcast "
    "EQUI-join on the date — at 100 TB a BETWEEN theta-join would plan "
    "as a nested loop over the fact table; expansion costs only "
    "O(total covered days).",
    tags=("join", "range"),
)
def holiday_range_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    ranges = ev.sparkSession.createDataFrame(
        [(l, dt.date.fromisoformat(s), dt.date.fromisoformat(e)) for l, s, e in _RANGES],
        "label string, d_start date, d_end date",
    )
    dates = ranges.select(
        "label", F.explode(F.sequence("d_start", "d_end")).alias("d")
    )
    j = ev.withColumn("d", F.to_date(F.col("ts"))).join(F.broadcast(dates), "d")
    return j.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        (F.sum(cents(F.col("value"))).cast("double") / 100.0).alias("value_sum"),
    )


@register(
    "sliding_hour_windows",
    f"""
WITH x AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) - to_minutes(15 * k) AS ws,
         {o_cents('value')} AS c
  FROM events, range(0, 4) AS t(k)
)
SELECT {o_fmt_ts('ws')} AS window_start,
       COUNT(*) AS n,
       CAST(SUM(c) AS DOUBLE) / 100.0 AS value_sum
FROM x GROUP BY 1
""",
    doc="Sliding (hopping) windows: 1-hour windows every 15 minutes — "
    "each event contributes to exactly 4 overlapping windows. Spark's "
    "window('1 hour','15 minutes') expands events to their windows "
    "before the aggregation (the oracle reproduces the same expansion "
    "with a k=0..3 cross join). The smoothing/alerting aggregation "
    "tumbling windows (T4, hourly_rollup) can't express; expansion "
    "factor = window/slide = 4x, paid before the map-side combine.",
    tags=("window", "agg", "timeseries"),
)
def sliding_hour_windows_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(cents(F.col("value"))).cast("double") / 100.0).alias("value_sum"),
        )
        .select(fmt_ts(F.col("w.start")).alias("window_start"), "n", "value_sum")
    )


@register(
    "twap_hourly",
    f"""
WITH p AS (
  SELECT ts, {o_cents('value')} AS vc,
         lead(epoch_us(ts)) OVER (ORDER BY ts, event_id) AS next_us,
         epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
),
seg AS (
  SELECT date_trunc('hour', ts) AS h, vc, next_us - us AS dur_us
  FROM p WHERE next_us IS NOT NULL
)
SELECT {o_fmt_ts('h')} AS hour,
       COUNT(*) AS n_segments,
       CAST(SUM(vc * dur_us) AS BIGINT) AS weighted_sum,
       CAST(SUM(dur_us) AS BIGINT) AS total_dur_us,
       CAST(SUM(vc * dur_us) AS DOUBLE) / (100.0 * SUM(dur_us)) AS twap
FROM seg GROUP BY 1
""",
    doc="Time-weighted average price (TWAP) over irregular samples: each "
    "observation holds until the next one (lead over a total order), "
    "its weight is that duration in integer microseconds, and the "
    "hourly TWAP is weighted_sum/total_duration — exact integer "
    "arithmetic until the final division. This is the correct mean for "
    "unevenly-sampled series, where the row-mean (A6 resample) "
    "over-weights bursts; segments are attributed to the hour they "
    "start in. The successor timestamp comes from the day-bucketed "
    "lead stitch (operators/windows.py::partitioned_lead1_stitch) — "
    "identical to the global (ts, event_id) window with one task "
    "per day instead of a single-partition sort — then a "
    "map-side-combinable groupBy.",
    tags=("window", "agg", "timeseries"),
)
def twap_hourly_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.windows import partitioned_lead1_stitch

    ev = events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    us = F.unix_micros(F.col("ts"))
    # global lead(1) via the day-bucketed stitch: lead inside day
    # buckets, each bucket's last row repaired from the next day's
    # first timestamp — identical to the global (ts, event_id) window
    # (tests/test_operators.py) with one task per day instead of one
    # single-partition sort
    withus = ev.select(
        "ts", "event_id", cents(F.col("value")).alias("vc"), us.alias("__us")
    )
    p = (
        partitioned_lead1_stitch(
            withus,
            "__us",
            ["ts", "event_id"],
            F.date_trunc("day", F.col("ts")),
            "__next_us",
        )
        .select("ts", "vc", (F.col("__next_us") - F.col("__us")).alias("dur_us"))
        .filter(F.col("dur_us").isNotNull())
    )
    seg = p.select(F.date_trunc("hour", F.col("ts")).alias("h"), "vc", "dur_us")
    return seg.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(F.col("vc") * F.col("dur_us")).cast("long").alias("weighted_sum"),
        F.sum("dur_us").cast("long").alias("total_dur_us"),
        (
            F.sum(F.col("vc") * F.col("dur_us")).cast("double")
            / (F.lit(100.0) * F.sum("dur_us"))
        ).alias("twap"),
    ).select(fmt_ts(F.col("h")).alias("hour"), "n_segments", "weighted_sum", "total_dur_us", "twap")
