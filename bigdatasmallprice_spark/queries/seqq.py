"""Sequence analytics over ``events``: point-in-time (as-of) joins and
gap-based sessionization — per-key ordered-window operators a
training-data pipeline needs beyond the reference's global windows.
Both shuffle once on user_id and parallelize across keys."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.asof import asof_join_backward
from bigdatasmallprice_spark.queries.core import cents, events, fmt_ts_us, o_cents, o_fmt_ts_us
from bigdatasmallprice_spark.registry import register

_GAP_US = 30 * 60 * 1_000_000  # 30-min session gap


@register(
    "asof_last_purchase",
    f"""
WITH src AS (
  SELECT user_id, ts, {o_cents('value')} AS p_cents, epoch_us(ts) AS p_us
  FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT e.event_type, epoch_us(e.ts) AS e_us, s.p_cents, s.p_us
  FROM events e ASOF LEFT JOIN src s
    ON e.user_id = s.user_id AND e.ts >= s.ts
)
SELECT event_type,
       COUNT(*) AS n,
       COUNT(p_cents) AS n_matched,
       round(CAST(SUM(e_us - p_us) AS DOUBLE) / (1000000.0 * COUNT(p_cents)), 6) AS avg_staleness_sec,
       CAST(SUM(p_cents) AS DOUBLE) / 100.0 AS matched_value_sum
FROM j
GROUP BY 1
""",
    doc="As-of join (point-in-time): every event gains the latest prior "
    "purchase of the same user (ties at equal ts match). Spark side is "
    "the union-sentinel window (operators/asof.py) — one shuffle on "
    "user_id, no range join; oracle is DuckDB's native ASOF LEFT JOIN, "
    "so the tie/NULL semantics are checked against a reference "
    "implementation, not against ourselves.",
    tags=("join", "window", "asof"),
)
def asof_last_purchase_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    src = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        cents(F.col("value")).alias("p_cents"),
        F.unix_micros(F.col("ts")).alias("p_us"),
    )
    j = asof_join_backward(ev, src, keys=["user_id"], ts_col="ts", payload=["p_cents", "p_us"])
    stale_us = F.unix_micros(F.col("ts")) - F.col("p_us")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("p_cents").alias("n_matched"),
        F.round(
            F.sum(stale_us).cast("double") / (F.lit(1_000_000.0) * F.count("p_cents")), 6
        ).alias("avg_staleness_sec"),
        (F.sum("p_cents").cast("double") / 100.0).alias("matched_value_sum"),
    )


@register(
    "session_stats",
    f"""
WITH g AS (
  SELECT user_id, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
  FROM events
),
s AS (
  SELECT user_id, ts,
         SUM(CASE WHEN gap_us IS NULL OR gap_us > {_GAP_US} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
  FROM g
),
per_sess AS (
  SELECT user_id, sess, COUNT(*) AS n_events,
         epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
  FROM s GROUP BY 1, 2
)
SELECT user_id,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       COUNT(*) AS n_sessions,
       CAST(MAX(n_events) AS BIGINT) AS max_session_events,
       round(CAST(MAX(dur_us) AS DOUBLE) / 1000000.0, 6) AS longest_session_sec
FROM per_sess
GROUP BY 1
""",
    doc="Gap-based sessionization (30-min inactivity gap): lag-over-key "
    "marks session starts, a cumulative sum numbers sessions, then "
    "per-session and per-user rollups. The classic event-stream "
    "sessionizer; one shuffle on user_id, integer microsecond "
    "arithmetic end-to-end.",
    tags=("window", "agg", "session"),
)
def session_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    wu = Window.partitionBy("user_id").orderBy("ts")
    us = F.unix_micros(F.col("ts"))
    g = ev.select("user_id", "ts", (us - F.lag(us).over(wu)).alias("gap_us"))
    new_sess = F.when(F.col("gap_us").isNull() | (F.col("gap_us") > _GAP_US), 1).otherwise(0)
    s = g.select(
        "user_id",
        "ts",
        F.sum(new_sess).over(wu.rowsBetween(Window.unboundedPreceding, 0)).alias("sess"),
    )
    per_sess = s.groupBy("user_id", "sess").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    return per_sess.groupBy("user_id").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").cast("long").alias("max_session_events"),
        F.round(F.max("dur_us").cast("double") / 1_000_000.0, 6).alias("longest_session_sec"),
    )


@register(
    "latest_event_per_user",
    f"""
WITH r AS (
  SELECT user_id, ts, event_id, event_type, {o_cents('value')} AS v_cents,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id,
       {o_fmt_ts_us('ts')} AS last_ts,
       event_type AS last_type,
       CAST(v_cents AS DOUBLE) / 100.0 AS last_value
FROM r WHERE rn = 1
""",
    doc="Latest-row-per-key compaction (last-writer-wins): row_number "
    "over (key ORDER BY ts DESC, id DESC) keeps exactly one row per "
    "user with a total tie-break. The changelog->snapshot primitive "
    "of CDC/upsert pipelines; one shuffle on the key, and at scale "
    "the window beats groupBy+max+self-join (single pass, no second "
    "shuffle back onto the fact).",
    tags=("window", "dedup"),
)
def latest_event_per_user_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            fmt_ts_us(F.col("ts")).alias("last_ts"),
            F.col("event_type").alias("last_type"),
            (cents(F.col("value")).cast("double") / 100.0).alias("last_value"),
        )
    )


@register(
    "top_days_per_type",
    f"""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM({o_cents('value')}) AS BIGINT) AS day_cents,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, day, day_cents, n,
         rank() OVER (PARTITION BY event_type
                      ORDER BY day_cents DESC, day ASC) AS rk
  FROM d
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(day_cents AS DOUBLE) / 100.0 AS day_value, n, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 3
""",
    doc="Top-k per group via rank(): best 3 revenue days per event type, "
    "totally ordered (value desc, day asc tie-break). The window runs "
    "on the pre-aggregated daily frame — rank after reduction, so the "
    "shuffle carries days x types, not raw events; at 100 TB the "
    "groupBy collapses map-side first.",
    tags=("window", "agg", "topk"),
)
def top_days_per_type_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    d = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(cents(F.col("value"))).cast("long").alias("day_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("day_cents"), F.asc("day"))
    return (
        d.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            (F.col("day_cents").cast("double") / 100.0).alias("day_value"),
            "n",
            F.col("rk").cast("long").alias("rk"),
        )
    )


_HOUR_US = 3_600_000_000


@register(
    "peak_hour_spend",
    f"""
WITH w AS (
  SELECT user_id,
         SUM({o_cents('value')}) OVER (
           PARTITION BY user_id ORDER BY ts
           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
         ) AS trail_cents
  FROM events
)
SELECT user_id,
       CAST(MAX(trail_cents) AS DOUBLE) / 100.0 AS peak_hour_value,
       COUNT(*) AS n_events
FROM w GROUP BY 1
""",
    doc="Time-RANGE window (burst detection): per event, the trailing "
    "1-hour value sum for its user; reduced to each user's peak. RANGE "
    "frames bound by event time — not row counts — so gaps and "
    "duplicate timestamps are handled by semantics, not data shape "
    "(Spark: rangeBetween over unix_micros; frame peers at equal ts "
    "are included by both engines). One shuffle on user_id.",
    tags=("window", "agg", "timeseries"),
)
def peak_hour_spend_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_HOUR_US, 0)
    )
    trail = ev.select(
        "user_id", F.sum(cents(F.col("value"))).over(w).alias("trail_cents")
    )
    return trail.groupBy("user_id").agg(
        (F.max("trail_cents").cast("double") / 100.0).alias("peak_hour_value"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# funnel analysis: ordered-stage conversion over the event stream
# ---------------------------------------------------------------------------


@register(
    "event_funnel",
    """
WITH v AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(CASE WHEN e.event_type = 'click' AND e.ts >= v.t_view THEN e.ts END) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id GROUP BY 1
),
s AS (
  SELECT e.user_id, MIN(CASE WHEN e.event_type = 'signup' AND e.ts >= c.t_click THEN e.ts END) AS t_signup
  FROM events e JOIN c ON e.user_id = c.user_id GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(CASE WHEN e.event_type = 'purchase' AND e.ts >= s.t_signup THEN e.ts END) AS t_purchase
  FROM events e JOIN s ON e.user_id = s.user_id GROUP BY 1
),
u AS (
  SELECT v.user_id, v.t_view, c.t_click, s.t_signup, p.t_purchase
  FROM v JOIN c ON v.user_id = c.user_id
         JOIN s ON v.user_id = s.user_id
         JOIN p ON v.user_id = p.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       round(CAST(SUM(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS full_conversion
FROM u
""",
    doc="Ordered-funnel conversion (view -> click -> signup -> "
    "purchase): a user reaches stage k only via an event AT OR AFTER "
    "their stage-(k-1) time — the standard product-analytics funnel "
    "with temporal ordering, not mere existence. The Spark plan "
    "computes all four stage times with STACKED per-user window "
    "minimums over ONE user-partitioned shuffle (each stage's "
    "conditional min references the previous stage's column; the "
    "partitioning is reused, so Catalyst plans a single Exchange), "
    "then one global count row. The oracle chains per-stage "
    "conditional-min CTEs. At 100 TB: one shuffle of (user, type, ts), "
    "stage logic entirely in codegen windows.",
    tags=("sequence", "window", "agg"),
)
def event_funnel_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.funnel import (
        funnel_counts,
        funnel_stage_times,
    )

    ev = events(spark, sf_dir).select("user_id", "event_type", "ts")
    stages = ["view", "click", "signup", "purchase"]
    return funnel_counts(funnel_stage_times(ev, stages), stages)
