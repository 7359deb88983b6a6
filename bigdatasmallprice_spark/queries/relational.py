"""Relational operator queries: multi-way joins, splits, idempotent
upsert, grain-aligning joins, backfill estimation — over the TPC-H-ish
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.splits import split_label_by_ratio
from bigdatasmallprice_spark.operators.upsert import upsert_do_nothing
from bigdatasmallprice_spark.queries.core import (
    cents,
    events,
    fmt_ts,
    o_cents,
    o_fmt_ts,
    table,
)
from bigdatasmallprice_spark.registry import register

# ---------------------------------------------------------------------------
# J1-J3 analog: multi-way dimension joins (star join, broadcast dims)
# ---------------------------------------------------------------------------


@register(
    "market_revenue",
    f"""
SELECT r.r_name,
       strftime(date_trunc('month', o.o_orderdate), '%Y-%m') AS ym,
       CAST(SUM({o_cents('l.l_extendedprice * (1 - l.l_discount)')}) AS DOUBLE) / 100.0 AS revenue,
       COUNT(DISTINCT o.o_orderkey) AS n_orders,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
""",
    doc="Multi-way equi-join + time-bucketed rollup (J1-J3 shape, "
    "init.sql:349-368): fact joins 3 broadcast-able dims; Catalyst "
    "broadcasts every dim (verified in tests), one shuffle total.",
    tags=("join", "agg"),
)
def market_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan: pre-aggregate the fact table per order key BEFORE the star
    join — the join input shrinks ~4x (items -> orders) and the
    COUNT(DISTINCT o_orderkey) collapses to COUNT(*) because the
    pre-aggregated key is unique. One fact shuffle on l_orderkey, then
    broadcast-only joins, then the final small group-by."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nat = table(spark, sf_dir, "nation")
    reg = table(spark, sf_dir, "region")
    rev_cents = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(rev_cents).alias("rev_c"), F.count(F.lit(1)).alias("items")
    )
    return (
        per_order.join(orders, per_order["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy(
            F.col("r_name"),
            F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM").alias("ym"),
        )
        .agg(
            (F.sum("rev_c").cast("double") / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("items").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# D4/P13: chronological ratio split
# ---------------------------------------------------------------------------


@register(
    "chrono_split_summary",
    """
WITH r AS (
  SELECT o_orderkey, o_orderdate,
         row_number() OVER (ORDER BY o_orderdate, o_orderkey) AS rn,
         COUNT(*) OVER () AS n
  FROM orders
),
lab AS (
  SELECT *,
         CASE WHEN rn <= CAST(floor(n * 0.7) AS BIGINT) THEN 'train'
              WHEN rn <= CAST(floor(n * 0.7) AS BIGINT) + CAST(floor(n * 0.15) AS BIGINT) THEN 'val'
              ELSE 'test' END AS split
  FROM r
)
SELECT split, COUNT(*) AS n_rows,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS min_d,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS max_d
FROM lab GROUP BY 1
""",
    doc="70/15/15 chronological split (D4, export_pipeline.py:164-207): "
    "sizes floor(n*frac); invariants: ordering, no overlap, totality "
    "(test_feature_pipeline.py:109-146).",
    tags=("split", "window"),
)
def chrono_split_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    lab = split_label_by_ratio(orders, ["o_orderdate", "o_orderkey"], 0.7, 0.15)
    return lab.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("min_d"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("max_d"),
    )


# ---------------------------------------------------------------------------
# S14/T2: idempotent keyed upsert (INSERT ... ON CONFLICT DO NOTHING)
# ---------------------------------------------------------------------------


@register(
    "upsert_idempotency",
    f"""
WITH existing AS (
  SELECT * FROM events WHERE event_id % 2 = 0
),
batch AS (
  SELECT event_id, ts, user_id, event_type, value + 1.0 AS value, props
  FROM events WHERE event_id % 3 = 0
),
merged AS (
  SELECT * FROM existing
  UNION ALL
  SELECT * FROM batch b
  WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.event_id = b.event_id)
)
SELECT event_type, COUNT(*) AS n,
       CAST(SUM({o_cents('value')}) AS DOUBLE) / 100.0 AS value_sum
FROM merged GROUP BY 1
""",
    doc="Idempotent first-writer-wins ingestion (S14/T2, timescale_client"
    ".py:53-240): re-ingesting overlapping keys with CHANGED values must "
    "keep the existing rows — DO NOTHING semantics via left-anti join.",
    tags=("upsert", "join"),
)
def upsert_idempotency_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    existing = ev.filter(F.col("event_id") % 2 == 0)
    batch = ev.filter(F.col("event_id") % 3 == 0).withColumn("value", F.col("value") + 1.0)
    merged = upsert_do_nothing(existing, batch, keys=["event_id"], order_by=["event_id"])
    return merged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(cents(F.col("value"))).cast("double") / 100.0).alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# J4: grain-aligning join (row time -> containing hour bucket)
# ---------------------------------------------------------------------------


@register(
    "grain_align_join",
    f"""
WITH pa AS (
  SELECT date_trunc('hour', ts) AS h,
         CAST(SUM({o_cents('value')}) AS DOUBLE) / (100.0 * COUNT(*)) AS hourly_purchase_avg
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT e.event_type,
       COUNT(*) AS n,
       CAST(COALESCE(SUM(CASE WHEN e.value > pa.hourly_purchase_avg THEN 1 END), 0) AS BIGINT) AS n_above,
       CAST(COALESCE(SUM(CASE WHEN pa.h IS NULL THEN 1 END), 0) AS BIGINT) AS n_unmatched
FROM events e
LEFT JOIN pa ON date_trunc('hour', e.ts) = pa.h
GROUP BY 1
""",
    doc="Grain-aligning left join (J4, init.sql:452-455): fine-grained rows "
    "join their containing hour's aggregate via date_trunc equi-key.",
    tags=("join", "agg"),
)
def grain_align_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    pa = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            (F.sum(cents(F.col("value"))).cast("double") / (F.lit(100.0) * F.count(F.lit(1)))).alias(
                "hourly_purchase_avg"
            )
        )
    )
    j = ev.withColumn("eh", F.date_trunc("hour", F.col("ts"))).join(
        F.broadcast(pa), F.col("eh") == pa["h"], "left"
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.when(F.col("value") > F.col("hourly_purchase_avg"), F.lit(1))), F.lit(0))
        .cast("long")
        .alias("n_above"),
        F.coalesce(F.sum(F.when(F.col("h").isNull(), F.lit(1))), F.lit(0)).cast("long").alias("n_unmatched"),
    )


# ---------------------------------------------------------------------------
# A8: backfill gap estimate
# ---------------------------------------------------------------------------


@register(
    "backfill_estimate",
    """
SELECT event_type,
       CAST(date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1 AS BIGINT) AS span_days,
       COUNT(DISTINCT CAST(ts AS DATE)) AS days_present,
       CAST(date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1
            - COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS days_missing,
       CAST(date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE))) + 1
            - COUNT(DISTINCT CAST(ts AS DATE)) AS DOUBLE) * 1.5 AS est_seconds
FROM events
GROUP BY 1
""",
    doc="Backfill gap estimation (A8, main.py:755-822): span vs distinct "
    "days present, 1.5 s/call cost model (main.py:816).",
    tags=("agg",),
)
def backfill_estimate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    d = F.to_date(F.col("ts"))
    span = F.datediff(F.max(d), F.min(d)) + 1
    missing = span - F.countDistinct(d)
    return ev.groupBy("event_type").agg(
        span.cast("long").alias("span_days"),
        F.countDistinct(d).alias("days_present"),
        missing.cast("long").alias("days_missing"),
        (missing.cast("double") * 1.5).alias("est_seconds"),
    )


# ---------------------------------------------------------------------------
# A5: rate-limit style rollup (per source/hour monitoring)
# ---------------------------------------------------------------------------


@register(
    "error_monitor",
    f"""
SELECT {o_fmt_ts("date_trunc('hour', ts)")} AS t,
       COUNT(*) AS n_errors,
       COUNT(DISTINCT user_id) AS n_users,
       {o_fmt_ts('MAX(ts)')} AS last_error_t
FROM events
WHERE event_type = 'error'
GROUP BY 1
""",
    doc="Ops monitoring rollup (A5, main.py:663-690,718-744): hourly "
    "error counts + distinct users + last occurrence.",
    tags=("agg",),
)
def error_monitor_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir).filter(F.col("event_type") == "error")
    return ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n_errors"),
        F.countDistinct("user_id").alias("n_users"),
        fmt_ts(F.max("ts")).alias("last_error_t"),
    ).select(fmt_ts(F.col("h")).alias("t"), "n_errors", "n_users", "last_error_t")


# ---------------------------------------------------------------------------
# top-N heavy hitters (serving-style leaderboard with total order)
# ---------------------------------------------------------------------------


@register(
    "top_users",
    """
SELECT user_id, COUNT(*) AS n_events,
       CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0) AS BIGINT) AS n_purchases
FROM events
GROUP BY 1
ORDER BY n_events DESC, user_id
LIMIT 20
""",
    doc="Top-k heavy hitters with deterministic tie-break (O1-O4 family): "
    "TakeOrderedAndProject, no global sort.",
    tags=("topk", "agg"),
)
def top_users_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.coalesce(F.sum(F.when(F.col("event_type") == "purchase", F.lit(1))), F.lit(0))
            .cast("long")
            .alias("n_purchases"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# pricing summary (TPC-H Q1 shape): wide aggregate battery, exact decimals
# ---------------------------------------------------------------------------


def _o_micros(expr: str) -> str:
    return f"CAST(round(({expr}) * 1000000) AS BIGINT)"


def _micros(c):
    return F.round(c * 1_000_000, 0).cast("long")


@register(
    "pricing_summary",
    f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({o_cents('l_quantity')}) AS DOUBLE) / 100.0 AS sum_qty,
       CAST(SUM({o_cents('l_extendedprice')}) AS DOUBLE) / 100.0 AS sum_base_price,
       CAST(SUM({_o_micros('l_extendedprice * (1 - l_discount)')}) AS DOUBLE) / 1000000.0 AS sum_disc_price,
       CAST(SUM({_o_micros('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}) AS DOUBLE) / 1000000.0 AS sum_charge,
       CAST(SUM({o_cents('l_quantity')}) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_qty,
       CAST(SUM({o_cents('l_extendedprice')}) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_price,
       CAST(SUM({o_cents('l_discount')}) AS DOUBLE) / (100.0 * COUNT(*)) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
GROUP BY 1, 2
""",
    doc="Pricing-summary battery (TPC-H Q1 shape; the reference's A3/A9 "
    "stat sweeps generalized): 8 aggregates over a filtered fact scan in "
    "ONE pass — map-side partial agg carries (flag,status)-partials, so "
    "the shuffle moves a handful of rows regardless of table size. "
    "Multi-decimal products summed as integer micros for exactness.",
    tags=("agg",),
)
def pricing_summary_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2024-09-01 00:00:00").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(cents(F.col("l_quantity"))).cast("double") / 100.0).alias("sum_qty"),
        (F.sum(cents(F.col("l_extendedprice"))).cast("double") / 100.0).alias("sum_base_price"),
        (F.sum(_micros(disc)).cast("double") / 1_000_000.0).alias("sum_disc_price"),
        (F.sum(_micros(charge)).cast("double") / 1_000_000.0).alias("sum_charge"),
        (F.sum(cents(F.col("l_quantity"))).cast("double") / (F.lit(100.0) * n)).alias("avg_qty"),
        (F.sum(cents(F.col("l_extendedprice"))).cast("double") / (F.lit(100.0) * n)).alias("avg_price"),
        (F.sum(cents(F.col("l_discount"))).cast("double") / (F.lit(100.0) * n)).alias("avg_disc"),
        n.alias("count_order"),
    )


# ---------------------------------------------------------------------------
# supplier/part star join (brand revenue by supplier nation)
# ---------------------------------------------------------------------------


@register(
    "brand_nation_revenue",
    f"""
SELECT n.n_name, p.p_brand,
       CAST(SUM({o_cents('l.l_extendedprice * (1 - l.l_discount)')}) AS DOUBLE) / 100.0 AS revenue,
       CAST(SUM({o_cents('l.l_quantity')}) AS DOUBLE) / 100.0 AS total_qty,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
""",
    doc="Fact × three broadcast dimensions (part, supplier, nation) + "
    "rollup — the J1-J3 star shape over the OTHER dimension arms. All "
    "dim joins are map-side broadcasts; the only shuffle is the final "
    "(nation, brand) aggregate of pre-combined partials.",
    tags=("join", "agg"),
)
def brand_nation_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    supp = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"])
        .groupBy("n_name", "p_brand")
        .agg(
            (F.sum(rev).cast("double") / 100.0).alias("revenue"),
            (F.sum(cents(F.col("l_quantity"))).cast("double") / 100.0).alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# semi/anti joins (existence predicates without row multiplication)
# ---------------------------------------------------------------------------


@register(
    "customer_activity_split",
    """
WITH buyers AS (SELECT DISTINCT o_custkey FROM orders),
j AS (
  SELECT c.c_custkey, c.c_nationkey,
         EXISTS (SELECT 1 FROM buyers b WHERE b.o_custkey = c.c_custkey) AS has_orders
  FROM customer c
)
SELECT c_nationkey,
       CAST(COALESCE(SUM(CASE WHEN has_orders THEN 1 END), 0) AS BIGINT) AS n_active,
       CAST(COALESCE(SUM(CASE WHEN NOT has_orders THEN 1 END), 0) AS BIGINT) AS n_inactive
FROM j GROUP BY 1
""",
    doc="Semi/anti join: customers split by order existence per nation. "
    "Spark plans left_semi/left_anti — existence checked without "
    "multiplying rows (vs an inner join + distinct, which shuffles the "
    "full match set). The dedup/enrichment pipelines' 'already seen?' "
    "primitive.",
    tags=("join", "agg"),
)
def customer_activity_split_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = table(spark, sf_dir, "orders").select("o_custkey")
    active = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_semi"
    ).groupBy("c_nationkey").agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    inactive = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).groupBy("c_nationkey").agg(F.count(F.lit(1)).cast("long").alias("n_inactive"))
    return (
        active.join(inactive, "c_nationkey", "full")
        .select(
            "c_nationkey",
            F.coalesce("n_active", F.lit(0)).cast("long").alias("n_active"),
            F.coalesce("n_inactive", F.lit(0)).cast("long").alias("n_inactive"),
        )
    )


# ---------------------------------------------------------------------------
# grouping sets (multi-granularity rollup in one scan)
# ---------------------------------------------------------------------------


@register(
    "revenue_grouping_sets",
    f"""
SELECT COALESCE(l_returnflag, 'ALL') AS flag,
       COALESCE(l_linestatus, 'ALL') AS status,
       CAST(SUM({o_cents('l_extendedprice')}) AS DOUBLE) / 100.0 AS base_sum,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    doc="GROUPING SETS: (flag,status), (flag), grand total in ONE scan — "
    "Spark's Expand operator emits one row per grouping per input row "
    "and the partial aggregation collapses them map-side, vs three "
    "separate scans + union. The multi-granularity reporting rollup.",
    tags=("agg", "rollup"),
)
def revenue_grouping_sets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_gs")
    return spark.sql(f"""
        SELECT COALESCE(l_returnflag, 'ALL') AS flag,
               COALESCE(l_linestatus, 'ALL') AS status,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS base_sum,
               COUNT(*) AS n
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """)


# ---------------------------------------------------------------------------
# set operations (INTERSECT / EXCEPT) — cohort retention shape
# ---------------------------------------------------------------------------

_CUTOFF = "1998-01-01"


@register(
    "customer_retention_sets",
    f"""
WITH early AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'),
late AS (SELECT DISTINCT o_custkey FROM orders
         WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}')
SELECT 'retained' AS segment, COUNT(*) AS n_customers
  FROM (SELECT * FROM early INTERSECT SELECT * FROM late)
UNION ALL
SELECT 'churned', COUNT(*)
  FROM (SELECT * FROM early EXCEPT SELECT * FROM late)
UNION ALL
SELECT 'acquired', COUNT(*)
  FROM (SELECT * FROM late EXCEPT SELECT * FROM early)
""",
    doc="INTERSECT / EXCEPT cohort split: buyers before vs after a cutoff "
    "date classified retained / churned / acquired. Spark plans set ops "
    "as left_semi / left_anti joins over distinct inputs — no row "
    "multiplication, one shuffle per side on the compared column.",
    tags=("setop", "agg"),
)
def customer_retention_sets_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    early = orders.filter(F.col("o_orderdate") < cutoff).select("o_custkey").distinct()
    late = orders.filter(F.col("o_orderdate") >= cutoff).select("o_custkey").distinct()

    def seg(df: DataFrame, label: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_customers")).select(
            F.lit(label).alias("segment"), "n_customers"
        )

    return (
        seg(early.intersect(late), "retained")
        .unionByName(seg(early.subtract(late), "churned"))
        .unionByName(seg(late.subtract(early), "acquired"))
    )


# ---------------------------------------------------------------------------
# scalar-aggregate join-back (TPC-H Q17 shape): avg-threshold filter
# ---------------------------------------------------------------------------


@register(
    "small_quantity_revenue",
    f"""
WITH pa AS (
  SELECT l_partkey,
         CAST(SUM({o_cents('l_quantity')}) AS BIGINT) AS q_cents,
         COUNT(*) AS n
  FROM lineitem GROUP BY 1
)
SELECT p.p_brand,
       CAST(SUM({o_cents('l.l_extendedprice')}) AS DOUBLE) / 100.0 AS revenue,
       COUNT(*) AS n_small
FROM lineitem l
JOIN pa ON l.l_partkey = pa.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE {o_cents('l.l_quantity')} * 2 * pa.n < pa.q_cents
GROUP BY 1
""",
    doc="TPC-H Q17 shape: per-part average quantity joined back onto the "
    "fact as a threshold (rows below half the part's average). The "
    "comparison is integer-exact (2*q_cents*n < sum_cents, no float "
    "average) so both engines agree bit-for-bit. At scale the per-part "
    "aggregate is tiny next to the fact — AQE broadcasts the join-back; "
    "the part dim join is broadcast outright.",
    tags=("join", "agg"),
)
def small_quantity_revenue_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pa = li.groupBy("l_partkey").agg(
        F.sum(cents(F.col("l_quantity"))).cast("long").alias("q_cents"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        li.join(pa.withColumnRenamed("l_partkey", "pa_partkey"),
                F.col("l_partkey") == F.col("pa_partkey"))
        .filter(cents(F.col("l_quantity")) * 2 * F.col("n") < F.col("q_cents"))
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            (F.sum(cents(F.col("l_extendedprice"))).cast("double") / 100.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# SCD type-2 history: validity-interval dimension maintenance
# ---------------------------------------------------------------------------


@register(
    "scd2_history",
    """
WITH c AS (
  SELECT o_custkey AS custkey, o_orderpriority AS priority,
         o_orderdate AS ts, o_orderkey AS okey
  FROM orders
),
i AS (
  SELECT custkey, priority, ts, okey,
         lag(priority) OVER (PARTITION BY custkey ORDER BY ts, okey) AS prev
  FROM c
),
isl AS (
  SELECT custkey, priority, ts, okey FROM i
  WHERE prev IS NULL OR prev != priority
)
SELECT custkey, priority, ts AS valid_from,
       lead(ts) OVER (PARTITION BY custkey ORDER BY ts, okey) AS valid_to,
       (lead(ts) OVER (PARTITION BY custkey ORDER BY ts, okey) IS NULL) AS is_current
FROM isl
""",
    doc="SCD type-2 dimension history: per-customer order-priority "
    "tracked as validity intervals — consecutive same-value changes "
    "collapse (gaps-and-islands via lag), valid_to = next island's "
    "start (lead), open interval flagged is_current. ONE key-"
    "partitioned window, no self-join; (ts, orderkey) makes the order "
    "total so equal-date changes resolve identically in both engines. "
    "operators/scd2.py also ships the INCREMENTAL form (scd2_apply: "
    "one batch merged against open intervals only, history enters via "
    "pass-through) proven equal to this rebuild over time-partitioned "
    "batches — the daily-pipeline path at 100 TB, where rebuilding "
    "from the full change log is the thing you must never do.",
    tags=("relational", "window", "scd"),
)
def scd2_history_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdatasmallprice_spark.operators.scd2 import scd2_reconstruct

    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("okey"),
    )
    out = scd2_reconstruct(orders, "custkey", "priority", "ts", "okey")
    return out.select(
        "custkey", "priority", "valid_from", "valid_to", "is_current"
    )
