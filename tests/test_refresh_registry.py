"""Refresh-policy semantics (reference init.sql:94-100 policies) and the
model registry round-trip (train.py:101-118 / predict.py:40-57)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.rollup import (
    RefreshPolicy,
    apply_refresh_policy,
    hourly_rollup,
)

NOW = dt.datetime(2024, 3, 10, 12, 30)


def _bronze(spark, rows):
    df = spark.createDataFrame(rows, "ts_s string, tariff string, value double")
    return df.select(F.to_timestamp("ts_s").alias("ts"), "tariff", "value")


def test_policy_window_and_schedule():
    p = RefreshPolicy(start_offset="2 days", end_offset="1 hour", schedule="15 minutes")
    start, end = p.window(NOW)
    assert start == NOW - dt.timedelta(days=2)
    assert end == NOW - dt.timedelta(hours=1)
    assert p.is_due(None, NOW)
    assert not p.is_due(NOW - dt.timedelta(minutes=10), NOW)
    assert p.is_due(NOW - dt.timedelta(minutes=15), NOW)
    with pytest.raises(ValueError):
        RefreshPolicy(start_offset="2 fortnights").window(NOW)


def test_late_row_inside_window_refreshes_outside_is_frozen(spark):
    """The reference-policy semantics: a late arrival whose bucket is
    within [now-start_offset, now-end_offset) updates the rollup on the
    next tick; one older than start_offset stays frozen."""
    base = [
        ("2024-03-01 05:10:00", "ht", 10.0),  # old, outside 2d window
        ("2024-03-09 08:10:00", "ht", 20.0),  # inside window
        ("2024-03-10 11:40:00", "ht", 30.0),  # inside window, < end_offset? no: end=11:30 -> bucket 11:00 recomputed
    ]
    bronze0 = _bronze(spark, base)
    existing = hourly_rollup(bronze0, "ts", "value", ["tariff"])

    # late arrivals land in bronze after the first materialization
    late_in_window = ("2024-03-09 08:50:00", "ht", 40.0)
    late_too_old = ("2024-03-01 05:50:00", "ht", 99.0)
    bronze1 = _bronze(spark, base + [late_in_window, late_too_old])

    policy = RefreshPolicy(start_offset="2 days", end_offset="1 hour")
    refreshed = apply_refresh_policy(
        bronze1, existing, "ts", "value", ["tariff"], policy, now=NOW
    )
    rows = {r.bucket: r for r in refreshed.collect()}

    b_old = dt.datetime(2024, 3, 1, 5)
    b_win = dt.datetime(2024, 3, 9, 8)
    # in-window bucket folded the late row in
    assert rows[b_win].count_value == 2
    assert rows[b_win].avg_value == pytest.approx(30.0)
    # frozen bucket ignored its late row (bounded-recompute contract)
    assert rows[b_old].count_value == 1
    assert rows[b_old].avg_value == pytest.approx(10.0)


def test_refresh_not_due_returns_none(spark):
    bronze = _bronze(spark, [("2024-03-10 11:10:00", "ht", 1.0)])
    out = apply_refresh_policy(
        bronze, None, "ts", "value", ["tariff"],
        RefreshPolicy(schedule="30 minutes"),
        now=NOW,
        last_run=NOW - dt.timedelta(minutes=5),
    )
    assert out is None


def test_model_registry_roundtrip(spark, tmp_path):
    """train -> save -> find-latest -> score, entirely in the engine."""
    from bigdatasmallprice_spark.modelstore import (
        find_latest,
        load_model,
        save_model,
        score_latest,
    )
    from bigdatasmallprice_spark.operators.linreg import (
        fit_linear_hour_dow,
        mape_gate,
    )
    from bigdatasmallprice_spark.queries.core import table

    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events")
    coef = fit_linear_hour_dow(ev, "event_type")
    gate = mape_gate(ev, coef, "event_type")

    d = str(tmp_path)
    save_model(d, "value_by_hour_dow", coef, gate, version="20240309T120000")
    newest = save_model(d, "value_by_hour_dow", coef, gate, version="20240310T120000")
    save_model(d, "other_model", coef, version="20240311T120000")  # different name

    assert find_latest(d, "value_by_hour_dow") == newest  # O8: newest by name
    assert find_latest(d, "missing") is None

    doc = load_model(newest)
    assert doc["version"] == "20240310T120000"
    assert {c["event_type"] for c in doc["coefficients"]} == {
        r.event_type for r in coef.collect()
    }
    assert doc["metrics"] is not None and len(doc["metrics"]) > 0

    scored = score_latest(spark, d, "value_by_hour_dow", ev, "event_type")
    assert scored.filter(F.col("prediction").isNull()).count() == 0
    assert scored.select("model_version").distinct().collect()[0][0] == "20240310T120000"
    assert scored.count() == ev.count()
    # predictions reproduce the in-engine fit applied directly
    direct = (
        ev.join(F.broadcast(coef), "event_type")
        .select(
            F.round(
                (
                    F.col("b0c")
                    + F.col("b1c") * F.hour("ts")
                    + F.col("b2c") * F.dayofweek("ts")
                )
                / 100.0,
                6,
            ).alias("p")
        )
        .agg(F.sum("p"))
        .collect()[0][0]
    )
    via_store = scored.agg(F.sum("prediction")).collect()[0][0]
    assert via_store == pytest.approx(direct, rel=1e-12)


# ---------------------------------------------------------------------------
# lifecycle integration: ingest -> late data -> policy refresh -> compact
# ---------------------------------------------------------------------------


def test_day_in_the_life_lifecycle(spark, tmp_path):
    """End-to-end maintenance loop on one bronze table: idempotent daily
    ingest, a refresh-policy tick folding in-window late rows and
    freezing out-of-window ones, re-ingest inserting zero, and
    compaction preserving content byte-for-byte."""
    import datetime as dt

    from pyspark.sql import functions as F

    from bigdatasmallprice_spark.catalog import compact_bronze, read_bronze
    from bigdatasmallprice_spark.ingest import backfill_dates
    from bigdatasmallprice_spark.operators.rollup import (
        RefreshPolicy,
        apply_refresh_policy,
    )

    day1, day2 = dt.date(2026, 1, 1), dt.date(2026, 1, 2)
    schema = "time timestamp, sensor string, value double"
    bronze = str(tmp_path / "bronze")

    def mk_fetch(late_rows):
        def fetch(d):
            rows = [
                {
                    "time": dt.datetime(d.year, d.month, d.day, h),
                    "sensor": s,
                    "value": float(h + (0 if s == "a" else 100)),
                }
                for h in range(24)
                for s in ("a", "b")
            ]
            return rows + list(late_rows)

        return fetch

    # day-1 ingest, initial materialization
    ins1 = backfill_dates(
        spark, mk_fetch([]), [day1], bronze, schema, keys=["time", "sensor"]
    )
    assert ins1[day1] == 48
    policy = RefreshPolicy(start_offset="1 day", end_offset="1 hour", schedule="15 minutes")
    now1 = dt.datetime(2026, 1, 2, 0, 30)
    gold = str(tmp_path / "gold_rollup")
    # materialize the rollup to storage, as production would: a cached
    # plan over bronze would silently recompute against LATER appends
    # (Spark invalidates path-dependent caches on write)
    apply_refresh_policy(
        read_bronze(spark, bronze), None, "time", "value", ["sensor"], policy, now1
    ).write.parquet(gold)
    roll1 = spark.read.parquet(gold)

    # day-2 ingest carries two stragglers: one inside the next refresh
    # window (day2 10:00) and one older than start_offset (day1 12:00)
    late_in = {"time": dt.datetime(2026, 1, 2, 10, 30), "sensor": "a", "value": 999.0}
    late_frozen = {"time": dt.datetime(2026, 1, 1, 12, 30), "sensor": "a", "value": 555.0}
    ins2 = backfill_dates(
        spark, mk_fetch([late_in, late_frozen]), [day2], bronze, schema,
        keys=["time", "sensor"],
    )
    assert ins2[day2] == 48 + 2  # both stragglers are genuinely new rows

    now2 = dt.datetime(2026, 1, 3, 0, 30)
    gold2 = str(tmp_path / "gold_rollup_2")
    apply_refresh_policy(
        read_bronze(spark, bronze), roll1, "time", "value", ["sensor"], policy, now2
    ).write.parquet(gold2)
    roll2 = spark.read.parquet(gold2)

    got = {
        (r.bucket, r.sensor): (r.count_value, r.avg_value, r.max_value)
        for r in roll2.collect()
    }
    # in-window late row folded into its bucket on this tick
    assert got[(dt.datetime(2026, 1, 2, 10), "a")] == (2, (10.0 + 999.0) / 2, 999.0)
    # out-of-window late row: bucket frozen at its original aggregate
    assert got[(dt.datetime(2026, 1, 1, 12), "a")] == (1, 12.0, 12.0)
    # the frozen row IS in bronze (nothing lost) — only the rollup froze
    n_at_frozen = read_bronze(spark, bronze).filter(
        (F.col("time") == F.lit(dt.datetime(2026, 1, 1, 12, 30))) & (F.col("sensor") == "a")
    ).count()
    assert n_at_frozen == 1

    # re-ingest of day 2 is a no-op (idempotent ON CONFLICT DO NOTHING)
    ins3 = backfill_dates(
        spark, mk_fetch([late_in, late_frozen]), [day2], bronze, schema,
        keys=["time", "sensor"],
    )
    assert ins3[day2] == 0

    # compaction: content identical, files per partition reduced to 1
    before = sorted(map(tuple, read_bronze(spark, bronze).collect()))
    files_after = compact_bronze(spark, bronze, target_file_bytes=1 << 30)
    assert set(files_after.values()) == {1}
    after = sorted(map(tuple, read_bronze(spark, bronze).collect()))
    assert before == after


# ---------------------------------------------------------------------------
# policy scheduler: the Airflow-cadence loop (scheduler.py)
# ---------------------------------------------------------------------------


def test_run_due_policies_fires_only_due_jobs():
    from bigdatasmallprice_spark.scheduler import ScheduledJob, run_due_policies

    calls = []

    def mk(name):
        return lambda s, e, now: calls.append((name, s, e, now)) or name

    fast = ScheduledJob(
        "fast", RefreshPolicy(schedule="15 minutes"), mk("fast")
    )
    slow = ScheduledJob("slow", RefreshPolicy(schedule="60 minutes"), mk("slow"))
    last: dict = {}

    t0 = dt.datetime(2026, 2, 14, 12, 0)
    fired = run_due_policies([fast, slow], t0, last)
    # first heartbeat: nothing has ever run -> everything fires
    assert set(fired) == {"fast", "slow"} and last == {"fast": t0, "slow": t0}

    t1 = t0 + dt.timedelta(minutes=20)
    fired = run_due_policies([fast, slow], t1, last)
    # second heartbeat 20 min later: only the 15-minute job is due
    assert set(fired) == {"fast"}
    assert last == {"fast": t1, "slow": t0}
    # each fired run received its OWN policy window anchored at the tick
    (_, s, e, now) = calls[-1]
    assert (s, e) == fast.policy.window(t1) and now == t1

    # catchup=False: after a long outage the job runs ONCE, not per miss
    t2 = t1 + dt.timedelta(hours=6)
    fired = run_due_policies([fast, slow], t2, last)
    assert set(fired) == {"fast", "slow"}
    assert sum(1 for c in calls if c[0] == "fast") == 3

    with pytest.raises(ValueError, match="duplicate job names"):
        run_due_policies([fast, fast], t2, last)


def test_scheduler_drives_partition_scoped_refresh(spark):
    """Two ticks over a rollup job: only due ticks recompute, and each
    recompute touches only the policy window's buckets (T1 + T5 glue)."""
    from bigdatasmallprice_spark.operators.rollup import apply_refresh_policy
    from bigdatasmallprice_spark.scheduler import ScheduledJob, run_due_policies

    rows = [
        (dt.datetime(2026, 2, 13, 8, 10), "a", 1.0),
        (dt.datetime(2026, 2, 13, 8, 40), "a", 3.0),
        (dt.datetime(2026, 2, 14, 9, 20), "a", 5.0),
    ]
    bronze = spark.createDataFrame(rows, "time timestamp, key string, value double")
    state = {"rollup": None}
    policy = RefreshPolicy(
        start_offset="2 days", end_offset="1 hour", schedule="30 minutes"
    )

    def refresh(start, end, now):
        out = apply_refresh_policy(
            bronze, state["rollup"], "time", "value", ["key"], policy, now
        )
        if out is not None:
            state["rollup"] = out.persist()
        return out

    job = ScheduledJob("hourly_rollup", policy, refresh)
    last: dict = {}
    t0 = dt.datetime(2026, 2, 14, 12, 0)
    assert set(run_due_policies([job], t0, last)) == {"hourly_rollup"}
    got = {
        (r["bucket"], r["count_value"]): r["avg_value"]
        for r in state["rollup"].collect()
    }
    # both in-window buckets aggregated; nothing outside the window
    assert got == {
        (dt.datetime(2026, 2, 13, 8, 0), 2): 2.0,
        (dt.datetime(2026, 2, 14, 9, 0), 1): 5.0,
    }
    # 10 minutes later the schedule is not due: no recompute happens
    assert run_due_policies([job], t0 + dt.timedelta(minutes=10), last) == {}


def test_backfill_job_covers_window_dates():
    from bigdatasmallprice_spark.scheduler import backfill_job, run_due_policies

    seen: list = []
    job = backfill_job(
        "daily_backfill",
        RefreshPolicy(start_offset="3 days", end_offset="1 hours", schedule="1 days"),
        lambda dates: seen.extend(dates) or len(dates),
    )
    last: dict = {}
    now = dt.datetime(2026, 2, 14, 6, 0)
    fired = run_due_policies([job], now, last)
    assert fired["daily_backfill"] == len(seen)
    assert seen[0] == dt.date(2026, 2, 11) and seen[-1] == dt.date(2026, 2, 14)


def test_backfill_job_respects_half_open_window_at_midnight():
    """end_offset makes the window half-open [start, end): a window
    ending exactly at midnight contains no instant of end.date(), so
    that day must NOT be backfilled prematurely."""
    from bigdatasmallprice_spark.scheduler import backfill_job, run_due_policies

    seen: list = []
    job = backfill_job(
        "daily",
        RefreshPolicy(start_offset="3 days", end_offset="6 hours", schedule="1 days"),
        lambda dates: seen.extend(dates),
    )
    now = dt.datetime(2026, 8, 14, 6, 0)  # window = [Aug 11 06:00, Aug 14 00:00)
    run_due_policies([job], now, {})
    assert seen[0] == dt.date(2026, 8, 11)
    assert seen[-1] == dt.date(2026, 8, 13)  # Aug 14 excluded
