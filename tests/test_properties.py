"""Property-based semantics tests (hypothesis): randomized inputs vs
brute-force Python oracles for the operators whose edge cases are
combinatorial (as-of matching, keyed first-writer-wins upsert,
chronological split invariants)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdatasmallprice_spark.operators.asof import asof_join_backward
from bigdatasmallprice_spark.operators.splits import split_label_by_ratio
from bigdatasmallprice_spark.operators.upsert import upsert_do_nothing

BASE = dt.datetime(2026, 1, 1)

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, minute-offset) event sets; duplicates filtered per (key, ts)
events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=25
).map(lambda xs: sorted(set(xs)))


@given(probe=events_strategy, source=events_strategy)
@settings(**SETTINGS)
def test_asof_matches_bruteforce(spark, probe, source):
    pdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=m)) for k, m in probe], "k long, ts timestamp"
    )
    sdf = spark.createDataFrame(
        [(k, BASE + dt.timedelta(minutes=m), 100 * k + m) for k, m in source],
        "k long, ts timestamp, v long",
    )
    got = {
        (r["k"], r["ts"]): r["v"]
        for r in asof_join_backward(pdf, sdf, ["k"], "ts", ["v"]).collect()
    }
    assert len(got) == len(probe)
    for k, m in probe:
        eligible = [(sm, 100 * k + sm) for sk, sm in source if sk == k and sm <= m]
        expect = max(eligible)[1] if eligible else None
        assert got[(k, BASE + dt.timedelta(minutes=m))] == expect, (k, m)


kv_strategy = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 100)), min_size=0, max_size=20
)


@given(existing=kv_strategy, batch=kv_strategy)
@settings(**SETTINGS)
def test_upsert_first_writer_wins_property(spark, existing, batch):
    # dedupe existing per key (it's the already-ingested, keyed table)
    exist = {}
    for k, v in existing:
        exist.setdefault(k, v)
    e = spark.createDataFrame([(k, v) for k, v in exist.items()] or [(None, None)],
                              "k long, v long").filter("k IS NOT NULL")
    b = spark.createDataFrame(batch or [(None, None)], "k long, v long").filter(
        "k IS NOT NULL"
    )
    out = {r["k"]: r["v"] for r in upsert_do_nothing(e, b, keys=["k"], order_by=["v"]).collect()}
    # existing rows always survive untouched
    for k, v in exist.items():
        assert out[k] == v
    # batch-only keys appear exactly once, with the batch's smallest v
    # (first-writer by the order_by tiebreak)
    batch_only = {k for k, _ in batch} - set(exist)
    for k in batch_only:
        assert out[k] == min(v for kk, v in batch if kk == k)
    assert set(out) == set(exist) | batch_only


@given(
    n=st.integers(1, 60),
    fracs=st.sampled_from(
        [(0.5, 0.1), (0.5, 0.25), (0.7, 0.15), (0.8, 0.1), (0.7, 0.0)]
    ),
)
@settings(**SETTINGS)
def test_chrono_split_invariants(spark, n, fracs):
    train_frac, val_frac = fracs
    df = spark.createDataFrame(
        [(i, BASE + dt.timedelta(hours=i)) for i in range(n)], "i long, ts timestamp"
    )
    lab = split_label_by_ratio(df, ["ts", "i"], train_frac, val_frac).collect()
    by = {}
    for r in lab:
        by.setdefault(r["split"], []).append(r["i"])
    n_train = len(by.get("train", []))
    n_val = len(by.get("val", []))
    n_test = len(by.get("test", []))
    # totality + declared floor sizes
    assert n_train + n_val + n_test == n
    assert n_train == int(n * train_frac)
    assert n_val == int(n * val_frac)
    # chronological: every train row precedes every val row precedes test
    if n_train and n_val:
        assert max(by["train"]) < min(by["val"])
    if n_val and n_test:
        assert max(by["val"]) < min(by["test"])
    if n_train and n_test and not n_val:
        assert max(by["train"]) < min(by["test"])


def test_split_rejects_degenerate_fractions(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, BASE)], "i long, ts timestamp")
    with _pytest.raises(ValueError):
        split_label_by_ratio(df, ["ts"], 0.8, 0.25)
    with _pytest.raises(ValueError):
        split_label_by_ratio(df, ["ts"], 0.0, 0.5)
