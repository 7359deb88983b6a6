"""Mergeable heavy-hitters sketch (Misra–Gries / space-saving family).

Top-k frequent terms over a corpus WITHOUT a vocabulary-sized shuffle:
each partition maintains at most ``m`` counters (Misra–Gries), emits
its summary (≤ m rows) plus its decrement total, and the summaries
merge by plain addition — Misra–Gries is a mergeable summary (Agarwal
et al., "Mergeable Summaries", PODS 2012): after merging, every
reported count ``est`` satisfies

    true_count - total_err  <=  est  <=  true_count

where ``total_err`` = sum of per-partition decrement totals, and every
term with true frequency > total_err is guaranteed present. So the
shuffle carries P·m rows (partitions × capacity) instead of |vocab|
rows, and per-task memory is capped at m counters regardless of data
size — the property that matters at 100 TB, where a skewed exact
groupBy can OOM a reducer and the full term shuffle dominates the job.

The exact groupBy twin stays the CORRECTNESS oracle in tests: the
sketch's guarantee (containment + bounds) is asserted against it on
Zipf-shaped data.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_update(counters: dict[str, int], term: str, m: int) -> int:
    """One Misra–Gries step; returns the decrement applied (0 or 1)."""
    if term in counters:
        counters[term] += 1
        return 0
    if len(counters) < m:
        counters[term] = 1
        return 0
    # decrement all; drop zeros — the classic m-way cancellation
    dead = []
    for t in counters:
        counters[t] -= 1
        if counters[t] == 0:
            dead.append(t)
    for t in dead:
        del counters[t]
    return 1


def mg_summarize(terms: Iterator[str], m: int) -> tuple[dict[str, int], int]:
    """Stream a term iterator into (counters, decrement_total)."""
    counters: dict[str, int] = {}
    err = 0
    for t in terms:
        err += mg_update(counters, t, m)
    return counters, err


def heavy_hitters(
    df: DataFrame, term_col: str, m: int = 64, min_est: int = 1
) -> DataFrame:
    """Distributed heavy hitters: per-partition Misra–Gries summaries
    (mapInPandas, ≤ m+1 output rows per partition) merged by a tiny
    keyed sum. Output: (term, est, err_bound) where
    true - err_bound <= est <= true; terms with true count > err_bound
    are guaranteed present. One shuffle of P·(m+1) rows total."""

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, int] = {}
        err = 0
        for pdf in batches:
            for t in pdf[term_col]:
                err += mg_update(counters, t, m)
        rows = [{"term": t, "cnt": c, "err": 0} for t, c in counters.items()]
        # one sentinel row carries this partition's decrement total so
        # the global bound is a plain SUM after the shuffle
        rows.append({"term": None, "cnt": 0, "err": err})
        yield pd.DataFrame(rows, columns=["term", "cnt", "err"])

    # NULL terms are excluded: the merge uses term=NULL as the
    # error-sentinel row, and "no value" is not a countable term
    summaries = (
        df.select(term_col)
        .where(F.col(term_col).isNotNull())
        .mapInPandas(_summarize, "term string, cnt long, err long")
    )
    merged = summaries.groupBy("term").agg(
        F.sum("cnt").alias("est"), F.sum("err").alias("err_part")
    )
    total_err = merged.agg(F.sum("err_part").alias("err_bound"))
    return (
        merged.filter(F.col("term").isNotNull())
        .crossJoin(F.broadcast(total_err))
        .filter(F.col("est") >= min_est)
        .select("term", F.col("est").cast("long").alias("est"),
                F.col("err_bound").cast("long").alias("err_bound"))
    )


def exact_term_counts(df: DataFrame, term_col: str) -> DataFrame:
    """The exact twin (vocabulary-sized shuffle) — correctness oracle."""
    return df.groupBy(F.col(term_col).alias("term")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def heavy_hitters_by_group(
    df: DataFrame, group_col: str, term_col: str, m: int = 64
) -> DataFrame:
    """Per-group heavy hitters (e.g. top terms per language/source):
    one Misra–Gries summary per (partition, group), merged per group.
    Same bounds as ``heavy_hitters`` but err is per GROUP (summed over
    that group's partition summaries only). Shuffle carries at most
    P·G·(m+1) rows — still sketch-sized, never vocabulary-sized."""

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict[str, dict[str, int]] = {}
        errs: dict[str, int] = {}
        for pdf in batches:
            for g, t in zip(pdf[group_col], pdf[term_col]):
                errs[g] = errs.get(g, 0) + mg_update(counters.setdefault(g, {}), t, m)
        rows = [
            {"grp": g, "term": t, "cnt": c, "err": 0}
            for g, cs in counters.items()
            for t, c in cs.items()
        ]
        rows += [{"grp": g, "term": None, "cnt": 0, "err": e} for g, e in errs.items()]
        yield pd.DataFrame(rows, columns=["grp", "term", "cnt", "err"])

    summaries = (
        df.select(group_col, term_col)
        .where(F.col(term_col).isNotNull() & F.col(group_col).isNotNull())
        .mapInPandas(_summarize, "grp string, term string, cnt long, err long")
    )
    merged = summaries.groupBy("grp", "term").agg(
        F.sum("cnt").alias("est"), F.sum("err").alias("err_part")
    )
    errs = merged.groupBy("grp").agg(F.sum("err_part").alias("err_bound"))
    return (
        merged.filter(F.col("term").isNotNull())
        .join(F.broadcast(errs), "grp")
        .select(
            F.col("grp").alias(group_col),
            "term",
            F.col("est").cast("long").alias("est"),
            F.col("err_bound").cast("long").alias("err_bound"),
        )
    )
