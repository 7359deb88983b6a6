"""Streaming heavy hitters: incremental Misra–Gries over a persisted
sketch state — the continuous twin of ``operators/sketches.py``.

Pattern (shared with ``neardup_stream``/``dedup_incremental``): each
micro-batch folds into a small persisted summary table instead of
re-scanning the corpus. State per shard is ≤ m counters + one error
total; the merge is the textbook mergeable-summaries step (Agarwal et
al. 2012):

    C = state ⊎ batch_summary      (pointwise count addition)
    if |C| > m: d = (m+1)-th largest count; subtract d everywhere,
                drop ≤0; err += d

so after any number of batches, per shard:

    true_count − err_shard  <=  est  <=  true_count

and every term whose true count exceeds its shard's err is present.
Terms are sharded by hash, so each term lives in exactly ONE shard and
error bounds never sum across shards — the sketch scales horizontally
by raising ``n_shards`` while per-shard memory stays m counters.

The summary table is tiny (n_shards·(m+1) rows), rewritten atomically
per batch; exactly-once across restarts comes from the stream's
checkpoint (availableNow + foreachBatch), matching the repo's other
incremental-state streams.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUMMARY_SCHEMA = "shard long, term string, cnt long"


def _fold_shard(state: pd.DataFrame, terms: list[str], m: int) -> pd.DataFrame:
    """One shard's merge: existing counters ⊎ batch MG summary, trimmed
    to m counters with the decrement folded into the error row."""
    from bigdatasmallprice_spark.operators.sketches import mg_summarize

    counters: dict[str, int] = {}
    err = 0
    for r in state.itertuples():
        if r.term is None or (isinstance(r.term, float) and pd.isna(r.term)):
            err += int(r.cnt)
        else:
            counters[r.term] = int(r.cnt)
    batch_counters, batch_err = mg_summarize(iter(sorted(terms)), m)
    err += batch_err
    for t, c in batch_counters.items():
        counters[t] = counters.get(t, 0) + c
    if len(counters) > m:
        d = sorted(counters.values(), reverse=True)[m]  # (m+1)-th largest
        counters = {t: c - d for t, c in counters.items() if c - d > 0}
        err += d
    rows = [{"term": t, "cnt": c} for t, c in counters.items()]
    rows.append({"term": None, "cnt": err})
    return pd.DataFrame(rows, columns=["term", "cnt"])


def update_summary(
    spark: SparkSession,
    summary_path: str,
    batch: DataFrame,
    term_col: str,
    m: int = 64,
    n_shards: int = 8,
    batch_id: int | None = None,
    allow_repin: bool = False,
) -> None:
    """foreachBatch body: fold one micro-batch into the persisted
    sketch. Reads the (tiny) current state version, merges per shard,
    writes a FRESH version directory and atomically flips the state
    manifest to it (streaming/state.py) — a crash at any point leaves
    either the old complete state or the new complete state, never a
    torn one.

    MG folds are NOT idempotent, so replay protection matters: Spark
    retries a foreachBatch that failed AFTER the state write but
    BEFORE the checkpoint commit with the SAME batch_id — the manifest
    watermark detects that and skips the re-fold. The manifest also
    pins (m, n_shards): resuming with a different n_shards would
    reshard terms (xxhash64 % n_shards) and silently split counts
    across shards, so a mismatch raises instead."""
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        validate_pin_with_default,
        validate_state_config,
        versioned_already_applied,
    )

    if versioned_already_applied(summary_path, batch_id):
        return
    validate_state_config(summary_path, {"m": m, "n_shards": n_shards})
    # source-column pin (knlm_stream's rule). term_col has no default
    # to fall back on, so a pre-pin state CANNOT trust-on-first-use —
    # one fold from the wrong column would mix two columns' counts and
    # then pin the wrong column. Migration is an explicit, one-time
    # acknowledgment: the caller re-runs with allow_repin=True naming
    # the column the summary was historically built from, and the pin
    # publishes below. Already-pinned states refuse mismatches as ever.
    from bigdatasmallprice_spark.streaming.state import read_state_manifest

    manifest = read_state_manifest(summary_path)
    if manifest is not None and "term_col" not in manifest.get("config", {}):
        if not allow_repin:
            raise ValueError(
                f"state at {summary_path} predates the term_col pin and "
                "the column cannot be inferred; re-run ONCE with "
                "allow_repin=True naming the column this summary was "
                "built from"
            )
    else:
        validate_pin_with_default(summary_path, "term_col", term_col, term_col)
    # shard hashes the ALIASED column: with term_col != "term" the
    # original F.col(term_col) no longer resolved after the alias
    # (latent until the source-column pin's test passed a real name)
    shard = F.pmod(F.xxhash64(F.col("term")), F.lit(n_shards)).cast("long")
    # NULL terms excluded — term=NULL is the summary's error sentinel
    b = (
        batch.select(F.col(term_col).alias("term"))
        .where(F.col("term").isNotNull())
        .withColumn("shard", shard)
    )
    state_dir = resolve_state_dir(summary_path)
    if state_dir is not None:
        state = spark.read.schema(SUMMARY_SCHEMA).parquet(state_dir)
    else:
        state = spark.createDataFrame([], SUMMARY_SCHEMA)
    both = state.select("shard", "term", "cnt").unionByName(
        b.select("shard", "term", F.lit(None).cast("long").alias("cnt"))
    )

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        sh = int(pdf["shard"].iloc[0])
        is_state = pdf["cnt"].notna()
        out = _fold_shard(
            pdf[is_state][["term", "cnt"]],
            [t for t in pdf[~is_state]["term"]],
            m,
        )
        out.insert(0, "shard", sh)
        return out

    new = both.groupBy("shard").applyInPandas(_fold, SUMMARY_SCHEMA)
    version = next_state_version(summary_path)
    new.coalesce(1).write.mode("overwrite").parquet(
        state_version_dir(summary_path, version)
    )
    publish_state(
        summary_path,
        version,
        batch_id,
        config={"m": m, "n_shards": n_shards, "term_col": term_col},
    )


def read_heavy_hitters(spark: SparkSession, summary_path: str) -> DataFrame:
    """Current sketch: (term, est, err_bound) with the PER-SHARD error
    (sharper than the batch operator's global bound)."""
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(summary_path)
    if state_dir is None:
        raise FileNotFoundError(f"no heavy-hitter state at {summary_path}")
    s = spark.read.schema(SUMMARY_SCHEMA).parquet(state_dir)
    errs = (
        s.filter(F.col("term").isNull())
        .groupBy("shard")
        .agg(F.sum("cnt").alias("err_bound"))
    )
    return (
        s.filter(F.col("term").isNotNull())
        .join(F.broadcast(errs), "shard")
        .select("term", F.col("cnt").alias("est"), "err_bound")
    )


def heavy_hitters_stream(
    spark: SparkSession,
    source: DataFrame,
    summary_path: str,
    checkpoint: str,
    term_col: str = "term",
    m: int = 64,
    n_shards: int = 8,
):
    """Wire a term stream into the incremental sketch (availableNow)."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_summary(spark, summary_path, batch, term_col, m, n_shards, batch_id=bid)

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
