"""Incremental Z-order table maintenance — the streaming OPTIMIZE
ZORDER loop (the Delta/Iceberg maintenance pattern, composed from the
engine's existing pieces: operators/zorder.py's Morton clustering and
streaming/state.py's versioned crash-atomic swap).

A one-shot ``zorder_write`` lays the whole table out once; real tables
keep receiving data. Appending micro-batches as-is fragments the
layout (new files span the full z range, footer pruning decays toward
the unclustered scan), and re-running the one-shot write per batch
rewrites the entire table every time — at 100 TB both are wrong. The
incremental loop instead treats each clustered file as the owner of a
compact z-range (its footer min/max of the persisted ``__z`` column)
and, per batch, rewrites ONLY the files whose range the new rows
touch:

1. compute the delta's z-values (pure codegen bit-interleave);
2. read the current version's per-file ``__z`` footer stats (a
   file-count-sized metadata pass, like any OPTIMIZE planner);
3. segment the z-axis into INTERVALS — each file's range plus the
   gaps between/around them — and count delta rows per interval with
   ONE aggregate; rows of untouched files are never read;
4. write a NEW version directory: each HIT file-interval rewrites as
   its own unit (its rows + its delta rows, confined to its span),
   each hit gap-interval becomes new files confined to that gap,
   untouched files HARDLINK in (zero data copy). Per-interval
   confinement keeps all file ranges PAIRWISE DISJOINT forever — the
   invariant footer pruning and future ownership decisions rely on
   (folding gap rows into an affected rewrite would mint files
   spanning across untouched files' ranges);
5. atomically flip the manifest (``publish_state``). Appends are not
   idempotent, so the replay watermark guards at-least-once retries —
   same contract as the Count-Min stream. An empty delivery advances
   only the watermark (re-publishing the same version would GC the
   previous version dir out from under a concurrent reader).

Unlike ``zorder_write`` (which drops the z column — pure layout
metadata), the maintained table PERSISTS ``__z``: it is the bookkeeping
that makes incremental ownership decidable from footers alone, the
explicit form of what Delta keeps in its transaction-log file stats.
``read_zorder_table`` hides it from consumers.

No reference counterpart (the reference's tables are TimescaleDB
hypertables; chunk-local btrees play the pruning role). Spec: the
OPTIMIZE ZORDER maintenance loop as shipped by Delta Lake/Iceberg.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.zorder import zvalue_col
from bigdatasmallprice_spark.streaming.state import (
    next_state_version,
    publish_state,
    resolve_state_dir,
    state_version_dir,
    validate_state_config,
    versioned_already_applied,
)

ZCOL = "__z"


def _file_z_ranges(state_dir: str) -> list[tuple[str, int, int, int]]:
    """(path, min_z, max_z, num_rows) per parquet file from footer
    statistics — the OPTIMIZE planner's metadata pass (file-count-
    sized, no data read; num_rows sizes the rewrite without a scan)."""
    import glob

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(state_dir, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        zi = names.index(ZCOL)
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(zi).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if lo is not None:
            out.append((f, int(lo), int(hi), int(md.num_rows)))
    return out


def update_zorder_table(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    x_sql: str,
    y_sql: str,
    bits: int = 8,
    rows_per_file: int = 4096,
    batch_id: int | None = None,
) -> dict:
    """Fold one micro-batch into the z-clustered table: rewrite only
    the z-ranges the batch touches, hardlink the rest, flip the
    version atomically. Returns {"rewritten": n, "linked": n,
    "files_after": n} (all zero-ish on a skipped replay)."""
    config = {"x_sql": x_sql, "y_sql": y_sql, "bits": bits}
    validate_state_config(state_path, config)
    if versioned_already_applied(state_path, batch_id):
        return {"rewritten": 0, "linked": 0, "skipped_replay": True}

    # NULL z (a NULL layout input) saturates to bucket 0 like the
    # documented clamp semantics — dropping the row would be silent
    # data loss (every interval's `between` is NULL for it)
    delta = batch.withColumn(
        ZCOL,
        F.coalesce(zvalue_col(F.expr(x_sql), F.expr(y_sql), bits), F.lit(0)),
    ).persist()
    cur = resolve_state_dir(state_path)
    ranges = sorted(
        _file_z_ranges(cur) if cur is not None else [], key=lambda r: r[1]
    )
    # the per-file ownership below needs pairwise-disjoint ranges —
    # the invariant this function maintains (and a one-shot
    # zorder-style write produces). A corrupted/foreign layout falls
    # back to one full rewrite — ALL existing files become a single
    # rewrite unit (emptying `ranges` alone would publish a version
    # holding only the delta and lose the table)
    disjoint = all(
        ranges[i][2] < ranges[i + 1][1] for i in range(len(ranges) - 1)
    )
    full_rewrite_paths: list[str] = []
    full_rewrite_rows = 0
    if not disjoint:
        full_rewrite_paths = [p for p, _, _, _ in ranges]
        full_rewrite_rows = sum(n for _, _, _, n in ranges)
        ranges = []

    # Segment the z-axis into INTERVALS — each existing file's range
    # plus the gaps between/around them — so every delta row belongs
    # to exactly ONE interval. Rows in a file's range rewrite that
    # file; rows in a gap become new files CONFINED to that gap. This
    # is what keeps all file ranges pairwise disjoint forever: folding
    # gap rows into an affected rewrite (or writing all gap rows as
    # one unit) would mint files spanning across untouched files'
    # ranges, silently decaying footer pruning toward the unclustered
    # scan and misclassifying future batches.
    intervals: list[tuple[str | None, int, int, int]] = []  # (path|None, lo, hi, nrows)
    prev_hi = None
    for path, lo, hi, nrows in ranges:
        # leading gap opens at -2^62, not 0: a caller whose layout
        # expressions are unclamped can produce negative z, and those
        # rows must land in a gap file, never vanish
        gap_lo = -(1 << 62) if prev_hi is None else prev_hi + 1
        if gap_lo <= lo - 1:
            intervals.append((None, gap_lo, lo - 1, 0))
        intervals.append((path, lo, hi, nrows))
        prev_hi = hi
    tail_lo = -(1 << 62) if prev_hi is None else prev_hi + 1
    intervals.append((None, tail_lo, 1 << 62, 0))

    # ONE aggregate over the delta: total rows + per-interval hit
    # counts (intervals partition the z-axis, so each row counts once)
    counts = delta.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum((F.col(ZCOL).between(lo, hi)).cast("long")).alias(f"f{i}")
            for i, (_, lo, hi, _) in enumerate(intervals)
        ],
    ).collect()[0]
    n_delta = counts["__n"]
    if n_delta == 0:
        # nothing to fold — advance ONLY the replay watermark.
        # Re-publishing the current version would collapse the GC
        # keep-set to one directory and delete the genuinely-previous
        # version a reader may still be scanning (publish_state's
        # reader-grace contract).
        delta.unpersist()
        if batch_id is not None:
            from bigdatasmallprice_spark.streaming.state import (
                advance_watermark,
            )

            advance_watermark(state_path, batch_id)
        return {"rewritten": 0, "linked": 0, "empty_batch": True}

    hits = [(counts[f"f{i}"] or 0) for i in range(len(intervals))]
    untouched = [
        path
        for i, (path, _, _, _) in enumerate(intervals)
        if path is not None and hits[i] == 0
    ]

    version = next_state_version(state_path)
    vdir = state_version_dir(state_path, version)

    # Row counts come from footers + the hit aggregate — no data pass
    # is spent on sizing.
    def _write_unit(df: DataFrame, n_rows: int) -> int:
        # nearest-rounding, not ceil: a unit at 1.05x the target must
        # stay ONE file (ceil would double every unit that absorbed a
        # few rows — file-count inflation on every narrow batch)
        n_files = max(1, int(n_rows / rows_per_file + 0.5))
        (
            df.repartitionByRange(n_files, ZCOL)
            .sortWithinPartitions(ZCOL)
            .write.mode("append")
            .parquet(vdir)
        )
        return n_files

    written = 0
    rewritten = 0
    if full_rewrite_paths:
        # non-disjoint fallback: every existing file + the whole delta
        # becomes one rewrite — restores the disjointness invariant
        unit = spark.read.parquet(*full_rewrite_paths)
        unit = unit.unionByName(delta.select(*unit.columns))
        written += _write_unit(unit, full_rewrite_rows + n_delta)
        rewritten = len(full_rewrite_paths)
    else:
        for i, (path, lo, hi, nrows) in enumerate(intervals):
            if hits[i] == 0:
                continue
            unit = delta.filter(F.col(ZCOL).between(lo, hi))
            if path is not None:
                prev = spark.read.parquet(path)
                unit = prev.unionByName(unit.select(*prev.columns))
                rewritten += 1
            written += _write_unit(unit, nrows + hits[i])

    # untouched files enter the new version as hardlinks: incremental
    # in IO, still crash-atomic (the manifest flip publishes a complete
    # directory or nothing). Linked names are rebuilt from a CONTENT
    # DIGEST of the original basename, not by prefixing it — prefixing
    # would grow the name by one "part-linked-" layer per surviving
    # batch, unbounded over a long stream.
    import hashlib

    linked = 0
    for i, src in enumerate(sorted(untouched)):
        tag = hashlib.md5(os.path.basename(src).encode()).hexdigest()[:16]
        dst = os.path.join(vdir, f"part-linked-{i:05d}-{tag}.parquet")
        os.link(src, dst)
        linked += 1
    delta.unpersist()
    publish_state(state_path, version, batch_id, config=config)
    return {
        "rewritten": rewritten,
        "linked": linked,
        "files_after": linked + written,
    }


def read_zorder_table(spark: SparkSession, state_path: str) -> DataFrame:
    """The current table version, layout column hidden."""
    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no zorder table at {state_path}")
    return spark.read.parquet(state_dir).drop(ZCOL)


def zorder_table_stats(state_path: str) -> list[tuple[str, int, int]]:
    """Per-file z-ranges of the current version (for tests/monitoring)."""
    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        return []
    return _file_z_ranges(state_dir)


def zorder_table_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    checkpoint: str,
    x_sql: str,
    y_sql: str,
    bits: int = 8,
    rows_per_file: int = 4096,
):
    """Wire a stream into the incremental z-ordered table
    (availableNow): restart-safe via the stream checkpoint + the replay
    watermark (appends are not idempotent)."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_zorder_table(
            spark,
            state_path,
            batch,
            x_sql,
            y_sql,
            bits=bits,
            rows_per_file=rows_per_file,
            batch_id=bid,
        )

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
