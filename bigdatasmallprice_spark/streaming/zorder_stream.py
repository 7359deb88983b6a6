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
3. affected = files whose [min_z, max_z] contains at least one delta
   z (one tiny aggregate over the delta); rows of untouched files are
   never read;
4. write a NEW version directory: affected files + delta re-range-
   partitioned on ``__z`` (each rewritten file sized to
   ``rows_per_file``), untouched files HARDLINKED in (zero data copy);
5. atomically flip the manifest (``publish_state``). Appends are not
   idempotent, so the replay watermark guards at-least-once retries —
   same contract as the Count-Min stream.

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


def _file_z_ranges(state_dir: str) -> list[tuple[str, int, int]]:
    """(path, min_z, max_z) per parquet file from footer statistics —
    the OPTIMIZE planner's metadata pass (file-count-sized, no data
    read)."""
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
            out.append((f, int(lo), int(hi)))
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

    delta = batch.withColumn(
        ZCOL, zvalue_col(F.expr(x_sql), F.expr(y_sql), bits)
    )
    n_delta = delta.count()
    cur = resolve_state_dir(state_path)
    if n_delta == 0:
        # nothing to fold — advance only the replay watermark (keep the
        # current version dir; an empty batch must not mint an empty
        # file or rewrite anything)
        if cur is not None and batch_id is not None:
            from bigdatasmallprice_spark.streaming.state import (
                read_state_manifest,
            )

            manifest = read_state_manifest(state_path)
            if manifest is not None:
                publish_state(
                    state_path, manifest["version"], batch_id, config=config
                )
        return {"rewritten": 0, "linked": 0, "empty_batch": True}
    ranges = _file_z_ranges(cur) if cur is not None else []

    if ranges:
        # one tiny aggregate over the delta decides ownership: which
        # existing files' z-ranges receive at least one new row
        hit_flags = delta.agg(
            *[
                F.max(
                    (F.col(ZCOL).between(lo, hi)).cast("int")
                ).alias(f"f{i}")
                for i, (_, lo, hi) in enumerate(ranges)
            ]
        ).collect()[0]
        affected = [
            path
            for i, (path, _, _) in enumerate(ranges)
            if hit_flags[f"f{i}"] == 1
        ]
    else:
        affected = []
    untouched = [p for p, _, _ in ranges if p not in set(affected)]

    to_write = delta
    n_rows = n_delta
    if affected:
        prev = spark.read.parquet(*affected)
        to_write = prev.unionByName(delta.select(*prev.columns))
        n_rows = to_write.count()
    n_files = max(1, -(-n_rows // rows_per_file))

    version = next_state_version(state_path)
    vdir = state_version_dir(state_path, version)
    (
        to_write.repartitionByRange(n_files, ZCOL)
        .sortWithinPartitions(ZCOL)
        .write.mode("overwrite")
        .parquet(vdir)
    )
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
    publish_state(state_path, version, batch_id, config=config)
    return {
        "rewritten": len(affected),
        "linked": linked,
        "files_after": linked + n_files,
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
