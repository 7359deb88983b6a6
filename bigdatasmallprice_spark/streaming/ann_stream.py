"""Streaming IVF index maintenance: the continuous twin of
``ann_index_upsert`` (queries/simq.py).

The batch query freezes the coarse quantizer (trained once on the
existing corpus) and upserts an arrivals batch by nearest-centroid
assignment — no retrain, no corpus re-scan. This module runs the same
contract continuously: ``init_ann_index`` trains and PINS the
quantizer and folds the base corpus's assignments as version-0 state;
each ``update_ann_index`` delivery assigns only its own vectors
against the frozen centroids (one broadcast-assign narrow map — the
upsert cost scales with the delivery) and set-unions the (id, cid)
membership rows into the versioned state.

Merge class: given a FROZEN quantizer, a vector's cell is a pure
function of its embedding, so bit-identical re-deliveries fold as a
no-op; the fold itself is LAST-WRITER-WINS BY ID (a delivery's
assignment replaces any prior posting row for the same id via an
anti-join), so a vector re-delivered with a changed embedding — or an
id present in both the base corpus and a delivery — ends up in exactly
one cell instead of accumulating stale postings. The batch-id
watermark still skips replayed deliveries' work. What makes
idempotence REAL is the quantizer pin: assignments from two different
quantizers must never fold into one index, so the state manifest pins
an md5 fingerprint of the centroid table (the langid_stream
model-version rule) and a delivery scored against different centroids
refuses instead of silently mixing cell geometries.

The membership state IS the IVF index (per-cell posting lists — what
an IVF index stores by definition), and ``read_index_manifest`` is a
pure function of it, recomputed on read with the exact batch
aggregates — so stream-assembled manifest EQUALS the batch upsert
query's output bit-for-bit however arrivals were sliced across
deliveries (proven in tests/test_ann_stream.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ANN_STATE_SCHEMA = "id long, cid long, is_base boolean"
_CENTROID_SCHEMA = "cid long, cu array<long>"


def centroid_fingerprint(cent_rows: list[tuple[int, list[int]]]) -> str:
    """md5 of the canonical centroid serialization — the quantizer pin."""
    canon = ";".join(
        f"{cid}:{','.join(map(str, cu))}" for cid, cu in sorted(cent_rows)
    )
    return hashlib.md5(canon.encode()).hexdigest()


def _centroid_dir(state_path: str) -> str:
    return state_path.rstrip("/") + ".__centroids__"


def _read_centroids(spark: SparkSession, state_path: str) -> DataFrame:
    return spark.read.schema(_CENTROID_SCHEMA).parquet(_centroid_dir(state_path))


def _fingerprint_of(cent: DataFrame) -> str:
    rows = [(int(r.cid), [int(x) for x in r.cu]) for r in cent.collect()]
    return centroid_fingerprint(rows)


def init_ann_index(
    spark: SparkSession,
    state_path: str,
    base: DataFrame,
    k: int = 8,
    iters: int = 2,
) -> None:
    """Train the coarse quantizer on the base corpus, persist it beside
    the state, fold the base assignments as version-0 membership, and
    pin the quantizer fingerprint in the manifest. Centroids are
    model-sized (k rows) — the only collected object."""
    from bigdatasmallprice_spark.operators.similarity import (
        assign_cells,
        centroid_arrays,
        kmeans_fit_scaled,
        with_scaled_units,
    )
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        state_version_dir,
    )

    cent = centroid_arrays(kmeans_fit_scaled(base, k=k, iters=iters))
    cent.coalesce(1).write.mode("overwrite").parquet(_centroid_dir(state_path))
    cent = _read_centroids(spark, state_path)
    assigned = assign_cells(with_scaled_units(base), cent).select(
        "id", "cid", F.lit(True).alias("is_base")
    )
    version = next_state_version(state_path)
    assigned.coalesce(1).write.mode("overwrite").parquet(
        state_version_dir(state_path, version)
    )
    publish_state(
        state_path,
        version,
        batch_id=None,
        config={"quantizer_md5": _fingerprint_of(cent), "k": k},
    )


def update_ann_index(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: assign the delivery against the FROZEN
    pinned quantizer and set-union its (id, cid) membership rows into
    the state. Only the delivery is ever assigned; the prior state is
    read back, never recomputed."""
    from bigdatasmallprice_spark.operators.similarity import (
        assign_cells,
        with_scaled_units,
    )
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        read_state_manifest,
        resolve_state_dir,
        state_version_dir,
        validate_state_config,
        versioned_already_applied,
    )

    manifest = read_state_manifest(state_path)
    if manifest is None:
        raise FileNotFoundError(
            f"no ANN index state at {state_path}; run init_ann_index first"
        )
    if versioned_already_applied(state_path, batch_id):
        return
    cent = _read_centroids(spark, state_path)
    # the quantizer pin: refuse to fold assignments from a quantizer
    # other than the one the index was built with
    validate_state_config(
        state_path,
        {"quantizer_md5": _fingerprint_of(cent), "k": manifest["config"]["k"]},
    )
    part = (
        assign_cells(with_scaled_units(batch), cent)
        # within one delivery a duplicated id resolves deterministically
        # to its smallest cell; across deliveries the LATEST delivery
        # wins (see the anti-join below)
        .groupBy("id")
        .agg(F.min("cid").cast("long").alias("cid"))
        .select("id", "cid", F.lit(False).alias("is_base"))
    )
    state_dir = resolve_state_dir(state_path)
    prior = spark.read.schema(ANN_STATE_SCHEMA).parquet(state_dir)
    # Dedupe by id on fold (r9 ADVICE): a vector re-delivered with a
    # CHANGED embedding — or an id present in both the base corpus and
    # a delivery — must REPLACE its old posting row, not accumulate a
    # second one (stale postings double-count n_total and can surface
    # one id through two cells in read_topk). The delivery's assignment
    # wins; bit-identical re-deliveries still fold idempotently because
    # replacing a row with itself is a no-op.
    new = part.unionByName(prior.join(part.select("id"), "id", "left_anti"))
    version = next_state_version(state_path)
    new.coalesce(1).write.mode("overwrite").parquet(
        state_version_dir(state_path, version)
    )
    publish_state(
        state_path, version, batch_id, config=manifest["config"]
    )


def read_index_state(spark: SparkSession, state_path: str) -> DataFrame:
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no ANN index state at {state_path}")
    return spark.read.schema(ANN_STATE_SCHEMA).parquet(state_dir)


def read_index_manifest(spark: SparkSession, state_path: str) -> DataFrame:
    """(cid, n_old, n_new, n_total, min_new_id, max_new_id) over
    everything folded so far — the exact batch aggregates of
    ann_index_upsert run over the membership state, so the streaming
    manifest equals the batch query's output by construction."""
    state = read_index_state(spark, state_path)
    cells = _read_centroids(spark, state_path).select("cid")
    n_old = (
        state.filter(F.col("is_base"))
        .groupBy("cid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_old"))
    )
    n_new = (
        state.filter(~F.col("is_base"))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_new"),
            F.min("id").cast("long").alias("min_new_id"),
            F.max("id").cast("long").alias("max_new_id"),
        )
    )
    z = F.lit(0).cast("long")
    return (
        cells.join(n_old, "cid", "left")
        .join(n_new, "cid", "left")
        .select(
            "cid",
            F.coalesce(F.col("n_old"), z).alias("n_old"),
            F.coalesce(F.col("n_new"), z).alias("n_new"),
            (
                F.coalesce(F.col("n_old"), z) + F.coalesce(F.col("n_new"), z)
            ).alias("n_total"),
            F.coalesce(F.col("min_new_id"), F.lit(-1).cast("long")).alias(
                "min_new_id"
            ),
            F.coalesce(F.col("max_new_id"), F.lit(-1).cast("long")).alias(
                "max_new_id"
            ),
        )
    )


def read_topk(
    spark: SparkSession,
    state_path: str,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """(query_id, cand_id, d2, rank): IVF search SERVED from the
    streamed index — probe cells ranked by exact integer squared L2
    against the frozen pinned centroids (the n_queries x k expansion is
    vs the broadcast model-sized centroid table, then a per-query
    window over k rows), candidates drawn from the state's posting
    lists for those cells only (vectors re-joined from ``corpus`` by
    id — the index points into storage, as a production IVF does), and
    an exact integer re-rank. Proven identical to searching a
    batch-built index in tests/test_ann_stream.py; the continuously
    maintained index and a from-scratch one serve the same answers."""
    from pyspark.sql import Window

    from bigdatasmallprice_spark.operators.similarity import with_scaled_units

    cent = _read_centroids(spark, state_path)
    d2 = (
        "aggregate(zip_with(xu, cu, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    probes = (
        with_scaled_units(queries)
        .crossJoin(F.broadcast(cent))
        .selectExpr("id AS query_id", "xu AS qxu", "cid", f"{d2} AS cd2")
        .withColumn(
            "crn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("cd2", "cid")
            ),
        )
        .filter(F.col("crn") <= nprobe)
        .select("query_id", "qxu", F.col("cid").alias("cell"))
    )
    members = read_index_state(spark, state_path).select(
        F.col("id").alias("cand_id"), F.col("cid").alias("cell")
    )
    cand_vecs = members.join(
        with_scaled_units(corpus).select(
            F.col("id").alias("cand_id"), F.col("xu").alias("cxu")
        ),
        "cand_id",
    )
    qd2 = (
        "aggregate(zip_with(qxu, cxu, (a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    scored = (
        probes.join(cand_vecs, "cell")
        .filter(F.col("query_id") != F.col("cand_id"))
        .selectExpr("query_id", "cand_id", f"{qd2} AS d2")
    )
    w = Window.partitionBy("query_id").orderBy("d2", "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "d2", "rank")
    )
