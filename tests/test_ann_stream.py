"""Streaming IVF index maintenance (streaming/ann_stream.py): the
stream-assembled index manifest equals the batch ann_index_upsert
query bit-for-bit over time-split deliveries; replays and
re-deliveries cannot corrupt the membership fold; the quantizer
fingerprint pin refuses a different quantizer's assignments."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdatasmallprice_spark.registry import all_queries
from bigdatasmallprice_spark.streaming.ann_stream import (
    init_ann_index,
    read_index_manifest,
    read_index_state,
    update_ann_index,
)

SF = "/root/testdata/sf0.001"


def _splits(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    max_id = emb.agg(F.max("vec_id")).collect()[0][0]
    old_pred = F.col("vec_id") * 5 < F.lit(int(max_id)) * 4
    return emb.filter(old_pred), emb.filter(~old_pred)


def test_stream_assembled_index_equals_batch_upsert(spark, tmp_path):
    old, new = _splits(spark)
    state = str(tmp_path / "ann_state")
    init_ann_index(spark, state, old, k=8, iters=2)
    # the arrivals land in three interleaved deliveries
    for i in range(3):
        update_ann_index(
            spark, state, new.filter(F.col("vec_id") % 3 == i), batch_id=i
        )
    stream = sorted(map(tuple, read_index_manifest(spark, state).collect()))
    batch = sorted(
        map(tuple, all_queries()["ann_index_upsert"].fn(spark, SF).collect())
    )
    assert stream == batch
    # the state is the index: per-cell posting sizes match the manifest
    st = read_index_state(spark, state)
    assert st.count() == old.count() + new.count()

    # watermark replay: same batch_id is skipped outright
    update_ann_index(
        spark, state, new.filter(F.col("vec_id") % 3 == 1), batch_id=1
    )
    assert sorted(map(tuple, read_index_manifest(spark, state).collect())) == stream

    # untracked re-delivery (no batch_id): the set-union fold itself is
    # idempotent under the frozen quantizer — state unchanged
    update_ann_index(
        spark, state, new.filter(F.col("vec_id") % 3 == 2), batch_id=None
    )
    assert sorted(map(tuple, read_index_manifest(spark, state).collect())) == stream


def test_redelivered_id_replaces_stale_posting(spark, tmp_path):
    """A vector re-delivered with a CHANGED embedding (and an id that
    already exists in the base corpus) must REPLACE its old posting
    row — one row per id, n_total counts it once, and read_topk cannot
    surface it through two cells (r9 ADVICE item)."""
    old, new = _splits(spark)
    state = str(tmp_path / "ann_state")
    init_ann_index(spark, state, old, k=8, iters=2)
    update_ann_index(spark, state, new, batch_id=0)
    n_ids = read_index_state(spark, state).select("id").distinct().count()

    # mutate every delivered embedding hard enough to move cells, and
    # include a base id too — both must land in exactly one cell
    base_one = old.limit(1)
    mutated = (
        new.unionByName(base_one)
        .select(
            "vec_id",
            F.expr("transform(embedding, e -> -e)").alias("embedding"),
            *[c for c in new.columns if c not in ("vec_id", "embedding")],
        )
    )
    update_ann_index(spark, state, mutated, batch_id=1)

    st = read_index_state(spark, state)
    dup_ids = (
        st.groupBy("id").count().filter(F.col("count") > 1).count()
    )
    assert dup_ids == 0, "stale posting rows survived a re-delivery"
    assert st.count() == n_ids  # same id universe, no double-counting
    # manifest totals count each id exactly once
    total = (
        read_index_manifest(spark, state)
        .agg(F.sum("n_total"))
        .collect()[0][0]
    )
    assert total == n_ids


def test_quantizer_pin_refuses_different_centroids(spark, tmp_path):
    from bigdatasmallprice_spark.streaming.ann_stream import _centroid_dir

    old, new = _splits(spark)
    state = str(tmp_path / "ann_state")
    init_ann_index(spark, state, old, k=8, iters=2)
    # swap the quantizer under the index (shift every centroid): the
    # next delivery must refuse to fold
    cent = spark.read.parquet(_centroid_dir(state))
    moved = cent.select(
        "cid", F.expr("transform(cu, e -> e + 1000)").alias("cu")
    )
    moved.coalesce(1).write.mode("overwrite").parquet(_centroid_dir(state) + ".tmp")
    spark.read.parquet(_centroid_dir(state) + ".tmp").coalesce(1).write.mode(
        "overwrite"
    ).parquet(_centroid_dir(state))
    with pytest.raises(ValueError, match="different parameters"):
        update_ann_index(spark, state, new, batch_id=0)


def test_update_without_init_raises(spark, tmp_path):
    _, new = _splits(spark)
    with pytest.raises(FileNotFoundError, match="init_ann_index"):
        update_ann_index(spark, str(tmp_path / "missing"), new, batch_id=0)


def test_streamed_index_serves_like_batch_built_index(spark, tmp_path):
    """read_topk over the stream-folded posting lists equals the same
    search over a from-scratch batch-built index: the state membership
    itself is proven set-equal first, then the served top-k (exact
    integer re-rank, (d2, cand_id) total order) matches row for row."""
    from pyspark.sql import Window

    from bigdatasmallprice_spark.operators.similarity import (
        assign_cells,
        with_scaled_units,
    )
    from bigdatasmallprice_spark.streaming.ann_stream import (
        _read_centroids,
        read_topk,
    )

    old, new = _splits(spark)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    state = str(tmp_path / "ann_state")
    init_ann_index(spark, state, old, k=8, iters=2)
    for i in range(2):
        update_ann_index(
            spark, state, new.filter(F.col("vec_id") % 2 == i), batch_id=i
        )

    # 1) membership state == batch assignment of the full corpus
    cent = _read_centroids(spark, state)
    batch_members = sorted(
        map(
            tuple,
            assign_cells(with_scaled_units(emb), cent)
            .select("id", "cid")
            .collect(),
        )
    )
    stream_members = sorted(
        map(
            tuple,
            read_index_state(spark, state).select("id", "cid").collect(),
        )
    )
    assert stream_members == batch_members

    # 2) serving: the streamed index answers queries like a fresh one
    queries = emb.filter(F.col("vec_id") < 10)
    served = sorted(
        map(tuple, read_topk(spark, state, queries, emb, k=5, nprobe=2).collect())
    )
    assert len(served) == 10 * 5
    # rebuild the index batch-side into a second state and serve again
    state2 = str(tmp_path / "ann_state_batch")
    init_ann_index(spark, state2, old, k=8, iters=2)
    update_ann_index(spark, state2, new, batch_id=0)
    batch_served = sorted(
        map(tuple, read_topk(spark, state2, queries, emb, k=5, nprobe=2).collect())
    )
    assert served == batch_served
