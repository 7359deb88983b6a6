"""Streaming graph maintenance: the continuous twin of
``pagerank_copurchase`` (queries/graphq.py).

The design point: co-purchase EDGE WEIGHTS are not row-mergeable — an
order whose lineitems arrive split across two deliveries (supplier
sets S1 then S2) owes the cross pairs S1 x S2 that neither batch can
see alone. What IS mergeable is one level down: the distinct
(order, supplier) MEMBERSHIP relation, whose fold is set union —
idempotent and order-independent (the strongest merge class in the
streaming family: bloom OR and HLL MAX are idempotent, Count-Min /
quantile SUMs are not). Each micro-batch distinct-folds its
(l_orderkey, l_suppkey) pairs into the state; edge weights and
PageRank are pure functions of the membership relation, recomputed on
READ with the exact batch operators — so stream ranks EQUAL batch
ranks by construction, however orders were sliced across deliveries.

Because set union is idempotent, a re-delivered row cannot corrupt the
state (tested); the batch-id watermark is still applied so replayed
batches skip the fold work entirely. At 100 TB the membership state is
the deduplicated (order, supplier) relation — far smaller than raw
lineitems — and the read-side recompute is the same
two-shuffle-edges + iterate plan the batch query runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

G_STATE_SCHEMA = "ok long, sk long"


def update_graph_state(
    spark: SparkSession,
    state_path: str,
    batch: DataFrame,
    batch_id: int | None = None,
) -> None:
    """foreachBatch body: set-union the batch's distinct
    (order, supplier) membership pairs into the state."""
    from bigdatasmallprice_spark.streaming.state import (
        next_state_version,
        publish_state,
        resolve_state_dir,
        state_version_dir,
        versioned_already_applied,
    )

    if versioned_already_applied(state_path, batch_id):
        return
    part = batch.select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).distinct()
    state_dir = resolve_state_dir(state_path)
    if state_dir is not None:
        part = part.unionByName(
            spark.read.schema(G_STATE_SCHEMA).parquet(state_dir)
        )
    new = part.distinct()
    version = next_state_version(state_path)
    new.coalesce(1).write.mode("overwrite").parquet(
        state_version_dir(state_path, version)
    )
    publish_state(state_path, version, batch_id)


def read_graph_state(spark: SparkSession, state_path: str) -> DataFrame:
    from bigdatasmallprice_spark.streaming.state import resolve_state_dir

    state_dir = resolve_state_dir(state_path)
    if state_dir is None:
        raise FileNotFoundError(f"no graph membership state at {state_path}")
    return spark.read.schema(G_STATE_SCHEMA).parquet(state_dir)


def read_pagerank(
    spark: SparkSession, state_path: str, nodes: DataFrame, iters: int | None = None
) -> DataFrame:
    """(node, r) over everything folded so far — the state's membership
    relation run through the EXACT batch operators (copurchase_edges
    expects lineitem column names, so the state renames back), which is
    what makes stream == batch hold by construction."""
    from bigdatasmallprice_spark.operators.pagerank import (
        PR_ITERS,
        copurchase_edges,
        pagerank_fit,
    )

    membership = read_graph_state(spark, state_path).select(
        F.col("ok").alias("l_orderkey"), F.col("sk").alias("l_suppkey")
    )
    edges = copurchase_edges(membership)
    return pagerank_fit(
        nodes, edges, iters=iters if iters is not None else PR_ITERS
    )


def read_skipgram_pairs(
    spark: SparkSession, state_path: str, nodes: DataFrame
) -> DataFrame:
    """(center, context, cnt) over everything folded so far — the
    membership state run through the exact batch walk pipeline
    (top-k sparsify -> deterministic walks -> skip-gram pairs), so the
    streaming corpus equals the batch corpus by construction. One
    graph state serves BOTH readbacks: centrality (read_pagerank) and
    the embedding pair corpus (this)."""
    from bigdatasmallprice_spark.operators.pagerank import copurchase_edges
    from bigdatasmallprice_spark.operators.triangles import topk_edges
    from bigdatasmallprice_spark.operators.walks import (
        random_walks,
        skipgram_pairs,
    )

    membership = read_graph_state(spark, state_path).select(
        F.col("ok").alias("l_orderkey"), F.col("sk").alias("l_suppkey")
    )
    # checkpoint: random_walks evaluates the edge frame twice (its
    # neighbor index and its degree table) — the batch query persists
    # for the same reason; a checkpoint self-cleans across readbacks
    edges = topk_edges(copurchase_edges(membership)).localCheckpoint(
        eager=True
    )
    return skipgram_pairs(random_walks(edges, nodes))


def read_node_embeddings(
    spark: SparkSession,
    state_path: str,
    nodes: DataFrame,
    iters: int | None = None,
) -> DataFrame:
    """(node, dim, u, v) over everything folded so far — the streamed
    membership state run through the EXACT batch embedding pipeline
    (read_skipgram_pairs' corpus -> deterministic negatives -> the
    all-integer SGNS fit), so streaming embeddings equal the batch
    query's bit-for-bit by construction. This completes the continuous
    DeepWalk loop: the same graph state serves centrality
    (read_pagerank), the training corpus (read_skipgram_pairs), and
    the trained representation (this)."""
    from bigdatasmallprice_spark.operators.sgns import (
        SGNS_ITERS,
        sgns_fit,
        sgns_init,
        sgns_training_pairs,
    )

    pairs = read_skipgram_pairs(spark, state_path, nodes)
    n = nodes.count()  # model-sized scalar (the batch query's n)
    # checkpoint: the training table is scanned once per GD iteration;
    # the batch query persists for the same reason (self-cleans here)
    train = sgns_training_pairs(pairs, nodes, n).localCheckpoint(
        eager=True
    )
    return sgns_fit(
        train,
        sgns_init(nodes),
        iters=iters if iters is not None else SGNS_ITERS,
    )


def graph_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    checkpoint: str,
):
    """Wire a lineitem stream into the incremental co-purchase
    membership state (availableNow): restart-safe via the stream
    checkpoint + the replay watermark (the fold is idempotent, so the
    watermark only saves work — it is not load-bearing for
    correctness, unlike the SUM streams)."""

    def _batch_fn(batch: DataFrame, bid: int) -> None:
        update_graph_state(spark, state_path, batch, batch_id=bid)

    return (
        source.writeStream.foreachBatch(_batch_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
    )
