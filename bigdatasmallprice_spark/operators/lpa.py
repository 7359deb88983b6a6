"""Weighted label propagation (LPA) — community detection as a
replayable iterative dataflow (Raghavan et al. 2007).

Each node starts as its own community (label = node id); per round
every node adopts the label with the LARGEST total edge weight among
its neighbors. Two determinism/stability anchors make the trajectory
engine-replayable (vanilla LPA is famously nondeterministic — random
update order, random tie-breaks — and fully synchronous LPA
oscillates on bipartite-ish structure, e.g. a single edge flip-flops
forever):

- SEMI-SYNCHRONOUS parity coloring (the standard oscillation fix,
  "LPA with graph coloring"): each round runs two half-steps — even
  ids update first against the current labels, then odd ids against
  the half-updated ones. A deterministic 2-coloring by id parity is
  not a proper graph coloring, but it breaks the synchronized swap
  that causes the flip-flop (traced in tests: one edge converges in
  one round);
- ties break on the SMALLEST label (a total order, not a coin flip),
  with the node's own current label participating at weight
  ``SELF_WEIGHT`` so an isolated or evenly-pulled node has a
  deterministic incumbent.

Fixed round count (LPA converges in a handful of rounds on sparse
graphs). Everything is integer (labels are node ids, scores BIGINT
weight sums), so the DuckDB oracle unrolls the identical half-steps.
Per half-step: ONE edge-label join + ONE (node, label) weight
aggregate + ONE argmax window — the canonical distributed LPA plan;
the node-sized label frame is localCheckpoint'ed EVERY half-step
(it is referenced three times by the next one — an unchecked union
chain re-evaluates its history per reference; measured 2x slower). Like the other walk-family consumers, communities
are detected on the TOP-K strongest-tie graph (the co-occurrence
graph saturates toward complete at scale, where LPA degenerates to
one giant community).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LPA_ITERS = 4  # full rounds; each round = 2 parity half-steps
SELF_WEIGHT = 1


def lpa_fit(
    nodes: DataFrame, edges: DataFrame, iters: int = LPA_ITERS
) -> DataFrame:
    """(node, label) after ``iters`` semi-synchronous weighted-majority
    rounds over a symmetric (src, dst, w) edge list."""
    from pyspark.sql import Window

    # checkpoint our OWN copy of the edge frame (it feeds every
    # half-step): persist()/unpersist() here would silently evict a
    # cache entry the CALLER created on the same plan — Spark's cache
    # manager keys on the logical plan, not the DataFrame object
    e = edges.localCheckpoint(eager=True)
    labels = nodes.select(
        "node", F.col("node").alias("label")
    ).localCheckpoint(eager=True)
    w_pick = Window.partitionBy("node").orderBy(
        F.col("score").desc(), F.col("label")
    )
    for _ in range(iters):
        for parity in (0, 1):
            # only the updating parity class needs scores this
            # half-step — halves the join/aggregate work
            nbr = (
                e.filter(F.col("src") % 2 == parity)
                .join(
                    labels.select(F.col("node").alias("dst"), "label"), "dst"
                )
                .groupBy(F.col("src").alias("node"), "label")
                .agg(F.sum("w").cast("long").alias("score"))
            )
            own = labels.filter(F.col("node") % 2 == parity).select(
                "node",
                "label",
                F.lit(SELF_WEIGHT).cast("long").alias("score"),
            )
            cand = (
                nbr.unionByName(own)
                .groupBy("node", "label")
                .agg(F.sum("score").cast("long").alias("score"))
                .withColumn("rn", F.row_number().over(w_pick))
                .filter(F.col("rn") == 1)
                .select("node", "label")
            )
            # checkpoint EVERY half-step: the label frame is referenced
            # three times next half-step (neighbor join, own rows, the
            # untouched-parity filter), so an unchecked union chain
            # re-evaluates its whole history per reference (measured
            # slower than the naive join form); the frame is node-sized,
            # so eager materialization is the cheap side of the trade
            labels = (
                labels.filter(F.col("node") % 2 != parity)
                .unionByName(cand)
                .localCheckpoint(eager=True)
            )
    return labels


def o_lpa_chain_sql(iters: int = LPA_ITERS, topk: int | None = None) -> str:
    """DuckDB CTE chain replaying the identical semi-synchronous
    half-steps over the top-k sparsified supplier co-purchase graph.
    Ends with l{2 * iters}(node, label)."""
    from bigdatasmallprice_spark.operators.triangles import (
        TOPK_TIES,
        o_topk_edges_sql,
    )

    k = TOPK_TIES if topk is None else topk
    parts = [
        f"""{o_topk_edges_sql(k)},
nodes AS MATERIALIZED (SELECT s_suppkey AS node FROM supplier),
l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"""
    ]
    for h in range(1, 2 * iters + 1):
        parity = (h - 1) % 2
        parts.append(f"""sc{h} AS (
  SELECT node, label, CAST(SUM(score) AS BIGINT) AS score FROM (
    SELECT es.src AS node, l.label, es.w AS score
    FROM es JOIN l{h - 1} l ON l.node = es.dst
    WHERE es.src % 2 = {parity}
    UNION ALL
    SELECT node, label, CAST({SELF_WEIGHT} AS BIGINT) AS score
    FROM l{h - 1} WHERE node % 2 = {parity}
  ) GROUP BY 1, 2
),
c{h} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node ORDER BY score DESC, label) AS rn
    FROM sc{h}
  ) WHERE rn = 1
),
l{h} AS MATERIALIZED (
  SELECT node, label FROM l{h - 1} WHERE node % 2 <> {parity}
  UNION ALL
  SELECT node, label FROM c{h}
)""")
    return ",\n".join(parts)
