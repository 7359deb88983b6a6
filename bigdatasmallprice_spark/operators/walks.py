"""Deterministic random-walk corpus + skip-gram pair extraction — the
DeepWalk/node2vec DATA-PREP stage (Perozzi et al. 2014): graph
embeddings train on (center, context) pairs harvested from truncated
random walks, exactly as word2vec trains on text windows. This module
generates the pair corpus; the embedding fit that consumes it is
operators/sgns.py (the skip-gram-with-negative-sampling trainer).

The house twist: the walks are DETERMINISTIC. Each step chooses the
next neighbor by an md5-slice hash of (start, walk, step, current)
modulo the current node's degree — the engine-portable stand-in for a
seeded RNG (same device as the repo's other md5-slice mixes), so the
"random" walk corpus is bit-reproducible across engines AND runs: the
DuckDB oracle replays every step of every walk. Spark-side the hash is
``conv(substr(md5(k), 1, 8), 16, 10)``, DuckDB-side
``('0x' || substr(md5(k), 1, 8))::BIGINT`` — verified equal (positive,
< 2^32, so the ``% deg`` semantics agree everywhere).

Walks run on the TOP-K strongest-tie graph (operators/triangles.py::
topk_edges — the same pruning Pixie applies before walking): neighbor
lists stay bounded, and each step is ONE equi-join of the walk
frontier against the (src, idx) neighbor index — W*n frontier rows
joining an n*k edge list, L-1 times. Dead ends (nodes with no
neighbors) terminate their walk early, the standard truncation.
Skip-gram pairs: every ordered (center, context) pair within the
window along each walk, counted exactly — the positive-pair corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WALKS_PER_NODE = 4
WALK_LEN = 8  # nodes per walk (WALK_LEN - 1 steps)
SKIPGRAM_WINDOW = 2


def _spark_choice(step: int) -> str:
    """Deterministic neighbor index for this step: md5-slice of
    (start, w, step, node) mod degree."""
    key = (
        "concat_ws(':', CAST(start AS STRING), CAST(w AS STRING), "
        f"CAST({step} AS STRING), CAST(node AS STRING))"
    )
    return f"CAST(conv(substr(md5({key}), 1, 8), 16, 10) AS BIGINT) % deg"


def neighbor_index(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Symmetric (src, dst, w) edges -> ((src, idx, dst) neighbor index
    ordered by dst, (src, deg) degrees)."""
    from pyspark.sql import Window

    w_nb = Window.partitionBy("src").orderBy("dst")
    nb = edges.select(
        "src",
        (F.row_number().over(w_nb) - 1).cast("long").alias("idx"),
        "dst",
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
    return nb, deg


def random_walks(
    edges: DataFrame,
    nodes: DataFrame,
    walks_per_node: int = WALKS_PER_NODE,
    walk_len: int = WALK_LEN,
) -> DataFrame:
    """(start, w, step, node): ``walks_per_node`` deterministic
    truncated walks from every node. Each step is one frontier join
    against the neighbor index."""
    nb, deg = neighbor_index(edges)
    nb = nb.persist()
    deg = deg.persist()
    frontier = nodes.select(
        F.col("node").alias("start"),
        F.explode(
            F.array(*[F.lit(i).cast("long") for i in range(walks_per_node)])
        ).alias("w"),
        F.lit(0).cast("long").alias("step"),
        "node",
    )
    frames = [frontier]
    for t in range(walk_len - 1):
        nxt = (
            frontier.join(deg.withColumnRenamed("src", "node"), "node")
            .withColumn("idx", F.expr(_spark_choice(t)))
            .join(
                nb.withColumnRenamed("src", "node"), ["node", "idx"]
            )
            .select(
                "start",
                "w",
                F.lit(t + 1).cast("long").alias("step"),
                F.col("dst").alias("node"),
            )
        )
        # checkpoint EVERY step: the step frame is referenced twice
        # (the walks union AND the next frontier), and the pair stage
        # self-joins the union — an unchecked chain re-embeds every
        # prefix per reference, exploding the static plan (1.4k
        # Exchange nodes measured) while the frontier itself is only
        # W*n rows — eager materialization is the cheap side
        nxt = nxt.localCheckpoint(eager=True)
        frames.append(nxt)
        frontier = nxt
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    # the union of L checkpointed step frames carries L * (session
    # parallelism) fragmented partitions; every consumer (the skip-gram
    # self-join above all) pays per-partition task overhead for rows
    # that total only n * W * L. Narrow-coalesce back to the session's
    # shuffle width (4.7s -> 1.5s on the sf0.1 pair build, measured)
    out = out.coalesce(
        int(out.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    )
    # every step frame is checkpointed, so the internal caches are
    # dead weight the moment the loop ends — release them (a streaming
    # readback calling this repeatedly must not accumulate cache
    # entries)
    nb.unpersist()
    deg.unpersist()
    return out


def skipgram_pairs(
    walks: DataFrame, window: int = SKIPGRAM_WINDOW
) -> DataFrame:
    """(center, context, cnt): every ordered within-window pair along
    each walk, counted exactly — the positive-pair training corpus."""
    a = walks.select(
        "start", "w", F.col("step").alias("i"), F.col("node").alias("center")
    )
    b = walks.select(
        "start", "w", F.col("step").alias("j"), F.col("node").alias("context")
    )
    return (
        a.join(b, ["start", "w"])
        .filter(
            (F.col("i") != F.col("j"))
            & (F.abs(F.col("i") - F.col("j")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def o_walk_chain_sql(
    walks_per_node: int = WALKS_PER_NODE,
    walk_len: int = WALK_LEN,
    topk: int | None = None,
) -> str:
    """DuckDB CTE chain replaying the identical deterministic walks
    over the (optionally top-k sparsified) supplier co-purchase graph.
    Ends with ``walks(start, w, step, node)``."""
    from bigdatasmallprice_spark.operators.triangles import (
        TOPK_TIES,
        o_topk_edges_sql,
    )

    k = TOPK_TIES if topk is None else topk
    parts = [
        f"""{o_topk_edges_sql(k)},
nb AS MATERIALIZED (
  SELECT src, CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS idx, dst
  FROM es
),
dg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM es GROUP BY 1),
nodes AS (SELECT s_suppkey AS node FROM supplier),
s0 AS MATERIALIZED (
  SELECT node AS start, CAST(ws.w AS BIGINT) AS w, CAST(0 AS BIGINT) AS step, node
  FROM nodes, (SELECT unnest(range({walks_per_node})) AS w) ws
)"""
    ]
    for t in range(walk_len - 1):
        key = (
            "CAST(s.start AS VARCHAR) || ':' || CAST(s.w AS VARCHAR) || ':' "
            f"|| CAST({t} AS VARCHAR) || ':' || CAST(s.node AS VARCHAR)"
        )
        choice = f"('0x' || substr(md5({key}), 1, 8))::BIGINT % dg.deg"
        parts.append(f"""s{t + 1} AS MATERIALIZED (
  SELECT s.start, s.w, CAST({t + 1} AS BIGINT) AS step, nb.dst AS node
  FROM s{t} s
  JOIN dg ON dg.src = s.node
  JOIN nb ON nb.src = s.node AND nb.idx = {choice}
)""")
    union = " UNION ALL ".join(f"SELECT * FROM s{t}" for t in range(walk_len))
    parts.append(f"walks AS ({union})")
    return ",\n".join(parts)
