"""Degree-ordered triangle counting — the canonical distributed graph
kernel (Suri & Vassilvitskii 2011, "Counting Triangles and the Curse
of the Last Reducer").

The naive wedge join explodes on hubs: a degree-d node contributes
d*(d-1)/2 wedges, so one celebrity vertex can dominate the whole
shuffle (the "last reducer"). The standard fix is to ORIENT each
undirected edge from its lower-ranked endpoint to its higher-ranked
endpoint under the total order (degree, node-id): every node's
OUT-degree is then bounded (a hub's edges point INTO it from its
lower-degree neighbors), wedges are built only between out-neighbors,
and each triangle is found exactly once — at its lowest-ranked vertex.
Wedge volume drops from sum(d^2) to O(E^1.5) worst case, which is the
difference between feasible and not at 100 TB edge lists.

Everything is exact integers (degrees, ranks via row_number over the
deterministic (degree, node) order, counts), so the DuckDB oracle
replays the identical plan: undirected edge set -> degrees -> rank ->
orientation -> wedge self-join -> closing-edge equi-join -> per-node
unwind. No iteration, three shuffles, all equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


TOPK_TIES = 10  # per-node strongest-tie budget for graph sparsification


def topk_edges(edges: DataFrame, k: int = TOPK_TIES) -> DataFrame:
    """kNN-graph sparsification: keep each node's k STRONGEST ties
    (weight desc, neighbor-id tie-break), union over directions — the
    standard densification guard before triangle/community analysis
    (a co-occurrence graph over n entities saturates toward complete
    as the corpus grows; the top-k graph stays at <= n*k edges at any
    scale). Output is symmetric (both directions), weights kept."""
    from pyspark.sql import Window

    w_rank = Window.partitionBy("src").orderBy(F.col("w").desc(), F.col("dst"))
    kept = (
        edges.select("src", "dst", "w", F.row_number().over(w_rank).alias("rn"))
        .filter(F.col("rn") <= k)
        .select("src", "dst", "w")
    )
    # union over directions: an undirected tie survives if EITHER
    # endpoint ranks it top-k; re-symmetrize for downstream consumers
    und = kept.select(
        F.least("src", "dst").alias("u"),
        F.greatest("src", "dst").alias("v"),
        "w",
    ).groupBy("u", "v").agg(F.max("w").cast("long").alias("w"))
    return und.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )


def undirected_edges(edges: DataFrame) -> DataFrame:
    """(u, v) with u < v, distinct — the undirected edge set of a
    symmetric weighted edge list (weights dropped: triangles are a
    topology statistic)."""
    return (
        edges.filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Per-node triangle participation over a symmetric edge list:
    (node, degree, n_tri, n_wedges) for every node in ``nodes``
    (isolated nodes included with zeros). n_wedges = deg*(deg-1)/2 is
    the local clustering denominator, kept as an exact integer next to
    n_tri instead of a float ratio.

    The edge and oriented-edge frames are localCheckpoint'ed rather
    than persisted: each is referenced 2-3 times downstream (degrees,
    ranking, wedges x2, the closing join), and a lazy cache leaves the
    full upstream pipeline embedded per reference in the static plan —
    checkpointing truncates it to the materialized frame."""
    und = undirected_edges(edges).localCheckpoint(eager=True)
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    # total order (degree, node): rank every touched node. Banded
    # two-phase rank (operators/topk.py::banded_global_rank, band =
    # degree ASC, tie = node) — bit-identical to ROW_NUMBER() OVER
    # (ORDER BY degree, node) but the |V|-scale sort is sharded by
    # degree value (power-law: few distinct degrees), never a single
    # reducer. The degree-1 band is the biggest; its within-band sort
    # is still partitioned per band value, and orientation only needs
    # ANY consistent total order, so a skewed band shards fine.
    from bigdatasmallprice_spark.operators.topk import banded_global_rank

    rnk = banded_global_rank(
        deg, "degree", "node", out_col="rk", band_desc=False
    ).select("node", "degree", "rk")
    ra = rnk.select(F.col("node").alias("u"), F.col("rk").alias("rku"))
    rb = rnk.select(F.col("node").alias("v"), F.col("rk").alias("rkv"))
    # orient each edge low-rank -> high-rank
    oe = (
        und.join(ra, "u")
        .join(rb, "v")
        .select(
            F.when(F.col("rku") < F.col("rkv"), F.col("u"))
            .otherwise(F.col("v"))
            .alias("a"),
            F.when(F.col("rku") < F.col("rkv"), F.col("v"))
            .otherwise(F.col("u"))
            .alias("b"),
        )
    ).localCheckpoint(eager=True)
    # wedges between out-neighbors of the same (lowest-ranked) apex;
    # b < c by NODE ID normalizes the closing-edge key to match und
    w1 = oe.select(F.col("a"), F.col("b").alias("b"))
    w2 = oe.select(F.col("a"), F.col("b").alias("c"))
    wedges = w1.join(w2, "a").filter(F.col("b") < F.col("c"))
    tris = wedges.join(
        und.select(F.col("u").alias("b"), F.col("v").alias("c")), ["b", "c"]
    ).select("a", "b", "c")
    per_node = (
        tris.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    z = F.lit(0).cast("long")
    out = (
        nodes.join(deg, "node", "left")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce(F.col("degree"), z).alias("degree"),
            F.coalesce(F.col("n_tri"), z).alias("n_tri"),
            F.expr(
                "CAST(coalesce(degree, 0) * (coalesce(degree, 0) - 1) "
                "DIV 2 AS BIGINT)"
            ).alias("n_wedges"),
        )
    )
    return out


def o_topk_edges_sql(k: int = TOPK_TIES) -> str:
    """The ONE definition of the top-k sparsified supplier co-purchase
    graph as oracle CTE text — shared by the triangle, LPA, walk and
    PPR oracles so the sparsification rule cannot drift between them.
    Defines: lo, e0 (directed, weighted), kept (per-node top-k by
    weight desc / neighbor-id), undw (undirected, MAX weight), es
    (re-symmetrized, MATERIALIZED)."""
    return f"""lo AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
e0 AS (
  SELECT a.sk AS src, b.sk AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM lo a JOIN lo b ON a.ok = b.ok AND a.sk <> b.sk GROUP BY 1, 2
),
kept AS (
  SELECT src, dst, w FROM (
    SELECT src, dst, w,
           row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
    FROM e0
  ) WHERE rn <= {k}
),
undw AS (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v,
         CAST(MAX(w) AS BIGINT) AS w
  FROM kept GROUP BY 1, 2
),
es AS MATERIALIZED (
  SELECT u AS src, v AS dst, w FROM undw
  UNION ALL SELECT v AS src, u AS dst, w FROM undw
)"""


O_TRIANGLES_SQL = f"""
{o_topk_edges_sql()},
und AS MATERIALIZED (SELECT u, v FROM undw),
deg AS MATERIALIZED (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
    SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und
  ) GROUP BY 1
),
rnk AS MATERIALIZED (
  SELECT node, degree,
         CAST(row_number() OVER (ORDER BY degree, node) AS BIGINT) AS rk
  FROM deg
),
oe AS MATERIALIZED (
  SELECT CASE WHEN ra.rk < rb.rk THEN und.u ELSE und.v END AS a,
         CASE WHEN ra.rk < rb.rk THEN und.v ELSE und.u END AS b
  FROM und JOIN rnk ra ON ra.node = und.u JOIN rnk rb ON rb.node = und.v
),
tris AS (
  SELECT w1.a, w1.b, w2.b AS c
  FROM oe w1 JOIN oe w2 ON w1.a = w2.a AND w1.b < w2.b
  JOIN und ON und.u = w1.b AND und.v = w2.b
),
per_node AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS n_tri FROM (
    SELECT a AS node FROM tris
    UNION ALL SELECT b AS node FROM tris
    UNION ALL SELECT c AS node FROM tris
  ) GROUP BY 1
)
"""
