"""node2vec biased random walks (Grover & Leskovec 2016) — the
second-order upgrade of the DeepWalk corpus generator
(operators/walks.py): the next step's distribution depends on where
the walk CAME FROM, interpolating between BFS-like (community
structure) and DFS-like (structural roles) exploration via the
return bias 1/p and the in-out bias 1/q.

House discipline: the walks stay DETERMINISTIC and bit-replayable.
Biases are INTEGER numerators over the sparsified unweighted graph —
B_RET : B_ONE : B_FAR = alpha(1/p) : alpha(1) : alpha(1/q) scaled to
integers (shipped 1 : 4 : 2, i.e. p=4, q=2 — return discouraged,
mild BFS preference, the paper's community-detection regime) — and
the step choice is the md5-slice hash mod the candidate set's total
bias mass, mapped through cumulative-weight intervals.

The scale trick: the weighted-choice structure depends only on the
EDGE PAIR (prev, cur), never on the walk, so the cumulative intervals
precompute ONCE as a (prev, cur, x, lo, hi, tot) table bounded by
sum_cur deg(cur)^2 <= n * k^2 on the top-k graph (k=10 -> <= 100 rows
per node at any corpus size). Each walk step is then ONE hash
equi-join of the frontier against that table plus an interval filter
— no per-step window, no per-step membership probe (the distance-1
test is folded into the table build). Step frames are
localCheckpoint'ed per step for the same references-per-round reason
as random_walks. Step 1 has no predecessor and takes the uniform
DeepWalk choice (the paper's convention) under a 'n2v:'-prefixed key,
so the two corpora are independent."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.walks import (
    WALK_LEN,
    WALKS_PER_NODE,
    neighbor_index,
)

N2V_RET = 1  # alpha = 1/p, p = 4 (scaled x4): returning is discouraged
N2V_ONE = 4  # alpha = 1: distance-1 candidates (triangle-closing)
N2V_FAR = 2  # alpha = 1/q, q = 2: mild BFS preference


def _h_uniform(step: int) -> str:
    key = (
        "concat_ws(':', 'n2v', CAST(start AS STRING), CAST(w AS STRING), "
        f"CAST({step} AS STRING), CAST(node AS STRING))"
    )
    return f"CAST(conv(substr(md5({key}), 1, 8), 16, 10) AS BIGINT) % deg"


def _h_biased(step: int) -> str:
    key = (
        "concat_ws(':', 'n2v', CAST(start AS STRING), CAST(w AS STRING), "
        f"CAST({step} AS STRING), CAST(prev AS STRING), "
        "CAST(node AS STRING))"
    )
    return f"CAST(conv(substr(md5({key}), 1, 8), 16, 10) AS BIGINT) % tot"


def n2v_choice_table(edges: DataFrame) -> DataFrame:
    """(prev, cur, x, lo, hi, tot): for every ordered edge (prev ->
    cur), the cumulative integer bias intervals over cur's candidate
    neighbors x (ordered by x id). A step landing at cur from prev
    draws h in [0, tot) and takes the x whose [lo, hi) contains it.
    The distance-1 test (x adjacent to prev) is ONE left equi-join
    here, at build time, instead of once per walk step."""
    from pyspark.sql import Window

    nbx = edges.select(F.col("src").alias("cur"), F.col("dst").alias("x"))
    nbp = edges.select(F.col("src").alias("cur"), F.col("dst").alias("prev"))
    e1 = edges.select(
        F.col("src").alias("prev"),
        F.col("dst").alias("x"),
        F.lit(1).alias("adj"),
    )
    cand = (
        nbp.join(nbx, "cur")
        .join(e1, ["prev", "x"], "left")
        .selectExpr(
            "prev", "cur", "x",
            f"CAST(CASE WHEN x = prev THEN {N2V_RET} "
            f"WHEN adj IS NOT NULL THEN {N2V_ONE} "
            f"ELSE {N2V_FAR} END AS BIGINT) AS b",
        )
    )
    w_cum = Window.partitionBy("prev", "cur").orderBy("x")
    w_all = Window.partitionBy("prev", "cur")
    return (
        cand.withColumn("hi", F.sum("b").over(w_cum).cast("long"))
        .withColumn("tot", F.sum("b").over(w_all).cast("long"))
        .selectExpr("prev", "cur", "x", "(hi - b) AS lo", "hi", "tot")
    )


def node2vec_walks(
    edges: DataFrame,
    nodes: DataFrame,
    walks_per_node: int = WALKS_PER_NODE,
    walk_len: int = WALK_LEN,
) -> DataFrame:
    """(start, w, step, node): deterministic biased walks. Dead ends
    truncate (inner joins drop the walk), exactly as in random_walks;
    the output schema matches random_walks so skipgram_pairs and the
    SGNS fit consume either corpus unchanged."""
    nb, deg = neighbor_index(edges)
    nb = nb.persist()
    deg = deg.persist()
    pc = n2v_choice_table(edges).persist()
    frontier = nodes.select(
        F.col("node").alias("start"),
        F.explode(
            F.array(*[F.lit(i).cast("long") for i in range(walks_per_node)])
        ).alias("w"),
        F.lit(0).cast("long").alias("step"),
        "node",
    )
    frames = [frontier]
    # step 1: no predecessor — uniform over N(start), n2v-keyed
    nxt = (
        frontier.join(deg.withColumnRenamed("src", "node"), "node")
        .withColumn("idx", F.expr(_h_uniform(0)))
        .join(nb.withColumnRenamed("src", "node"), ["node", "idx"])
        .select(
            "start", "w",
            F.lit(1).cast("long").alias("step"),
            F.col("node").alias("prev"),
            F.col("dst").alias("node"),
        )
        .localCheckpoint(eager=True)
    )
    frames.append(nxt.select("start", "w", "step", "node"))
    frontier = nxt
    for t in range(1, walk_len - 1):
        # biased step: ONE equi-join on (prev, cur) + interval filter
        nxt = (
            frontier.join(
                pc.withColumnRenamed("cur", "node"), ["prev", "node"]
            )
            .withColumn("h", F.expr(_h_biased(t)))
            .filter((F.col("h") >= F.col("lo")) & (F.col("h") < F.col("hi")))
            .select(
                "start", "w",
                F.lit(t + 1).cast("long").alias("step"),
                F.col("node").alias("prev"),
                F.col("x").alias("node"),
            )
            .localCheckpoint(eager=True)
        )
        frames.append(nxt.select("start", "w", "step", "node"))
        frontier = nxt
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    out = out.coalesce(
        int(out.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    )
    nb.unpersist()
    deg.unpersist()
    pc.unpersist()
    return out


# --- DuckDB oracle: the identical unrolled trajectory ----------------------
def o_n2v_chain_sql(
    walks_per_node: int = WALKS_PER_NODE,
    walk_len: int = WALK_LEN,
) -> str:
    """CTE chain replaying the biased walks over the top-k supplier
    co-purchase graph. Ends with ``walks(start, w, step, node)``."""
    from bigdatasmallprice_spark.operators.triangles import (
        o_topk_edges_sql,
    )

    parts = [
        f"""{o_topk_edges_sql()},
nb AS MATERIALIZED (
  SELECT src, CAST(row_number() OVER (PARTITION BY src ORDER BY dst) - 1 AS BIGINT) AS idx, dst
  FROM es
),
dg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM es GROUP BY 1),
pc AS MATERIALIZED (
  SELECT prev, cur, x, CAST(hi - b AS BIGINT) AS lo, hi, tot FROM (
    SELECT prev, cur, x, b,
           CAST(SUM(b) OVER (PARTITION BY prev, cur ORDER BY x) AS BIGINT) AS hi,
           CAST(SUM(b) OVER (PARTITION BY prev, cur) AS BIGINT) AS tot
    FROM (
      SELECT p.dst AS prev, p.src AS cur, c.dst AS x,
             CAST(CASE WHEN c.dst = p.dst THEN {N2V_RET}
                       WHEN a.src IS NOT NULL THEN {N2V_ONE}
                       ELSE {N2V_FAR} END AS BIGINT) AS b
      FROM es p
      JOIN es c ON c.src = p.src
      LEFT JOIN es a ON a.src = p.dst AND a.dst = c.dst
    )
  )
),
nodes AS (SELECT s_suppkey AS node FROM supplier),
t0 AS MATERIALIZED (
  SELECT node AS start, CAST(ws.w AS BIGINT) AS w, CAST(0 AS BIGINT) AS step,
         CAST(NULL AS BIGINT) AS prev, node
  FROM nodes, (SELECT unnest(range({walks_per_node})) AS w) ws
)"""
    ]
    key1 = (
        "CAST(s.start AS VARCHAR) || ':' || CAST(s.w AS VARCHAR) || ':0:' "
        "|| CAST(s.node AS VARCHAR)"
    )
    parts.append(f"""t1 AS MATERIALIZED (
  SELECT s.start, s.w, CAST(1 AS BIGINT) AS step, s.node AS prev, nb.dst AS node
  FROM t0 s
  JOIN dg ON dg.src = s.node
  JOIN nb ON nb.src = s.node
   AND nb.idx = ('0x' || substr(md5('n2v:' || {key1}), 1, 8))::BIGINT % dg.deg
)""")
    for t in range(1, walk_len - 1):
        key = (
            "CAST(s.start AS VARCHAR) || ':' || CAST(s.w AS VARCHAR) || "
            f"':{t}:' || CAST(s.prev AS VARCHAR) || ':' || "
            "CAST(s.node AS VARCHAR)"
        )
        h = f"('0x' || substr(md5('n2v:' || {key}), 1, 8))::BIGINT % pc.tot"
        parts.append(f"""t{t + 1} AS MATERIALIZED (
  SELECT s.start, s.w, CAST({t + 1} AS BIGINT) AS step, s.node AS prev,
         pc.x AS node
  FROM t{t} s
  JOIN pc ON pc.prev = s.prev AND pc.cur = s.node
   AND {h} >= pc.lo AND {h} < pc.hi
)""")
    union = " UNION ALL ".join(
        f"SELECT start, w, step, node FROM t{t}" for t in range(walk_len)
    )
    parts.append(f"walks AS ({union})")
    return ",\n".join(parts)
