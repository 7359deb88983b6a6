"""Degree-ordered triangle counting (operators/triangles.py): exact
counts on closed-form graphs, brute-force cross-check on real data,
and the no-double-count guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.triangles import triangle_counts


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def _sym_edges(spark, und_pairs):
    rows = [(a, b, 1) for a, b in und_pairs] + [(b, a, 1) for a, b in und_pairs]
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_k4_counts_are_exact(spark):
    """K4: 4 triangles total, every node participates in exactly 3;
    degree 3 -> 3 wedges."""
    ids = list(range(4))
    und = [(a, b) for a in ids for b in ids if a < b]
    got = {
        r.node: (r.degree, r.n_tri, r.n_wedges)
        for r in triangle_counts(_sym_edges(spark, und), _nodes(spark, ids)).collect()
    }
    assert got == {i: (3, 3, 3) for i in ids}, got


def test_star_plus_one_closing_edge(spark):
    """Hub 0 with spokes 1..4 has NO triangles until one spoke pair
    closes: edge (1, 2) creates exactly one triangle {0, 1, 2}; node 5
    is isolated and reports zeros."""
    und = [(0, s) for s in (1, 2, 3, 4)] + [(1, 2)]
    got = {
        r.node: (r.degree, r.n_tri, r.n_wedges)
        for r in triangle_counts(
            _sym_edges(spark, und), _nodes(spark, range(6))
        ).collect()
    }
    assert got[0] == (4, 1, 6)
    assert got[1] == (2, 1, 1) and got[2] == (2, 1, 1)
    assert got[3] == (1, 0, 0) and got[4] == (1, 0, 0)
    assert got[5] == (0, 0, 0)


def test_matches_brute_force_on_copurchase_graph(spark):
    """The oriented-wedge count must equal a brute-force neighbor-set
    intersection on the real sf0.001 co-purchase graph — every node,
    exact."""
    from bigdatasmallprice_spark.catalog import load_table
    from bigdatasmallprice_spark.operators.pagerank import copurchase_edges

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    sup = load_table(spark, "/root/testdata/sf0.001", "supplier")
    nodes = sup.select(F.col("s_suppkey").alias("node"))
    edges = copurchase_edges(li).persist()
    try:
        got = {
            r.node: (r.degree, r.n_tri)
            for r in triangle_counts(edges, nodes).collect()
        }
        und = {
            (r.src, r.dst)
            for r in edges.filter("src < dst").select("src", "dst").collect()
        }
    finally:
        edges.unpersist()
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want_tri = {n: 0 for n in got}
    for a, b in und:
        for c in adj[a] & adj[b]:
            # each triangle visits this loop once per edge; crediting
            # the shared neighbor c each time gives every corner
            # exactly one credit per triangle in total
            want_tri[c] += 1
    for n, (deg, tri) in got.items():
        assert deg == len(adj.get(n, ())), n
        assert tri == want_tri[n], (n, tri, want_tri[n])
    assert sum(want_tri.values()) > 0  # the graph really has triangles


def test_topk_sparsification_bounds_and_keeps_strongest(spark):
    """Each node keeps its k strongest ties (weight desc, neighbor-id
    tie-break), the output is symmetric, and an undirected tie
    survives if EITHER endpoint ranks it."""
    from bigdatasmallprice_spark.operators.triangles import topk_edges

    # node 0 has 4 ties with weights 9, 7, 5, 3; k=2 keeps {1, 2};
    # node 3's OWN top-2 includes 0 (its strongest tie), so (0, 3)
    # survives via the union even though 0 dropped it
    und = [(0, 1, 9), (0, 2, 7), (0, 3, 5), (0, 4, 3), (3, 4, 1)]
    rows = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    got = {
        (r.src, r.dst) for r in topk_edges(edges, k=2).collect()
    }
    und_got = {(a, b) for a, b in got if a < b}
    assert (0, 1) in und_got and (0, 2) in und_got
    assert (0, 3) in und_got  # rescued by node 3's own ranking
    assert (0, 4) in und_got  # node 4's top-2 is {0, 3}
    assert (3, 4) in und_got
    # symmetric output
    assert got == {(b, a) for a, b in got}
