"""Weighted label propagation (operators/lpa.py): closed-form
community structure, oscillation damping, weighted majorities,
determinism. Assertions are anchor-agnostic where the final label id
depends on update order — community MEMBERSHIP is the contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.lpa import LPA_ITERS, lpa_fit


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def _sym_edges(spark, und):
    rows = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_two_cliques_with_bridge_split_into_two_communities(spark):
    """Two K4s {0..3} and {10..13} joined by one weak bridge (3, 10):
    LPA must settle on exactly two communities split along the
    cliques."""
    k1 = [(a, b, 5) for a in range(4) for b in range(4) if a < b]
    k2 = [(a, b, 5) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(3, 10, 1)]
    labels = {
        r.node: r.label
        for r in lpa_fit(
            _nodes(spark, list(range(4)) + list(range(10, 14))),
            _sym_edges(spark, k1 + k2 + bridge),
        ).collect()
    }
    a_labels = {labels[n] for n in range(4)}
    b_labels = {labels[n] for n in range(10, 14)}
    assert len(a_labels) == 1 and len(b_labels) == 1, labels
    assert a_labels != b_labels, labels


def test_single_edge_converges_not_oscillates(spark):
    """One edge (0, 1) is the canonical synchronous-LPA flip-flop; the
    parity half-steps must merge the pair into ONE community, and an
    isolated node keeps its own label."""
    labels = {
        r.node: r.label
        for r in lpa_fit(
            _nodes(spark, [0, 1, 9]), _sym_edges(spark, [(0, 1, 3)])
        ).collect()
    }
    assert labels[9] == 9
    assert labels[0] == labels[1], labels


def test_weighted_majority_beats_count_majority(spark):
    """Node 5 has TWO weak ties into clique A (total weight 2) and ONE
    strong tie into clique B (weight 9): weighted LPA must put 5 in
    B's community — a count-majority implementation would pick A."""
    a_cl = [(0, 1, 9), (0, 2, 9), (1, 2, 9)]
    b_cl = [(10, 11, 9), (10, 12, 9), (11, 12, 9)]
    ties = [(5, 1, 1), (5, 2, 1), (5, 10, 9)]
    labels = {
        r.node: r.label
        for r in lpa_fit(
            _nodes(spark, [0, 1, 2, 5, 10, 11, 12]),
            _sym_edges(spark, a_cl + b_cl + ties),
        ).collect()
    }
    assert labels[5] == labels[10] == labels[11] == labels[12], labels
    assert labels[5] != labels[0], labels


def test_lpa_is_deterministic_on_real_graph(spark):
    from bigdatasmallprice_spark.catalog import load_table
    from bigdatasmallprice_spark.operators.pagerank import copurchase_edges
    from bigdatasmallprice_spark.operators.triangles import topk_edges

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    sup = load_table(spark, "/root/testdata/sf0.001", "supplier")
    nodes = sup.select(F.col("s_suppkey").alias("node"))
    edges = topk_edges(copurchase_edges(li)).persist()
    try:
        a = sorted(map(tuple, lpa_fit(nodes, edges, iters=LPA_ITERS).collect()))
        b = sorted(map(tuple, lpa_fit(nodes, edges, iters=LPA_ITERS).collect()))
    finally:
        edges.unpersist()
    assert a == b and len(a) == sup.count()
