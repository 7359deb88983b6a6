"""Deterministic random-walk corpus (operators/walks.py): walk
validity, forced-path closed form, determinism, and skip-gram pair
exactness."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.walks import (
    WALK_LEN,
    WALKS_PER_NODE,
    random_walks,
    skipgram_pairs,
)


def _sym_edges(spark, und_pairs):
    rows = [(a, b, 1) for a, b in und_pairs] + [(b, a, 1) for a, b in und_pairs]
    return spark.createDataFrame(rows, "src long, dst long, w long")


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def test_two_node_cycle_walks_are_forced(spark):
    """On 0 <-> 1 every node has exactly one neighbor, so the walk is
    forced: node alternates with step parity, full length, for every
    (start, w)."""
    walks = random_walks(
        _sym_edges(spark, [(0, 1)]), _nodes(spark, [0, 1])
    ).collect()
    assert len(walks) == 2 * WALKS_PER_NODE * WALK_LEN
    for r in walks:
        assert r.node == (r.start + r.step) % 2, r


def test_walk_steps_follow_real_edges_and_match_hash_choice(spark):
    """Every consecutive (step t, step t+1) transition must be a real
    edge AND the exact neighbor the md5 choice selects — the property
    that lets the oracle replay the corpus."""
    und = [(0, 1), (0, 2), (1, 2), (2, 3), (1, 3), (3, 4), (0, 4)]
    edges = _sym_edges(spark, und)
    nodes = _nodes(spark, range(5))
    adj: dict[int, list[int]] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    adj = {k: sorted(v) for k, v in adj.items()}

    walks = random_walks(edges, nodes).collect()
    path: dict[tuple[int, int], dict[int, int]] = {}
    for r in walks:
        path.setdefault((r.start, r.w), {})[r.step] = r.node
    assert len(path) == 5 * WALKS_PER_NODE
    for (start, w), steps in path.items():
        assert steps[0] == start
        assert len(steps) == WALK_LEN  # no dead ends on this graph
        for t in range(WALK_LEN - 1):
            cur, nxt = steps[t], steps[t + 1]
            nbrs = adj[cur]
            h = int(
                hashlib.md5(f"{start}:{w}:{t}:{cur}".encode()).hexdigest()[:8],
                16,
            )
            assert nxt == nbrs[h % len(nbrs)], (start, w, t, cur, nxt)


def test_dead_ends_truncate(spark):
    """A walk reaching a node with no neighbors stops there; isolated
    start nodes emit only their step-0 row."""
    edges = _sym_edges(spark, [(0, 1)])
    nodes = _nodes(spark, [0, 1, 9])  # 9 is isolated
    rows = random_walks(edges, nodes).collect()
    nine = [r for r in rows if r.start == 9]
    assert len(nine) == WALKS_PER_NODE
    assert all(r.step == 0 and r.node == 9 for r in nine)


def test_skipgram_pairs_exact_on_forced_walk(spark):
    """On the forced 2-cycle the pair counts have a closed form: per
    walk, |i-j| = 1 gives 2*(L-1) ordered cross pairs and |i-j| = 2
    gives 2*(L-2) ordered same-node pairs."""
    edges = _sym_edges(spark, [(0, 1)])
    nodes = _nodes(spark, [0, 1])
    walks = random_walks(edges, nodes).persist()
    try:
        got = {
            (r.center, r.context): r.cnt for r in skipgram_pairs(walks).collect()
        }
    finally:
        walks.unpersist()
    n_walks = 2 * WALKS_PER_NODE
    # distance-1 pairs alternate nodes; per walk L-1 adjacent pairs in
    # each direction; across all walks they split evenly by parity
    d1_total = n_walks * 2 * (WALK_LEN - 1)
    assert got[(0, 1)] + got[(1, 0)] == d1_total
    assert got[(0, 1)] == got[(1, 0)]
    # distance-2 pairs land on the SAME node
    d2_total = n_walks * 2 * (WALK_LEN - 2)
    assert got[(0, 0)] + got[(1, 1)] == d2_total


def test_walk_corpus_is_deterministic(spark):
    from bigdatasmallprice_spark.catalog import load_table
    from bigdatasmallprice_spark.operators.pagerank import copurchase_edges
    from bigdatasmallprice_spark.operators.triangles import topk_edges

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    sup = load_table(spark, "/root/testdata/sf0.001", "supplier")
    nodes = sup.select(F.col("s_suppkey").alias("node"))
    edges = topk_edges(copurchase_edges(li)).persist()
    try:
        a = sorted(map(tuple, random_walks(edges, nodes).collect()))
        b = sorted(map(tuple, random_walks(edges, nodes).collect()))
    finally:
        edges.unpersist()
    assert a == b
    assert len(a) > 0
