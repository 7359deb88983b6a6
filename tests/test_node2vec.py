"""node2vec biased walks (operators/node2vec.py): closed-form
cumulative-interval semantics, walk validity, determinism, and the
bias direction (in-out bias keeps walks more local than DeepWalk's
uniform choice on a planted two-community graph)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdatasmallprice_spark.operators.node2vec import (
    N2V_FAR,
    N2V_ONE,
    N2V_RET,
    n2v_choice_table,
    node2vec_walks,
)


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "node long")


def _sym_edges(spark, und):
    rows = [(a, b, w) for a, b, w in und] + [(b, a, w) for a, b, w in und]
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_choice_table_intervals_closed_form(spark):
    """Triangle {1,2,3} + tail (3,4). From (prev=2, cur=3) the
    candidates are N(3) = {1, 2, 4}: 1 is adjacent to prev (B_ONE),
    2 IS prev (B_RET), 4 is distance-2 (B_FAR) — cumulative intervals
    in x order must be exactly [0,4), [4,5), [5,7) with tot=7 under
    the shipped 1:4:2 biases."""
    edges = _sym_edges(spark, [(1, 2, 1), (2, 3, 1), (1, 3, 1), (3, 4, 1)])
    pc = {
        (r.prev, r.cur, r.x): (r.lo, r.hi, r.tot)
        for r in n2v_choice_table(edges).collect()
    }
    assert pc[(2, 3, 1)] == (0, N2V_ONE, 7)
    assert pc[(2, 3, 2)] == (N2V_ONE, N2V_ONE + N2V_RET, 7)
    assert pc[(2, 3, 4)] == (N2V_ONE + N2V_RET, 7, 7)
    # from (prev=1, cur=2): x=1 is the return (B_RET), x=3 closes the
    # triangle (B_ONE)
    assert pc[(1, 2, 1)] == (0, N2V_RET, N2V_RET + N2V_ONE)
    assert pc[(1, 2, 3)] == (N2V_RET, N2V_RET + N2V_ONE, N2V_RET + N2V_ONE)


def test_walks_follow_edges_and_are_deterministic(spark):
    und = [(1, 2, 1), (2, 3, 1), (1, 3, 1), (3, 4, 1), (4, 5, 1)]
    edges = _sym_edges(spark, und)
    nodes = _nodes(spark, [1, 2, 3, 4, 5])
    adj = {(a, b) for a, b, _ in und} | {(b, a) for a, b, _ in und}
    a = sorted(map(tuple, node2vec_walks(edges, nodes).collect()))
    b = sorted(map(tuple, node2vec_walks(edges, nodes).collect()))
    assert a == b and len(a) > 0
    paths = {}
    for start, w, step, node in a:
        paths.setdefault((start, w), {})[step] = node
    for (start, w), steps in paths.items():
        assert steps[0] == start
        for t in range(1, max(steps) + 1):
            assert t in steps, (start, w, steps)  # no gaps (truncation only trims the tail)
            assert (steps[t - 1], steps[t]) in adj


def test_inout_bias_keeps_walks_more_local_than_deepwalk(spark):
    """Two K6 communities joined by one bridge: with q=2 (distance-2
    moves discouraged) the node2vec corpus must cross between the
    communities NO MORE often than the uniform DeepWalk corpus on the
    same graph — both deterministic, so this is a stable measured
    fact, not a flaky statistic."""
    from bigdatasmallprice_spark.operators.walks import random_walks

    k1 = [(a, b, 1) for a in range(6) for b in range(6) if a < b]
    k2 = [(a, b, 1) for a in range(10, 16) for b in range(10, 16) if a < b]
    ids = list(range(6)) + list(range(10, 16))
    edges = _sym_edges(spark, k1 + k2 + [(5, 10, 1)])
    nodes = _nodes(spark, ids)

    def crossings(walks):
        n = 0
        paths = {}
        for r in walks.collect():
            paths.setdefault((r.start, r.w), {})[r.step] = r.node
        for steps in paths.values():
            for t in range(1, max(steps) + 1):
                if (steps[t - 1] < 6) != (steps[t] < 6):
                    n += 1
        return n

    c_n2v = crossings(node2vec_walks(edges, nodes))
    c_dw = crossings(random_walks(edges, nodes))
    assert c_n2v <= c_dw, (c_n2v, c_dw)


def test_corpus_feeds_skipgram_unchanged(spark):
    from bigdatasmallprice_spark.operators.walks import skipgram_pairs

    edges = _sym_edges(spark, [(1, 2, 1), (2, 3, 1), (1, 3, 1)])
    nodes = _nodes(spark, [1, 2, 3])
    pairs = skipgram_pairs(node2vec_walks(edges, nodes)).collect()
    assert len(pairs) > 0
    assert {c for r in pairs for c in (r.center, r.context)} <= {1, 2, 3}
    assert all(r.cnt > 0 for r in pairs)
