"""Graph operators: connected components (min-label + pointer jump)
and integer PageRank — ground truth via driver-side union-find and a
pure-Python mirror of the identical integer recurrence."""

from __future__ import annotations

from pyspark.sql import functions as F

from watermark_remove_spark.operators.graph import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_SCALE,
    connected_components,
    pagerank_integer,
)


def _uf_components(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min-id labels
    return {n: min(m for m in parent if find(m) == find(n)) for n in parent}


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = connected_components(df).collect()
    return {r["node"]: r["component"] for r in got}


def test_cc_triangle_chain_and_pair(spark):
    edges = [
        (1, 2), (2, 3), (3, 1),          # triangle
        (10, 11), (11, 12), (12, 13),    # chain
        (20, 21),                        # pair
    ]
    assert _cc_spark(spark, edges) == _uf_components(edges)


def test_cc_long_chain_converges(spark):
    # a 64-node path exercises the pointer-jump: plain propagation
    # would need 63 rounds, far past what log-depth jumping uses
    edges = [(i, i + 1) for i in range(64)]
    got = _cc_spark(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 65


def test_cc_self_loops_and_duplicate_edges_ignored(spark):
    edges = [(5, 5), (1, 2), (2, 1), (1, 2), (7, 8)]
    got = _cc_spark(spark, edges)
    # 5's only edge is a self-loop -> dropped entirely (no endpoint rows)
    assert got == {1: 1, 2: 1, 7: 7, 8: 7}


def _pr_python(edges, iterations):
    from collections import defaultdict

    outdeg = defaultdict(int)
    for u, _ in edges:
        outdeg[u] += 1
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    rank = {n: PR_SCALE for n in nodes}
    teleport = (15 * PR_SCALE) // PR_DAMP_DEN
    for _ in range(iterations):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += rank[u] // outdeg[u]
        rank = {n: teleport + (PR_DAMP_NUM * s[n]) // PR_DAMP_DEN for n in nodes}
    return rank


def test_pagerank_matches_python_mirror(spark):
    edges = [(1, 2), (2, 3), (3, 1), (3, 2), (4, 3), (4, 1), (5, 4), (2, 5)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank_integer(df, iterations=5).collect()}
    assert got == _pr_python(edges, 5)


def test_pagerank_dangling_node_gets_teleport_only(spark):
    # 2 has no out-edges and no in-edges after iter-1 settles: its rank
    # is teleport + damped inflow; node 3 receives nothing ever
    edges = [(1, 2), (3, 2)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank_integer(df, iterations=3).collect()}
    assert got == _pr_python(edges, 3)
    teleport = (15 * PR_SCALE) // PR_DAMP_DEN
    assert got[3] == teleport  # sink-only node: pure teleport
    assert got[2] > got[1] > 0


def test_pagerank_duplicate_edges_are_weighted(spark):
    # u->v listed twice carries 2x the contribution of a single edge
    edges = [(1, 2), (1, 2), (1, 3)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank_integer(df, iterations=2).collect()}
    assert got == _pr_python(edges, 2)
    assert got[2] > got[3]


def test_cc_raises_on_non_convergence(spark):
    import pytest

    from watermark_remove_spark.operators.graph import connected_components

    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=2).collect()
