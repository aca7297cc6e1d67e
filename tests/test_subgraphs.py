"""k-core / k-truss peeling: known-truth fixtures + python differential."""

from __future__ import annotations

from itertools import combinations

from tests.conftest import make_edges


def _py_kcore(pairs, k):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    return {(min(a, b), max(a, b)) for a in adj for b in adj[a]}


def _py_ktruss(pairs, k):
    edges = {(min(a, b), max(a, b)) for a, b in pairs}
    changed = True
    while changed:
        changed = False
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        drop = {e for e in edges if len(adj[e[0]] & adj[e[1]]) < k - 2}
        if drop:
            edges -= drop
            changed = True
    return edges


def test_kcore_tail_peeled(spark):
    """Triangle + pendant path: the 2-core is exactly the triangle (the
    path peels off vertex by vertex — the iterative part)."""
    from triangle_counting_spark.operators.subgraphs import kcore_edges

    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)]
    got = {(r.src, r.dst) for r in kcore_edges(make_edges(spark, pairs), 2).collect()}
    assert got == {(0, 1), (1, 2), (0, 2)}
    assert got == _py_kcore(pairs, 2)


def test_ktruss_bridge_removed(spark):
    """Two K4s joined by a bridge: the 4-truss keeps both K4s, drops the
    bridge (a K4 edge has support 2; the bridge has 0)."""
    from triangle_counting_spark.operators.subgraphs import ktruss_edges

    k4a = list(combinations(range(4), 2))
    k4b = list(combinations(range(10, 14), 2))
    pairs = k4a + k4b + [(3, 10)]
    got = {(r.src, r.dst) for r in ktruss_edges(make_edges(spark, pairs), 4).collect()}
    assert got == set(k4a) | set(k4b)
    assert got == _py_ktruss(pairs, 4)


def test_kcore_ktruss_differential_on_rmat(spark):
    from triangle_counting_spark.operators.subgraphs import kcore_edges, ktruss_edges
    from triangle_counting_spark.sources.rmat import rmat_edges

    e = rmat_edges(spark, scale=8, num_partitions=4)
    pairs = [(r.src, r.dst) for r in e.collect()]
    for k in (3, 5):
        got = {(r.src, r.dst) for r in kcore_edges(e, k).collect()}
        assert got == _py_kcore(pairs, k), f"kcore k={k}"
    got_t = {(r.src, r.dst) for r in ktruss_edges(e, 4).collect()}
    assert got_t == _py_ktruss(pairs, 4)
