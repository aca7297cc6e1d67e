"""Sampled-source distances / effective diameter (operators/distances.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.operators.distances import (
    distance_stats,
    sample_roots,
    sampled_distances,
)
from tests.conftest import make_edges


PATH6 = [(i, i + 1) for i in range(5)]  # 0-1-2-3-4-5


def _dists(rows):
    return {(r.root, r.v): r.dist for r in rows}


def test_path_distances_both_tiers(spark):
    e = make_edges(spark, PATH6)
    for tier in ("blocked", "shuffle"):
        got = _dists(sampled_distances(e, n_roots=6, tier=tier).collect())
        # all 6 vertices are roots; distance on a path = |i - j|
        assert got == {(a, b): abs(a - b) for a in range(6) for b in range(6)}


def test_tiers_agree_on_disconnected(spark):
    e = make_edges(spark, [(0, 1), (1, 2), (10, 11)])
    b = _dists(sampled_distances(e, n_roots=5, tier="blocked").collect())
    s = _dists(sampled_distances(e, n_roots=5, tier="shuffle").collect())
    assert b == s
    # unreached cross-component pairs are absent
    assert all(not (r in (0, 1, 2) and v in (10, 11)) for r, v in b)


def test_sample_roots_md5_deterministic(spark):
    e = make_edges(spark, PATH6)
    r1 = sorted(r.v for r in sample_roots(e, 3).collect())
    r2 = sorted(r.v for r in sample_roots(e.repartition(4), 3).collect())
    assert r1 == r2 and len(r1) == 3


def test_distance_stats_closed_form(spark):
    e = make_edges(spark, PATH6)
    row = distance_stats(e, n_roots=6, tier="blocked").collect()[0]
    # 36 ordered pairs incl. self; avg |i-j| over 6x6 = 70/36
    assert row.n_pairs == 36
    assert row.avg_dist == pytest.approx(70 / 36, abs=1e-6)
    assert row.max_dist == 5
    # p90 of the multiset {|i-j|} (quantile_cont): computed directly
    import numpy as np

    vals = np.sort([abs(a - b) for a in range(6) for b in range(6)])
    assert row.p90_dist == pytest.approx(float(np.quantile(vals, 0.9)), abs=1e-6)


def test_stats_match_across_tiers(spark):
    e = make_edges(spark, [(a, b) for a in range(8) for b in range(a + 1, 8) if (a * b) % 3 == 0])
    rb = distance_stats(e, n_roots=4, tier="blocked").collect()[0]
    rs = distance_stats(e, n_roots=4, tier="shuffle").collect()[0]
    assert rb == rs


WEIGHTED = [
    # (src, dst, weight): a short heavy edge vs a long light path
    (0, 1, 10.0),
    (0, 2, 1.0),
    (2, 3, 1.0),
    (3, 1, 1.0),
    (1, 4, 2.0),
]


def _wedges(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), float(w)) for a, b, w in triples],
        "src long, dst long, weight double",
    )


def test_sssp_prefers_light_path_both_tiers(spark):
    from triangle_counting_spark.operators.distances import sssp

    e = _wedges(spark, WEIGHTED)
    want = {0: 0.0, 2: 1.0, 3: 2.0, 1: 3.0, 4: 5.0}  # via 0-2-3-1, not 0-1
    for tier in ("blocked", "shuffle"):
        got = {r.v: r.dist for r in sssp(e, root=0, tier=tier).collect()}
        assert got == want, (tier, got)


def test_sssp_differential_vs_dijkstra(spark):
    import heapq
    import random

    from triangle_counting_spark.operators.distances import sssp

    rng = random.Random(17)
    triples = [
        (a, b, rng.randint(1, 9) * 1.0)
        for a, b in sorted({tuple(sorted(rng.sample(range(14), 2))) for _ in range(35)})
    ]
    adj: dict[int, list] = {}
    for a, b, w in triples:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {0: 0.0}
    pq = [(0.0, 0)]
    while pq:
        dd, u = heapq.heappop(pq)
        if dd > dist.get(u, float("inf")):
            continue
        for vv, w in adj.get(u, []):
            nd = dd + w
            if nd < dist.get(vv, float("inf")):
                dist[vv] = nd
                heapq.heappush(pq, (nd, vv))
    e = _wedges(spark, triples)
    for tier in ("blocked", "shuffle"):
        got = {r.v: r.dist for r in sssp(e, root=0, tier=tier).collect()}
        assert got == dist, tier


def test_sssp_rejects_nonpositive_weights(spark):
    from triangle_counting_spark.operators.distances import sssp

    e = _wedges(spark, [(0, 1, 0.0)])
    with pytest.raises(ValueError, match="positive"):
        sssp(e, root=0, tier="blocked")


# ------------------------------------------------------------- centrality


def _exact_centrality(adj_edges, n_roots_all=True):
    """Python oracle: exact harmonic/closeness when every vertex is a root
    (k = n ⇒ the sampling estimator collapses to the exact definition)."""
    verts = sorted({v for e in adj_edges for v in e})
    n = len(verts)
    sym = {}
    for a, b in adj_edges:
        sym.setdefault(a, set()).add(b)
        sym.setdefault(b, set()).add(a)
    import collections

    out = {}
    for v in verts:
        # BFS from v (undirected: d(root, v) == d(v, root))
        dist = {v: 0}
        q = collections.deque([v])
        while q:
            u = q.popleft()
            for w in sym.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    q.append(w)
        reach = [d for d in dist.values() if d > 0]
        # with k = n the estimators collapse to the textbook definitions:
        # harmonic = Σ 1/d; closeness = ((r-1)/(n-1)) · ((r-1)/Σd)  (W-F)
        h = sum(1.0 / d for d in reach)
        r1 = len(reach)  # r - 1: vertices other than v that reach v
        c = (r1 / (n - 1)) * (r1 / sum(reach)) if reach else 0.0
        out[v] = (round(h, 6), round(c, 6))
    return out


def test_centrality_exact_when_all_roots(spark):
    from triangle_counting_spark.operators.distances import centrality

    edges = [(0, 1), (1, 2), (2, 3), (1, 3), (4, 5)]  # two components
    e = make_edges(spark, edges)
    want = _exact_centrality(edges)
    for tier in ("blocked", "shuffle"):
        got = {r.v: (r.harmonic, r.closeness) for r in centrality(e, n_roots=6, tier=tier).collect()}
        assert got == pytest.approx(want), tier


def test_centrality_star_center_highest(spark):
    from triangle_counting_spark.operators.distances import centrality

    star = [(0, i) for i in range(1, 8)]
    got = {r.v: r.harmonic for r in centrality(make_edges(spark, star), n_roots=8).collect()}
    assert got[0] == max(got.values())
    assert all(got[0] > got[i] for i in range(1, 8))


def test_centrality_isolated_sample_scores_zero(spark):
    from triangle_counting_spark.operators.distances import centrality

    # n_roots=1: the md5-min root reaches only its own component; the other
    # component's vertices get no positive-distance rows → 0.0 (not NULL)
    e = make_edges(spark, [(0, 1), (10, 11)])
    rows = centrality(e, n_roots=1).collect()
    assert len(rows) == 4
    assert all(r.harmonic >= 0.0 and r.closeness >= 0.0 for r in rows)
    assert any(r.harmonic == 0.0 for r in rows)


def test_centrality_facade(spark):
    from triangle_counting_spark.graph import Graph

    g = Graph(make_edges(spark, PATH6))
    rows = g.centrality(n_roots=6).collect()
    assert {r.v for r in rows} == set(range(6))
