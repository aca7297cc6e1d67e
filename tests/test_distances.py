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
