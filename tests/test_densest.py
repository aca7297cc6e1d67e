"""Densest subgraph — exact-greedy blocked tier and (1+ε)-peeling shuffle
tier vs a brute-force max-density oracle and planted-core fixtures."""

from __future__ import annotations

from itertools import combinations

import pytest

from triangle_counting_spark.operators.densest import (
    densest_subgraph,
    induced_edges,
)


def _brute_force_density(edges: list[tuple[int, int]]) -> float:
    verts = sorted({v for e in edges for v in e})
    eset = {tuple(sorted(e)) for e in edges}
    best = 0.0
    for k in range(1, len(verts) + 1):
        for sub in combinations(verts, k):
            s = set(sub)
            m = sum(1 for a, b in eset if a in s and b in s)
            best = max(best, m / len(s))
    return best


TINY = [
    # triangle + pendant: densest = the triangle (ρ = 1)
    [(1, 2), (2, 3), (1, 3), (3, 4)],
    # K4 + path noise: densest = K4 (ρ = 1.5)
    [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (6, 7)],
    # two triangles joined by a bridge: ρ = 1 either side
    [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (4, 6)],
    # a 5-cycle: ρ = 1 (the whole cycle)
    [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)],
]


@pytest.mark.parametrize("edges", TINY)
def test_blocked_greedy_within_2approx_and_usually_exact(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = densest_subgraph(df, tier="blocked").collect()
    rho = out[0]["density"]
    opt = _brute_force_density(edges)
    assert rho <= opt + 1e-12
    assert rho >= opt / 2 - 1e-12
    # on these fixtures greedy peeling is exact
    assert rho == pytest.approx(opt)
    # reported density matches the induced subgraph exactly
    vs = spark.createDataFrame([(r["v"],) for r in out], "v long")
    m = induced_edges(df, vs).count()
    assert rho == pytest.approx(m / len(out))


@pytest.mark.parametrize("edges", TINY)
def test_shuffle_peeling_within_guarantee(spark, edges):
    eps = 0.1
    df = spark.createDataFrame(edges, "src long, dst long")
    out = densest_subgraph(df, epsilon=eps, tier="shuffle").collect()
    rho = out[0]["density"]
    opt = _brute_force_density(edges)
    assert rho <= opt + 1e-12
    assert rho >= opt / (2 * (1 + eps)) - 1e-12
    vs = spark.createDataFrame([(r["v"],) for r in out], "v long")
    m = induced_edges(df, vs).count()
    assert rho == pytest.approx(m / len(out))


def test_planted_clique_recovered_exactly(spark):
    # K6 planted in a long path: both tiers isolate exactly the clique
    clique = list(combinations(range(100, 106), 2))
    noise = [(i, i + 1) for i in range(30)] + [(5, 100), (10, 103)]
    df = spark.createDataFrame(clique + noise, "src long, dst long")
    for tier in ("blocked", "shuffle"):
        rows = densest_subgraph(df, epsilon=0.05, tier=tier).collect()
        got = sorted(r["v"] for r in rows)
        assert got == list(range(100, 106)), tier
        assert rows[0]["density"] == pytest.approx(15 / 6)


def test_shuffle_partition_invariance(spark):
    edges = [(i, (i * 7 + 1) % 37) for i in range(37)] + [
        (i, (i * 11 + 3) % 37) for i in range(37)
    ]
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = densest_subgraph(df.repartition(1), tier="shuffle").collect()
    b = densest_subgraph(df.repartition(16), tier="shuffle").collect()
    assert sorted(r["v"] for r in a) == sorted(r["v"] for r in b)
    assert a[0]["density"] == pytest.approx(b[0]["density"])


def test_empty_and_bad_epsilon(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert densest_subgraph(df, tier="shuffle").count() == 0
    assert densest_subgraph(df, tier="blocked").count() == 0
    some = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        densest_subgraph(some, epsilon=0.0)
    with pytest.raises(ValueError):
        densest_subgraph(some, tier="nope")
