"""Exact 4-cycle counting vs a brute-force cycle enumerator."""

from __future__ import annotations

from itertools import combinations, permutations

import pytest

from triangle_counting_spark.operators.triangles import four_cycle_count


def _brute_c4(edges: list[tuple[int, int]]) -> int:
    eset = {frozenset(e) for e in edges}
    verts = sorted({v for e in edges for v in e})
    cnt = 0
    for quad in combinations(verts, 4):
        for perm in permutations(quad):
            # canonical cycle representative: smallest vertex first,
            # smaller of the two neighbors second
            if perm[0] == min(perm) and perm[1] < perm[3]:
                a, b, c, d = perm
                if all(
                    frozenset(p) in eset
                    for p in [(a, b), (b, c), (c, d), (d, a)]
                ):
                    cnt += 1
    return cnt


FIXTURES = [
    [(1, 2), (2, 3), (3, 4), (4, 1)],  # one plain square
    list(combinations(range(5), 2)),  # K5: 3 per 4-subset = 15
    [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)],  # chorded square: still 1
    [(1, 2), (2, 3), (3, 1)],  # triangle: 0
    [(1, 2), (2, 3), (3, 4), (4, 1), (2, 5), (5, 4)],  # fused squares: 3
    list(combinations(range(4), 2)),  # K4: 3
    [(1, 2), (3, 4)],  # no cycles at all
]


@pytest.mark.parametrize("edges", FIXTURES)
def test_four_cycles_match_brute_force(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = four_cycle_count(df).collect()[0]["four_cycles"]
    assert got == _brute_c4(edges)


def test_four_cycles_bipartite_butterflies(spark):
    # complete bipartite K(3,3): C(3,2)² = 9 butterflies
    edges = [(a, b) for a in (1, 2, 3) for b in (10, 20, 30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert four_cycle_count(df).collect()[0]["four_cycles"] == 9


def test_four_cycles_empty_and_duplicates(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert four_cycle_count(empty).collect()[0]["four_cycles"] == 0
    # duplicate + reversed edges collapse before counting
    noisy = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 1), (3, 4)]
    df = spark.createDataFrame(noisy, "src long, dst long")
    assert four_cycle_count(df).collect()[0]["four_cycles"] == 1
