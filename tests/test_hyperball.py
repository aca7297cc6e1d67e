"""HyperBall (operators/neighborhood.py) — register parity against a pure
Python twin of the same md5-seeded sketch, estimate error bounds, component
confinement, and the neighborhood-function/effective-diameter surface."""

from __future__ import annotations

import hashlib
import math
import random
from collections import defaultdict

import pytest

from tests.conftest import TINY, make_edges
from triangle_counting_spark.operators.neighborhood import (
    M,
    RAW_NUMERATOR,
    effective_diameter,
    hyperball,
    hyperball_registers,
    neighborhood_function,
)


def _md5i(s: str, a: int, b: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[a:b], 16)


def _init_reg(v: int) -> list[int]:
    h1, h2 = _md5i(str(v), 0, 8), _md5i(str(v), 8, 16)
    r = [0] * M
    r[h1 % M] = 33 if h2 == 0 else 33 - len(bin(h2)[2:])
    return r


def _sim(pairs, rounds):
    adj, vs = defaultdict(set), set()
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
        vs.update((a, b))
    regs = {v: _init_reg(v) for v in vs}
    for _ in range(rounds):
        regs = {
            v: [max(vals) for vals in zip(regs[v], *[regs[u] for u in adj[v]])]
            for v in vs
        }
    return regs


def _est(r):
    s = sum(1 << (40 - x) for x in r)
    zeros = sum(1 for x in r if x == 0)
    raw = RAW_NUMERATOR / s
    if zeros > 0 and raw <= 2.5 * M:
        return round(M * math.log(M / zeros), 6)
    return round(raw, 6)


def _random_pairs(seed, n=90, m=260):
    rnd = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


@pytest.mark.parametrize("rounds", [0, 1, 3])
def test_sketch_matches_python_twin(spark, rounds):
    pairs = _random_pairs(11)
    e = make_edges(spark, pairs)
    got = {
        r["v"]: (r["reg_sum"], r["zeros"], r["ball_estimate"])
        for r in hyperball(e, rounds=rounds).collect()
    }
    want = {
        v: (sum(r), sum(1 for x in r if x == 0), _est(r))
        for v, r in _sim(pairs, rounds).items()
    }
    assert got == want


def test_estimate_error_within_sketch_bounds(spark):
    """K40 at radius 1: every true ball is the full clique (40). HLL with
    m=64 has RSD ≈ 13%; allow 4σ."""
    pairs = [(a, b) for a in range(40) for b in range(a + 1, 40)]
    e = make_edges(spark, pairs)
    for row in hyperball(e, rounds=1).collect():
        assert abs(row["ball_estimate"] - 40) <= 0.52 * 40


def test_balls_confined_to_component(spark):
    """two_triangles: radius-2 balls saturate at each triangle (3), never
    crossing components — registers equal the component-wide merge."""
    pairs = TINY["two_triangles"][0]
    e = make_edges(spark, pairs)
    regs = {r["v"]: list(r["regs"]) for r in hyperball_registers(e, 4).collect()}
    comp0 = [max(vals) for vals in zip(*[_init_reg(v) for v in (0, 1, 2)])]
    comp1 = [max(vals) for vals in zip(*[_init_reg(v) for v in (3, 4, 5)])]
    for v in (0, 1, 2):
        assert regs[v] == comp0
    for v in (3, 4, 5):
        assert regs[v] == comp1


def test_neighborhood_function_monotone_and_saturates(spark):
    pairs = _random_pairs(5)
    e = make_edges(spark, pairs)
    nf = neighborhood_function(e, max_rounds=12)
    vals = [n for _, n in nf]
    assert all(b >= a for a, b in zip(vals, vals[1:]))  # monotone
    assert vals[-1] <= vals[-2] * 1.001  # stopped at saturation
    d = effective_diameter(nf)
    assert 0 < d <= nf[-1][0]


def test_path_graph_effective_diameter(spark):
    """A long path: N(r) grows linearly, so the 0.9-effective diameter of
    the sketch must land near 0.9 × true diameter (sketch noise aside)."""
    n = 40
    pairs = [(i, i + 1) for i in range(n - 1)]
    e = make_edges(spark, pairs)
    nf = neighborhood_function(e, max_rounds=n)
    d = effective_diameter(nf)
    assert 0.6 * n <= d + 1 <= n  # ~0.9n expected; wide band for HLL noise


def test_harmonic_centrality_star_ordering(spark):
    """Star graph: the hub's harmonic centrality must dominate the leaves
    ((n-1)·1 vs 1 + (n-2)/2); sketch noise cannot flip that ordering."""
    from triangle_counting_spark.operators.neighborhood import hyperball_centrality

    n = 12
    pairs = [(0, i) for i in range(1, n)]
    e = make_edges(spark, pairs)
    got = {r["v"]: r["harmonic_estimate"] for r in hyperball_centrality(e).collect()}
    hub, leaves = got[0], [got[v] for v in range(1, n)]
    assert hub > max(leaves) * 1.5
    # leaves are symmetric up to per-vertex hash noise; all within HLL band
    true_leaf = 1 + (n - 2) / 2
    for x in leaves:
        assert abs(x - true_leaf) <= 0.55 * true_leaf
