"""Degree assortativity + power-law alpha (operators/stats.py, r3)."""

from __future__ import annotations

import math

import pytest

from triangle_counting_spark.operators.stats import (
    degree_assortativity,
    power_law_alpha,
)
from tests.conftest import make_edges


def test_assortativity_regular_graph_undefined(spark):
    # K4: all degrees equal -> zero variance -> corr undefined (null)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    row = degree_assortativity(make_edges(spark, k4)).collect()[0]
    assert row.assortativity is None


def test_assortativity_star_is_minus_one(spark):
    # star: every edge links the hub (deg n-1) to a leaf (deg 1) ->
    # perfectly disassortative, r = -1
    star = [(0, i) for i in range(1, 6)]
    row = degree_assortativity(make_edges(spark, star)).collect()[0]
    assert row.assortativity == pytest.approx(-1.0, abs=1e-6)


def test_assortativity_matches_python(spark):
    import random

    rng = random.Random(4)
    edges = sorted({tuple(sorted(rng.sample(range(15), 2))) for _ in range(40)})
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in edges:  # symmetrized: both directions
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    vx = sum((x - mx) ** 2 for x in xs)
    vy = sum((y - my) ** 2 for y in ys)
    want = cov / math.sqrt(vx * vy)
    row = degree_assortativity(make_edges(spark, edges)).collect()[0]
    assert row.assortativity == pytest.approx(want, abs=2e-6)


def test_power_law_alpha_closed_form(spark):
    # path of 5: degrees [1,2,2,2,1]; dmin=2 -> tail = three 2s
    # alpha = 1 + 3 / (3 * ln(2/1.5))
    e = make_edges(spark, [(i, i + 1) for i in range(4)])
    row = power_law_alpha(e, dmin=2).collect()[0]
    assert row.n_tail == 3
    assert row.alpha == pytest.approx(1 + 1 / math.log(2 / 1.5), abs=1e-5)


def test_power_law_alpha_on_zipf_fixture(spark):
    from triangle_counting_spark.sources.rmat import rmat_edges

    e = rmat_edges(spark, scale=12, num_partitions=4)
    row = power_law_alpha(e, dmin=4).collect()[0]
    # RMAT degree tails are power-law-ish; the MLE should land in the
    # plausible exponent band, not a degenerate value
    assert 1.2 < row.alpha < 5.0
    assert row.n_tail > 100
