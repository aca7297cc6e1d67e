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


def _labels(spark, pairs):
    return spark.createDataFrame([(int(v), int(c)) for v, c in pairs], "v long, label long")


def test_modularity_two_triangles_split(spark):
    from triangle_counting_spark.operators.labelprop import modularity

    e = make_edges(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)])
    lab = _labels(spark, [(v, 0 if v < 3 else 1) for v in range(6)])
    q = modularity(e, lab).collect()[0].modularity
    # each community: e_c/m = 3/6, (d_c/2m)^2 = (6/12)^2 -> Q = 2*(0.5-0.25)
    assert q == pytest.approx(0.5, abs=1e-6)


def test_modularity_single_community_is_zero(spark):
    from triangle_counting_spark.operators.labelprop import modularity

    e = make_edges(spark, [(0, 1), (1, 2), (0, 2)])
    lab = _labels(spark, [(v, 7) for v in range(3)])
    assert modularity(e, lab).collect()[0].modularity == pytest.approx(0.0, abs=1e-6)


def test_modularity_matches_python(spark):
    import random

    from triangle_counting_spark.operators.labelprop import modularity

    rng = random.Random(23)
    edges = sorted({tuple(sorted(rng.sample(range(12), 2))) for _ in range(25)})
    labels = {v: rng.randint(0, 2) for v in range(12)}
    m = len(edges)
    deg: dict[int, int] = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    from collections import defaultdict

    ec: dict[int, int] = defaultdict(int)
    dc: dict[int, int] = defaultdict(int)
    for a, b in edges:
        if labels[a] == labels[b]:
            ec[labels[a]] += 1
    for v, d in deg.items():
        dc[labels[v]] += d
    want = sum(ec[c] / m - (dc[c] / (2 * m)) ** 2 for c in dc)
    got = modularity(
        make_edges(spark, edges), _labels(spark, labels.items())
    ).collect()[0].modularity
    assert got == pytest.approx(want, abs=2e-6)
