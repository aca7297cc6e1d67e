"""Link prediction scores (operators/linkpred.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.operators.linkpred import (
    capped_center_count,
    link_prediction,
)
from tests.conftest import make_edges


def _rows(df):
    return {(r.u, r.v): (r.common, r.jaccard, r.adamic_adar) for r in df.collect()}


def test_path3_closed_form(spark):
    got = _rows(link_prediction(make_edges(spark, [(0, 1), (1, 2)])))
    assert set(got) == {(0, 2)}
    c, j, aa = got[(0, 2)]
    assert c == 1 and j == 1.0
    assert aa == pytest.approx(1 / math.log(2), abs=1e-6)


def test_square_closed_form(spark):
    got = _rows(link_prediction(make_edges(spark, [(0, 1), (1, 2), (2, 3), (0, 3)])))
    assert set(got) == {(0, 2), (1, 3)}
    for pair in got:
        c, j, aa = got[pair]
        assert c == 2 and j == 1.0
        assert aa == pytest.approx(2 / math.log(2), abs=1e-6)


def test_triangle_has_no_open_pairs(spark):
    assert _rows(link_prediction(make_edges(spark, [(0, 1), (1, 2), (0, 2)]))) == {}


def test_differential_vs_python(spark):
    import itertools
    import random

    rng = random.Random(9)
    edges = sorted(
        {tuple(sorted(rng.sample(range(12), 2))) for _ in range(30)}
    )
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for u, v in itertools.combinations(sorted(adj), 2):
        if v in adj[u]:
            continue
        common = adj[u] & adj[v]
        if not common:
            continue
        want[(u, v)] = (
            len(common),
            round(len(common) / (len(adj[u]) + len(adj[v]) - len(common)), 6),
            round(sum(1 / math.log(len(adj[w])) for w in common), 6),
        )
    got = _rows(link_prediction(make_edges(spark, edges)))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)
        assert got[k][2] == pytest.approx(want[k][2], abs=2e-6)


def test_center_cap_is_explicit(spark):
    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    e = make_edges(spark, star)
    full = _rows(link_prediction(e))
    capped = _rows(link_prediction(e, max_center_degree=2))
    # the hub (deg 5) is excluded as a CENTER: leaf pairs mediated only by
    # the hub disappear; pair (3,…) etc. gone, but pairs via low-deg
    # centers survive
    assert set(capped) <= set(full)
    assert len(capped) < len(full)
    assert capped_center_count(e, 2) == 1  # exactly the hub
