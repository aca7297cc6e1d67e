"""HITS hubs & authorities — both tiers vs a numpy power-iteration
oracle, structural sanity, and partition invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.operators.hits import (
    hits,
    hits_blocked,
    hits_fixed,
)


def _numpy_hits(edges: list[tuple[int, int]], iterations: int):
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    hub = np.full(n, 1.0 / np.sqrt(n))
    auth = hub.copy()
    for _ in range(iterations):
        auth = A.T @ hub
        auth /= np.linalg.norm(auth)
        hub = A @ auth
        hub /= np.linalg.norm(hub)
    return {v: (hub[idx[v]], auth[idx[v]]) for v in verts}


FIXTURES = [
    # hub/authority bipartite-ish core
    [(1, 2), (1, 3), (2, 3), (4, 2), (4, 3), (3, 5)],
    # pure cycle: symmetric scores
    [(1, 2), (2, 3), (3, 1)],
    # star out: center is the only hub, leaves the only authorities
    [(0, 1), (0, 2), (0, 3), (0, 4)],
    # two disconnected dyads
    [(1, 2), (3, 4)],
]


@pytest.mark.parametrize("edges", FIXTURES)
@pytest.mark.parametrize("tier", ["shuffle", "blocked"])
def test_hits_matches_numpy(spark, edges, tier):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        r["v"]: (r["hub"], r["auth"])
        for r in hits_fixed(df, 6, tier=tier).collect()
    }
    ref = _numpy_hits(edges, 6)
    assert set(out) == set(ref)
    tol = 1e-9 if tier == "shuffle" else 1e-12
    for v, (h, a) in ref.items():
        assert out[v][0] == pytest.approx(h, abs=tol)
        assert out[v][1] == pytest.approx(a, abs=tol)


def test_hits_star_structure(spark):
    df = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3)], "src long, dst long"
    )
    out = {r["v"]: r for r in hits_fixed(df, 4).collect()}
    # the center is the sole hub (hub=1), pure-sink leaves the authorities
    assert out[0]["hub"] == pytest.approx(1.0)
    assert out[0]["auth"] == pytest.approx(0.0)
    for leaf in (1, 2, 3):
        assert out[leaf]["hub"] == pytest.approx(0.0)
        assert out[leaf]["auth"] == pytest.approx(1.0 / np.sqrt(3))


def test_hits_convergence_loop(spark):
    edges = [(1, 2), (1, 3), (2, 3), (4, 2), (4, 3), (3, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = hits(df, tol=1e-9, max_iter=100)
    assert res.converged
    # converged state is the dominant singular pair: one more iteration
    # moves nothing
    again = {
        r["v"]: (r["hub"], r["auth"])
        for r in hits_fixed(df, res.iterations + 3).collect()
    }
    for r in res.state.collect():
        h, a = again[r["v"]]
        assert r["hub"] == pytest.approx(h, abs=1e-6)
        assert r["auth"] == pytest.approx(a, abs=1e-6)


def test_hits_partition_invariance(spark):
    edges = [(i, (i * 7 + 1) % 23) for i in range(23)] + [
        (i, (i * 5 + 2) % 23) for i in range(23)
    ]
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {
        r["v"]: (r["hub"], r["auth"])
        for r in hits_fixed(df.repartition(1), 5).collect()
    }
    b = {
        r["v"]: (r["hub"], r["auth"])
        for r in hits_fixed(df.repartition(16), 5).collect()
    }
    assert set(a) == set(b)
    for v in a:
        assert a[v][0] == pytest.approx(b[v][0], abs=1e-12)
        assert a[v][1] == pytest.approx(b[v][1], abs=1e-12)


def test_hits_blocked_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert hits_blocked(df, 3).count() == 0


def test_hits_auto_tier_dispatch(spark):
    edges = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["v"]: r["hub"] for r in hits_fixed(df, 4, tier="auto").collect()}
    ref = _numpy_hits(edges, 4)
    for v, (h, _a) in ref.items():
        assert out[v] == pytest.approx(h, abs=1e-9)


def test_hits_duplicate_and_self_edges_cleaned(spark):
    # duplicates collapse, self-loops drop — directed_edges semantics
    noisy = [(1, 2), (1, 2), (2, 2), (2, 3), (3, 1)]
    clean = [(1, 2), (2, 3), (3, 1)]
    df = spark.createDataFrame(noisy, "src long, dst long")
    out = {
        r["v"]: (r["hub"], r["auth"])
        for r in hits_fixed(df, 4).collect()
    }
    ref = _numpy_hits(clean, 4)
    assert set(out) == set(ref)
    for v, (h, a) in ref.items():
        assert out[v][0] == pytest.approx(h, abs=1e-9)
        assert out[v][1] == pytest.approx(a, abs=1e-9)
