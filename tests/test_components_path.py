from __future__ import annotations

from tests.conftest import make_edges
from triangle_counting_spark.operators.components import connected_components


def test_long_path_converges_logarithmically(spark):
    """Pointer jumping: a 64-vertex chain must converge in O(log n)
    rounds, not O(n) (pure hash-min needs ~64)."""
    n = 64
    e = make_edges(spark, [(i, i + 1) for i in range(n - 1)])
    res = connected_components(e, max_iter=25)
    assert res.converged, f"not converged in 25 iters (took {res.iterations})"
    labels = {r.v: r.component for r in res.state.collect()}
    assert set(labels.values()) == {0}
    assert len(labels) == n


def test_two_chains_plus_clique(spark):
    pairs = [(i, i + 1) for i in range(0, 19)]  # chain 0..19
    pairs += [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]  # K5
    pairs += [(200, 201), (201, 202)]
    res = connected_components(make_edges(spark, pairs), max_iter=25)
    assert res.converged
    labels = {r.v: r.component for r in res.state.collect()}
    assert set(labels.values()) == {0, 100, 200}
