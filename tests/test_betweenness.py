"""Betweenness centrality — both tiers vs an independent pure-Python
Brandes and vs closed-form values on the known-truth tiny graphs."""

from __future__ import annotations

from collections import deque

import pytest

from tests.conftest import TINY, make_edges
from triangle_counting_spark.operators.betweenness import betweenness


def exact_brandes(pairs):
    """Textbook Brandes (undirected, unnormalized, pairs halved) —
    deliberately list/deque-based so it shares nothing with the engine."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    bc = {v: 0.0 for v in adj}
    for s in adj:
        order = []
        preds = {v: [] for v in adj}
        sigma = {v: 0.0 for v in adj}
        dist = {v: -1 for v in adj}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in adj}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: x / 2.0 for v, x in bc.items()}


def as_map(df):
    return {r["v"]: r["betweenness"] for r in df.collect()}


@pytest.mark.parametrize("tier", ["blocked", "shuffle"])
def test_path4_closed_form(spark, tier):
    # path 0-1-2-3: bc(1)=bc(2)=2 (pairs {0,2},{0,3} resp {1,3},{0,3}... )
    edges = make_edges(spark, TINY["path4"][0])
    n = 4
    got = as_map(betweenness(edges, n_roots=n, tier=tier))
    assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}


@pytest.mark.parametrize("tier", ["blocked", "shuffle"])
@pytest.mark.parametrize("name", sorted(TINY))
def test_tiny_graphs_exact(spark, tier, name):
    pairs = TINY[name][0]
    edges = make_edges(spark, pairs)
    n = len({v for p in pairs for v in p})
    want = exact_brandes(pairs)
    got = as_map(betweenness(edges, n_roots=n, tier=tier))
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)


def test_rmat_tiers_agree_and_match_exact(spark):
    from triangle_counting_spark.sources.rmat import rmat_edges

    edges = rmat_edges(spark, scale=7, num_partitions=4).persist()
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    n = len({v for p in pairs for v in p})
    want = exact_brandes(pairs)
    blocked = as_map(betweenness(edges, n_roots=n, tier="blocked"))
    shuffle = as_map(betweenness(edges, n_roots=n, tier="shuffle"))
    assert set(blocked) == set(want) == set(shuffle)
    for v in want:
        assert blocked[v] == pytest.approx(want[v], abs=1e-5)
        assert shuffle[v] == pytest.approx(want[v], abs=1e-5)
    edges.unpersist()


def test_sampled_estimate_tracks_exact(spark):
    """k=16 of ~100 vertices: the Brandes-Pich estimate must rank the top
    hub correctly and stay within a loose relative band on the big scores."""
    from triangle_counting_spark.sources.rmat import rmat_edges

    edges = rmat_edges(spark, scale=7, num_partitions=4).persist()
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    want = exact_brandes(pairs)
    got = as_map(betweenness(edges, n_roots=16, tier="blocked"))
    top_exact = max(want, key=want.get)
    top3_est = sorted(got, key=got.get, reverse=True)[:3]
    assert top_exact in top3_est
    assert got[top_exact] == pytest.approx(want[top_exact], rel=0.6)
    edges.unpersist()


def test_disconnected_and_empty(spark):
    got = as_map(
        betweenness(
            make_edges(spark, [(0, 1), (1, 2), (5, 6)]), n_roots=5, tier="blocked"
        )
    )
    assert got == {0: 0.0, 1: 1.0, 2: 0.0, 5: 0.0, 6: 0.0}
    empty = betweenness(make_edges(spark, []), n_roots=4, tier="blocked")
    assert empty.count() == 0
