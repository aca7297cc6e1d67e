"""Core decomposition (coreness, operators/subgraphs.py) — both tiers vs a
sequential min-degree-peel oracle, tier equality, k-core consistency, and
the oracle-unroll convergence bound (ADVICE r3 discipline: a gate whose SQL
replay unrolls K rounds must PROVE the engine converges within K)."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from tests.conftest import TINY, make_edges
from triangle_counting_spark.operators.subgraphs import (
    coreness,
    coreness_blocked,
    kcore_edges,
)

# known coreness for the tiny fixtures
TINY_CORENESS = {
    "triangle": {0: 2, 1: 2, 2: 2},
    "path4": {0: 1, 1: 1, 2: 1, 3: 1},
    "star5": {0: 1, 1: 1, 2: 1, 3: 1, 4: 1},
    "cycle5": {v: 2 for v in range(5)},
    "K4": {v: 3 for v in range(4)},
    "K5": {v: 4 for v in range(5)},
    "two_triangles": {v: 2 for v in range(6)},
    "bowtie": {v: 2 for v in range(5)},
}


def peel_coreness(pairs):
    """Sequential Batagelj–Zaveršnik-style peel — the textbook oracle."""
    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    core, alive = {}, set(adj)
    deg = {v: len(adj[v]) for v in adj}
    k = 0
    while alive:
        k = max(k, min(deg[v] for v in alive))
        q = [v for v in alive if deg[v] <= k]
        while q:
            v = q.pop()
            if v not in alive:
                continue
            core[v] = k
            alive.discard(v)
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
                    if deg[u] <= k:
                        q.append(u)
    return core


@pytest.mark.parametrize("name", sorted(TINY_CORENESS))
def test_tiny_graphs_both_tiers(spark, name):
    pairs = TINY[name][0]
    want = TINY_CORENESS[name]
    assert peel_coreness(pairs) == want  # the oracle agrees with the book
    e = make_edges(spark, pairs)
    got_s = {r["v"]: r["coreness"] for r in coreness(e).state.collect()}
    got_b = {r["v"]: r["coreness"] for r in coreness_blocked(e).state.collect()}
    assert got_s == want
    assert got_b == want


def _random_pairs(seed, n=70, m=220):
    rnd = random.Random(seed)
    pairs = set()
    while len(pairs) < m:
        a, b = rnd.randrange(n), rnd.randrange(n)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


@pytest.mark.parametrize("seed", [1, 2])
def test_random_graph_matches_peel(spark, seed):
    pairs = _random_pairs(seed)
    want = peel_coreness(pairs)
    e = make_edges(spark, pairs)
    rs = coreness(e)
    rb = coreness_blocked(e)
    assert {r["v"]: r["coreness"] for r in rs.state.collect()} == want
    assert {r["v"]: r["coreness"] for r in rb.state.collect()} == want
    assert rs.converged and rb.converged


def test_kcore_consistency(spark):
    """v survives the k-core peel  ⟺  coreness(v) ≥ k, for every k."""
    pairs = _random_pairs(3)
    e = make_edges(spark, pairs)
    core = {r["v"]: r["coreness"] for r in coreness_blocked(e).state.collect()}
    for k in (2, 3, max(core.values())):
        kc = kcore_edges(e, k).collect()
        in_core = {r["src"] for r in kc} | {r["dst"] for r in kc}
        assert in_core == {v for v, c in core.items() if c >= k}


def test_gate_converges_within_oracle_bound(spark):
    """The driver gate's SQL replay unrolls CORENESS_ORACLE_ROUNDS rounds;
    the engine must converge within that bound at the gate's data scale
    (sf0.01) or the hash comparison is meaningless."""
    import __spark_entry__ as entry

    e = entry._edges(spark, "/root/testdata/sf0.01")
    r = coreness_blocked(e)  # same fixpoint/rounds as the shuffle tier
    assert r.converged
    assert r.iterations <= entry.CORENESS_ORACLE_ROUNDS, (
        f"engine took {r.iterations} rounds; oracle unrolls only "
        f"{entry.CORENESS_ORACLE_ROUNDS} — raise CORENESS_ORACLE_ROUNDS"
    )


def test_duplicate_and_directed_input_normalized(spark):
    """Canonicalization: dupes/self-loops/reversed edges don't change it."""
    pairs = TINY["K4"][0]
    noisy = pairs + [(b, a) for a, b in pairs] + [(0, 0), (1, 1)] + pairs[:2]
    e = make_edges(spark, noisy)
    got = {r["v"]: r["coreness"] for r in coreness_blocked(e).state.collect()}
    assert got == TINY_CORENESS["K4"]
