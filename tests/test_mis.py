"""Maximal independent set: both tiers == greedy-by-priority reference."""

from __future__ import annotations

from collections import defaultdict

import pytest

from triangle_counting_spark.operators.mis import maximal_independent_set

from tests.conftest import TINY, make_edges


def _greedy_reference(spark, pairs):
    """Lexicographically-first MIS under the (xxhash64(v), v) order —
    the hash fetched from Spark so the definition stays in one place."""
    from pyspark.sql import functions as F

    adj = defaultdict(set)
    for a, b in pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    verts = sorted(adj)
    hdf = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in verts], "v long")
        .select("v", F.xxhash64("v").alias("h"))
        .collect()
    }
    state = {}
    for v in sorted(verts, key=lambda v: (hdf[v], v)):
        if v not in state:
            state[v] = True
            for u in adj[v]:
                state.setdefault(u, False)
    return state


def _check_valid(pairs, got):
    adj = {frozenset(e) for e in pairs if e[0] != e[1]}
    mis = {v for v, f in got.items() if f}
    # independence
    for e in adj:
        assert not e <= mis, f"adjacent pair {e} both in MIS"
    # maximality: every excluded vertex has a MIS neighbor
    nbrs = defaultdict(set)
    for a, b in ((tuple(e)) for e in adj):
        nbrs[a].add(b)
        nbrs[b].add(a)
    for v, f in got.items():
        if not f:
            assert nbrs[v] & mis, f"{v} excluded but has no MIS neighbor"


@pytest.mark.parametrize("name", sorted(TINY))
@pytest.mark.parametrize("tier", ["shuffle", "blocked"])
def test_mis_matches_greedy(spark, name, tier):
    pairs = TINY[name][0]
    ref = _greedy_reference(spark, pairs)
    got = {
        r["v"]: r["in_mis"]
        for r in maximal_independent_set(
            make_edges(spark, pairs), tier=tier
        ).collect()
    }
    assert got == ref
    _check_valid(pairs, got)


@pytest.mark.parametrize("tier", ["shuffle", "blocked"])
def test_mis_rmat_tiers_identical_and_valid(spark, tier):
    from triangle_counting_spark.sources.rmat import rmat_edges

    e = rmat_edges(spark, scale=8, edge_factor=4, seed=3)
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    ref = _greedy_reference(spark, pairs)
    got = {
        r["v"]: r["in_mis"]
        for r in maximal_independent_set(e, tier=tier).collect()
    }
    assert got == ref
    _check_valid(pairs, got)


def test_mis_partitioning_invariant(spark):
    from triangle_counting_spark.sources.rmat import rmat_edges

    e = rmat_edges(spark, scale=7, edge_factor=4, seed=9)
    a = {
        r["v"]: r["in_mis"]
        for r in maximal_independent_set(e.repartition(1), tier="shuffle").collect()
    }
    b = {
        r["v"]: r["in_mis"]
        for r in maximal_independent_set(e.repartition(7), tier="shuffle").collect()
    }
    assert a == b


def test_mis_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert maximal_independent_set(empty, tier="shuffle").count() == 0
    assert maximal_independent_set(empty, tier="blocked").count() == 0


@pytest.mark.parametrize("tier", ["shuffle", "blocked"])
def test_mis_md5_priority_tiers_identical_and_valid(spark, tier):
    # the md5 priority (the SQL-replayable driver-gate variant) must obey
    # the same lexicographic-MIS property as the xxhash64 default
    from triangle_counting_spark.sources.rmat import rmat_edges

    e = rmat_edges(spark, scale=8, edge_factor=4, seed=3)
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    got = {
        r["v"]: r["in_mis"]
        for r in maximal_independent_set(e, tier=tier, priority="md5").collect()
    }
    _check_valid(pairs, got)
    other = {
        r["v"]: r["in_mis"]
        for r in maximal_independent_set(
            e, tier="blocked" if tier == "shuffle" else "shuffle", priority="md5"
        ).collect()
    }
    assert got == other


def test_mis_unknown_priority_rejected(spark):
    with pytest.raises(ValueError, match="priority"):
        maximal_independent_set(
            make_edges(spark, [(1, 2)]), tier="shuffle", priority="sha1"
        )
