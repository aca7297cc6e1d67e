"""Louvain community detection — planted-structure recovery, cross-tier
equality, modularity quality, weighted graphs, degenerate inputs."""

from __future__ import annotations

from itertools import combinations

import pytest

from triangle_counting_spark.operators.labelprop import modularity
from triangle_counting_spark.operators.louvain import louvain


def _partition(rows):
    """community assignment → frozenset-of-frozensets partition."""
    groups: dict = {}
    for r in rows:
        groups.setdefault(r["community"], set()).add(r["v"])
    return frozenset(frozenset(g) for g in groups.values())


def _two_cliques():
    c1 = list(combinations(range(0, 5), 2))
    c2 = list(combinations(range(10, 15), 2))
    return c1 + c2 + [(4, 10)]


def test_blocked_recovers_planted_cliques(spark):
    df = spark.createDataFrame(_two_cliques(), "src long, dst long")
    part = _partition(louvain(df, tier="blocked").collect())
    assert part == frozenset(
        [frozenset(range(0, 5)), frozenset(range(10, 15))]
    )


def test_shuffle_matches_blocked_on_cliques(spark):
    df = spark.createDataFrame(_two_cliques(), "src long, dst long")
    blk = louvain(df, tier="blocked").collect()
    shf = louvain(df, tier="shuffle").collect()
    # identical synchronous rounds → identical assignment, not just the
    # same partition
    assert {r["v"]: r["community"] for r in blk} == {
        r["v"]: r["community"] for r in shf
    }


def test_ring_of_cliques(spark):
    # four K4s in a ring — the textbook Louvain fixture
    cliques = [list(range(i * 10, i * 10 + 4)) for i in range(4)]
    edges = [e for c in cliques for e in combinations(c, 2)]
    edges += [(3, 10), (13, 20), (23, 30), (33, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    part = _partition(louvain(df, tier="blocked").collect())
    assert part == frozenset(frozenset(c) for c in cliques)


def test_modularity_beats_singletons_and_matches_optimum(spark):
    df = spark.createDataFrame(_two_cliques(), "src long, dst long")
    rows = louvain(df, tier="blocked").collect()
    lab = spark.createDataFrame(
        [(r["v"], r["community"]) for r in rows], "v long, label long"
    )
    q = modularity(df, lab).collect()[0]["modularity"]
    # known optimum for two 5-cliques + bridge: Q = 0.452381
    assert q == pytest.approx(0.452381, abs=1e-6)


def test_weighted_louvain_follows_weights(spark):
    # topology is one 4-cycle; weights split it 2+2
    edges = [
        (1, 2, 10.0),
        (3, 4, 10.0),
        (2, 3, 0.1),
        (4, 1, 0.1),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    part = _partition(
        louvain(df, tier="blocked", weight_col="w").collect()
    )
    assert part == frozenset([frozenset({1, 2}), frozenset({3, 4})])


def test_weighted_duplicate_edges_sum(spark):
    # duplicate (src, dst) weighted rows must sum, not multiply rows
    edges = [(1, 2, 5.0), (1, 2, 5.0), (3, 4, 10.0), (2, 3, 0.1)]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    part = _partition(louvain(df, tier="blocked", weight_col="w").collect())
    assert part == frozenset([frozenset({1, 2}), frozenset({3, 4})])


def test_shuffle_partition_invariance(spark):
    df = spark.createDataFrame(_two_cliques(), "src long, dst long")
    a = louvain(df.repartition(1), tier="shuffle").collect()
    b = louvain(df.repartition(16), tier="shuffle").collect()
    assert {r["v"]: r["community"] for r in a} == {
        r["v"]: r["community"] for r in b
    }


def test_empty_and_bad_tier(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    assert louvain(empty, tier="blocked").count() == 0
    assert louvain(empty, tier="shuffle").count() == 0
    some = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        louvain(some, tier="nope")


def test_graph_facade_louvain(spark):
    from triangle_counting_spark.graph import Graph

    df = spark.createDataFrame(_two_cliques(), "src long, dst long")
    g = Graph(df)
    part = _partition(g.louvain(tier="blocked").collect())
    assert len(part) == 2
