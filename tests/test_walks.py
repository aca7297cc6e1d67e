"""Seeded random walks (operators/walks.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from triangle_counting_spark.operators.walks import random_walks
from tests.conftest import make_edges


def _py_walks(edges, length, walks_per_vertex, seed):
    """Reference replay of the md5-index walk definition."""
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for v in adj:
        adj[v] = sorted(set(adj[v]))
    rows = set()
    for v0 in adj:
        for wix in range(walks_per_vertex):
            cur = v0
            rows.add((v0, wix, 0, cur))
            for t in range(1, length + 1):
                key = f"{v0}_{wix}_{t}_{seed}"
                h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
                nbrs = adj[cur]
                cur = nbrs[h % len(nbrs)]
                rows.add((v0, wix, t, cur))
    return rows


EDGES = [(0, 1), (1, 2), (2, 3), (0, 3), (1, 3), (2, 4)]


def test_walks_match_python_replay(spark):
    got = {
        (r.start_v, r.walk_ix, r.step, r.v)
        for r in random_walks(make_edges(spark, EDGES), length=5,
                              walks_per_vertex=2, seed=3).collect()
    }
    assert got == _py_walks(EDGES, 5, 2, 3)


def test_walks_are_edge_respecting(spark):
    e = make_edges(spark, EDGES)
    walks = random_walks(e, length=6, walks_per_vertex=1, seed=9)
    sym = {(a, b) for a, b in EDGES} | {(b, a) for a, b in EDGES}
    steps = {
        (r.start_v, r.walk_ix): {} for r in walks.collect()
    }
    for r in walks.collect():
        steps[(r.start_v, r.walk_ix)][r.step] = r.v
    for path in steps.values():
        for t in range(1, max(path) + 1):
            assert (path[t - 1], path[t]) in sym


def test_walks_deterministic_across_partitioning(spark):
    e = make_edges(spark, EDGES)
    a = sorted(map(tuple, random_walks(e, 4, 1, 7).collect()))
    b = sorted(map(tuple, random_walks(e.repartition(5), 4, 1, 7).collect()))
    assert a == b


def test_walk_row_count(spark):
    e = make_edges(spark, EDGES)
    n_verts = 5
    out = random_walks(e, length=3, walks_per_vertex=2, seed=1)
    assert out.count() == n_verts * 2 * 4  # (L+1) rows per walk


def test_skipgram_pairs_match_python(spark):
    from triangle_counting_spark.operators.walks import walk_skipgram_pairs

    e = make_edges(spark, EDGES)
    walks = random_walks(e, length=4, walks_per_vertex=1, seed=5)
    rows = walks.collect()
    by_walk: dict = {}
    for r in rows:
        by_walk.setdefault((r.start_v, r.walk_ix), {})[r.step] = r.v
    want = []
    for path in by_walk.values():
        for sa, ca in path.items():
            for sb, cb in path.items():
                if sa != sb and abs(sa - sb) <= 2 and ca != cb:
                    want.append((ca, cb, sb - sa))
    got = [
        (r.center, r.context, r.offset)
        for r in walk_skipgram_pairs(walks, window=2).collect()
    ]
    assert sorted(got) == sorted(want)
    assert all(0 < abs(o) <= 2 for _, _, o in got)
