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


def _py_biased_walks(edges, length, walks_per_vertex, seed, p, q):
    """Reference replay of the node2vec integer-weight selection rule."""
    from triangle_counting_spark.operators.walks import _biased_weights

    w_ret, w_d1, w_d2 = _biased_weights(p, q)
    adj: dict[int, list[int]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    for v in adj:
        adj[v] = sorted(set(adj[v]))
    rows = set()
    for v0 in adj:
        for wix in range(walks_per_vertex):
            prev, cur = None, v0
            rows.add((v0, wix, 0, cur))
            for t in range(1, length + 1):
                key = f"{v0}_{wix}_{t}_{seed}_b"
                h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
                nbrs = adj[cur]
                if t == 1:
                    prev, cur = cur, nbrs[h % len(nbrs)]
                    rows.add((v0, wix, t, cur))
                    continue
                ws = [
                    w_ret if x == prev
                    else (w_d1 if x in adj[prev] else w_d2)
                    for x in nbrs
                ]
                r = h % sum(ws)
                cum = 0
                for i, w in enumerate(ws):
                    cum += w
                    if cum > r:
                        prev, cur = cur, nbrs[i]
                        break
                rows.add((v0, wix, t, cur))
    return rows


def test_biased_walks_match_python_replay(spark):
    from triangle_counting_spark.operators.walks import biased_walks

    for p, q in [(1.0, 4.0), (4.0, 1.0), (0.25, 2.0)]:
        got = {
            (r.start_v, r.walk_ix, r.step, r.v)
            for r in biased_walks(make_edges(spark, EDGES), length=5,
                                  walks_per_vertex=2, seed=3, p=p, q=q).collect()
        }
        assert got == _py_biased_walks(EDGES, 5, 2, 3, p, q), (p, q)


def test_biased_walks_edge_respecting_and_deterministic(spark):
    from triangle_counting_spark.operators.walks import biased_walks

    e = make_edges(spark, EDGES)
    a = sorted(map(tuple, biased_walks(e, 4, 1, 7, p=0.5, q=2.0).collect()))
    b = sorted(map(tuple,
                   biased_walks(e.repartition(5), 4, 1, 7, p=0.5, q=2.0).collect()))
    assert a == b
    sym = {(x, y) for x, y in EDGES} | {(y, x) for x, y in EDGES}
    paths: dict = {}
    for sv, wix, step, v in a:
        paths.setdefault((sv, wix), {})[step] = v
    for path in paths.values():
        for t in range(1, max(path) + 1):
            assert (path[t - 1], path[t]) in sym


def test_biased_walks_bias_direction(spark):
    """Distributional sanity: low p (return-likely) revisits the previous
    vertex far more often than high p, on a graph where every vertex has
    alternatives."""
    from triangle_counting_spark.operators.walks import biased_walks

    def return_rate(p, q):
        walks = biased_walks(make_edges(spark, EDGES), length=6,
                             walks_per_vertex=8, seed=13, p=p, q=q)
        paths: dict = {}
        for r in walks.collect():
            paths.setdefault((r.start_v, r.walk_ix), {})[r.step] = r.v
        ret = tot = 0
        for path in paths.values():
            for t in range(2, max(path) + 1):
                tot += 1
                ret += path[t] == path[t - 2]
        return ret / tot

    assert return_rate(0.05, 1.0) > return_rate(20.0, 1.0) + 0.2


def test_biased_walks_validates_params(spark):
    from triangle_counting_spark.operators.walks import biased_walks

    e = make_edges(spark, EDGES)
    with pytest.raises(ValueError, match="p and q"):
        biased_walks(e, 2, 1, 1, p=0.0, q=1.0)
    with pytest.raises(ValueError, match="walks_per_vertex"):
        biased_walks(e, 2, 0)
