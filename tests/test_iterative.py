from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import TINY, make_edges
from triangle_counting_spark.operators.bfs import bfs_levels, k_metric
from triangle_counting_spark.operators.components import (
    component_sizes,
    connected_components,
)
from triangle_counting_spark.operators.labelprop import label_propagation
from triangle_counting_spark.operators.pagerank import pagerank


def numpy_pagerank(pairs, damping=0.85, tol=1e-12, max_iter=500):
    """Power-iteration oracle mirroring the engine's update rule exactly."""
    verts = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = np.zeros(n)
    adj = [[] for _ in range(n)]
    for a, b in pairs:
        ia, ib = idx[a], idx[b]
        adj[ia].append(ib)
        adj[ib].append(ia)
        out[ia] += 1
        out[ib] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        dangling = rank[out == 0].sum()
        gathered = np.zeros(n)
        for i in range(n):
            if out[i]:
                share = rank[i] / out[i]
                for j in adj[i]:
                    gathered[j] += share
        new = (1 - damping) / n + damping * (gathered + dangling / n)
        if np.abs(new - rank).max() <= tol:
            rank = new
            break
        rank = new
    return {v: rank[idx[v]] for v in verts}


@pytest.mark.parametrize("name", ["triangle", "K4", "star5", "bowtie", "two_triangles"])
def test_pagerank_vs_numpy(spark, name):
    pairs, _, _ = TINY[name]
    res = pagerank(make_edges(spark, pairs), tol=1e-8, max_iter=300)
    assert res.converged
    got = {r.v: r["rank"] for r in res.state.collect()}
    want = numpy_pagerank(pairs)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_uniform_on_vertex_transitive(spark):
    for name, n in [("triangle", 3), ("K5", 5), ("cycle5", 5)]:
        res = pagerank(make_edges(spark, TINY[name][0]), tol=1e-9)
        for r in res.state.collect():
            assert abs(r["rank"] - 1.0 / n) < 1e-6


@pytest.mark.parametrize("name", sorted(TINY))
def test_connected_components(spark, name):
    pairs, _, ncomp = TINY[name]
    res = connected_components(make_edges(spark, pairs))
    assert res.converged
    labels = {r.v: r.component for r in res.state.collect()}
    comps = set(labels.values())
    assert len(comps) == ncomp
    # representative = min vertex id of the component
    for c in comps:
        assert c == min(v for v, l in labels.items() if l == c)


def test_component_sizes(spark):
    sizes = {
        r.component: r["size"]
        for r in component_sizes(make_edges(spark, TINY["two_triangles"][0])).collect()
    }
    assert sizes == {0: 3, 3: 3}


def test_label_propagation_cliques(spark):
    # disjoint cliques converge to their min vertex label
    res = label_propagation(make_edges(spark, TINY["two_triangles"][0]), max_iter=20)
    labels = {r.v: r.label for r in res.state.collect()}
    assert labels == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    res = label_propagation(make_edges(spark, TINY["K5"][0]), max_iter=20)
    assert {r.label for r in res.state.collect()} == {0}


def test_bfs_levels_and_kmetric(spark):
    # bowtie from vertex 0: levels 0,1,1,2,2 ; horizontal edges: (1,2)? no —
    # (0,1)L0-L1,(1,2)L1-L1 horiz,(0,2)L0-L1,(2,3)L1-L2,(3,4)L2-L2 horiz,(2,4)L1-L2
    lv = {r.v: r.level for r in bfs_levels(make_edges(spark, TINY["bowtie"][0])).collect()}
    assert lv == {0: 0, 1: 1, 2: 1, 3: 2, 4: 2}
    k = k_metric(make_edges(spark, TINY["bowtie"][0])).collect()[0]["k"]
    assert abs(k - 2.0 / 6.0) < 1e-12


def test_bfs_multi_component_roots(spark):
    lv = bfs_levels(make_edges(spark, TINY["two_triangles"][0])).collect()
    roots = {r.v: r.root for r in lv}
    assert roots == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_pagerank_resume(spark, tmp_path):
    """FIXTURES.md §7: checkpoint, 'kill', resume → identical converged state."""
    pairs = TINY["bowtie"][0]
    ckdir = str(tmp_path / "ck")
    full = pagerank(
        make_edges(spark, pairs), tol=1e-6, damping=0.5, checkpoint_dir=ckdir,
        checkpoint_every=3, run_id="run1",
    )
    # simulate a fresh process resuming the same run_id: loop() finds the
    # newest checkpoint and continues; with the run converged it must
    # reproduce the final state bit-for-bit
    resumed = pagerank(
        make_edges(spark, pairs), tol=1e-6, damping=0.5, checkpoint_dir=ckdir,
        checkpoint_every=3, run_id="run1",
    )
    assert resumed.resumed_from > 0
    a = {r.v: r["rank"] for r in full.state.collect()}
    b = {r.v: r["rank"] for r in resumed.state.collect()}
    assert a == b  # bit-identical: resumed from the converged checkpoint
    # metrics carry per-partition lineage
    assert any("checkpoint" in m or m.get("resumed") for m in resumed.metrics)
