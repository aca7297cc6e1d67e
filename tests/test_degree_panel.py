"""local_clustering and degree_panel (knn, rich-club) vs brute force."""

from __future__ import annotations

from collections import defaultdict

import pytest

from triangle_counting_spark.operators.stats import degree_panel
from triangle_counting_spark.operators.triangles import local_clustering

from tests.conftest import TINY, make_edges


def _brute(edges: list[tuple[int, int]]):
    """Python reference: adjacency-set lcc + degree panel."""
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    lcc = {}
    tri = {}
    for v, ns in adj.items():
        t = sum(1 for a in ns for b in ns if a < b and b in adj[a])
        tri[v] = t
        d = deg[v]
        lcc[v] = 0.0 if d < 2 else 2.0 * t / (d * (d - 1))
    # panel per degree class
    classes = sorted(set(deg.values()))
    cnt = {k: sum(1 for d in deg.values() if d == k) for k in classes}
    knn = {}
    for k in classes:
        s = sum(deg[u] for v in adj for u in adj[v] if deg[v] == k)
        knn[k] = s / (k * cnt[k])
    rich = {}
    canon = {frozenset(e) for e in edges if e[0] != e[1]}
    for k in classes:
        n_ge = sum(1 for d in deg.values() if d >= k)
        e_ge = sum(1 for e in canon if min(deg[v] for v in e) >= k)
        rich[k] = 0.0 if n_ge < 2 else 2.0 * e_ge / (n_ge * (n_ge - 1))
    return deg, tri, lcc, cnt, knn, rich


@pytest.mark.parametrize("name", sorted(TINY))
def test_local_clustering_matches_brute(spark, name):
    pairs = TINY[name][0]
    deg, tri, lcc, *_ = _brute(pairs)
    rows = {r["v"]: r for r in local_clustering(make_edges(spark, pairs)).collect()}
    assert set(rows) == set(deg)
    for v, r in rows.items():
        assert r["degree"] == deg[v]
        assert r["triangles"] == tri[v]
        assert r["lcc"] == pytest.approx(lcc[v], abs=0)  # bit-exact


@pytest.mark.parametrize("name", sorted(TINY))
def test_degree_panel_matches_brute(spark, name):
    pairs = TINY[name][0]
    _, _, _, cnt, knn, rich = _brute(pairs)
    rows = {r["degree"]: r for r in degree_panel(make_edges(spark, pairs)).collect()}
    assert set(rows) == set(cnt)
    running = 0
    for k in sorted(rows):
        r = rows[k]
        running += cnt[k]
        assert r["cnt"] == cnt[k]
        assert r["cum_cnt"] == running
        assert r["knn"] == pytest.approx(knn[k], abs=0)
        assert r["rich_club"] == pytest.approx(rich[k], abs=0)


def test_star_closed_form(spark):
    # S_4: center degree 4, leaves degree 1 — knn(1)=4, knn(4)=1;
    # φ(1)=2·4/(5·4)=0.4, φ(4): N_≥4=1 → 0 by convention
    pairs = [(0, i) for i in range(1, 5)]
    rows = {r["degree"]: r for r in degree_panel(make_edges(spark, pairs)).collect()}
    assert rows[1]["knn"] == 4.0 and rows[4]["knn"] == 1.0
    assert rows[1]["rich_club"] == pytest.approx(0.4)
    assert rows[4]["rich_club"] == 0.0


def test_clique_lcc_one(spark):
    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    for r in local_clustering(make_edges(spark, pairs)).collect():
        assert r["lcc"] == 1.0 and r["triangles"] == 10 and r["degree"] == 5


def test_pendant_zero_filled(spark):
    # triangle + pendant: vertex 3 has degree 1, no triangles, lcc 0
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
    rows = {r["v"]: r for r in local_clustering(make_edges(spark, pairs)).collect()}
    assert rows[3]["triangles"] == 0 and rows[3]["lcc"] == 0.0
    assert rows[2]["lcc"] == pytest.approx(2 * 1 / (3 * 2), abs=0)


def test_rmat_differential(spark):
    from triangle_counting_spark.sources.rmat import rmat_edges

    e = rmat_edges(spark, scale=7, edge_factor=4, seed=11)
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    pairs = [(a, b) for a, b in pairs if a != b]
    deg, tri, lcc, cnt, knn, rich = _brute(pairs)
    lrows = {r["v"]: r for r in local_clustering(e).collect()}
    assert {v: r["lcc"] for v, r in lrows.items()} == pytest.approx(lcc)
    prows = {r["degree"]: r for r in degree_panel(e).collect()}
    assert {k: r["knn"] for k, r in prows.items()} == pytest.approx(knn)
    assert {k: r["rich_club"] for k, r in prows.items()} == pytest.approx(rich)


def test_noisy_input_canonicalized_consistently(spark):
    # duplicate + reversed edges must not inflate degrees vs triangles
    # (review fix: one canonicalization feeds both sides)
    noisy = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 2)]
    rows = {r["v"]: r for r in local_clustering(make_edges(spark, noisy)).collect()}
    for v in (1, 2, 3):
        assert rows[v]["degree"] == 2 and rows[v]["triangles"] == 1
        assert rows[v]["lcc"] == 1.0
    panel = degree_panel(make_edges(spark, noisy)).collect()
    assert len(panel) == 1
    assert panel[0]["degree"] == 2 and panel[0]["cnt"] == 3
    assert panel[0]["knn"] == 2.0 and panel[0]["rich_club"] == 1.0
