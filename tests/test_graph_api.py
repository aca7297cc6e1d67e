"""Graph facade: one-import API delegating to the gate-verified operators."""

from __future__ import annotations

import pytest

from tests.conftest import TINY, make_edges


def test_graph_facade_end_to_end(spark):
    from triangle_counting_spark.graph import Graph

    g = Graph(make_edges(spark, TINY["bowtie"][0])).persist()
    try:
        assert g.triangle_count() == 2
        assert g.triangle_count("sql") == 2
        assert g.vertices.count() == 5
        deg = {r.v: r.degree for r in g.degrees().collect()}
        assert deg[2] == 4
        tri = {r.v: r.triangles for r in g.triangles_per_vertex().collect()}
        assert tri[2] == 2
        assert g.clustering_coefficient() == pytest.approx(
            3 * 2 / sum(d * (d - 1) / 2 for d in deg.values())
        )
        cc = g.connected_components().state
        assert cc.select("component").distinct().count() == 1
        pr = g.pagerank(tol=-1.0, max_iter=5).state
        assert pr.count() == 5
        lv = {r.v: r.level for r in g.bfs(roots=[0]).collect()}
        assert lv[4] == 2
        assert 0.0 <= g.k_metric() <= 1.0
        assert g.plan().strategy == "sql"  # tiny graph
    finally:
        g.unpersist()


def test_graph_from_rmat(spark):
    from triangle_counting_spark.graph import Graph

    g = Graph.from_rmat(spark, scale=8, num_partitions=4)
    assert g.triangle_count("bcast") == g.triangle_count("sql")
