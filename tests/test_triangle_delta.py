"""Incremental triangle counting under edge inserts:
tc(G ∪ Δ) = tc(G) + triangle_count_delta(G, Δ) — differential-tested
against full recounts on randomized splits."""

from __future__ import annotations

from tests.conftest import make_edges


def _added(spark, g_pairs, d_pairs):
    from triangle_counting_spark.operators.triangles import triangle_count_delta

    g = make_edges(spark, g_pairs)
    d = make_edges(spark, d_pairs)
    return triangle_count_delta(g, d).collect()[0]["triangles_added"]


def test_delta_single_edge_closes_triangle(spark):
    # path 0-1-2 plus Δ={0,2} closes exactly one triangle (1 Δ edge)
    assert _added(spark, [(0, 1), (1, 2)], [(0, 2)]) == 1


def test_delta_two_new_edges(spark):
    # G = {0,1}; Δ = {1,2},{0,2} → one triangle with 2 Δ edges
    assert _added(spark, [(0, 1)], [(1, 2), (0, 2)]) == 1


def test_delta_all_three_new(spark):
    # G disjoint; Δ is a full triangle (3 Δ edges)
    assert _added(spark, [(10, 11)], [(0, 1), (1, 2), (0, 2)]) == 1


def test_delta_duplicate_and_existing_edges_ignored(spark):
    # Δ containing an edge already in G adds nothing new
    assert _added(spark, [(0, 1), (1, 2), (0, 2)], [(0, 1)]) == 0


def test_delta_matches_full_recount_on_rmat(spark):
    """Randomized split of an RMAT graph: delta(G, Δ) == tc(G∪Δ) − tc(G)."""
    from pyspark.sql import functions as F

    from triangle_counting_spark.operators.triangles import (
        triangle_count,
        triangle_count_delta,
    )
    from triangle_counting_spark.sources.rmat import rmat_edges

    e = rmat_edges(spark, scale=9, num_partitions=4)
    # deterministic hash split: ~85% old graph, ~15% delta
    h = F.pmod(F.xxhash64("src", "dst"), F.lit(100))
    g = e.where(h < 85)
    d = e.where(h >= 85)
    t_g = triangle_count(g, "sql").collect()[0]["triangles"]
    t_all = triangle_count(e, "sql").collect()[0]["triangles"]
    added = triangle_count_delta(g, d).collect()[0]["triangles_added"]
    assert added == t_all - t_g
    assert added > 0  # the split actually exercises the operator
