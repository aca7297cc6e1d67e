from __future__ import annotations

import pytest

from tests.conftest import TINY, make_edges
from triangle_counting_spark.operators.orientation import (
    canonical_edges,
    degrees,
    orient_by_degree,
)
from triangle_counting_spark.operators.triangles import (
    triangle_count,
    triangles_per_vertex,
    wedge_count,
)

STRATEGIES = ["sql", "join", "merge", "probe", "bcast", "level", "auto"]


@pytest.mark.parametrize("name", sorted(TINY))
@pytest.mark.parametrize("strategy", STRATEGIES)
def test_tiny_graphs(spark, name, strategy):
    pairs, want, _ = TINY[name]
    got = triangle_count(make_edges(spark, pairs), strategy).collect()[0]["triangles"]
    assert got == want, f"{name}/{strategy}: {got} != {want}"


def test_canonicalization(spark):
    # dirty input: duplicates, both directions, self-loops (main.c:350-370 semantics)
    dirty = make_edges(spark, [(1, 0), (0, 1), (0, 1), (2, 2), (1, 2), (0, 2)])
    ce = canonical_edges(dirty)
    assert sorted((r.src, r.dst) for r in ce.collect()) == [(0, 1), (0, 2), (1, 2)]
    assert triangle_count(ce, "sql").collect()[0]["triangles"] == 1


def test_orientation_is_dag_and_preserves_edges(spark):
    pairs, _, _ = TINY["bowtie"]
    ce = canonical_edges(make_edges(spark, pairs))
    o = orient_by_degree(ce)
    assert o.count() == ce.count()
    # re-canonicalizing the oriented edges reproduces the undirected set
    back = sorted((r.src, r.dst) for r in canonical_edges(o).collect())
    orig = sorted((r.src, r.dst) for r in ce.collect())
    assert back == orig
    # hub vertex 2 (degree 4) must never be an orientation source toward
    # the degree-2 vertices: max oriented out-degree stays bounded
    outdeg = {r.src: r["count"] for r in o.groupBy("src").count().collect()}
    assert outdeg.get(2, 0) <= 1  # only possible toward equal/higher (deg,id)


def test_degrees(spark):
    pairs, _, _ = TINY["star5"]
    d = {r.v: r.degree for r in degrees(make_edges(spark, pairs)).collect()}
    assert d == {0: 4, 1: 1, 2: 1, 3: 1, 4: 1}


def test_per_vertex_and_wedges(spark):
    pairs, _, _ = TINY["bowtie"]
    e = make_edges(spark, pairs)
    pv = {r.v: r.triangles for r in triangles_per_vertex(e).collect()}
    assert pv == {0: 1, 1: 1, 2: 2, 3: 1, 4: 1}
    # bowtie degrees: 2,2,4,2,2 -> wedges = 1+1+6+1+1 = 10
    assert wedge_count(e).collect()[0]["wedges"] == 10


def test_counts_are_long_not_int(spark):
    e = make_edges(spark, TINY["K5"][0])
    schema = dict(triangle_count(e, "sql").dtypes)
    assert schema["triangles"] == "bigint"
