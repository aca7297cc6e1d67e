"""Exact triangle counting — degree-ordered orientation + intersection joins.

Logical plan (all strategies share it; reference algorithm:
tc_forward_hash_degreeOrder, tc.c:944-958):

    canonical edges --orient by (degree,id)--> DAG edges
    adj = groupBy(src).collect_sorted_list(dst)          # CSR rows
    per oriented edge (a,b): |adj[a] ∩ adj[b]|           # intersection join
    triangles = sum                                       # exact, no /3 or /6

Because orientation makes the graph a DAG ordered by (degree, id), each
triangle {a,b,c} is counted exactly once (the reference's "forward"
correction-free family, tc.c:814-975), and every adjacency list is
O(sqrt(m)) long, so the plan has no skew-prone task even on power-law
graphs — the whole-game property at 100 TB.

Physical strategies (the reference ships 5 intersection kernels,
graph.c:276-459; we ship 4 — each is a different *physical* plan for the
same logical query, selectable like the reference's function-pointer
registry main.c:454-488):

- "sql":    JVM `array_intersect` — whole-stage codegen, zero Python.
- "join":   pure 3-way self-join  edges(a,b) ⋈ edges(b,c) ⋈ edges(a,c) —
            the SpGEMM/Davis formulation (tc.c:12-49) as equi-joins; AQE
            handles residual skew. No arrays materialized at all.
- "merge":  Arrow-batched numpy merge-path kernel (graph.c:276-304 in
            spirit): sorted-array intersection per edge inside mapInPandas.
- "probe":  Arrow-batched numpy binary-search kernel (graph.c:322-351):
            searchsorted probes of the smaller list into the larger.

Partial counts per Arrow batch + final sum = the reference's per-thread
counter + OpenMP reduction (tc_parallel.c:10-50) in Spark's native
partial/final aggregation model.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .adjacency import oriented_adjacency
from .orientation import DST, SRC, canonical_edges, degrees, orient_by_degree

_KERNEL_SCHEMA = "partial long"


def _edge_adjacency_pairs(edges: DataFrame) -> DataFrame:
    """(src, dst, nbrs_src, nbrs_dst) for every oriented edge.

    Two equi-joins of the oriented edge table against the adjacency table;
    both shuffle on a vertex id and Catalyst/AQE picks broadcast vs
    sort-merge. Vertices with no outgoing oriented edge simply drop out
    (inner join) — they cannot close a triangle.
    """
    oriented = orient_by_degree(canonical_edges(edges))
    adj = oriented_adjacency(oriented)
    a_src = adj.select(F.col("v").alias(SRC), F.col("nbrs").alias("nbrs_src"))
    a_dst = adj.select(F.col("v").alias(DST), F.col("nbrs").alias("nbrs_dst"))
    return oriented.join(a_src, SRC).join(a_dst, DST)


def _count_sql(edges: DataFrame) -> DataFrame:
    pairs = _edge_adjacency_pairs(edges)
    return pairs.agg(
        F.coalesce(
            F.sum(F.size(F.array_intersect("nbrs_src", "nbrs_dst"))), F.lit(0)
        )
        .cast("long")
        .alias("triangles")
    )


def _count_join(edges: DataFrame) -> DataFrame:
    """edges(a,b) ⋈ edges(b,c) ⋈ edges(a,c) over the oriented DAG."""
    oriented = orient_by_degree(canonical_edges(edges))
    ab = oriented.select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
    bc = oriented.select(F.col(SRC).alias("b"), F.col(DST).alias("c"))
    ac = oriented.select(F.col(SRC).alias("a"), F.col(DST).alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    return tri.agg(F.count(F.lit(1)).cast("long").alias("triangles"))


def _make_merge_kernel():
    """np.intersect1d over sorted unique neighbor arrays (merge-path).

    Defined as a closure so cloudpickle ships it BY VALUE — executors never
    need this package importable (works without --py-files in local mode;
    on a cluster, ship the zip anyway for the rest of the library).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        total = 0
        for pdf in batches:
            for a, b in zip(pdf["nbrs_src"].values, pdf["nbrs_dst"].values):
                total += np.intersect1d(a, b, assume_unique=True).size
        yield pd.DataFrame({"partial": [total]})

    return kernel


def _make_probe_kernel():
    """Binary-search probe of the smaller list into the larger
    (graph.c:322-351 incl. the smaller-side pick at 342-347)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        total = 0
        for pdf in batches:
            for a, b in zip(pdf["nbrs_src"].values, pdf["nbrs_dst"].values):
                small, big = (a, b) if len(a) <= len(b) else (b, a)
                if len(small) == 0:
                    continue
                idx = np.searchsorted(big, small)
                idx[idx == len(big)] = 0
                total += int((big[idx] == small).sum())
        yield pd.DataFrame({"partial": [total]})

    return kernel


_KERNELS = {"merge": _make_merge_kernel, "probe": _make_probe_kernel}


def _count_kernel(edges: DataFrame, kernel: str) -> DataFrame:
    pairs = _edge_adjacency_pairs(edges).select("nbrs_src", "nbrs_dst")
    partials = pairs.mapInPandas(_KERNELS[kernel](), schema=_KERNEL_SCHEMA)
    return partials.agg(
        F.coalesce(F.sum("partial"), F.lit(0)).cast("long").alias("triangles")
    )


STRATEGIES = ("sql", "join", "merge", "probe", "auto")


def triangle_count(edges: DataFrame, strategy: str = "auto") -> DataFrame:
    """Exact global triangle count. Returns a 1-row DataFrame
    ``(triangles: long)``.

    ``auto`` mirrors the reference's statistic-driven hybrid planner
    (tc_bader_hybrid, tc.c:1844-1911) at DataFrame level: the JVM
    array-intersect plan is best until adjacency arrays get long; the
    pure-join plan wins when AQE can exploit its flat shuffle. We default
    to "sql" (codegen, zero Python) — bench.py picks per-input winners.
    """
    if strategy == "auto":
        strategy = "sql"
    if strategy == "sql":
        return _count_sql(edges)
    if strategy == "join":
        return _count_join(edges)
    if strategy in _KERNELS:
        return _count_kernel(edges, strategy)
    raise ValueError(f"unknown strategy {strategy!r}; one of {STRATEGIES}")


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(v, triangles) — number of triangles each vertex participates in.

    Uses the 3-join enumeration and credits all three corners; vertices in
    no triangle are absent (join with degrees to zero-fill if needed).
    """
    oriented = orient_by_degree(canonical_edges(edges))
    ab = oriented.select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
    bc = oriented.select(F.col(SRC).alias("b"), F.col(DST).alias("c"))
    ac = oriented.select(F.col(SRC).alias("a"), F.col(DST).alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("v"))
        .union(tri.select(F.col("b").alias("v")))
        .union(tri.select(F.col("c").alias("v")))
    )
    return corners.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("triangles"))


def wedge_count(edges: DataFrame) -> DataFrame:
    """Total wedges (paths of length 2) = Σ_v C(deg(v), 2) — the size of
    the search space the reference's tc_wedge walks (tc.c:52-86), and the
    denominator of global clustering coefficient."""
    deg = degrees(edges)
    return deg.agg(
        F.coalesce(F.sum(F.col("degree") * (F.col("degree") - 1) / 2), F.lit(0))
        .cast("long")
        .alias("wedges")
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Global clustering coefficient = 3·triangles / wedges."""
    t = triangle_count(edges).collect()[0]["triangles"]
    return wedge_count(edges).select(
        (F.lit(3 * t) / F.when(F.col("wedges") > 0, F.col("wedges")).otherwise(F.lit(1)))
        .alias("global_clustering")
    )
