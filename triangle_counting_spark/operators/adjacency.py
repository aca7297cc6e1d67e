"""Oriented sorted-adjacency construction.

The Spark stand-in for the reference's CSR rows (types.h:27-32, built by
convert_edges_to_graph graph.c:44-86 with per-row qsort graph.c:76-82):
one DataFrame row per vertex, neighbors as a sorted `array<long>`.

Built from DEGREE-ORIENTED edges, every array is bounded by O(sqrt(m))
(see orientation.py), so `collect_list` cannot OOM a task even on 10^9-degree
hubs — the orientation does the job the reference's degree relabel does.
One shuffle (groupBy src); the sort is per-row and local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .orientation import DST, SRC


def oriented_adjacency(oriented: DataFrame) -> DataFrame:
    """(v, nbrs: array<long> sorted asc) from oriented edges."""
    return oriented.groupBy(F.col(SRC).alias("v")).agg(
        F.sort_array(F.collect_list(F.col(DST))).alias("nbrs")
    )


def full_adjacency(edges: DataFrame) -> DataFrame:
    """Symmetric adjacency (both directions) — used by BFS/stats, NOT by
    triangle kernels (unbounded row size on hubs; the reference pays the
    same cost in its unoriented kernels, tc.c:174-195)."""
    from .orientation import symmetrize

    return symmetrize(edges).groupBy(F.col(SRC).alias("v")).agg(
        F.sort_array(F.collect_list(F.col(DST))).alias("nbrs")
    )
