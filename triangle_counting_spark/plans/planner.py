"""Statistic-driven strategy selection — the reference's hybrid planner.

tc_bader_hybrid (tc.c:1844-1911) computes one graph statistic (k = fraction
of BFS-horizontal edges) and picks a physical algorithm: small graphs or
k > 0.7 → forward_hash, else the level-partitioned variant, with a 100k-edge
recursion base (tc.h:43). Our planner does the DataFrame-level analog:
cheap statistics (edge count, degree skew) choose among the engine's
physical triangle strategies; Spark's own AQE then handles the *physical*
analogs (broadcast-vs-shuffle, skew split) at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.orientation import canonical_edges, degrees

SMALL_GRAPH_EDGES = 100_000  # the reference's recursion/hybrid base, tc.h:43


@dataclass
class PlanChoice:
    strategy: str
    m: int
    max_degree: int
    mean_degree: float
    reason: str


def choose_triangle_strategy(edges: DataFrame) -> PlanChoice:
    """Pick a triangle strategy from cheap statistics.

    - small graph (m < 100k, the reference's base constant): "sql" — one
      codegen'd plan, no Python workers to spin up.
    - heavy skew (max_degree > 32·mean): the oriented adjacency arrays are
      long; the numpy merge kernel beats JVM array_intersect on long arrays
      → "merge".
    - otherwise "sql".
    """
    ce = canonical_edges(edges)
    m = ce.count()
    if m < SMALL_GRAPH_EDGES:
        return PlanChoice("sql", m, 0, 0.0, f"m={m} < {SMALL_GRAPH_EDGES}")
    s = (
        degrees(ce)
        .agg(F.max("degree").alias("mx"), F.avg("degree").alias("mean"))
        .collect()[0]
    )
    if s["mx"] > 32 * s["mean"]:
        return PlanChoice(
            "merge", m, s["mx"], s["mean"], f"skew max={s['mx']} mean={s['mean']:.1f}"
        )
    return PlanChoice("sql", m, s["mx"], s["mean"], "default")
