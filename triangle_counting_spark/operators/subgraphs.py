"""Dense-subgraph peeling operators — k-core and k-truss.

Classic link-graph reductions built from the engine's own primitives
(degrees / wedge joins), the standard precursors to community mining on
co-occurrence graphs. Both are synchronous peels: drop everything below
the threshold, recompute, repeat until a fixpoint — each round is one or
two joins + an aggregate, so the plan shape is iteration-safe at scale
(same lineage discipline as plans/iterate.py, via eager localCheckpoint).

- k-core  (vertex peel): the maximal subgraph where every vertex has
  degree ≥ k within the subgraph.
- k-truss (edge peel):   the maximal subgraph where every edge closes
  ≥ k-2 triangles within the subgraph (support = common neighbors).
  Support uses the ROW-based wedge join (no adjacency arrays — hub-safe,
  AQE-splittable), the same shape as the level strategy.

Both converge in few rounds on power-law graphs (the dense part
stabilizes fast); rounds are bounded and the fixpoint is
partitioning-independent (pure set semantics), so results are exactly
reproducible — and replayable in ANSI SQL by unrolling rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .orientation import DST, SRC, canonical_edges, degrees, symmetrize


def kcore_edges(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """Canonical (src, dst) edges of the k-core."""
    cur = canonical_edges(edges).localCheckpoint(eager=True)
    m = cur.count()
    for _ in range(max_rounds):
        if m == 0:
            break
        keep = degrees(cur).where(F.col("degree") >= k).select("v")
        nxt = (
            cur.join(keep.select(F.col("v").alias(SRC)), SRC, "left_semi")
            .join(keep.select(F.col("v").alias(DST)), DST, "left_semi")
            .select(SRC, DST)
            .localCheckpoint(eager=True)
        )
        m2 = nxt.count()
        cur = nxt
        if m2 == m:
            break
        m = m2
    return cur


def _edge_support(cur: DataFrame) -> DataFrame:
    """(src, dst, support) — common-neighbor count per edge within ``cur``,
    via the row-based wedge join (x ∈ N(src), then require {dst, x})."""
    sym = symmetrize(cur)
    w = cur.join(sym.select(SRC, F.col(DST).alias("x")), SRC)
    closed = w.join(
        sym.select(F.col(SRC).alias(DST), F.col(DST).alias("x")), [DST, "x"]
    )
    sup = closed.groupBy(SRC, DST).agg(F.count(F.lit(1)).alias("support"))
    return cur.join(sup, [SRC, DST], "left").select(
        SRC, DST, F.coalesce("support", F.lit(0)).alias("support")
    )


def ktruss_edges(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """Canonical (src, dst) edges of the k-truss (every edge in ≥ k-2
    triangles within the subgraph)."""
    if k < 2:
        raise ValueError("k-truss requires k >= 2")
    cur = canonical_edges(edges).localCheckpoint(eager=True)
    m = cur.count()
    for _ in range(max_rounds):
        if m == 0:
            break
        nxt = (
            _edge_support(cur)
            .where(F.col("support") >= k - 2)
            .select(SRC, DST)
            .localCheckpoint(eager=True)
        )
        m2 = nxt.count()
        cur = nxt
        if m2 == m:
            break
        m = m2
    return cur
