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


def _edge_support(cur: DataFrame, of_edges: DataFrame | None = None) -> DataFrame:
    """(src, dst, support) — common-neighbor count per edge within ``cur``,
    via the row-based wedge join (x ∈ N(src), then require {dst, x}).

    ``of_edges`` restricts the OUTPUT to a subset of edges (support is still
    computed against the full ``cur`` graph) — the incremental-peel path:
    wedge enumeration then costs |of_edges|·deg, not |cur|·deg."""
    sym = symmetrize(cur)
    probe = cur if of_edges is None else of_edges
    w = probe.select(SRC, DST).join(sym.select(SRC, F.col(DST).alias("x")), SRC)
    closed = w.join(
        sym.select(F.col(SRC).alias(DST), F.col(DST).alias("x")), [DST, "x"]
    )
    sup = closed.groupBy(SRC, DST).agg(F.count(F.lit(1)).alias("support"))
    return probe.select(SRC, DST).join(sup, [SRC, DST], "left").select(
        SRC, DST, F.coalesce("support", F.lit(0)).alias("support")
    )


def ktruss_edges(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """Canonical (src, dst) edges of the k-truss (every edge in ≥ k-2
    triangles within the subgraph).

    Incremental peel: the full wedge-join support is computed ONCE; each
    subsequent round recomputes support only for survivor edges incident to
    an endpoint of a just-removed edge. Correctness: an edge's support drops
    only when a triangle through it is destroyed, every destroyed triangle
    contains a removed edge, and the other two edges of that triangle each
    share a vertex with it — so edges not touching a removed endpoint keep
    their support exactly. Round cost falls from |E|·deg to |affected|·deg,
    and the affected set shrinks geometrically on real graphs (the dense
    core stabilizes fast)."""
    if k < 2:
        raise ValueError("k-truss requires k >= 2")
    thresh = k - 2
    cur = _edge_support(canonical_edges(edges)).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        removed = cur.where(F.col("support") < thresh)
        if removed.limit(1).count() == 0:
            break
        survivors = cur.where(F.col("support") >= thresh).localCheckpoint(eager=True)
        if survivors.limit(1).count() == 0:
            cur = survivors
            break
        touched = (
            removed.select(F.col(SRC).alias("v"))
            .union(removed.select(F.col(DST).alias("v")))
            .distinct()
        )
        is_affected = (
            survivors.join(touched.select(F.col("v").alias(SRC)), SRC, "left_semi")
            .select(SRC, DST)
            .union(
                survivors.join(
                    touched.select(F.col("v").alias(DST)), DST, "left_semi"
                ).select(SRC, DST)
            )
            .distinct()
        )
        unaffected = survivors.join(is_affected, [SRC, DST], "left_anti")
        recomputed = _edge_support(
            survivors.select(SRC, DST), of_edges=is_affected
        )
        cur = unaffected.select(SRC, DST, "support").union(
            recomputed.select(SRC, DST, "support")
        ).localCheckpoint(eager=True)
    return cur.select(SRC, DST)
