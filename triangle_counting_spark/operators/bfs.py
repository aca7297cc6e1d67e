"""BFS levels, horizontal-edge classification, and the k-metric.

The reference's BFS family (bfs.c, 13 variants) reduces on Spark to ONE
level-synchronous pattern: each BFS level is one join of the frontier with
the edge table (SURVEY.md §2.10). We implement it as lexicographic
(component, level) min-propagation, which simultaneously reproduces the
reference's component sweep (tc.c:1174-1178: BFS from every unvisited
vertex in ascending id order → each component's root is its min id) and
the per-vertex level array (tc.c:1163-1168).

Direction-optimizing BFS (bfs.c:314-377, ALPHA=14/BETA=24) is a
shared-memory frontier trick; its Spark analog — broadcast tiny frontiers,
full-scan big ones — is exactly what AQE's runtime broadcast decision does
to the frontier join, so we do not hand-roll it.

The k-metric (fraction of edges whose endpoints share a BFS level,
tc_bader_compute_k tc.c:1120-1159) is the statistic the reference's hybrid
planner (tc.c:1844-1911, cutover k > 0.7) uses; our auto planner consumes
the same number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.iterate import LoopResult, loop
from .orientation import DST, SRC, canonical_edges, symmetrize


def bfs_levels(
    edges: DataFrame,
    roots: list[int] | None = None,
    max_iter: int = 10_000,
) -> DataFrame:
    """(v, root, level) — BFS level of every vertex.

    ``roots=None``: multi-source BFS from each component's minimum vertex id
    (the reference's full sweep, tc.c:1174-1178). With explicit roots,
    unreachable vertices are absent from the result.
    """
    from pyspark.storagelevel import StorageLevel

    ce = canonical_edges(edges)
    # joined every level — persist once (see pagerank.py note)
    sym = symmetrize(ce).persist(StorageLevel.MEMORY_AND_DISK)
    verts = (
        ce.select(F.col(SRC).alias("v"))
        .union(ce.select(F.col(DST).alias("v")))
        .distinct()
    )
    if roots is None:
        # every vertex is a candidate root for its own component
        state0 = verts.select(
            "v", F.col("v").alias("root"), F.lit(0).cast("long").alias("level")
        )
    else:
        rs = {int(r) for r in roots}
        state0 = verts.select(
            "v",
            F.when(F.col("v").isin(rs), F.col("v")).alias("root"),
            F.when(F.col("v").isin(rs), F.lit(0)).cast("long").alias("level"),
        )

    def step(state: DataFrame, _i: int) -> DataFrame:
        nbr = (
            sym.join(
                state.where(F.col("root").isNotNull()).select(
                    F.col("v").alias(SRC), "root", "level"
                ),
                SRC,
            )
            .groupBy(F.col(DST).alias("v"))
            .agg(
                F.min(F.struct(F.col("root"), (F.col("level") + 1).alias("level"))).alias(
                    "cand"
                )
            )
        )
        return (
            state.select(
                "v",
                F.struct(F.col("root"), F.col("level")).alias("cur"),
            )
            .join(nbr, "v", "left")
            .select(
                "v",
                F.when(
                    F.col("cand").isNotNull()
                    & (F.col("cur.root").isNull() | (F.col("cand") < F.col("cur"))),
                    F.col("cand"),
                )
                .otherwise(F.col("cur"))
                .alias("best"),
                F.col("cur").alias("prev"),
            )
            .select(
                "v",
                F.col("best.root").alias("root"),
                F.col("best.level").alias("level"),
                F.col("prev.root").alias("root_prev"),
                F.col("prev.level").alias("level_prev"),
            )
        )

    def delta_fn(_old: DataFrame, new: DataFrame, _i: int) -> float:
        changed = new.where(
            ~(
                F.col("root").eqNullSafe(F.col("root_prev"))
                & F.col("level").eqNullSafe(F.col("level_prev"))
            )
        ).count()
        return float(changed)

    res: LoopResult = loop(
        state0.select(
            "v", "root", "level", F.col("root").alias("root_prev"),
            F.col("level").alias("level_prev"),
        ),
        step,
        delta_fn,
        tol=0.0,
        max_iter=max_iter,
        fingerprint="bfs",
        resume=False,
    )
    sym.unpersist()
    out = res.state.select("v", "root", "level")
    return out.where(F.col("root").isNotNull()) if roots is not None else out


def classify_edges(edges: DataFrame, levels: DataFrame | None = None) -> DataFrame:
    """(src, dst, level_src, level_dst, horizontal) — the reference's
    horizontal-edge flag (bfs_mark_horizontal_edges, bfs.c:202-225) as a
    column, not a second graph."""
    ce = canonical_edges(edges)
    lv = levels if levels is not None else bfs_levels(ce)
    l_src = lv.select(F.col("v").alias(SRC), F.col("level").alias("level_src"))
    l_dst = lv.select(F.col("v").alias(DST), F.col("level").alias("level_dst"))
    return (
        ce.join(l_src, SRC)
        .join(l_dst, DST)
        .select(
            SRC,
            DST,
            "level_src",
            "level_dst",
            (F.col("level_src") == F.col("level_dst")).alias("horizontal"),
        )
    )


def k_metric(edges: DataFrame, levels: DataFrame | None = None) -> DataFrame:
    """1-row (k: double): fraction of undirected edges that are horizontal
    (tc_bader_compute_k, tc.c:1120-1159). Drives the hybrid planner."""
    cls = classify_edges(edges, levels)
    return cls.agg(
        (
            F.coalesce(F.sum(F.col("horizontal").cast("long")), F.lit(0))
            / F.greatest(F.count(F.lit(1)), F.lit(1))
        ).alias("k")
    )
