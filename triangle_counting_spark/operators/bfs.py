"""BFS levels, horizontal-edge classification, and the k-metric.

The reference's BFS family (bfs.c, 13 variants) reduces on Spark to ONE
level-synchronous pattern: each BFS level is one join of the frontier with
the edge table (SURVEY.md §2.10). We implement it as lexicographic
(component, level) min-propagation, which simultaneously reproduces the
reference's component sweep (tc.c:1174-1178: BFS from every unvisited
vertex in ascending id order → each component's root is its min id) and
the per-vertex level array (tc.c:1163-1168).

Direction-optimizing BFS (bfs.c:314-377, ALPHA=14/BETA=24): the Spark
analog of the top-down/bottom-up switch is broadcast-vs-shuffle on the
frontier join. We make it EXPLICIT rather than trusting AQE's size
estimates: each iteration joins only the CHANGED frontier (not the full
visited set — the frontier shrinks as BFS converges), and when the
previous round's frontier count drops below n/ALPHA (and an absolute cap
that bounds executor memory) the frontier side gets an F.broadcast hint,
so the edge table is never re-shuffled for a tiny frontier
(:func:`frontier_neighbors`, plan-asserted in tests).

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


BFS_ALPHA = 14  # reference's direction-switch ratio (bfs.c:299-300)
BFS_BCAST_CAP = 4_000_000  # absolute frontier-row cap for the broadcast hint


def frontier_neighbors(
    sym: DataFrame, frontier: DataFrame, broadcast_hint: bool
) -> DataFrame:
    """(v, cand) — min (root, level+1) candidate per neighbor of the
    frontier. With ``broadcast_hint`` the frontier side is broadcast (the
    direction-optimizing switch: the big edge table is scanned in place,
    never re-shuffled for a small frontier)."""
    f = frontier.select(F.col("v").alias(SRC), "root", "level")
    if broadcast_hint:
        f = F.broadcast(f)
    return (
        sym.join(f, SRC)
        .groupBy(F.col(DST).alias("v"))
        .agg(
            F.min(F.struct(F.col("root"), (F.col("level") + 1).alias("level"))).alias(
                "cand"
            )
        )
    )


def bfs_levels(
    edges: DataFrame,
    roots: list[int] | None = None,
    max_iter: int = 10_000,
) -> DataFrame:
    """(v, root, level) — BFS level of every vertex.

    ``roots=None``: multi-source BFS from each component's minimum vertex id
    (the reference's full sweep, tc.c:1174-1178). With explicit roots,
    unreachable vertices are absent from the result.

    Delta iteration: only vertices improved in the previous round join the
    edge table (the frontier); the previous round's frontier count decides
    the broadcast hint (count < n/ALPHA and < cap), mirroring the
    reference's direction-optimizing switch (bfs.c:314-377).
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
    n = verts.count()
    if roots is None:
        # every vertex is a candidate root for its own component
        state0 = verts.select(
            "v",
            F.col("v").alias("root"),
            F.lit(0).cast("long").alias("level"),
            F.lit(True).alias("changed"),
        )
    else:
        rs = {int(r) for r in roots}
        state0 = verts.select(
            "v",
            F.when(F.col("v").isin(rs), F.col("v")).alias("root"),
            F.when(F.col("v").isin(rs), F.lit(0)).cast("long").alias("level"),
            F.col("v").isin(rs).alias("changed"),
        )
    # delta_fn's count of the new frontier feeds the NEXT step's broadcast
    # decision (the loop barrier guarantees it ran before step i+1 plans)
    frontier_count: dict[str, float | None] = {"last": None}

    def step(state: DataFrame, _i: int) -> DataFrame:
        fc = frontier_count["last"]
        hint = fc is not None and fc <= min(n // BFS_ALPHA, BFS_BCAST_CAP)
        nbr = frontier_neighbors(sym, state.where(F.col("changed")), hint)
        return (
            state.select(
                "v", F.struct(F.col("root"), F.col("level")).alias("cur")
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
                (
                    F.col("cand").isNotNull()
                    & (F.col("cur.root").isNull() | (F.col("cand") < F.col("cur")))
                ).alias("changed"),
            )
            .select(
                "v",
                F.col("best.root").alias("root"),
                F.col("best.level").alias("level"),
                "changed",
            )
        )

    def delta_fn(_old: DataFrame, new: DataFrame, _i: int) -> float:
        changed = new.where(F.col("changed")).count()
        frontier_count["last"] = float(changed)
        return float(changed)

    res: LoopResult = loop(
        state0,
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
