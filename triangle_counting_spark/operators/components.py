"""Connected components — hash-min label exchange.

Each vertex starts labeled with its own id; every iteration each vertex
takes the minimum label among itself and its neighbors; converged when no
label changes. Semantically identical to the reference's BFS-per-unvisited-
vertex component sweep (tc.c:1174-1178: each BFS tree = one component, here
the component representative is the minimum vertex id instead of the BFS
root).

Plan per iteration: one join (symmetrized edges ⋈ labels, shuffle partitioned
on vertex id and reused across iterations) + one min-aggregate. Convergence
in O(diameter) iterations; power-law co-occurrence graphs have tiny
diameters so this beats the extra shuffles of small-star/large-star in
practice (that variant is noted in SURVEY.md §2.11 as the huge-diameter
fallback).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.iterate import LoopResult, loop
from .orientation import DST, SRC, canonical_edges, symmetrize


def connected_components(
    edges: DataFrame,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    run_id: str | None = None,
    resume: bool = True,
) -> LoopResult:
    """LoopResult whose state is ``(v: long, component: long)``;
    component = min vertex id reachable. Exact (north rule)."""
    from pyspark.storagelevel import StorageLevel

    ce = canonical_edges(edges)
    # joined every iteration — persist once (see pagerank.py note)
    sym = symmetrize(ce).persist(StorageLevel.MEMORY_AND_DISK)
    state0 = (
        ce.select(F.col(SRC).alias("v"))
        .union(ce.select(F.col(DST).alias("v")))
        .distinct()
        .select("v", F.col("v").alias("component"))
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        nbr_min = (
            sym.join(state.select(F.col("v").alias(SRC), "component"), SRC)
            .groupBy(F.col(DST).alias("v"))
            .agg(F.min("component").alias("nbr_component"))
        )
        combined = (
            state.select("v", F.col("component").alias("component_prev"))
            .join(nbr_min, "v", "left")
            .select(
                "v",
                F.least(
                    "component_prev", F.coalesce("nbr_component", "component_prev")
                ).alias("c1"),
                "component_prev",
            )
        )
        # pointer jumping (label := label[label]): pure hash-min needs
        # O(diameter) rounds — a chain of 10^4 vertices would take 10^4
        # shuffles; one extra |V|-sized self-join per round makes label
        # paths halve each round → O(log diameter) total. Same fixpoint
        # (min reachable id), just reached exponentially faster.
        parent = state.select(
            F.col("v").alias("c1"), F.col("component").alias("parent_component")
        )
        return combined.join(parent, "c1", "left").select(
            "v",
            F.least("c1", F.coalesce("parent_component", "c1")).alias("component"),
            "component_prev",
        )

    def delta_fn(_old: DataFrame, new: DataFrame, _i: int) -> float:
        return float(
            new.where(F.col("component") != F.col("component_prev")).count()
        )

    result = loop(
        state0.select("v", "component", F.col("component").alias("component_prev")),
        step,
        delta_fn,
        tol=0.0,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        run_id=run_id,
        fingerprint="cc|hash-min",
        resume=resume,
    )
    sym.unpersist()
    result.state = result.state.select("v", "component")
    return result


def component_sizes(edges: DataFrame, **kw) -> DataFrame:
    """(component, size) — handy summary + test surface."""
    labels = connected_components(edges, **kw).state
    return labels.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
