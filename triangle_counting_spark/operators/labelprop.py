"""Label propagation — synchronous community assignment.

Every vertex starts with its own id as label; each iteration it adopts the
most frequent label among its neighbors, ties broken by MINIMUM label
(deterministic — the reference breaks every comparison tie by id the same
way, graph.c:187-205, so runs reproduce across partitionings). Synchronous
updates only: asynchronous LP is partition-order-dependent and can never
satisfy the reproducibility bar.

Plan per iteration: edges ⋈ labels (shuffle on vertex id) →
groupBy(v, label).count → per-vertex argmax via max_by over a packed
(count, -label) struct — one aggregate, no window sort.

Convergence: #vertices whose label changed == 0, or max_iter (LP may
oscillate on bipartite structures; a fixed cap is standard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.iterate import LoopResult, loop
from .orientation import DST, SRC, canonical_edges, symmetrize


def label_propagation(
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    run_id: str | None = None,
    resume: bool = True,
) -> LoopResult:
    """LoopResult whose state is ``(v: long, label: long)``."""
    from pyspark.storagelevel import StorageLevel

    ce = canonical_edges(edges)
    # joined every iteration — persist once (see pagerank.py note)
    sym = symmetrize(ce).persist(StorageLevel.MEMORY_AND_DISK)
    state0 = (
        ce.select(F.col(SRC).alias("v"))
        .union(ce.select(F.col(DST).alias("v")))
        .distinct()
        .select("v", F.col("v").alias("label"), F.col("v").alias("label_prev"))
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        votes = (
            sym.join(state.select(F.col("v").alias(SRC), "label"), SRC)
            .groupBy(F.col(DST).alias("v"), "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        # argmax by (cnt desc, label asc): max_by on struct(cnt, -label)
        winner = votes.groupBy("v").agg(
            F.max_by("label", F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias(
                "new_label"
            )
        )
        return (
            state.select("v", F.col("label").alias("label_prev"))
            .join(winner, "v", "left")
            .select(
                "v",
                F.coalesce("new_label", "label_prev").alias("label"),
                "label_prev",
            )
        )

    def delta_fn(_old: DataFrame, new: DataFrame, _i: int) -> float:
        return float(new.where(F.col("label") != F.col("label_prev")).count())

    result = loop(
        state0,
        step,
        delta_fn,
        tol=0.0,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        run_id=run_id,
        fingerprint="lp|sync-minlabel",
        resume=resume,
    )
    sym.unpersist()
    result.state = result.state.select("v", "label")
    return result


def label_propagation_fixed(edges: DataFrame, iterations: int) -> DataFrame:
    """Exactly ``iterations`` synchronous rounds (oracle-comparable)."""
    res = label_propagation(edges, max_iter=iterations)
    # loop stops early only on convergence, which is also deterministic
    return res.state
