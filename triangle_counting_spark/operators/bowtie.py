"""Bowtie decomposition of a directed link graph (Broder et al., WWW 2000).

THE classic web-graph structure query, composed from this engine's own
primitives: the giant SCC (``operators/scc.py``) is the CORE; forward /
backward reachability from it carves OUT / IN; two more frontier sweeps
over the residual split TUBE / TENDRIL_IN / TENDRIL_OUT / DISCONNECTED.

Region semantics (each vertex gets exactly one):

- ``CORE``       — the largest SCC.
- ``OUT``        — reachable from CORE, not in it.
- ``IN``         — reaches CORE, not in it.
- ``TUBE``       — reachable from IN and reaching OUT while avoiding CORE
                   (an IN→OUT bypass).
- ``TENDRIL_IN`` — reachable from IN, but neither reaching CORE/OUT nor
                   in any of the above.
- ``TENDRIL_OUT``— reaching OUT, but not reachable from IN.
- ``DISCONNECTED`` — everything else.

Every sweep is the same shuffle-shaped frontier join the BFS family uses
(edges ⋈ frontier, distinct, anti-join visited), with eager
``localCheckpoint`` per round (the scc.py lineage discipline). At 100 TB
the dominant cost is the SCC itself; the four reachability sweeps are
plain BFS passes over the directed edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .orientation import DST, SRC, directed_edges
from .scc import strongly_connected_components


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _reachable(
    edges: DataFrame, seeds: DataFrame, forward: bool, max_iter: int = 500
) -> DataFrame:
    """All vertices reachable from ``seeds`` (column ``v``) along edge
    direction (``forward=True``) or against it — seeds included."""
    a, b = (SRC, DST) if forward else (DST, SRC)
    visited = _ckpt(seeds.select("v").distinct())
    frontier = visited
    for i in range(max_iter + 1):
        if i == max_iter:
            raise RuntimeError(f"reachability did not close in {max_iter} rounds")
        nxt = (
            edges.join(frontier.select(F.col("v").alias(a)), a, "left_semi")
            .select(F.col(b).alias("v"))
            .distinct()
        )
        frontier = _ckpt(nxt.join(visited, "v", "left_anti"))
        if frontier.count() == 0:
            break
        visited = _ckpt(visited.unionByName(frontier))
    return visited


def bowtie_decomposition(edges: DataFrame, max_iter: int = 500) -> DataFrame:
    """(v: long, region: string) — the Broder bowtie of the directed graph.

    Deterministic giant-SCC pick: the largest SCC, ties broken by the
    smallest scc_id.
    """
    e = _ckpt(directed_edges(edges))
    scc = _ckpt(strongly_connected_components(e))
    giant = (
        scc.groupBy("scc_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .orderBy(F.desc("sz"), F.asc("scc_id"))
        .limit(1)
    )
    core = _ckpt(scc.join(giant.select("scc_id"), "scc_id", "left_semi").select("v"))

    fwd_core = _reachable(e, core, forward=True, max_iter=max_iter)
    bwd_core = _reachable(e, core, forward=False, max_iter=max_iter)
    out_set = _ckpt(fwd_core.join(core, "v", "left_anti"))
    in_set = _ckpt(bwd_core.join(core, "v", "left_anti"))

    # residual-side sweeps: walk only through vertices not already in
    # CORE/IN/OUT, so a tendril path that re-enters a classified region
    # does not leak the mark through it
    classified = _ckpt(core.unionByName(out_set).unionByName(in_set).distinct())
    residual_e = _ckpt(
        e.join(classified.select(F.col("v").alias(SRC)), SRC, "left_anti")
        .join(classified.select(F.col("v").alias(DST)), DST, "left_anti")
        .select(SRC, DST)
    )
    # seed with the residual vertices DIRECTLY touched from IN / toward OUT
    from_in_seed = (
        e.join(in_set.select(F.col("v").alias(SRC)), SRC, "left_semi")
        .select(F.col(DST).alias("v"))
        .distinct()
        .join(classified, "v", "left_anti")
    )
    to_out_seed = (
        e.join(out_set.select(F.col("v").alias(DST)), DST, "left_semi")
        .select(F.col(SRC).alias("v"))
        .distinct()
        .join(classified, "v", "left_anti")
    )
    from_in = _reachable(residual_e, _ckpt(from_in_seed), forward=True, max_iter=max_iter)
    to_out = _reachable(residual_e, _ckpt(to_out_seed), forward=False, max_iter=max_iter)

    verts = scc.select("v")
    return (
        verts.join(core.withColumn("_core", F.lit(True)), "v", "left")
        .join(in_set.withColumn("_in", F.lit(True)), "v", "left")
        .join(out_set.withColumn("_out", F.lit(True)), "v", "left")
        .join(from_in.withColumn("_fi", F.lit(True)), "v", "left")
        .join(to_out.withColumn("_to", F.lit(True)), "v", "left")
        .select(
            "v",
            F.when(F.col("_core"), "CORE")
            .when(F.col("_in"), "IN")
            .when(F.col("_out"), "OUT")
            .when(F.col("_fi") & F.col("_to"), "TUBE")
            .when(F.col("_fi"), "TENDRIL_IN")
            .when(F.col("_to"), "TENDRIL_OUT")
            .otherwise("DISCONNECTED")
            .alias("region"),
        )
    )
