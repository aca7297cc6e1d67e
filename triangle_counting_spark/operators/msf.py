"""Minimum spanning forest — data-parallel Borůvka.

The weighted-graph companion to connected components: clustering /
backbone extraction over the weighted co-occurrence graph (single-link
hierarchical clustering's first levels ARE Borůvka rounds). Kruskal and
Prim are driver-sequential (a sorted scan with union-find); Borůvka is
the textbook distributed MST and maps exactly onto this engine's
iterative-join substrate:

per round (O(log n) rounds total, each component at least halves):
  1. drop intra-component edges,
  2. every component picks its minimum incident edge under the TOTAL
     order (weight, src, dst) — ties broken deterministically, so the
     forest is unique and replayable regardless of partitioning,
  3. picked edges join the forest; the picked-edge component graph is a
     pseudo-forest, contracted to its min component id by an inner
     hash-min loop (stars + short paths → a handful of inner rounds),
  4. vertices relabel through the contraction map.

All steps are joins/aggregates (min_by via a struct min — one shuffle
keyed by component per round); eager ``localCheckpoint`` per round (the
scc.py lineage discipline). At 100 TB the per-round cost is one edges ⋈
labels join + one component-keyed min — the same shape as one PageRank
iteration, whose N→4N scaling is evidenced in BASELINE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .orientation import DST, SRC


def _ckpt(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def minimum_spanning_forest(
    wedges: DataFrame,
    weight_col: str = "weight",
    max_iter: int = 64,
) -> DataFrame:
    """(src, dst, weight) — the minimum spanning forest of the undirected
    weighted edge list (src < dst canonical rows; one row per edge).

    Deterministic: ties resolve by (weight, src, dst), so the result is
    THE unique MSF of the tie-broken total order.
    """
    e = _ckpt(
        wedges.select(
            F.col(SRC).cast("long").alias(SRC),
            F.col(DST).cast("long").alias(DST),
            F.col(weight_col).cast("double").alias("w"),
        )
        .where(F.col(SRC) != F.col(DST))
        .groupBy(SRC, DST)
        .agg(F.min("w").alias("w"))
    )
    comp = _ckpt(
        e.select(F.col(SRC).alias("v"))
        .union(e.select(F.col(DST).alias("v")))
        .distinct()
        .select("v", F.col("v").alias("c"))
    )
    forest: DataFrame | None = None

    for r in range(max_iter + 1):
        if r == max_iter:
            raise RuntimeError(f"msf: did not converge in {max_iter} Borůvka rounds")
        labeled = (
            e.join(comp.select(F.col("v").alias(SRC), F.col("c").alias("cs")), SRC)
            .join(comp.select(F.col("v").alias(DST), F.col("c").alias("cd")), DST)
            .where(F.col("cs") != F.col("cd"))
        )
        labeled = _ckpt(labeled)
        # each component's minimum incident edge under (w, src, dst)
        cand = labeled.select(F.col("cs").alias("c"), "w", SRC, DST).union(
            labeled.select(F.col("cd").alias("c"), "w", SRC, DST)
        )
        picked = _ckpt(
            cand.groupBy("c")
            .agg(F.min(F.struct("w", SRC, DST)).alias("m"))
            .select(
                F.col("m")[SRC].alias(SRC),
                F.col("m")[DST].alias(DST),
                F.col("m")["w"].alias("w"),
            )
            .distinct()
        )
        if picked.count() == 0:
            break
        forest = _ckpt(
            picked if forest is None else forest.unionByName(picked).distinct()
        )
        # contract: hash-min over the picked component pairs (pseudo-forest)
        pairs = _ckpt(
            picked.join(
                comp.select(F.col("v").alias(SRC), F.col("c").alias("ca")), SRC
            )
            .join(comp.select(F.col("v").alias(DST), F.col("c").alias("cb")), DST)
            .select("ca", "cb")
        )
        sym = pairs.union(pairs.select(F.col("cb").alias("ca"), F.col("ca").alias("cb")))
        label = _ckpt(
            sym.select(F.col("ca").alias("c"))
            .distinct()
            .select("c", F.col("c").alias("lbl"))
        )
        for i in range(max_iter + 1):
            if i == max_iter:
                raise RuntimeError(f"msf: contraction did not close in {max_iter} rounds")
            nbr = (
                sym.join(label.select(F.col("c").alias("ca"), "lbl"), "ca")
                .groupBy(F.col("cb").alias("c"))
                .agg(F.min("lbl").alias("nl"))
            )
            stepped = label.join(nbr, "c", "left").select(
                "c",
                F.least("lbl", F.coalesce("nl", "lbl")).alias("l1"),
                "lbl",
            )
            # pointer jumping (components.py discipline): a picked-edge
            # graph can be a long path (monotone weights along a chain), so
            # pure hash-min needs O(path) rounds; label := label[label]
            # halves label paths → O(log path)
            parent = label.select(F.col("c").alias("l1"), F.col("lbl").alias("pl"))
            new = _ckpt(
                stepped.join(parent, "l1", "left").select(
                    "c",
                    F.least("l1", F.coalesce("pl", "l1")).alias("nlbl"),
                    (F.least("l1", F.coalesce("pl", "l1")) < F.col("lbl")).alias(
                        "_chg"
                    ),
                )
            )
            label = new.select("c", F.col("nlbl").alias("lbl"))
            if new.where(F.col("_chg")).count() == 0:
                break
        comp = _ckpt(
            comp.join(label, comp["c"] == label["c"], "left")
            .select(comp["v"], F.coalesce("lbl", comp["c"]).alias("c"))
        )
        # intra-component edges can only grow — prune them from e as we go
        e = _ckpt(
            labeled.join(label.withColumnRenamed("c", "cs"), "cs", "left")
            .withColumnRenamed("lbl", "ls")
            .join(label.withColumnRenamed("c", "cd"), "cd", "left")
            .withColumnRenamed("lbl", "ld")
            .where(
                F.coalesce("ls", F.col("cs")) != F.coalesce("ld", F.col("cd"))
            )
            .select(SRC, DST, "w")
        )

    spark = wedges.sparkSession
    if forest is None:
        return spark.createDataFrame([], f"{SRC} long, {DST} long, weight double")
    return forest.select(SRC, DST, F.col("w").alias("weight"))
