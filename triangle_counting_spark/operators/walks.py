"""Deterministic seeded random walks — the graph-embedding corpus
generator (DeepWalk/node2vec-style uniform walks).

Training graph embeddings needs a walk corpus: for every vertex, W walks
of L steps, each step picking a uniform-random neighbor. At 100 TB the
walk state is |V|·W rows advanced L times — an iterative equi-join
against a pre-built adjacency table, all JVM-side expressions (no Python
in the loop, no RNG state to ship).

Determinism/replayability: the "random" neighbor index at step t is
``hex(md5(start_v _ walk_ix _ t _ seed))[0:8] mod deg`` — the same
md5-rank trick the sampled estimators use, so the EXACT walks replay in
ANSI SQL (DuckDB: ``('0x' || substr(md5(k),1,8))::BIGINT``) and the gate
verifies every visited vertex, not a distributional property. Uniform
walks only (node2vec's p/q biases need the previous vertex's adjacency —
a documented extension point, not silently approximated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .orientation import DST, SRC, canonical_edges, symmetrize


def _hash_index(key_col, deg_col):
    """First 8 md5 hex chars as an integer, mod degree — replayable in
    ANSI SQL; conv() is JVM-side and exact for 8 hex digits."""
    return F.pmod(
        F.conv(F.substring(F.md5(key_col), 1, 8), 16, 10).cast("long"), deg_col
    )


def random_walks(
    edges: DataFrame,
    length: int = 4,
    walks_per_vertex: int = 1,
    seed: int = 11,
) -> DataFrame:
    """(start_v, walk_ix, step, v) — one row per visited vertex of every
    walk; step 0 is the start vertex. Every vertex in the edge table has
    degree ≥ 1 after symmetrization, so walks never dead-end. Walks
    advance by L unrolled equi-joins against the persisted
    sorted-adjacency table; lineage is checkpoint-truncated every few
    steps so L can be large. The result is materialized (eager
    checkpoint) so the adjacency cache can be released before return.
    """
    from pyspark.storagelevel import StorageLevel

    if walks_per_vertex < 1:
        # sequence(0, -1) would DESCEND ([0, -1]) and emit two walks per
        # vertex, not zero — same Spark pitfall ngram_vocabulary guards
        raise ValueError("walks_per_vertex must be >= 1")
    if length < 0:
        raise ValueError("length must be >= 0")
    ce = canonical_edges(edges)
    adj = (
        symmetrize(ce)
        .groupBy(F.col(SRC).alias("_av"))
        .agg(F.sort_array(F.collect_list(DST)).alias("_nbrs"))
        .select("_av", "_nbrs", F.size("_nbrs").alias("_deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    verts = adj.select(F.col("_av").alias("v"))
    cur = verts.select(
        F.col("v").alias("start_v"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(walks_per_vertex) - 1))
        ).alias("walk_ix"),
        F.col("v").alias("v"),
        # walk_ix as long: the sequence explodes as int32, but the gate
        # oracle (and downstream joins) type it BIGINT like step
    ).withColumn("walk_ix", F.col("walk_ix").cast("long"))
    frames = [cur.select("start_v", "walk_ix", F.lit(0).cast("long").alias("step"), "v")]
    for t in range(1, int(length) + 1):
        key = F.concat_ws(
            "_",
            F.col("start_v"),
            F.col("walk_ix"),
            F.lit(t),
            F.lit(int(seed)),
        )
        cur = (
            cur.join(adj, cur["v"] == adj["_av"])
            .select(
                "start_v",
                "walk_ix",
                F.element_at(
                    F.col("_nbrs"), (_hash_index(key, F.col("_deg")) + 1).cast("int")
                ).alias("v"),
            )
        )
        if t % 4 == 0:
            cur = cur.localCheckpoint(eager=True)
        frames.append(
            cur.select(
                "start_v", "walk_ix", F.lit(t).cast("long").alias("step"), "v"
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    return out


def walk_skipgram_pairs(
    walks: DataFrame, window: int = 2, drop_self: bool = True
) -> DataFrame:
    """(center, context, offset) — skip-gram training pairs within
    ``window`` steps along each walk (the word2vec-style output an
    embedding trainer consumes). One self-equi-join on the walk id with a
    bounded |step offset| predicate — row-based, AQE-splittable; pair
    volume = walks · L · 2·window.

    ``drop_self``: drop pairs where center == context vertex (a walk can
    revisit); keep them for unigram-frequency parity with word2vec.
    """
    a = walks.select(
        F.col("start_v"), F.col("walk_ix"),
        F.col("step").alias("_sa"), F.col("v").alias("center"),
    )
    b = walks.select(
        F.col("start_v"), F.col("walk_ix"),
        F.col("step").alias("_sb"), F.col("v").alias("context"),
    )
    pairs = (
        a.join(b, ["start_v", "walk_ix"])
        .where(
            (F.col("_sa") != F.col("_sb"))
            & (F.abs(F.col("_sa") - F.col("_sb")) <= window)
        )
        .select(
            "center",
            "context",
            (F.col("_sb") - F.col("_sa")).alias("offset"),
        )
    )
    if drop_self:
        pairs = pairs.where(F.col("center") != F.col("context"))
    return pairs
