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
verifies every visited vertex, not a distributional property.

``biased_walks`` adds node2vec's 2nd-order p/q biases: the candidate
weight is 1/p for returning to the previous vertex, 1 for a neighbor of
the previous vertex (distance 1), 1/q otherwise (distance 2). Weights
are held as INTEGERS (scaled by a fixed S) so the cumulative-weight
selection is exact int64 arithmetic that replays bit-identically in
ANSI SQL — no float comparisons at bucket boundaries. The per-step cost
is O(deg(v)·deg(prev)) per walk row (the membership tests against the
previous vertex's sorted neighbor list) — the same asymptotic cost
node2vec's per-edge alias tables pay at build time (Σ_{(u,v)∈E} deg(v)),
paid lazily only for visited edges instead of all of them.
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


def _biased_weights(p: float, q: float, scale: int = 1_000_000):
    """(w_return, w_dist1, w_dist2) integer weights ∝ (1/p, 1, 1/q),
    scaled by ``scale`` and rounded half-up — the EXACT integers both the
    Spark plan and the SQL oracle inline, so there is no float anywhere
    in the selection rule."""
    if p <= 0 or q <= 0:
        raise ValueError("node2vec p and q must be > 0")
    w_ret = int(scale / p + 0.5)
    w_d2 = int(scale / q + 0.5)
    if w_ret < 1 or w_d2 < 1:
        raise ValueError(f"p={p} / q={q} too large for weight scale {scale}")
    return w_ret, scale, w_d2


def biased_walks(
    edges: DataFrame,
    length: int = 4,
    walks_per_vertex: int = 1,
    seed: int = 11,
    p: float = 1.0,
    q: float = 1.0,
) -> DataFrame:
    """(start_v, walk_ix, step, v) — node2vec p/q-biased 2nd-order walks
    (VERDICT r3 next #7; node2vec: Grover & Leskovec, KDD 2016). Step 1
    has no previous vertex and is UNIFORM with the same key rule as
    ``random_walks``; steps ≥ 2 select neighbor index i of the sorted
    neighbor list by exact integer cumulative weights:

        w_i = w_ret  if nbr_i == prev
              w_d1   if nbr_i ∈ N(prev)   (sorted-array membership)
              w_d2   otherwise
        r   = md5_32(start_v_walkix_t_seed_b) mod Σw
        v'  = first i with cumsum(w)_i > r

    All JVM-side higher-order functions (transform / aggregate with a
    struct accumulator — single O(deg) pass, no per-row Python); the
    identical rule replays in DuckDB SQL via a correlated window-cumsum
    subquery, so the gate verifies every visited vertex exactly.
    """
    from pyspark.storagelevel import StorageLevel

    if walks_per_vertex < 1:
        raise ValueError("walks_per_vertex must be >= 1")
    if length < 0:
        raise ValueError("length must be >= 0")
    w_ret, w_d1, w_d2 = _biased_weights(p, q)
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
    ).withColumn("walk_ix", F.col("walk_ix").cast("long"))
    cur = cur.withColumn("prev", F.lit(None).cast(cur.schema["v"].dataType))
    frames = [cur.select("start_v", "walk_ix", F.lit(0).cast("long").alias("step"), "v")]
    padj = adj.select(
        F.col("_av").alias("_pv"), F.col("_nbrs").alias("_pnbrs")
    )
    for t in range(1, int(length) + 1):
        key = F.concat_ws(
            "_",
            F.col("start_v"),
            F.col("walk_ix"),
            F.lit(t),
            F.lit(int(seed)),
            F.lit("b"),  # distinct key-space from the uniform generator
        )
        stepped = cur.join(adj, cur["v"] == adj["_av"])
        if t == 1:
            nxt = F.element_at(
                F.col("_nbrs"), (_hash_index(key, F.col("_deg")) + 1).cast("int")
            )
            cur = stepped.select(
                "start_v", "walk_ix", F.col("v").alias("prev"), nxt.alias("v")
            )
        else:
            stepped = stepped.join(padj, stepped["prev"] == padj["_pv"])
            weights = F.transform(
                F.col("_nbrs"),
                lambda x: F.when(x == F.col("prev"), F.lit(w_ret))
                .when(F.array_contains(F.col("_pnbrs"), x), F.lit(w_d1))
                .otherwise(F.lit(w_d2))
                .cast("long"),
            )
            total = F.aggregate(
                weights, F.lit(0).cast("long"), lambda acc, w: acc + w
            )
            r = F.pmod(
                F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"), total
            )
            # one O(deg) fold: carry (cum, chosen idx, position) and keep
            # the FIRST index whose cumulative weight exceeds r
            idx = F.aggregate(
                weights,
                F.struct(
                    F.lit(0).cast("long").alias("cum"),
                    F.lit(-1).alias("idx"),
                    F.lit(0).alias("pos"),
                ),
                lambda acc, w: F.struct(
                    (acc["cum"] + w).alias("cum"),
                    F.when(acc["idx"] >= 0, acc["idx"])
                    .when(acc["cum"] + w > r, acc["pos"])
                    .otherwise(F.lit(-1))
                    .alias("idx"),
                    (acc["pos"] + 1).alias("pos"),
                ),
                lambda acc: acc["idx"],
            )
            # two projections, not one: ``idx``'s lambdas reference the
            # INPUT column "prev", and Spark 4's lateral column alias
            # resolution would capture a same-select `v AS prev` alias
            # instead (observed: weights silently computed against the
            # wrong previous vertex) — so alias to temp names first,
            # then rename
            cur = stepped.select(
                "start_v",
                "walk_ix",
                F.col("v").alias("_next_prev"),
                F.element_at(F.col("_nbrs"), (idx + 1).cast("int")).alias("_next_v"),
            ).select(
                "start_v",
                "walk_ix",
                F.col("_next_prev").alias("prev"),
                F.col("_next_v").alias("v"),
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
