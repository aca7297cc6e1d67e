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
    weight_col: str | None = None,
) -> LoopResult:
    """LoopResult whose state is ``(v: long, label: long)``.

    ``weight_col``: optional edge weight — neighbor votes are weighted
    sums instead of counts (ties still break by min label, so runs stay
    deterministic; integer-valued weights keep the tie set exact across
    engines)."""
    from pyspark.storagelevel import StorageLevel

    _nshuf = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    if weight_col is None:
        ce = canonical_edges(edges)
        sym_w = symmetrize(ce).select(SRC, DST, F.lit(1.0).alias("_w"))
    else:
        s, d = F.col(SRC).cast("long"), F.col(DST).cast("long")
        ce = (
            edges.select(
                s.alias(SRC), d.alias(DST),
                F.col(weight_col).cast("double").alias("_w"),
            )
            .where(F.col(SRC) != F.col(DST))
            .where(F.col(SRC).isNotNull() & F.col(DST).isNotNull())
        )
        sym_w = ce.select(SRC, DST, "_w").union(
            ce.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), F.col("_w"))
        )
    # joined every iteration — persist once, pre-partitioned on SRC so the
    # per-iteration vote join only shuffles the label table (pagerank.py note)
    sym = sym_w.repartition(_nshuf, SRC).persist(StorageLevel.MEMORY_AND_DISK)
    state0 = (
        ce.select(F.col(SRC).alias("v"))
        .union(ce.select(F.col(DST).alias("v")))
        .distinct()
        .select("v", F.col("v").alias("label"), F.col("v").alias("label_prev"))
    )
    vote_agg = (
        F.count(F.lit(1)).alias("cnt") if weight_col is None
        else F.sum("_w").alias("cnt")
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        votes = (
            sym.join(state.select(F.col("v").alias(SRC), "label"), SRC)
            .groupBy(F.col(DST).alias("v"), "label")
            .agg(vote_agg)
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
        fingerprint=f"lp|sync-minlabel|weighted={weight_col is not None}",
        resume=resume,
    )
    sym.unpersist()
    result.state = result.state.select("v", "label")
    return result


def label_propagation_blocked(
    edges: DataFrame,
    max_iter: int = 20,
    n_blocks: int | None = None,
    assume_canonical: bool = False,
) -> LoopResult:
    """CSR-blocked synchronous label propagation — the broadcast tier.

    Per round each dst-block computes the per-vertex neighbor-label vote
    argmax fully vectorized: lexsort by (dst, label) → run-length counts →
    lexsort runs by (dst, -count, label) → first run per dst wins. Same
    (count desc, label asc) tie-break as the shuffle tier, so the two
    implementations agree round for round (tested).
    """
    import numpy as np
    import pandas as pd

    from ..plans.blocked import _ship_arrays, build_blocked
    from .orientation import canonical_edges as _canon

    spark = edges.sparkSession
    ce = edges.select(SRC, DST) if assume_canonical else _canon(edges)
    pdf = ce.toPandas()
    if n_blocks is None:
        n_blocks = max(spark.sparkContext.defaultParallelism, 1)
    g = build_blocked(pdf, n_blocks)
    n = len(g.verts)
    if n == 0:
        empty = spark.createDataFrame([], "v long, label long")
        return LoopResult(state=empty, iterations=0, converged=True, delta=0.0)
    files = _ship_arrays(
        spark, {"src": g.src, "dst": g.dst, "bounds": g.block_bounds}
    )

    def make_round(bc_state, _k):
        def fn(batches):
            from pyspark import SparkFiles  # noqa: PLC0415
            import numpy as np  # noqa: PLC0415

            arrs = {
                name: np.asarray(np.load(SparkFiles.get(f), mmap_mode="r"))
                for name, f in files.items()
            }
            s_, d_, bounds = arrs["src"], arrs["dst"], arrs["bounds"]
            vec = bc_state.value
            for b in batches:
                for blk in b["id"].to_numpy():
                    lo, hi = bounds[blk], bounds[blk + 1]
                    if hi <= lo:
                        yield pd.DataFrame({"dst": [], "val": []}).astype(
                            {"dst": "int64", "val": "float64"}
                        )
                        continue
                    dd = d_[lo:hi]
                    lbl = vec[s_[lo:hi]]
                    order = np.lexsort((lbl, dd))
                    dd, lbl = dd[order], lbl[order]
                    # run-length counts of (dst, label) pairs
                    new_run = np.r_[
                        True, (dd[1:] != dd[:-1]) | (lbl[1:] != lbl[:-1])
                    ]
                    starts = np.flatnonzero(new_run)
                    cnts = np.diff(np.r_[starts, len(dd)])
                    rd, rl = dd[starts], lbl[starts]
                    # winner per dst: (count desc, label asc) → lexsort keys
                    # reversed-significance: label, -count, dst
                    w = np.lexsort((rl, -cnts, rd))
                    rd, rl = rd[w], rl[w]
                    first = np.flatnonzero(np.r_[True, rd[1:] != rd[:-1]])
                    yield pd.DataFrame(
                        {"dst": rd[first], "val": rl[first].astype(np.float64)}
                    )

        return fn

    slices = spark.range(0, n_blocks, 1, numPartitions=n_blocks)
    state = np.arange(n, dtype=np.int64)
    metrics: list[dict] = []
    converged = False
    i = 0
    for i in range(1, max_iter + 1):
        bc_state = spark.sparkContext.broadcast(state)
        out = slices.mapInPandas(
            make_round(bc_state, n_blocks), schema="dst long, val double"
        ).toPandas()
        bc_state.destroy()
        new = state.copy()
        new[out["dst"].to_numpy(dtype=np.int64)] = out["val"].to_numpy(dtype=np.int64)
        delta = int((new != state).sum())
        state = new
        metrics.append({"iteration": i, "delta": float(delta)})
        if delta == 0:
            converged = True
            break
    out_df = spark.createDataFrame(
        pd.DataFrame({"v": g.verts, "label": g.verts[state]})
    )
    return LoopResult(
        state=out_df,
        iterations=i,
        converged=converged,
        delta=metrics[-1]["delta"] if metrics else 0.0,
        metrics=metrics,
    )


def label_propagation_fixed(
    edges: DataFrame, iterations: int, weight_col: str | None = None,
    tier: str = "auto",
) -> DataFrame:
    """Exactly ``iterations`` synchronous rounds (oracle-comparable).

    ``tier`` (round 6): "auto" routes the unweighted case through the
    memory-derived
    :func:`~triangle_counting_spark.plans.planner.choose_iterative_tier`
    statistic to :func:`label_propagation_blocked` while the graph fits
    memory — both tiers run the identical synchronous round with the
    identical (count desc, label asc) tie-break and stop on the same
    delta == 0 test, so they agree round for round (driver-gated against
    one oracle; re-verified exactly at sf0.1 this round). "shuffle"
    forces the dataflow loop; weighted votes always take it (the blocked
    tier is unweighted)."""
    if tier == "auto" and weight_col is None:
        from ..plans.planner import choose_iterative_tier

        tier = choose_iterative_tier(edges)
    if tier == "blocked" and weight_col is None:
        return label_propagation_blocked(edges, max_iter=iterations).state
    res = label_propagation(edges, max_iter=iterations, weight_col=weight_col)
    # loop stops early only on convergence, which is also deterministic
    return res.state


def modularity(
    edges: DataFrame, assignments: DataFrame, label_col: str = "label"
) -> DataFrame:
    """One row ``(modularity)`` — Newman's Q for a community assignment:
    Q = Σ_c [ e_c/m − (d_c/2m)² ] with e_c = intra-community edge count
    and d_c = community degree sum. The quality score for the engine's
    own label-propagation output (or any (v, label) table). Three
    broadcastable joins + one aggregate; round 6 for oracle parity.
    """
    from .orientation import canonical_edges, degrees

    # ce feeds three plan subtrees (inside join, degrees, m) — materialize
    # once instead of re-running the distinct per subtree (the same
    # rationale as orient_by_degree's checkpointed degree table)
    ce = canonical_edges(edges).localCheckpoint(eager=True)
    m = ce.count()
    if m == 0:
        return ce.sparkSession.createDataFrame([(0.0,)], "modularity double")
    lab = assignments.select(
        F.col("v").cast("long").alias("v"), F.col(label_col).alias("_c")
    )
    inside = (
        ce.join(lab.select(F.col("v").alias(SRC), F.col("_c").alias("_ca")), SRC)
        .join(lab.select(F.col("v").alias(DST), F.col("_c").alias("_cb")), DST)
        .where(F.col("_ca") == F.col("_cb"))
        .groupBy(F.col("_ca").alias("_c"))
        .agg(F.count(F.lit(1)).cast("double").alias("_ec"))
    )
    degsum = (
        degrees(ce)
        .join(lab, "v")
        .groupBy("_c")
        .agg(F.sum("degree").cast("double").alias("_dc"))
    )
    per_c = degsum.join(inside, "_c", "left").select(
        (
            F.coalesce("_ec", F.lit(0.0)) / F.lit(float(m))
            - F.pow(F.col("_dc") / F.lit(2.0 * m), F.lit(2.0))
        ).alias("_q")
    )
    return per_c.agg(F.round(F.sum("_q"), 6).alias("modularity"))
