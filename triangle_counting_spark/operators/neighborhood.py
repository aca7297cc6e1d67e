"""HyperBall — sketch-based neighborhood function and ball-size estimates.

The exact distance table (bfs.py / distances.py) costs one BFS per source;
at web scale you cannot afford n of them. HyperBall (Boldi & Vigna, the
algorithm behind the Facebook four-degrees measurement) keeps ONE HyperLogLog
counter per vertex and runs synchronous max-merge rounds:

    B(v, 0) = {v};   B(v, r) = B(v, r-1) ∪ ⋃_{u ∈ N(v)} B(u, r-1)

so after r rounds each vertex's counter estimates |ball(v, r)| — every
vertex's r-neighborhood size in r join+aggregate passes TOTAL, not per
source. The neighborhood function N(r) = Σ_v |ball(v, r)| then yields the
effective diameter. This is the designed-for-100TB member of the distance
family: the exact BFS tiers stay for small graphs and spot checks, the
sampled estimators (distances.py) for medium, HyperBall for full coverage.

Determinism/replayability: registers are derived from md5(v) (the walks.py
md5-rank discipline, walks.py:37), merges are integer MAX — so the entire
sketch is partitioning-independent and replays in ANSI SQL by unrolling
rounds (the coreness/sssp oracle pattern). The float estimate is computed
from an integer-exact register sum (Σ 2^(40-M_j) as a BIGINT — no
float-accumulation-order hazard) with one shared constant, so Spark and
DuckDB agree bit-for-bit after round-6.

Register layout: m = 64 registers packed as one array<tinyint> column per
vertex (per-round shuffle rows stay O(n), not O(64 n); the element-wise
max-merge is 64 JVM-side MAX aggregates — no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .orientation import DST, SRC, canonical_edges, degrees, symmetrize

M = 64  # registers per sketch (log2m = 6)
ALPHA = 0.709  # HLL bias constant for m = 64
# one shared literal for alpha * m^2 * 2^40 so Spark and DuckDB compute the
# raw estimate as the SAME two-operand division (see module docstring)
RAW_NUMERATOR = ALPHA * M * M * float(1 << 40)


def _rho32(h: F.Column) -> F.Column:
    """Leading-zero rank of a 32-bit value + 1 (HLL ρ); bin() drops leading
    zeros in both Spark and DuckDB, so ρ = 33 - len(bin(h)), h > 0."""
    return F.when(h == 0, F.lit(33)).otherwise(F.lit(33) - F.length(F.bin(h)))


def hyperball_registers(
    edges: DataFrame, rounds: int, assume_canonical: bool = False
) -> DataFrame:
    """(v, regs: array<tinyint>) — each vertex's HLL registers for ball(v, rounds).

    Round = sym ⋈ state (one shuffle on vertex id) → union own sketch →
    64 MAX aggregates; eager localCheckpoint truncates lineage per round
    (kcore_edges discipline, subgraphs.py:41)."""
    ce = edges if assume_canonical else canonical_edges(edges)
    sym = _prepared_sym(ce)

    vstr = F.col("v").cast("string")
    h1 = F.conv(F.substring(F.md5(vstr), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(vstr), 9, 8), 16, 10).cast("long")
    j, rho = (h1 % M).cast("int"), _rho32(h2).cast("tinyint")
    init = F.array(
        *[F.when(F.lit(i) == j, rho).otherwise(F.lit(0)).cast("int") for i in range(M)]
    ).cast("array<tinyint>")
    state = (
        degrees(ce).select("v", init.alias("regs")).localCheckpoint(eager=True)
    )

    for _ in range(rounds):
        state = _one_round(sym, state)
    sym.unpersist()
    return state


def _estimate_cols() -> list[F.Column]:
    """reg_sum / zeros / ball_estimate from a regs column — integer-exact
    S = Σ 2^(40-M_j), then the HLL estimate with small-range correction."""
    acc0 = F.lit(0).cast("long")
    # python F.shiftleft only takes a literal bit count; the SQL form
    # accepts a column (same JVM expression)
    s_int = F.expr("aggregate(regs, 0L, (a, x) -> a + shiftleft(1L, 40 - x))")
    zeros = F.size(F.filter("regs", lambda x: x == 0)).cast("long")
    reg_sum = F.aggregate("regs", acc0, lambda a, x: a + x.cast("long"))
    raw = F.lit(RAW_NUMERATOR) / s_int.cast("double")
    est = F.when(
        (zeros > 0) & (raw <= F.lit(2.5 * M)),
        F.lit(float(M)) * F.log(F.lit(float(M)) / zeros.cast("double")),
    ).otherwise(raw)
    return [
        reg_sum.alias("reg_sum"),
        zeros.alias("zeros"),
        F.round(est, 6).alias("ball_estimate"),
    ]


def hyperball(
    edges: DataFrame, rounds: int = 4, assume_canonical: bool = False
) -> DataFrame:
    """(v, reg_sum, zeros, ball_estimate) — estimated |ball(v, rounds)| for
    EVERY vertex. reg_sum/zeros are the integer sketch invariants (the
    hash-exact part of the gate); ball_estimate is the HLL estimate
    (±1.04/√64 ≈ 13% relative error)."""
    regs = hyperball_registers(edges, rounds, assume_canonical=assume_canonical)
    return regs.select("v", *_estimate_cols())


def neighborhood_function(
    edges: DataFrame, max_rounds: int = 16, assume_canonical: bool = False
) -> list[tuple[int, float]]:
    """[(r, N(r))] for r = 0..max_rounds — N(r) = Σ_v |ball(v, r)| estimate,
    stopping early once N(r) saturates (< 0.1% growth). Feed to
    :func:`effective_diameter`."""
    spark = edges.sparkSession
    ce = edges if assume_canonical else canonical_edges(edges)
    out: list[tuple[int, float]] = []
    regs = hyperball_registers(ce, 0, assume_canonical=True)
    sym = _prepared_sym(ce)
    prev = None
    try:
        for r in range(max_rounds + 1):
            if r > 0:
                # incremental: one more merge round on top of the kept state
                regs = _one_round(sym, regs)
            total = float(
                regs.select(*_estimate_cols())
                .agg(F.sum("ball_estimate").alias("s"))
                .collect()[0]["s"]
            )
            out.append((r, total))
            if prev is not None and total <= prev * 1.001:
                break
            prev = total
    finally:
        sym.unpersist()
    return out


def _prepared_sym(ce: DataFrame) -> DataFrame:
    """Symmetrized edges, pre-partitioned on SRC and persisted — built ONCE
    per round loop so each round only shuffles the (small) register table,
    never re-derives the edge side (hyperball_registers discipline)."""
    spark = ce.sparkSession
    _nshuf = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    return symmetrize(ce).repartition(_nshuf, SRC).persist()


def _one_round(sym: DataFrame, state: DataFrame) -> DataFrame:
    reg_cols = [F.max(F.col("regs")[i]).alias(f"_r{i}") for i in range(M)]
    rebuild = F.array(*[F.col(f"_r{i}") for i in range(M)]).cast("array<tinyint>")
    nbr = sym.join(state.select(F.col("v").alias(SRC), "regs"), SRC).select(
        F.col(DST).alias("v"), "regs"
    )
    return (
        nbr.unionByName(state)
        .groupBy("v")
        .agg(*reg_cols)
        .select("v", rebuild.alias("regs"))
        .localCheckpoint(eager=True)
    )


def effective_diameter(nf: list[tuple[int, float]], q: float = 0.9) -> float:
    """Interpolated q-effective diameter from a neighborhood function."""
    if not nf:
        return 0.0
    target = q * nf[-1][1]
    for (r0, n0), (r1, n1) in zip(nf, nf[1:]):
        if n1 >= target:
            if n1 == n0:
                return float(r1)
            return r0 + (target - n0) / (n1 - n0)
    return float(nf[-1][0])


def hyperball_centrality(
    edges: DataFrame, max_rounds: int = 16, assume_canonical: bool = False
) -> DataFrame:
    """(v, harmonic_estimate) — sketch harmonic centrality for EVERY vertex:
    Σ_r (|ball(v,r)| - |ball(v,r-1)|) / r, the estimator HyperBall was
    built for (each distance-r shell weighted 1/r). Complements the exact
    sampled tier (distances.py:centrality): that one is exact for k roots,
    this one covers all n vertices in max_rounds passes at sketch accuracy.

    Rounds stop early when the total estimate stops growing (< 0.1%)."""
    ce = edges if assume_canonical else canonical_edges(edges)
    regs = hyperball_registers(ce, 0, assume_canonical=True)
    prev = regs.select("v", *_estimate_cols()).select(
        "v", F.col("ball_estimate").alias("_b")
    ).localCheckpoint(eager=True)
    acc = prev.select("v", F.lit(0.0).alias("harmonic"))
    sym = _prepared_sym(ce)
    prev_total = None
    try:
        for r in range(1, max_rounds + 1):
            regs = _one_round(sym, regs)
            cur = regs.select("v", *_estimate_cols()).select(
                "v", F.col("ball_estimate").alias("_b")
            ).localCheckpoint(eager=True)
            shell = cur.join(prev.select("v", F.col("_b").alias("_pb")), "v").select(
                "v",
                (F.greatest(F.col("_b") - F.col("_pb"), F.lit(0.0)) / r).alias("_s"),
            )
            acc = (
                acc.join(shell, "v")
                .select("v", (F.col("harmonic") + F.col("_s")).alias("harmonic"))
                .localCheckpoint(eager=True)
            )
            total = cur.agg(F.sum("_b")).collect()[0][0]
            if prev_total is not None and total <= prev_total * 1.001:
                break
            prev_total = total
            prev = cur
    finally:
        sym.unpersist()
    return acc.select("v", F.round("harmonic", 6).alias("harmonic_estimate"))
