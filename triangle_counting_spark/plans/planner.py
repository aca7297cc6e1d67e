"""Statistic-driven strategy selection — the reference's hybrid planner.

tc_bader_hybrid (tc.c:1844-1911) computes one graph statistic (k = fraction
of BFS-horizontal edges, tc_bader_compute_k tc.c:1120-1159) and picks a
physical algorithm: ``m < 100000 || k > 0.7 → tc_forward_hash_degreeOrder
else tc_bader`` (tc.c:1904), with a 100k-edge recursion base (tc.h:43).
Our planner is the DataFrame-level analog over the engine's physical
strategies, with one Spark-specific tier the reference doesn't need: the
broadcast-CSR cutover (a single shared-memory node always "fits" in the
reference; on a cluster, fitting executor memory is THE plan-changing
statistic).

Decision ladder (each statistic only computed if the previous didn't
decide — k costs a BFS, exactly as the reference's compute_k does):

1. m < small_edges (default 100k, tc.h:43)  → "sql"   (one codegen'd plan,
   no Python workers to spin up)
2. m <= bcast_max (default 20M ≈ 330 MB CSR) → "bcast" (zero-shuffle
   broadcast-CSR kernel)
3. k > 0.7  → "part"  (co-grouped CSR blocks — the degree-ordered
   forward-hash analog at shuffle scale)
   k <= 0.7 → "level" (BFS-level-partitioned, the tc_bader family: only
   the k·m horizontal edges do intersection work)

Spark's AQE then handles the *physical* runtime analogs (broadcast-vs-
shuffle joins, skew split) inside whichever plan is chosen.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators.orientation import canonical_edges

SMALL_GRAPH_EDGES = 100_000  # the reference's recursion/hybrid base, tc.h:43
BCAST_MAX_EDGES = 20_000_000  # conservative FLOOR: CSR ≈ 16 B/edge → ~330 MB
BCAST_HARD_CAP_EDGES = 256_000_000  # ~4 GB CSR — past this, always shuffle
K_CUTOVER = 0.7  # tc.c:1904


def bcast_max_edges(spark) -> int:
    """Memory-derived broadcast-tier cutoff, the honest cluster model: the
    CSR must fit the smallest executor, so the cutoff is a budget fraction
    of available memory over 16 B/edge — not a fixed magic number (r3:
    RMAT-21 measured bcast 2.0x faster than the shuffled "part" tier, but
    a fixed 20M-edge cutoff routed it away from bcast on a 128 GiB box).

    Resolution order: explicit ``spark.tcs.bcastMaxEdges`` conf override
    (malformed values raise — a silently ignored safety cap is worse than
    no cap) → 10% of min(driver JVM max heap, ``spark.executor.memory``
    when set) / 16 B, clamped to [20M floor, 256M hard cap]. The executor
    term matters in client mode: a 64 GB driver next to 4 GB executors
    must NOT size executor broadcasts from the driver's heap.
    """
    try:
        override = spark.conf.get("spark.tcs.bcastMaxEdges", None)
    except Exception:  # noqa: BLE001 — connect mode without conf access
        override = None
    if override is not None:
        return int(override)  # ValueError on garbage, deliberately loud
    try:
        mem = int(spark._jvm.java.lang.Runtime.getRuntime().maxMemory())
    except Exception:  # noqa: BLE001 — connect-mode / no JVM handle
        return BCAST_MAX_EDGES
    try:
        exec_mem = spark.conf.get("spark.executor.memory", None)
        if exec_mem:
            mem = min(mem, _parse_mem(exec_mem))
    except Exception:  # noqa: BLE001
        pass
    derived = (mem // 10) // 16
    return max(BCAST_MAX_EDGES, min(derived, BCAST_HARD_CAP_EDGES))


def _parse_mem(s: str) -> int:
    """Spark memory string ("4g", "512m", "8192") -> bytes."""
    s = s.strip().lower()
    units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
    if s and s[-1] in units:
        return int(float(s[:-1]) * units[s[-1]])
    return int(s)


@dataclass
class PlanChoice:
    strategy: str
    m: int
    k: float | None  # BFS-horizontal edge fraction (None if not computed)
    reason: str


def choose_iterative_tier(
    edges: DataFrame,
    blocked_max_edges: int | None = None,
    assume_canonical: bool = False,
) -> str:
    """"blocked" (CSR-in-memory broadcast tier) while the graph fits a
    driver/executor vector, else "shuffle" — the same memory-fit statistic
    the triangle planner uses, applied to PageRank/CC/label propagation so
    callers don't have to self-select the tier. Default cutoff is the
    memory-derived :func:`bcast_max_edges`."""
    ce = edges if assume_canonical else canonical_edges(edges)
    m = ce.count()
    if blocked_max_edges is None:
        blocked_max_edges = bcast_max_edges(ce.sparkSession)
    return "blocked" if m <= blocked_max_edges else "shuffle"


def choose_triangle_strategy(
    edges: DataFrame,
    small_edges: int = SMALL_GRAPH_EDGES,
    bcast_max: int | None = None,
    k_cutover: float = K_CUTOVER,
    assume_canonical: bool = False,
) -> PlanChoice:
    """Pick a triangle strategy from graph statistics (cheapest first).

    Beyond the memory cutoff, auto ALWAYS picks "part" (round 4,
    measured): the reference's k-statistic cutover (tc.c:1904) routes
    low-k graphs to the level split, but that constant was tuned for an
    in-memory OpenMP engine — in this shuffle-based engine the level
    tier's G1 wedge join materializes Σ_horiz crossdeg(src) rows through
    an exchange, which is hub-product-shaped and exhausted shuffle disk
    at RMAT-22 (m=67M, k=0.57: level FAILED with "No space left on
    device" at ~70 GB free; part completed the same graph in 184 s,
    2,948,949,366 triangles). "level" remains an explicitly-requestable
    strategy (reference parity, exact, oracle-gated at test scale) —
    auto just never gambles on it. Skipping the k-statistic also saves
    auto one full BFS on every beyond-memory graph; ``k_cutover`` is
    retained for signature compatibility and opt-in experiments via
    :func:`choose_with_level`."""
    ce = edges if assume_canonical else canonical_edges(edges)
    m = ce.count()
    if bcast_max is None:
        bcast_max = bcast_max_edges(ce.sparkSession)
    if m < small_edges:
        return PlanChoice("sql", m, None, f"m={m} < {small_edges} (tc.h:43 base)")
    if m <= bcast_max:
        return PlanChoice(
            "bcast", m, None, f"m={m} <= {bcast_max}: oriented CSR fits memory"
        )
    return PlanChoice(
        "part", m, None,
        f"m={m} > {bcast_max}: co-grouped CSR blocks (bounded replication; "
        "level's wedge-join shuffle is hub-product-shaped — see docstring)",
    )


def choose_with_level(
    edges: DataFrame,
    small_edges: int = SMALL_GRAPH_EDGES,
    bcast_max: int | None = None,
    k_cutover: float = K_CUTOVER,
    assume_canonical: bool = False,
) -> PlanChoice:
    """The pre-r4 reference-faithful hybrid (tc.c:1904): beyond memory,
    compute the horizontal-edge fraction k (one BFS) and route k <=
    k_cutover to the level split. Kept for experiments and parity runs;
    auto no longer uses it (see :func:`choose_triangle_strategy`)."""
    ce = edges if assume_canonical else canonical_edges(edges)
    base = choose_triangle_strategy(
        ce, small_edges, bcast_max, k_cutover, assume_canonical=True
    )
    if base.strategy != "part":
        return base
    from ..operators.bfs import k_metric

    k = float(k_metric(ce).collect()[0]["k"])
    if k > k_cutover:
        return PlanChoice(
            "part", base.m, k,
            f"k={k:.3f} > {k_cutover} → forward-hash analog (tc.c:1904)",
        )
    return PlanChoice(
        "level", base.m, k, f"k={k:.3f} <= {k_cutover} → level-partitioned (tc.c:1904)"
    )
