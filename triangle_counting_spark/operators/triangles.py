"""Exact triangle counting — degree-ordered orientation + intersection joins.

Logical plan (all strategies share it; reference algorithm:
tc_forward_hash_degreeOrder, tc.c:944-958):

    canonical edges --orient by (degree,id)--> DAG edges
    adj = groupBy(src).collect_sorted_list(dst)          # CSR rows
    per oriented edge (a,b): |adj[a] ∩ adj[b]|           # intersection join
    triangles = sum                                       # exact, no /3 or /6

Because orientation makes the graph a DAG ordered by (degree, id), each
triangle {a,b,c} is counted exactly once (the reference's "forward"
correction-free family, tc.c:814-975), and every adjacency list is
O(sqrt(m)) long, so the plan has no skew-prone task even on power-law
graphs — the whole-game property at 100 TB.

Physical strategies (the reference ships 5 intersection kernels plus the
bader level family, graph.c:276-459 / tc.c:1161-1196; we ship 6 — each a
different *physical* plan for the same logical query, selectable like the
reference's function-pointer registry main.c:454-488):

- "sql":    JVM `array_intersect` — whole-stage codegen, zero Python.
- "join":   pure 3-way self-join  edges(a,b) ⋈ edges(b,c) ⋈ edges(a,c) —
            the SpGEMM/Davis formulation (tc.c:12-49) as equi-joins; AQE
            handles residual skew. No arrays materialized at all.
- "merge":  Arrow-batched numpy merge-path kernel (graph.c:276-304 in
            spirit): sorted-array intersection per edge inside mapInPandas.
- "probe":  Arrow-batched numpy binary-search kernel (graph.c:322-351):
            searchsorted probes of the smaller list into the larger.
- "bcast":  broadcast-CSR strided-slice kernel (BroadcastCSRTriangles) —
            zero shuffle; the fits-in-executor-memory tier.
- "level":  BFS-level-partitioned counting (tc_bader, tc.c:1161-1196).

Partial counts per Arrow batch + final sum = the reference's per-thread
counter + OpenMP reduction (tc_parallel.c:10-50) in Spark's native
partial/final aggregation model.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .adjacency import oriented_adjacency
from .orientation import DST, SRC, canonical_edges, degrees, orient_by_degree

_KERNEL_SCHEMA = "partial long"


def _compact_ids(np, s_raw, d_raw, m_in):
    """Map raw vertex ids to compact int32 indices.

    Dense-id fast path: when ids already live in a small range (RMAT,
    relabeled graphs) the id IS the index — skips the unique/sort pass,
    which is the single biggest serial cost of the broadcast tier. Sparse
    ids (xxhash64 at 10^12 scale) take the unique(return_inverse) path.
    """
    mx = max(int(s_raw.max(initial=0)), int(d_raw.max(initial=0))) if m_in else 0
    mn = min(int(s_raw.min(initial=0)), int(d_raw.min(initial=0))) if m_in else 0
    if m_in and mn >= 0 and mx < max(4 * 2 * m_in, 1024) and mx < 2**31:
        verts = np.arange(mx + 1, dtype=np.int64)
        return s_raw.astype(np.int32), d_raw.astype(np.int32), verts
    # hash-based factorize is O(m) vs sort-based np.unique O(m log m) —
    # 8.6s -> ~1.5s on 16M sparse xxhash64 ids; then rank-remap the small
    # vertex table so compact ids remain sorted by original id
    import pandas as pd  # noqa: PLC0415

    codes, uniq = pd.factorize(np.concatenate([s_raw, d_raw]), sort=False)
    uniq = np.asarray(uniq, dtype=np.int64)
    order = np.argsort(uniq)
    rank = np.empty(len(uniq), dtype=np.int32)
    rank[order] = np.arange(len(uniq), dtype=np.int32)
    inv = rank[codes]
    return inv[:m_in], inv[m_in:], uniq[order]


def _edge_adjacency_pairs(oriented: DataFrame) -> DataFrame:
    """(src, dst, nbrs_src, nbrs_dst) for every oriented edge.

    Two equi-joins of the oriented edge table against the adjacency table;
    both shuffle on a vertex id and Catalyst/AQE picks broadcast vs
    sort-merge. Vertices with no outgoing oriented edge simply drop out
    (inner join) — they cannot close a triangle.
    """
    adj = oriented_adjacency(oriented)
    a_src = adj.select(F.col("v").alias(SRC), F.col("nbrs").alias("nbrs_src"))
    a_dst = adj.select(F.col("v").alias(DST), F.col("nbrs").alias("nbrs_dst"))
    return oriented.join(a_src, SRC).join(a_dst, DST)


def _count_sql(oriented: DataFrame) -> DataFrame:
    pairs = _edge_adjacency_pairs(oriented)
    return pairs.agg(
        F.coalesce(
            F.sum(F.size(F.array_intersect("nbrs_src", "nbrs_dst"))), F.lit(0)
        )
        .cast("long")
        .alias("triangles")
    )


def _oriented_triangles(oriented: DataFrame) -> DataFrame:
    """(a, b, c) triangle enumeration: edges(a,b) ⋈ edges(b,c) ⋈ edges(a,c)
    over the oriented DAG."""
    ab = oriented.select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
    bc = oriented.select(F.col(SRC).alias("b"), F.col(DST).alias("c"))
    ac = oriented.select(F.col(SRC).alias("a"), F.col(DST).alias("c"))
    return ab.join(bc, "b").join(ac, ["a", "c"])


def _count_join(oriented: DataFrame) -> DataFrame:
    return _oriented_triangles(oriented).agg(
        F.count(F.lit(1)).cast("long").alias("triangles")
    )


def _make_merge_kernel():
    """np.intersect1d over sorted unique neighbor arrays (merge-path).

    Defined as a closure so cloudpickle ships it BY VALUE — executors never
    need this package importable (works without --py-files in local mode;
    on a cluster, ship the zip anyway for the rest of the library).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        total = 0
        for pdf in batches:
            for a, b in zip(pdf["nbrs_src"].values, pdf["nbrs_dst"].values):
                total += np.intersect1d(a, b, assume_unique=True).size
        yield pd.DataFrame({"partial": [total]})

    return kernel


def _make_probe_kernel():
    """Binary-search probe of the smaller list into the larger
    (graph.c:322-351 incl. the smaller-side pick at 342-347)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        total = 0
        for pdf in batches:
            for a, b in zip(pdf["nbrs_src"].values, pdf["nbrs_dst"].values):
                small, big = (a, b) if len(a) <= len(b) else (b, a)
                if len(small) == 0:
                    continue
                idx = np.searchsorted(big, small)
                idx[idx == len(big)] = 0
                total += int((big[idx] == small).sum())
        yield pd.DataFrame({"partial": [total]})

    return kernel


_KERNELS = {"merge": _make_merge_kernel, "probe": _make_probe_kernel}


def _count_kernel(oriented: DataFrame, kernel: str) -> DataFrame:
    pairs = _edge_adjacency_pairs(oriented).select("nbrs_src", "nbrs_dst")
    partials = pairs.mapInPandas(_KERNELS[kernel](), schema=_KERNEL_SCHEMA)
    return partials.agg(
        F.coalesce(F.sum("partial"), F.lit(0)).cast("long").alias("triangles")
    )


class BroadcastCSRTriangles:
    """Broadcast-CSR triangle counter — build once, count many.

    The shuffle-free strategy for graphs whose oriented CSR fits in executor
    memory (8 B/edge CSR → ~10^8 edges in a GB; the planner's `auto` guards
    the cutover, the shuffle strategies remain the beyond-memory path).

    The shuffle strategies ship Σ deg² adjacency elements through two joins
    (measured 4.3 GB at RMAT-17). Here instead: ``build()`` collects the
    canonical edge list once, orients + builds the CSR vectorized in numpy
    (degree-orientation semantics of graph.c:207-274; hash-based factorize
    for sparse xxhash64 ids) and broadcasts it; ``count()`` fans the probe
    kernel out over STRIDED source slices via spark.range — zero shuffle,
    kernel cost scales with cores. The kernel is the reference's amortized
    bool-scatter hash intersection (scatter N+(v) once per source,
    tc.c:1232-1252; probe kernel graph.c:423-459), vectorized per row.

    The build/count split mirrors the reference's own benchmark protocol:
    main.c builds the CSR once and times each algorithm on the prebuilt
    graph with copy overhead subtracted (main.c:168-190).
    """

    def __init__(self, edges: DataFrame, assume_canonical: bool = False):
        import numpy as np

        self.spark = edges.sparkSession
        ce = edges.select(SRC, DST) if assume_canonical else canonical_edges(edges)
        pdf = ce.toPandas()
        s_raw = pdf["src"].to_numpy(dtype=np.int64)
        d_raw = pdf["dst"].to_numpy(dtype=np.int64)
        m_in = len(s_raw)
        s, d, verts = _compact_ids(np, s_raw, d_raw, m_in)
        n = len(verts)
        deg = np.bincount(s, minlength=n) + np.bincount(d, minlength=n)
        # orient by (degree, id): src -> smaller endpoint under that order
        fwd = (deg[s] < deg[d]) | ((deg[s] == deg[d]) & (s < d))
        os_ = np.where(fwd, s, d)
        od_ = np.where(fwd, d, s)
        # (src, dst) sort via one composite-int64 argsort (2x over lexsort)
        order = np.argsort(os_.astype(np.int64) << 32 | od_.astype(np.int64))
        os_, od_ = os_[order], od_[order]
        rowptr = np.zeros(n + 1, dtype=np.int64)
        rowptr[1:] = np.cumsum(np.bincount(os_, minlength=n))
        self.n = n
        self.m = m_in
        # ship CSR as mmap'd .npy files, not a pickled broadcast: one
        # page-cache copy per machine instead of one unpickled copy per
        # python worker (see plans/blocked.py measurement at RMAT-20)
        from ..plans.blocked import _ship_arrays

        self._files = _ship_arrays(self.spark, {"rowptr": rowptr, "colind": od_})

    def count(self) -> int:
        """Run the probe kernel over the prebuilt broadcast CSR."""
        files = self._files
        _k = max(self.spark.sparkContext.defaultParallelism * 4, 1)

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import numpy as np  # noqa: PLC0415
            from pyspark import SparkFiles  # noqa: PLC0415

            rp = np.asarray(np.load(SparkFiles.get(files["rowptr"]), mmap_mode="r"))
            ci = np.asarray(np.load(SparkFiles.get(files["colind"]), mmap_mode="r"))
            nn = len(rp) - 1
            mask = np.zeros(nn, dtype=bool)
            total = 0
            for b in batches:
                for sl in b["id"].to_numpy():
                    # STRIDED source assignment: contiguous slicing skews
                    # (front groups of a clique carry 6x average work);
                    # striding src ids balances power-law inputs. Group v's
                    # edge range IS its CSR row and its dst list IS its
                    # neighbor list — one scatter, |row| probe rows.
                    for v in range(int(sl), nn, _k):
                        lo, hi = rp[v], rp[v + 1]
                        if hi - lo < 2:
                            continue  # <2 out-edges close no triangle at v
                        nbrs = ci[lo:hi]
                        mask[nbrs] = True
                        lens = rp[nbrs + 1] - rp[nbrs]
                        tot = int(lens.sum())
                        if tot and tot <= 48 * len(nbrs):
                            starts = rp[nbrs]
                            offs = (
                                np.arange(tot, dtype=np.int64)
                                - np.repeat(np.cumsum(lens) - lens, lens)
                                + np.repeat(starts, lens)
                            )
                            total += int(np.count_nonzero(mask[ci[offs]]))
                        elif tot:
                            for dk in nbrs:
                                total += int(
                                    np.count_nonzero(mask[ci[rp[dk] : rp[dk + 1]]])
                                )
                        mask[nbrs] = False
            yield pd.DataFrame({"partial": [total]})

        slices = self.spark.range(0, _k, 1, numPartitions=_k)
        partials = slices.mapInPandas(kernel, schema=_KERNEL_SCHEMA)
        row = partials.agg(
            F.coalesce(F.sum("partial"), F.lit(0)).cast("long").alias("triangles")
        ).collect()[0]
        return int(row["triangles"])

    def unpersist(self) -> None:
        pass  # mmap'd files are cleaned with the Spark temp dirs


def _count_broadcast_csr(edges: DataFrame) -> DataFrame:
    counter = BroadcastCSRTriangles(edges, assume_canonical=True)
    t = counter.count()
    return edges.sparkSession.createDataFrame([(t,)], "triangles long")


def _count_level(edges: DataFrame) -> DataFrame:
    """BFS-level-partitioned counting — the reference's namesake tc_bader
    family (tc_bader, tc.c:1161-1196; compute-k planner input
    tc.c:1120-1159).

    Every triangle spans at most two adjacent BFS levels, so it has either
    exactly 1 horizontal edge (apex on the neighboring level) or 3 (all one
    level). Process ONLY horizontal edges: intersect the full adjacencies
    of the endpoints and split common neighbors x by level —
    c1 (level[x] != level, counts 1-horizontal triangles once) +
    c2/3 (level[x] == level, counts all-horizontal triangles thrice) =
    exact total. Demonstrates the statistic-driven alternative physical
    plan; the planner keeps it for high-k graphs (hybrid cutover k > 0.7,
    tc.c:1904).
    """
    from .adjacency import full_adjacency
    from .bfs import bfs_levels

    ce = edges  # caller passes canonical edges
    levels = bfs_levels(ce)
    lv = levels.select("v", "level")
    l_src = lv.select(F.col("v").alias(SRC), F.col("level").alias("level_src"))
    l_dst = lv.select(F.col("v").alias(DST), F.col("level").alias("level_dst"))
    horiz = (
        ce.join(l_src, SRC)
        .join(l_dst, DST)
        .where(F.col("level_src") == F.col("level_dst"))
        .select(SRC, DST, F.col("level_src").alias("lev"))
    )
    adj = full_adjacency(ce)
    a_src = adj.select(F.col("v").alias(SRC), F.col("nbrs").alias("nbrs_src"))
    a_dst = adj.select(F.col("v").alias(DST), F.col("nbrs").alias("nbrs_dst"))
    common = (
        horiz.join(a_src, SRC)
        .join(a_dst, DST)
        .select(
            "lev", F.explode(F.array_intersect("nbrs_src", "nbrs_dst")).alias("x")
        )
    )
    l_x = lv.select(F.col("v").alias("x"), F.col("level").alias("level_x"))
    counts = common.join(l_x, "x").agg(
        F.coalesce(
            F.sum(F.when(F.col("level_x") != F.col("lev"), 1).otherwise(0)), F.lit(0)
        ).alias("c1"),
        F.coalesce(
            F.sum(F.when(F.col("level_x") == F.col("lev"), 1).otherwise(0)), F.lit(0)
        ).alias("c2"),
    )
    return counts.select(
        (F.col("c1") + F.col("c2") / 3).cast("long").alias("triangles")
    )


def triangle_count_estimate(
    edges: DataFrame, p: float = 0.1, seed: int = 42
) -> DataFrame:
    """Unbiased sampled estimate: count triangles on a p-sampled edge set,
    scale by 1/p^3 (each triangle survives with probability p^3). The cheap
    first look at a 100 TB graph before committing to the exact count; the
    notebook's signature-sketch (ipynb cells 11-23) plays this role in the
    reference. Deterministic in (p, seed) — sampling by hash, not rand()."""
    ce = canonical_edges(edges)
    sampled = ce.where(
        (F.pmod(F.xxhash64(SRC, DST, F.lit(seed)), F.lit(1_000_000)) / 1_000_000.0)
        < p
    )
    t = triangle_count(sampled, "sql", assume_canonical=True).collect()[0]["triangles"]
    est = int(round(t / p**3))
    return edges.sparkSession.createDataFrame(
        [(est, int(t))], "triangles_estimate long, sampled_triangles long"
    )


STRATEGIES = ("sql", "join", "merge", "probe", "bcast", "level", "auto")


def triangle_count(
    edges: DataFrame, strategy: str = "auto", assume_canonical: bool = False
) -> DataFrame:
    """Exact global triangle count. Returns a 1-row DataFrame
    ``(triangles: long)``.

    Executes EAGERLY: the oriented edge table feeds three plan branches
    (edge list + both adjacency joins), so it is persisted for the run and
    unpersisted right after — the Spark analog of the reference holding one
    CSR in memory per query (main.c:168-172), without leaking cache across
    queries.

    ``auto`` mirrors the reference's statistic-driven hybrid planner
    (tc_bader_hybrid computes one cheap statistic then picks the physical
    algorithm, tc.c:1844-1911): count m; if the oriented CSR fits in
    executor memory (m ≤ 20M edges ≈ 330 MB CSR) take the shuffle-free
    broadcast kernel, else the codegen'd shuffle plan ("sql").
    """
    ce = edges if assume_canonical else canonical_edges(edges)
    if strategy == "auto":
        m = ce.count()
        strategy = "bcast" if m <= 20_000_000 else "sql"
    if strategy == "sql":
        fn = _count_sql
    elif strategy == "join":
        fn = _count_join
    elif strategy == "bcast":
        # orientation happens in-kernel (numpy); feed canonical edges
        count = _count_broadcast_csr(ce).collect()[0]["triangles"]
        return edges.sparkSession.createDataFrame([(int(count),)], "triangles long")
    elif strategy == "level":
        return _count_level(ce)
    elif strategy in _KERNELS:
        def fn(o, _k=strategy):
            return _count_kernel(o, _k)
    else:
        raise ValueError(f"unknown strategy {strategy!r}; one of {STRATEGIES}")
    oriented = orient_by_degree(ce).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        count = fn(oriented).collect()[0]["triangles"]
    finally:
        oriented.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame([(int(count),)], "triangles long")


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """(v, triangles) — number of triangles each vertex participates in.

    Uses the 3-join enumeration and credits all three corners; vertices in
    no triangle are absent (join with degrees to zero-fill if needed).
    """
    oriented = orient_by_degree(canonical_edges(edges))
    tri = _oriented_triangles(oriented)
    corners = (
        tri.select(F.col("a").alias("v"))
        .union(tri.select(F.col("b").alias("v")))
        .union(tri.select(F.col("c").alias("v")))
    )
    return corners.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("triangles"))


def wedge_count(edges: DataFrame) -> DataFrame:
    """Total wedges (paths of length 2) = Σ_v C(deg(v), 2) — the size of
    the search space the reference's tc_wedge walks (tc.c:52-86), and the
    denominator of global clustering coefficient."""
    deg = degrees(edges)
    return deg.agg(
        F.coalesce(F.sum(F.col("degree") * (F.col("degree") - 1) / 2), F.lit(0))
        .cast("long")
        .alias("wedges")
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Global clustering coefficient = 3·triangles / wedges."""
    t = triangle_count(edges).collect()[0]["triangles"]
    return wedge_count(edges).select(
        (F.lit(3 * t) / F.when(F.col("wedges") > 0, F.col("wedges")).otherwise(F.lit(1)))
        .alias("global_clustering")
    )
