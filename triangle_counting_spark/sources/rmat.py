"""Seeded R-MAT generator — deterministic synthetic power-law graphs.

Parameters mirror the reference generator (graph.c:88-144, main.c:11-12):
n = 2^scale vertices, m = edge_factor·n undirected edges, quadrant
probabilities a=0.57 b=0.19 c=0.19 d=0.05, self-loops and duplicates
rejected. The reference uses libc rand() (graph.c:107); we use
numpy default_rng seeded per partition → deterministic AND distributed
(the bit-sampling runs vectorized inside mapInPandas, one numpy matrix per
partition — no per-row Python).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.orientation import canonical_edges

A, B, C = 0.57, 0.19, 0.19  # d = 0.05 (graph.c:109)
EDGE_FACTOR = 16  # main.c:12


def _make_sampler(scale: int, per_part: int, seed: int, round_no: int):
    def sample(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            for pid in pdf["id"].values:
                rng = np.random.default_rng((seed, int(pid), round_no))
                u = rng.random((per_part, scale))
                src_bit = (u >= A + B).astype(np.int64)
                dst_bit = ((u >= A) & (u < A + B) | (u >= A + B + C)).astype(np.int64)
                pow2 = (1 << np.arange(scale, dtype=np.int64))[::-1]
                yield pd.DataFrame(
                    {"src": src_bit @ pow2, "dst": dst_bit @ pow2}
                )

    return sample


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edge_factor: int = EDGE_FACTOR,
    seed: int = 42,
    num_partitions: int = 8,
) -> DataFrame:
    """Exactly m = edge_factor·2^scale canonical undirected edges
    (src < dst, distinct, no self-loops) — deterministic in
    (scale, edge_factor, seed, num_partitions).

    Over-samples by 30% per round, canonicalizes, and tops up with further
    seeded rounds until ≥ m distinct edges exist, then takes the first m in
    (src, dst) order — a deterministic set regardless of partitioning.

    The first-m selection is DISTRIBUTED: (src, dst) packs into one unique
    int64 key, a bucket histogram on the key's high bits locates the
    bucket holding the m-th smallest, only that one bucket's keys come to
    the driver for the exact cutoff, and the final pick is a plain filter.
    (The old ``orderBy().limit(m)`` funneled every edge through ONE task —
    a single-task sort that OOM'd the default heap at RMAT-21.)
    """
    if scale > 31:
        raise ValueError("rmat_edges packs (src, dst) into int64: scale <= 31")
    n = 1 << scale
    m = edge_factor * n
    key = (F.col("src") * F.lit(n) + F.col("dst")).alias("k")
    collected: DataFrame | None = None
    for round_no in range(20):
        per_part = math.ceil(m * 1.3 / num_partitions)
        sampler = _make_sampler(scale, per_part, seed, round_no)
        batch = (
            spark.range(num_partitions)
            .repartition(num_partitions, "id")
            .mapInPandas(sampler, schema="src long, dst long")
        )
        collected = batch if collected is None else collected.union(batch)
        ce = canonical_edges(collected)
        cnt = ce.count()
        if cnt == m:
            return ce
        if cnt > m:
            shift = max(2 * scale - 20, 0)  # ~2^20 buckets
            hist = sorted(
                (r["b"], r["c"])
                for r in ce.groupBy(
                    F.shiftright(key, shift).alias("b")
                ).agg(F.count(F.lit(1)).alias("c")).collect()
            )
            before = 0
            for b, c in hist:
                if before + c >= m:
                    break
                before += c
            import numpy as np

            bucket = np.sort(
                np.array(
                    [
                        r["k"]
                        for r in ce.select(key)
                        .where(F.shiftright(key, shift) == b)
                        .collect()
                    ],
                    dtype=np.int64,
                )
            )
            cutoff = int(bucket[m - before - 1])  # keys unique: no tie split
            return ce.where(key <= cutoff)
        collected = ce  # keep the dedup work
    raise RuntimeError(f"RMAT could not reach {m} distinct edges (got {cnt})")
