"""Isolate the 'part' plan's machinery cost from its kernel cost.

Runs the exact _count_partitioned plan twice at a given RMAT scale:
once with the real kernel, once with a kernel that returns immediately
after receiving the Arrow tables (so shuffle + cogroup sort + Arrow
conversion are paid, compute is not).

Usage: python scripts/part_machinery.py [scale] [n_blocks]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import pyarrow as pa
    from pyspark.sql import functions as F

    from triangle_counting_spark.operators.adjacency import oriented_adjacency
    from triangle_counting_spark.operators.orientation import (
        DST,
        SRC,
        orient_by_degree,
    )
    from triangle_counting_spark.operators.triangles import (
        _KERNEL_SCHEMA,
        _count_partitioned,
    )
    from triangle_counting_spark.session import get_spark
    from triangle_counting_spark.sources.rmat import rmat_edges

    spark = get_spark("part-machinery", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    edges = rmat_edges(spark, scale=scale, num_partitions=64).persist()
    m = edges.count()
    oriented = orient_by_degree(edges).persist()
    oriented.count()
    print(f"RMAT-{scale}: m={m} nb={nb}")

    def build(kernel):
        e = oriented.select(
            F.pmod(F.xxhash64(SRC), F.lit(nb)).cast("int").alias("pid"), SRC, DST
        )
        adj = oriented_adjacency(oriented)
        need = e.select(F.col("pid").alias("pid_r"), DST).distinct()
        adj_rep = adj.join(need, adj["v"] == need[DST]).select("pid_r", "v", "nbrs")
        return (
            e.groupBy("pid")
            .cogroup(adj_rep.groupBy("pid_r"))
            .applyInArrow(kernel, schema=_KERNEL_SCHEMA)
            .agg(F.coalesce(F.sum("partial"), F.lit(0)).alias("triangles"))
        )

    def noop_kernel(edges_t, adj_t):
        import pyarrow as pa

        n = edges_t.num_rows + adj_t.num_rows  # force both tables received
        return pa.table({"partial": pa.array([n], type=pa.int64())})

    def touch_kernel(edges_t, adj_t):
        """Additionally flatten the adjacency (the kernel's first real op)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        tot = 0
        if adj_t.num_rows:
            acat = pc.list_flatten(adj_t.column("nbrs"))
            tot = int(len(acat))
        return pa.table({"partial": pa.array([tot], type=pa.int64())})

    for name, kern in (("noop", noop_kernel), ("flatten", touch_kernel)):
        t0 = time.time()
        build(kern).collect()
        print(f"machinery[{name}]: {time.time() - t0:.1f}s")

    t0 = time.time()
    got = _count_partitioned(oriented, n_blocks=nb).collect()[0]["triangles"]
    print(f"full part: {time.time() - t0:.1f}s triangles={got}")
    spark.stop()


if __name__ == "__main__":
    main()
