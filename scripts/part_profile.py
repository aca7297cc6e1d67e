"""Profile the 'part' strategy vs 'bcast' at a given RMAT scale.

Usage: python scripts/part_profile.py [scale] [n_blocks ...]
Times each phase of the part plan (edge shuffle, adjacency replication,
kernel) by materializing intermediates, then the end-to-end cold counts.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    blocks = [int(x) for x in sys.argv[2:]] or [None]

    from triangle_counting_spark.operators.triangles import (
        _count_partitioned,
        triangle_count,
    )
    from triangle_counting_spark.operators.orientation import orient_by_degree
    from triangle_counting_spark.session import get_spark
    from triangle_counting_spark.sources.rmat import rmat_edges

    spark = get_spark("part-profile", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    edges = rmat_edges(spark, scale=scale, num_partitions=64).persist()
    m = edges.count()
    print(f"RMAT-{scale}: m={m}")

    t0 = time.time()
    tri = triangle_count(edges, "bcast", assume_canonical=True).collect()[0][
        "triangles"
    ]
    print(f"bcast cold: {time.time() - t0:.1f}s triangles={tri}")

    from pyspark.sql import functions as F
    from triangle_counting_spark.operators.adjacency import oriented_adjacency
    from triangle_counting_spark.operators.orientation import DST, SRC

    for nb in blocks:
        oriented = orient_by_degree(edges).persist()
        oriented.count()
        # phase breakdown (materialize each intermediate once)
        nb_eff = nb or 64
        t0 = time.time()
        adj = oriented_adjacency(oriented).persist()
        adj.count()
        t_adj = time.time() - t0
        e = oriented.select(
            F.pmod(F.xxhash64(SRC), F.lit(nb_eff)).cast("int").alias("pid"), SRC, DST
        )
        t0 = time.time()
        need = e.select(F.col("pid").alias("pid_r"), DST).distinct().persist()
        n_need = need.count()
        t_need = time.time() - t0
        t0 = time.time()
        rep = adj.join(need, adj["v"] == need[DST]).select("pid_r", "v", "nbrs")
        rep_rows = rep.count()
        rep_elems = rep.select(F.sum(F.size("nbrs"))).collect()[0][0]
        t_rep = time.time() - t0
        print(
            f"  phases nb={nb_eff}: adj={t_adj:.1f}s need={t_need:.1f}s"
            f" (rows={n_need}) rep={t_rep:.1f}s (rows={rep_rows},"
            f" elems={rep_elems})"
        )
        adj.unpersist(); need.unpersist()
        t0 = time.time()
        got = _count_partitioned(oriented, n_blocks=nb).collect()[0]["triangles"]
        dt = time.time() - t0
        print(f"part n_blocks={nb}: {dt:.1f}s triangles={got} match={got == tri}")
        oriented.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
