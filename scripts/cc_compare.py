"""Measure delta-frontier vs full-state CC at sf0.1 (VERDICT r2 #6).

Usage: python scripts/cc_compare.py [sf_dir] [repeats]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from triangle_counting_spark.operators.components import connected_components
    from triangle_counting_spark.session import get_spark
    from triangle_counting_spark.sources.edges import cooccurrence_edges

    spark = get_spark("cc-compare", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = cooccurrence_edges(lineitem, "l_orderkey", "l_partkey").persist()
    edges.count()
    spark.range(0, 32, 1, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    for use_delta in (True, False):
        runs = []
        ncomp = None
        for _ in range(repeats):
            t0 = time.time()
            r = connected_components(edges, use_delta=use_delta)
            ncomp = r.state.select("component").distinct().count()
            runs.append(round(time.time() - t0, 2))
        print(f"use_delta={use_delta}: runs={runs} min={min(runs)} ncomp={ncomp}")
    spark.stop()


if __name__ == "__main__":
    main()
