"""Per-round benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Protocol mirrors the reference's benchmarkTC (main.c:161-192): inputs are
materialized/cached first (the analog of copy-overhead subtraction), then
each operator is timed end-to-end including its output action.

Noise discipline (VERDICT r2 #10): this host shows ±50% wall-clock noise
under co-tenancy, so every query runs $SPARK_GRAFT_REPEATS times (default
3) and reports the MIN — the same protocol scripts/scaling_bench.py uses —
with the raw runs recorded under "runs" so round-over-round deltas are
attributable. Also reports edges/sec + triangles/sec throughput for the
flagship triangle count (BASELINE.json metric).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F

    from triangle_counting_spark.operators.components import connected_components
    from triangle_counting_spark.operators.labelprop import label_propagation_fixed
    from triangle_counting_spark.operators.pagerank import (
        pagerank_blocked,
        pagerank_fixed,
    )
    from triangle_counting_spark.operators.subgraphs import kcore_edges
    from triangle_counting_spark.operators.triangles import (
        triangle_count,
        triangle_count_delta,
        triangle_count_from_adjacency,
        write_oriented_adjacency,
    )
    from triangle_counting_spark.functions.dedup import ngram_jaccard_pairs
    from triangle_counting_spark.functions.similarity import brute_force_topk
    from triangle_counting_spark.session import get_spark
    from triangle_counting_spark.sources.edges import (
        cooccurrence_edges,
        cooccurrence_weighted_edges,
    )

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    times: dict[str, float] = {}
    runs: dict[str, list[float]] = {}

    def timed(name: str, fn, n: int | None = None) -> None:
        rs = []
        for _ in range(n if n is not None else repeats):
            t0 = time.time()
            fn()
            rs.append(round(time.time() - t0, 3))
        runs[name] = rs
        times[name] = min(rs)

    # warm up the Python worker pool + Arrow path once (the reference's
    # benchmark likewise excludes one-time setup: copy-overhead subtraction,
    # main.c:177-183); without this the first pandas-UDF query pays ~10 s of
    # worker spawn that belongs to the session, not the operator
    spark.range(0, cpus, 1, numPartitions=cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # edge derivation cannot reuse the persisted cache across repeats —
    # run it on its own, then persist the result all other queries share
    edges = None

    def derive():
        nonlocal edges
        if edges is not None:
            edges.unpersist()
        edges = cooccurrence_edges(lineitem, "l_orderkey", "l_partkey").persist()
        edges.count()

    timed("edge_derivation", derive)
    m = edges.count()
    n_vertices = (
        edges.select("src").union(edges.select(F.col("dst").alias("src"))).distinct().count()
    )

    from triangle_counting_spark.plans.planner import choose_triangle_strategy

    choice = choose_triangle_strategy(edges, assume_canonical=True)

    tri_box = {}

    def tc_auto():
        tri_box["t"] = triangle_count(edges, "auto", assume_canonical=True).collect()[
            0
        ]["triangles"]

    timed("triangle_count", tc_auto)
    triangles = tri_box["t"]
    tri_sec = times["triangle_count"]

    for strat in ("sql", "part", "merge", "probe", "join", "level"):
        timed(
            f"triangle_count_{strat}",
            lambda s=strat: triangle_count(edges, s, assume_canonical=True).collect(),
        )

    # suite-reuse path (VERDICT r2 #9): materialize the degree-oriented
    # adjacency ONCE as a bucketed table, then count from it — the repeated
    # -query plan every per-strategy call above cannot share
    t0 = time.time()
    write_oriented_adjacency(edges, "bench_adj", assume_canonical=True)
    adjacency_build_sec = round(time.time() - t0, 3)
    runs["adjacency_build"] = [adjacency_build_sec]
    times["adjacency_build"] = adjacency_build_sec
    timed(
        "triangle_count_prebuilt",
        lambda: triangle_count_from_adjacency(spark.table("bench_adj")).collect(),
    )

    timed("pagerank_10it", lambda: pagerank_fixed(edges, 10).agg(F.sum("rank")).collect())

    we = cooccurrence_weighted_edges(lineitem, "l_orderkey", "l_partkey").persist()
    we.count()
    timed(
        "pagerank_weighted_10it",
        lambda: pagerank_fixed(we, 10, weight_col="weight").agg(F.sum("rank")).collect(),
    )

    timed("kcore_80", lambda: kcore_edges(edges, 80).count())

    split = F.substring(F.md5(F.concat_ws(",", F.col("src"), F.col("dst"))), 1, 2)
    timed(
        "triangle_delta_15pct",
        lambda: triangle_count_delta(
            edges.where(split < "d9"), edges.where(split >= "d9")
        ).collect(),
    )

    timed(
        "pagerank_blocked_10it",
        lambda: pagerank_blocked(edges, tol=-1.0, max_iter=10, assume_canonical=True)
        .state.agg(F.sum("rank"))
        .collect(),
    )

    timed(
        "connected_components",
        lambda: connected_components(edges).state.groupBy("component").count().collect(),
    )

    timed(
        "label_propagation_3it",
        lambda: label_propagation_fixed(edges, 3).groupBy("label").count().collect(),
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed(
        "neardup_jaccard",
        lambda: ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.15).count(),
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed(
        "similarity_topk",
        lambda: brute_force_topk(emb, emb.where(F.col("vec_id") < 10), k=5).count(),
    )

    from triangle_counting_spark.functions.similarity import ivf_topk

    timed(
        "ivf_topk",
        lambda: ivf_topk(
            emb, emb.where(F.col("vec_id") < 10), k=5, n_centroids=16, n_probe=4
        ).count(),
    )

    from triangle_counting_spark.operators.bfs import bfs_levels

    root_box = {}

    def bfs_run():
        if "r" not in root_box:
            root_box["r"] = int(edges.agg(F.min("src")).collect()[0][0])
        bfs_levels(edges, roots=[root_box["r"]]).count()

    timed("bfs_levels", bfs_run)

    from triangle_counting_spark.operators.walks import random_walks

    timed(
        "random_walks_l8",
        lambda: random_walks(edges, length=8, walks_per_vertex=1).count(),
    )

    from triangle_counting_spark.functions.events import sessionize
    from triangle_counting_spark.functions.text import tf_idf

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    timed("sessions", lambda: sessionize(events).count())
    timed("tf_idf", lambda: tf_idf(docs, min_df=3).count())

    total = round(sum(times.values()), 3)
    out = {
        "metric": "graph+pipeline suite wall time (min-of-%d per query)" % repeats,
        "value": total,
        "unit": "sec",
        "queries": times,
        "runs": runs,
        "sf": sf,
        "edges": m,
        "vertices": n_vertices,
        "triangles": int(triangles),
        "edges_per_sec": round(m / tri_sec, 1) if tri_sec else None,
        "triangles_per_sec": round(triangles / tri_sec, 1) if tri_sec else None,
        "cpus": cpus,
        "repeats": repeats,
        # the statistic-driven plan choice behind "auto" (tc.c:1844-1911)
        "plan_choice": {"strategy": choice.strategy, "m": choice.m,
                        "k": choice.k, "reason": choice.reason},
    }
    spark.stop()
    # reference-parity TSV rows (main.c:186-189 format:
    # TC \t input \t n \t m \t name \t sec \t count) alongside the JSON line
    tsv = os.environ.get("SPARK_GRAFT_TSV", "/tmp/bench_results.tsv")
    n_verts = n_vertices
    with open(tsv, "a") as f:
        for name, sec in times.items():
            f.write(
                f"TC\t{sf_dir}\t{n_verts}\t{m}\t{name}\t{sec}\t{triangles}\t{cpus}\n"
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
