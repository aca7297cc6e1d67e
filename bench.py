"""Per-round benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints EXACTLY ONE stdout line — the compact
JSON summary:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
Raw per-repeat runs and plan details go to a sidecar file
($SPARK_GRAFT_RUNS, default bench_runs_latest.json) so the summary line
stays within the driver's tail capture (VERDICT r3 #2: the r3 line
embedded "runs" and outgrew it, leaving the round bench unparsed).

Protocol mirrors the reference's benchmarkTC (main.c:161-192): inputs are
materialized/cached first (the analog of copy-overhead subtraction), then
each operator is timed end-to-end including its output action.

Noise discipline (VERDICT r2 #10 + r3 #4): this host shows ±50%
wall-clock noise under co-tenancy. Repeats are INTERLEAVED — the whole
suite runs $SPARK_GRAFT_REPEATS times in round-robin passes, so a noisy
co-tenant window degrades every query's pass equally instead of one
query's entire sample (r3's per-query consecutive repeats let one bad
window brand single queries "regressed"). Reported time = min over
passes; raw passes live in the sidecar for attribution.
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
    runs_path = os.environ.get("SPARK_GRAFT_RUNS", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_runs_latest.json"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F

    from triangle_counting_spark.operators.components import connected_components
    from triangle_counting_spark.operators.labelprop import label_propagation_fixed
    from triangle_counting_spark.operators.pagerank import (
        pagerank_blocked,
        pagerank_fixed,
    )
    from triangle_counting_spark.operators.subgraphs import (
        coreness_blocked,
        kcore_edges,
    )
    from triangle_counting_spark.operators.triangles import (
        triangle_count,
        triangle_count_delta,
        triangle_count_from_adjacency,
        write_oriented_adjacency,
    )
    from triangle_counting_spark.functions.dedup import ngram_jaccard_pairs
    from triangle_counting_spark.functions.similarity import brute_force_topk, ivf_topk
    from triangle_counting_spark.operators.bfs import bfs_levels
    from triangle_counting_spark.operators.densest import densest_subgraph
    from triangle_counting_spark.operators.louvain import louvain
    from triangle_counting_spark.operators.mis import maximal_independent_set
    from triangle_counting_spark.operators.stats import degree_panel
    from triangle_counting_spark.operators.triangles import (
        four_clique_count,
        four_cycle_count,
        local_clustering,
    )
    from triangle_counting_spark.operators.walks import random_walks
    from triangle_counting_spark.functions.events import sessionize
    from triangle_counting_spark.functions.profile import profile_table
    from triangle_counting_spark.functions.text import chunk_documents, tf_idf
    from triangle_counting_spark.session import get_spark
    from triangle_counting_spark.sources.edges import (
        cooccurrence_edges,
        cooccurrence_weighted_edges,
    )

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    # warm up the Python worker pool + Arrow path once (the reference's
    # benchmark likewise excludes one-time setup: copy-overhead subtraction,
    # main.c:177-183); without this the first pandas-UDF query pays ~10 s of
    # worker spawn that belongs to the session, not the operator
    spark.range(0, cpus, 1, numPartitions=cpus).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # shared state across the suite; re-derived each pass by edge_derivation
    state: dict = {"edges": None, "we": None}

    def derive():
        if state["edges"] is not None:
            state["edges"].unpersist()
        state["edges"] = cooccurrence_edges(
            lineitem, "l_orderkey", "l_partkey"
        ).persist()
        state["edges"].count()

    tri_box: dict = {}

    def tc_auto():
        tri_box["t"] = triangle_count(
            state["edges"], "auto", assume_canonical=True
        ).collect()[0]["triangles"]

    def weighted_pr():
        if state["we"] is None:
            state["we"] = cooccurrence_weighted_edges(
                lineitem, "l_orderkey", "l_partkey"
            ).persist()
            state["we"].count()
        pagerank_fixed(state["we"], 10, weight_col="weight").agg(
            F.sum("rank")
        ).collect()

    def delta_split():
        e = state["edges"]
        split = F.substring(F.md5(F.concat_ws(",", F.col("src"), F.col("dst"))), 1, 2)
        triangle_count_delta(e.where(split < "d9"), e.where(split >= "d9")).collect()

    def scc_run():
        from triangle_counting_spark.operators.scc import (
            strongly_connected_components,
        )
        from triangle_counting_spark.sources.edges import (
            directed_cooccurrence_edges,
        )

        de = directed_cooccurrence_edges(lineitem, "l_orderkey", "l_partkey")
        strongly_connected_components(de).groupBy("scc_id").count().count()

    def hits_run():
        from triangle_counting_spark.operators.hits import hits_fixed
        from triangle_counting_spark.sources.edges import (
            directed_cooccurrence_edges,
        )

        de = directed_cooccurrence_edges(lineitem, "l_orderkey", "l_partkey")
        hits_fixed(de, 10, tier="shuffle").agg(
            F.sum("hub"), F.sum("auth")
        ).collect()

    root_box: dict = {}

    def bfs_run():
        if "r" not in root_box:
            root_box["r"] = int(state["edges"].agg(F.min("src")).collect()[0][0])
        bfs_levels(state["edges"], roots=[root_box["r"]]).count()

    # ordered suite; every thunk reads state["edges"] so passes stay honest
    suite: list[tuple[str, object]] = [
        ("edge_derivation", derive),
        ("triangle_count", tc_auto),
        ("triangle_count_sql",
         lambda: triangle_count(state["edges"], "sql", assume_canonical=True).collect()),
        ("triangle_count_part",
         lambda: triangle_count(state["edges"], "part", assume_canonical=True).collect()),
        ("triangle_count_merge",
         lambda: triangle_count(state["edges"], "merge", assume_canonical=True).collect()),
        ("triangle_count_probe",
         lambda: triangle_count(state["edges"], "probe", assume_canonical=True).collect()),
        ("triangle_count_join",
         lambda: triangle_count(state["edges"], "join", assume_canonical=True).collect()),
        ("triangle_count_level",
         lambda: triangle_count(state["edges"], "level", assume_canonical=True).collect()),
        ("pagerank_10it",
         lambda: pagerank_fixed(state["edges"], 10).agg(F.sum("rank")).collect()),
        ("pagerank_weighted_10it", weighted_pr),
        ("kcore_80", lambda: kcore_edges(state["edges"], 80).count()),
        ("coreness",
         lambda: coreness_blocked(state["edges"])
         .state.agg(F.max("coreness")).collect()),
        ("triangle_delta_15pct", delta_split),
        ("pagerank_blocked_10it",
         lambda: pagerank_blocked(
             state["edges"], tol=-1.0, max_iter=10, assume_canonical=True
         ).state.agg(F.sum("rank")).collect()),
        ("connected_components",
         lambda: connected_components(state["edges"])
         .state.groupBy("component").count().collect()),
        ("label_propagation_3it",
         lambda: label_propagation_fixed(state["edges"], 3)
         .groupBy("label").count().collect()),
        ("neardup_jaccard",
         lambda: ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.15).count()),
        ("similarity_topk",
         lambda: brute_force_topk(emb, emb.where(F.col("vec_id") < 10), k=5).count()),
        ("ivf_topk",
         lambda: ivf_topk(emb, emb.where(F.col("vec_id") < 10), k=5,
                          n_centroids=16, n_probe=4).count()),
        ("bfs_levels", bfs_run),
        ("random_walks_l8",
         lambda: random_walks(state["edges"], length=8, walks_per_vertex=1).count()),
        ("sessions", lambda: sessionize(events).count()),
        ("tf_idf", lambda: tf_idf(docs, min_df=3).count()),
        ("scc", scc_run),
        ("hits_10it", hits_run),
        ("louvain",
         lambda: louvain(state["edges"]).groupBy("community").count().count()),
        ("densest_subgraph",
         lambda: densest_subgraph(state["edges"]).count()),
        ("local_clustering",
         lambda: local_clustering(state["edges"]).count()),
        ("four_cycles",
         lambda: four_cycle_count(state["edges"]).collect()),
        ("four_cliques",
         lambda: four_clique_count(state["edges"]).collect()),
        ("mis",
         lambda: maximal_independent_set(state["edges"])
         .where(F.col("in_mis")).count()),
        ("degree_panel", lambda: degree_panel(state["edges"]).collect()),
        ("doc_chunks",
         lambda: chunk_documents(docs, chunk_tokens=32, overlap=8).count()),
        ("table_profile", lambda: profile_table(docs).collect()),
    ]

    runs: dict[str, list[float]] = {name: [] for name, _ in suite}
    for _pass in range(repeats):
        for name, fn in suite:
            t0 = time.time()
            fn()
            runs[name].append(round(time.time() - t0, 3))
    times = {name: min(rs) for name, rs in runs.items()}

    edges = state["edges"]
    m = edges.count()
    n_vertices = (
        edges.select("src").union(edges.select(F.col("dst").alias("src")))
        .distinct().count()
    )

    from triangle_counting_spark.plans.planner import choose_triangle_strategy

    choice = choose_triangle_strategy(edges, assume_canonical=True)

    # suite-reuse path (VERDICT r2 #9): materialize the degree-oriented
    # adjacency ONCE as a bucketed table, then count from it — the repeated
    # -query plan every per-strategy call above cannot share. Once, not per
    # pass: the build is idempotent-overwrite and the point is amortization.
    t0 = time.time()
    write_oriented_adjacency(edges, "bench_adj", assume_canonical=True)
    runs["adjacency_build"] = [round(time.time() - t0, 3)]
    times["adjacency_build"] = runs["adjacency_build"][0]
    for _ in range(repeats):
        t0 = time.time()
        triangle_count_from_adjacency(spark.table("bench_adj")).collect()
        runs.setdefault("triangle_count_prebuilt", []).append(
            round(time.time() - t0, 3)
        )
    times["triangle_count_prebuilt"] = min(runs["triangle_count_prebuilt"])

    triangles = tri_box["t"]
    tri_sec = times["triangle_count"]
    total = round(sum(times.values()), 3)
    summary = {
        "metric": "graph+pipeline suite wall time (min over %d interleaved passes)"
        % repeats,
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "edges": m,
        "vertices": n_vertices,
        "triangles": int(triangles),
        "edges_per_sec": round(m / tri_sec, 1) if tri_sec else None,
        "triangles_per_sec": round(triangles / tri_sec, 1) if tri_sec else None,
        "cpus": cpus,
        "repeats": repeats,
    }
    sidecar = dict(summary)
    sidecar["runs"] = runs
    # the statistic-driven plan choice behind "auto" (tc.c:1844-1911)
    sidecar["plan_choice"] = {"strategy": choice.strategy, "m": choice.m,
                              "k": choice.k, "reason": choice.reason}
    spark.stop()

    with open(runs_path, "w") as f:
        json.dump(sidecar, f, indent=1)
    # reference-parity TSV rows (main.c:186-189 format:
    # TC \t input \t n \t m \t name \t sec \t count) alongside the JSON line
    tsv = os.environ.get("SPARK_GRAFT_TSV", "/tmp/bench_results.tsv")
    with open(tsv, "a") as f:
        for name, sec in times.items():
            f.write(
                f"TC\t{sf_dir}\t{n_vertices}\t{m}\t{name}\t{sec}\t{triangles}\t{cpus}\n"
            )
    print(f"raw runs -> {runs_path}", file=sys.stderr)
    # the ONE stdout line (driver tail-capture contract)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
