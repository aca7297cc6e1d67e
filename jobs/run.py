"""spark-submit entry point.

    spark-submit --py-files tcs.zip jobs/run.py --input <edges parquet | lineitem parquet> \
        --job triangles|pagerank|components|labelprop|kcore|ktruss|scc|bowtie|msf|hits|densest|all \
        [--checkpoint-dir DIR] [--run-id ID] [--k K] \
        [--weight-col COL] [--personalized-for v1,v2,...]

Builds the package zip with:  python -m zipfile -c tcs.zip triangle_counting_spark

On a cluster, session confs come from spark-submit (--master yarn/k8s,
executor counts); get_spark only fills in AQE/Arrow defaults. The N-vs-4N
scaling protocol is: submit the identical command with N and 4N executors
and compare the printed throughput lines.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# `python jobs/run.py` puts jobs/ first on sys.path; make the repo root
# importable too (spark-submit users ship the zip via --py-files instead)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet of (src,dst) edges, or lineitem")
    ap.add_argument("--derive", default=None, help="group_col,item_col to derive co-occurrence edges")
    ap.add_argument("--job", default="all")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--k", type=int, default=8, help="k for kcore/ktruss jobs")
    ap.add_argument("--weight-col", default=None, help="edge-weight column for pagerank/labelprop")
    ap.add_argument("--personalized-for", default=None,
                    help="comma-separated seed vertex ids for personalized PageRank")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from triangle_counting_spark.operators.components import connected_components
    from triangle_counting_spark.operators.labelprop import label_propagation
    from triangle_counting_spark.operators.pagerank import pagerank
    from triangle_counting_spark.operators.triangles import triangle_count
    from triangle_counting_spark.sources.edges import cooccurrence_edges

    spark = SparkSession.builder.appName("triangle-counting-spark").getOrCreate()
    df = spark.read.parquet(args.input)
    if args.derive:
        g, i = args.derive.split(",")
        if args.job == "msf":
            # MSF needs edge weights — derive the shared-group-count graph
            from triangle_counting_spark.sources.edges import (
                cooccurrence_weighted_edges,
            )

            edges = cooccurrence_weighted_edges(df, g, i)
        elif args.job in ("scc", "bowtie", "hits"):
            # directed analytics need a directed derivation — the canonical
            # src<dst edge list is a DAG (all SCCs trivially singletons)
            from triangle_counting_spark.sources.edges import (
                directed_cooccurrence_edges,
            )

            edges = directed_cooccurrence_edges(df, g, i)
        else:
            edges = cooccurrence_edges(df, g, i)
    else:
        edges = df
    edges = edges.persist()
    m = edges.count()
    out: dict = {"edges": m}

    if args.job in ("triangles", "all"):
        t0 = time.time()
        tri = triangle_count(edges, "auto").collect()[0]["triangles"]
        sec = time.time() - t0
        out["triangles"] = {"count": int(tri), "sec": sec, "edges_per_sec": m / sec}
    if args.job in ("pagerank", "all"):
        t0 = time.time()
        seeds = (
            [int(x) for x in args.personalized_for.split(",")]
            if args.personalized_for
            else None
        )
        r = pagerank(edges, tol=args.tol, checkpoint_dir=args.checkpoint_dir,
                     run_id=args.run_id, weight_col=args.weight_col,
                     personalized_for=seeds)
        r.state.count()
        out["pagerank"] = {"iterations": r.iterations, "converged": r.converged,
                          "sec": time.time() - t0}
    if args.job in ("kcore", "ktruss"):
        from triangle_counting_spark.operators.subgraphs import (
            kcore_edges,
            ktruss_edges,
        )

        fn = kcore_edges if args.job == "kcore" else ktruss_edges
        t0 = time.time()
        m_sub = fn(edges, args.k).count()
        out[args.job] = {"k": args.k, "edges": m_sub, "sec": time.time() - t0}
    if args.job in ("components", "all"):
        t0 = time.time()
        r = connected_components(edges, checkpoint_dir=args.checkpoint_dir, run_id=args.run_id)
        ncomp = r.state.select("component").distinct().count()
        out["components"] = {"n": ncomp, "iterations": r.iterations, "sec": time.time() - t0}
    if args.job == "distances":
        from triangle_counting_spark.operators.distances import distance_stats

        t0 = time.time()
        row = distance_stats(edges, n_roots=args.k).collect()[0]
        out["distances"] = {**row.asDict(), "sec": time.time() - t0}
    if args.job == "linkpred":
        from triangle_counting_spark.operators.linkpred import link_prediction

        t0 = time.time()
        n_pairs = link_prediction(edges, min_common=args.k).count()
        out["linkpred"] = {"min_common": args.k, "pairs": n_pairs,
                          "sec": time.time() - t0}
    if args.job == "walks":
        from triangle_counting_spark.operators.walks import (
            random_walks,
            walk_skipgram_pairs,
        )

        t0 = time.time()
        walks = random_walks(edges, length=args.k)
        pairs = walk_skipgram_pairs(walks).count()
        out["walks"] = {"length": args.k, "skipgram_pairs": pairs,
                        "sec": time.time() - t0}
    if args.job == "scc":
        from triangle_counting_spark.operators.scc import (
            strongly_connected_components,
        )

        t0 = time.time()
        sizes = strongly_connected_components(edges).groupBy("scc_id").count()
        n_scc = sizes.count()
        out["scc"] = {"n_scc": n_scc, "sec": time.time() - t0,
                      "edges_per_sec": m / (time.time() - t0)}
    if args.job == "hits":
        from triangle_counting_spark.operators.hits import hits

        t0 = time.time()
        r = hits(edges, tol=args.tol, checkpoint_dir=args.checkpoint_dir,
                 run_id=args.run_id)
        r.state.count()
        out["hits"] = {"iterations": r.iterations, "converged": r.converged,
                       "sec": time.time() - t0}
    if args.job == "densest":
        from triangle_counting_spark.operators.densest import densest_subgraph

        t0 = time.time()
        rows = densest_subgraph(edges)
        n_sub = rows.count()
        rho = rows.select("density").first()["density"] if n_sub else 0.0
        out["densest"] = {"vertices": n_sub, "density": rho,
                          "sec": time.time() - t0}
    if args.job == "bowtie":
        from triangle_counting_spark.operators.bowtie import bowtie_decomposition

        t0 = time.time()
        regions = {
            r["region"]: r["count"]
            for r in bowtie_decomposition(edges).groupBy("region").count().collect()
        }
        out["bowtie"] = {"regions": regions, "sec": time.time() - t0}
    if args.job == "msf":
        from triangle_counting_spark.operators.msf import minimum_spanning_forest

        t0 = time.time()
        wcol = args.weight_col or "weight"
        forest = minimum_spanning_forest(edges, weight_col=wcol)
        n_forest = forest.count()
        out["msf"] = {"forest_edges": n_forest, "sec": time.time() - t0}
    if args.job in ("labelprop", "all"):
        t0 = time.time()
        r = label_propagation(edges, checkpoint_dir=args.checkpoint_dir,
                              run_id=args.run_id, weight_col=args.weight_col)
        out["labelprop"] = {"iterations": r.iterations, "sec": time.time() - t0}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
