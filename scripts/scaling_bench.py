"""Two-parallelism scaling evidence (BASELINE.json north rule).

No multi-node cluster exists in this sandbox, so per the driver protocol
the N-vs-4N-executor criterion is evidenced by running the IDENTICAL job at
two local parallelism levels (local[8] vs local[32], shuffle partitions
scaled 2x cores) on the same input, reporting throughput at both and
efficiency = throughput_4N / (4 * throughput_N).

Input = seeded RMAT (deterministic in (scale, seed, partitions) — identical
across both processes; generation excluded from timing). Each parallelism
level runs in a fresh subprocess (JVM thread count is fixed at startup).

Usage: python scripts/scaling_bench.py [rmat_scale] [repeats]
Prints one JSON line + a markdown fragment for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from triangle_counting_spark.session import get_spark
from triangle_counting_spark.sources.rmat import rmat_edges
from triangle_counting_spark.operators.triangles import BroadcastCSRTriangles
from triangle_counting_spark.operators.pagerank import pagerank_blocked

cpus = {cpus}
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=2*cpus)
spark.sparkContext.setLogLevel("ERROR")
if {kind!r} == "files":
    # domain input: file co-occurrence graph with a mega-repo (the skew
    # fixture, FIXTURES.md par.6 shape) — intersection work dominates
    from triangle_counting_spark.sources.files import skew_fixture
    from triangle_counting_spark.sources.edges import file_cooccurrence_edges
    edges = file_cooccurrence_edges(skew_fixture(spark, mega_files={scale})).persist()
else:
    edges = rmat_edges(spark, scale={scale}, num_partitions=64).persist()
m = edges.count()
# build/count split mirrors the reference protocol (main.c:168-190): the
# CSR is built once, each algorithm run is timed on the prebuilt graph
t0 = time.time()
counter = BroadcastCSRTriangles(edges, assume_canonical=True)
build_sec = time.time() - t0
tri = counter.count()  # warmup (JIT)
tc_times = []
for _ in range({repeats}):
    t0 = time.time()
    tri = counter.count()
    tc_times.append(time.time() - t0)
t0 = time.time()
pagerank_blocked(edges, tol=-1.0, max_iter=10, assume_canonical=True).state.agg(F.sum("rank")).collect()
pr_sec = time.time() - t0
print(json.dumps({{"cpus": cpus, "edges": m, "triangles": int(tri),
                   "tc_sec": min(tc_times), "build_sec": build_sec, "pr_sec": pr_sec}}))
spark.stop()
"""


def run(cpus: int, scale: int, repeats: int, kind: str = "rmat") -> dict:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(repo=repo, cpus=cpus, scale=scale, repeats=repeats, kind=kind)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    base_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    kind = sys.argv[4] if len(sys.argv) > 4 else "rmat"
    n = run(base_cpus, scale, repeats, kind)
    n4 = run(4 * base_cpus, scale, repeats, kind)
    assert n["triangles"] == n4["triangles"], "determinism violated across runs"
    tput_n = n["edges"] / n["tc_sec"]
    tput_4n = n4["edges"] / n4["tc_sec"]
    eff_tc = tput_4n / (4 * tput_n)
    eff_pr = (n["pr_sec"] / n4["pr_sec"]) / 4
    result = {
        "input": f"{kind} scale {scale} (m={n['edges']})",
        "N": n,
        "4N": n4,
        "edges_per_sec_N": round(tput_n, 1),
        "edges_per_sec_4N": round(tput_4n, 1),
        "triangles_per_sec_N": round(n["triangles"] / n["tc_sec"], 1),
        "triangles_per_sec_4N": round(n4["triangles"] / n4["tc_sec"], 1),
        "scaling_efficiency_tc": round(eff_tc, 3),
        "scaling_efficiency_pagerank": round(eff_pr, 3),
    }
    print(json.dumps(result))
    print(f"""
| run | parallelism | input | edges/sec | triangles/sec | pagerank 10it (s) | efficiency (tc) |
|---|---|---|---|---|---|---|
| N | local[{base_cpus}] | {kind} {scale}, m={n['edges']:,} | {tput_n:,.0f} | {n['triangles']/n['tc_sec']:,.0f} | {n['pr_sec']:.1f} | — |
| 4N | local[{4*base_cpus}] | same | {tput_4n:,.0f} | {n4['triangles']/n4['tc_sec']:,.0f} | {n4['pr_sec']:.1f} | {eff_tc:.3f} |""")


if __name__ == "__main__":
    main()
