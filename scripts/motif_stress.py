"""At-design-scale stress + N-vs-4N scaling legs for the motif panel.

Same protocol as scaling_bench.py / newop_stress.py (seeded RMAT, fresh
JVM per leg, generation excluded from timing): runs four_clique_count
(triangle-stream self-join + edge probe) and four_cycle_count (wedge-pair
join + integer identity) at RMAT-`scale` on each parallelism level and
reports wall seconds, edges/sec, and the N-vs-4N efficiency.

Usage: python scripts/motif_stress.py [rmat_scale=18] [cpus...=2 8]
Prints one JSON line per parallelism level plus a final efficiency line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from triangle_counting_spark.session import get_spark
from triangle_counting_spark.sources.rmat import rmat_edges
from triangle_counting_spark.operators.triangles import (
    four_clique_count, four_cycle_count)

cpus = {cpus}
spark = get_spark("motif-stress", master=f"local[{{cpus}}]",
                  shuffle_partitions=2*cpus)
spark.sparkContext.setLogLevel("ERROR")
edges = rmat_edges(spark, scale={scale}, num_partitions=64).persist()
m = edges.count()

t0 = time.time()
k4 = int(four_clique_count(edges).collect()[0]["four_cliques"])
t_k4 = time.time() - t0

t0 = time.time()
c4 = int(four_cycle_count(edges).collect()[0]["four_cycles"])
t_c4 = time.time() - t0

print(json.dumps({{
    "scale": {scale}, "cpus": cpus, "m": m,
    "four_cliques": k4, "four_cliques_sec": round(t_k4, 1),
    "four_cliques_edges_per_sec": int(m / t_k4),
    "four_cycles": c4, "four_cycles_sec": round(t_c4, 1),
    "four_cycles_edges_per_sec": int(m / t_c4),
}}))
spark.stop()
"""


def run(scale: int, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO, cpus=cpus, scale=scale)],
        capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    print(line, flush=True)
    return rec


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    cpus_list = [int(c) for c in sys.argv[2:]] or [2, 8]
    recs = [run(scale, c) for c in cpus_list]
    if len(recs) >= 2:
        a, b = recs[0], recs[-1]
        ratio = b["cpus"] / a["cpus"]
        for op in ("four_cliques", "four_cycles"):
            speedup = a[f"{op}_sec"] / b[f"{op}_sec"]
            print(json.dumps({
                "op": op, "scale": scale,
                "cpus": [a["cpus"], b["cpus"]],
                "speedup": round(speedup, 2),
                "efficiency": round(speedup / ratio, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
