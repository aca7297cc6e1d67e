"""At-design-scale stress for the round-4 additions — coreness + HyperBall.

Same protocol as scaling_bench.py (seeded RMAT, fresh JVM, generation
excluded from timing): runs coreness (blocked tier — what auto picks at
this size) and hyperball(rounds) at RMAT-`scale` on local[cpus], reports
wall seconds and edges/sec throughput per operator, optionally at two
parallelism levels for the N-vs-4N efficiency line.

Usage: python scripts/newop_stress.py [rmat_scale=20] [cpus=32] [cpus2=0]
Prints one JSON line per parallelism level.
"""

from __future__ import annotations

import json
import subprocess
import sys
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from triangle_counting_spark.session import get_spark
from triangle_counting_spark.sources.rmat import rmat_edges
from triangle_counting_spark.operators.subgraphs import coreness_blocked
from triangle_counting_spark.operators.neighborhood import hyperball

cpus = {cpus}
spark = get_spark("newop-stress", master=f"local[{{cpus}}]", shuffle_partitions=2*cpus)
spark.sparkContext.setLogLevel("ERROR")
edges = rmat_edges(spark, scale={scale}, num_partitions=64).persist()
m = edges.count()

t0 = time.time()
r = coreness_blocked(edges)
kmax = int(r.state.agg(F.max("coreness")).collect()[0][0])
t_core = time.time() - t0

t0 = time.time()
hb = hyperball(edges, rounds=4, assume_canonical=True)
n_rows = hb.count()
t_hb = time.time() - t0

print(json.dumps({{
    "scale": {scale}, "cpus": cpus, "m": m,
    "coreness_sec": round(t_core, 1), "coreness_iters": r.iterations,
    "coreness_kmax": kmax,
    "coreness_edges_per_sec": int(m / t_core),
    "hyperball4_sec": round(t_hb, 1), "hyperball_vertices": n_rows,
    "hyperball_edges_per_sec": int(m / t_hb),
}}))
spark.stop()
"""


def run(scale: int, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO, cpus=cpus, scale=scale)],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus2 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    for c in [x for x in (cpus2, cpus) if x]:
        print(json.dumps(run(scale, c)))


if __name__ == "__main__":
    main()
