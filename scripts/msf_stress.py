"""At-design-scale stress for Borůvka MSF (round 4).

Seeded RMAT canonical edges + deterministic md5 weights (generation
excluded from timing), fresh JVM per level; reports wall seconds,
edges/sec, Borůvka outer rounds implied by forest size, at one or two
parallelism levels.

Usage: python scripts/msf_stress.py [rmat_scale=16] [cpus=32] [cpus2=0]
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
from pyspark.sql import functions as F
from triangle_counting_spark.session import get_spark
from triangle_counting_spark.sources.rmat import rmat_edges
from triangle_counting_spark.operators.msf import minimum_spanning_forest

cpus = {cpus}
spark = get_spark("msf-stress", master=f"local[{{cpus}}]", shuffle_partitions=2*cpus)
spark.sparkContext.setLogLevel("ERROR")
e = rmat_edges(spark, scale={scale}, num_partitions=64)
we = e.select(
    "src", "dst",
    (F.conv(F.substring(F.md5(F.concat_ws(",", "src", "dst")), 1, 8), 16, 10)
     .cast("long") % 1000 + 1).cast("double").alias("weight"),
).persist()
m = we.count()

t0 = time.time()
forest = minimum_spanning_forest(we, tier="shuffle")
n_forest = forest.count()
total_w = forest.agg(F.sum("weight")).collect()[0][0]
t = time.time() - t0

t0 = time.time()
fb = minimum_spanning_forest(we, tier="blocked")
n_b = fb.count()
w_b = fb.agg(F.sum("weight")).collect()[0][0]
t_b = time.time() - t0
assert (n_b, w_b) == (n_forest, total_w), ((n_b, w_b), (n_forest, total_w))

print(json.dumps({{
    "scale": {scale}, "cpus": cpus, "m": m,
    "msf_sec": round(t, 1), "forest_edges": n_forest,
    "total_weight": total_w,
    "edges_per_sec": int(m / t),
    "msf_blocked_sec": round(t_b, 1),
    "blocked_edges_per_sec": int(m / t_b),
}}))
spark.stop()
"""


def run(scale: int, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO, cpus=cpus, scale=scale)],
        capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    print(line, flush=True)
    return json.loads(line)


if __name__ == "__main__":
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus2 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    a = run(scale, cpus)
    if cpus2:
        b = run(scale, cpus2)
        lo, hi = (a, b) if a["cpus"] < b["cpus"] else (b, a)
        eff = (hi["edges_per_sec"] / lo["edges_per_sec"]) / (hi["cpus"] / lo["cpus"])
        print(json.dumps({"efficiency": round(eff, 3),
                          "from_cpus": lo["cpus"], "to_cpus": hi["cpus"]}))
