"""At-design-scale stress + N-vs-4N scaling legs for HITS.

Same protocol as scaling_bench.py / newop_stress.py: seeded RMAT, fresh
JVM per leg, generation excluded from timing. The RMAT edge list is used
DIRECTED as generated (src→dst), the natural hub/authority shape. Runs
hits_fixed(10, tier="shuffle") — per-iteration plan is two edge joins +
two hash aggs + two scalar L2 norms, i.e. PageRank's per-round shape ×2
— and the blocked tier once at the top parallelism for the tier-gap
line.

Usage: python scripts/hits_stress.py [rmat_scale=18] [cpus...=2 8 32]
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
from pyspark.sql import functions as F
from triangle_counting_spark.session import get_spark
from triangle_counting_spark.sources.rmat import rmat_edges
from triangle_counting_spark.operators.hits import hits_fixed, hits_blocked

cpus = {cpus}
spark = get_spark("hits-stress", master=f"local[{{cpus}}]", shuffle_partitions=2*cpus)
spark.sparkContext.setLogLevel("ERROR")
edges = rmat_edges(spark, scale={scale}, num_partitions=64).persist()
m = edges.count()

t0 = time.time()
s = hits_fixed(edges, 10, tier="shuffle")
sums = s.agg(F.sum("hub").alias("h"), F.sum("auth").alias("a")).collect()[0]
t_shuf = time.time() - t0

t_blk = None
if {run_blocked}:
    t0 = time.time()
    b = hits_blocked(edges, 10)
    b.agg(F.sum("hub")).collect()
    t_blk = round(time.time() - t0, 1)

print(json.dumps({{
    "scale": {scale}, "cpus": cpus, "m": m,
    "hits10_shuffle_sec": round(t_shuf, 1),
    "hits10_edges_per_sec": int(10 * m / t_shuf),
    "sum_hub": round(float(sums["h"]), 6), "sum_auth": round(float(sums["a"]), 6),
    "hits10_blocked_sec": t_blk,
}}))
spark.stop()
"""


def run(scale: int, cpus: int, run_blocked: bool) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(
            repo=REPO, cpus=cpus, scale=scale,
            run_blocked="True" if run_blocked else "False")],
        capture_output=True, text=True, check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    print(json.dumps(rec))
    return rec


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    cpus_list = [int(x) for x in sys.argv[2:]] or [2, 8, 32]
    recs = [
        run(scale, c, run_blocked=(c == max(cpus_list))) for c in cpus_list
    ]
    if len(recs) >= 2:
        a, b = recs[0], recs[1]
        ratio = b["cpus"] / a["cpus"]
        speedup = b["hits10_edges_per_sec"] / a["hits10_edges_per_sec"]
        print(json.dumps({
            "efficiency": round(speedup / ratio, 3),
            "from_cpus": a["cpus"], "to_cpus": b["cpus"],
            "speedup": round(speedup, 2),
        }))


if __name__ == "__main__":
    main()
