"""At-design-scale stress for SCC — the round-4 directed-graph operator.

Same protocol as newop_stress.py (seeded RMAT, fresh JVM per level,
generation excluded from timing): derive the deterministic md5-oriented
directed graph from RMAT-`scale` canonical edges (the same transform
`directed_cooccurrence_edges` applies to the co-occurrence pair stream,
inlined here because the input is already an edge list), run
strongly_connected_components, report wall seconds + directed-edges/sec
at one or two parallelism levels for the N-vs-4N efficiency line.

Usage: python scripts/scc_stress.py [rmat_scale=18] [cpus=32] [cpus2=0] [keep_pct=10]
Prints one JSON line per parallelism level.
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
from triangle_counting_spark.operators.scc import strongly_connected_components

cpus = {cpus}
spark = get_spark("scc-stress", master=f"local[{{cpus}}]", shuffle_partitions=2*cpus)
spark.sparkContext.setLogLevel("ERROR")
und = rmat_edges(spark, scale={scale}, num_partitions=64)
key = F.concat_ws(",", F.col("src"), F.col("dst"))
h_sample = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
h_orient = F.conv(F.substring(F.md5(key), 9, 8), 16, 10).cast("long")
de = (
    und.where(h_sample % 100 < {keep_pct})
    .select(
        F.when(h_orient % 2 == 0, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(h_orient % 2 == 0, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )
    .persist()
)
m = de.count()

t0 = time.time()
out = strongly_connected_components(de, tier="shuffle")
sizes = out.groupBy("scc_id").count()
n_scc = sizes.count()
giant = sizes.agg(F.max("count")).collect()[0][0]
t = time.time() - t0

t0 = time.time()
outb = strongly_connected_components(de, tier="blocked")
sizes_b = outb.groupBy("scc_id").count()
n_scc_b = sizes_b.count()
t_b = time.time() - t0
assert n_scc_b == n_scc, (n_scc_b, n_scc)

print(json.dumps({{
    "scale": {scale}, "cpus": cpus, "directed_m": m,
    "scc_sec": round(t, 1), "n_scc": n_scc, "giant_scc": int(giant),
    "edges_per_sec": int(m / t),
    "scc_blocked_sec": round(t_b, 1),
    "blocked_edges_per_sec": int(m / t_b),
}}))
spark.stop()
"""


def run(scale: int, cpus: int, keep_pct: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO, cpus=cpus, scale=scale,
                                             keep_pct=keep_pct)],
        capture_output=True, text=True, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    print(line, flush=True)
    return json.loads(line)


if __name__ == "__main__":
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus2 = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    keep_pct = int(sys.argv[4]) if len(sys.argv) > 4 else 10
    a = run(scale, cpus, keep_pct)
    if cpus2:
        b = run(scale, cpus2, keep_pct)
        lo, hi = (a, b) if a["cpus"] < b["cpus"] else (b, a)
        eff = (hi["edges_per_sec"] / lo["edges_per_sec"]) / (hi["cpus"] / lo["cpus"])
        print(json.dumps({"efficiency": round(eff, 3),
                          "from_cpus": lo["cpus"], "to_cpus": hi["cpus"]}))
