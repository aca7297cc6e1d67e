"""Round-5 measurement legs, run serially on a quiet box.

1. north-rule scaling evidence: RMAT-20 triangle+pagerank at local[2] vs
   local[8] (delegates to scaling_bench.py, fresh JVM per leg)
2. skew-fixture scaling evidence (files kind, same protocol as r4)
3. blocked-louvain timing at RMAT-16 (VERDICT r4 #3 done-criterion:
   record the post-vectorization number)
4. embedding near-dup grid-vs-blocked at a size where both run but the
   broadcast matrix is already tens of MB (the crossover demo)

Each leg is a fresh subprocess so JVM thread pools are sized per leg and
no state leaks. Prints one JSON line per leg, then a combined JSON.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LOUVAIN_WORKER = r"""
import json, sys, time
sys.path.insert(0, %(repo)r)
from triangle_counting_spark.session import get_spark
from triangle_counting_spark.sources.rmat import rmat_edges
from triangle_counting_spark.operators.louvain import louvain
spark = get_spark("r5-louvain", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
edges = rmat_edges(spark, scale=16, num_partitions=32).persist()
m = edges.count()
out = {"m": m}
# blocked tier only: the shuffle tier on a community-less RMAT graph
# grinds its full 10-level x 8-round budget (~25 min of round latency at
# this size — see BASELINE.md round 5) and auto would never route an
# in-memory graph there; this leg records the number the dispatcher uses.
t0 = time.time()
n_comm = louvain(edges, tier="blocked").select("community").distinct().count()
out["blocked"] = {"sec": round(time.time() - t0, 2), "communities": n_comm}
print(json.dumps(out))
spark.stop()
"""

GRID_WORKER = r"""
import json, sys, time
import numpy as np
sys.path.insert(0, %(repo)r)
from pyspark.sql import functions as F
from triangle_counting_spark.session import get_spark
from triangle_counting_spark.functions.similarity import embedding_neardup_pairs
spark = get_spark("r5-grid", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
# 200k vectors x dim 32: broadcast matrix = 51 MB (fits: blocked is the
# right plan here); the point is measuring BOTH tiers on identical input
# and confirming identical results at a non-toy size.
n, dim = 200_000, 32
df = (
    spark.range(n)
    .select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda k: F.sin(F.col("id") * k * 0.7) + F.cos(k * 1.3),
        ).alias("embedding"),
    )
    .persist()
)
df.count()
out = {"n": n, "dim": dim}
for method, kw in (("blocked", {}), ("grid", {"block_rows": 25_000})):
    t0 = time.time()
    cnt = embedding_neardup_pairs(df, 0.995, method=method, **kw).count()
    out[method] = {"sec": round(time.time() - t0, 2), "pairs": cnt}
print(json.dumps(out))
spark.stop()
"""


def leg(name: str, argv: list[str]) -> dict:
    out = subprocess.run(argv, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][0]
    rec = json.loads(line)
    print(json.dumps({"leg": name, **rec}), flush=True)
    return rec

def pyleg(name: str, code: str) -> dict:
    return leg(name, [sys.executable, "-c", code % {"repo": REPO}])


def main() -> None:
    res = {}
    res["scaling_rmat20"] = leg(
        "scaling_rmat20",
        [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py"),
         "20", "3", "2"],
    )
    res["scaling_files"] = leg(
        "scaling_files",
        [sys.executable, os.path.join(REPO, "scripts", "scaling_bench.py"),
         "3000", "5", "2", "files"],
    )
    res["louvain_rmat16"] = pyleg("louvain_rmat16", LOUVAIN_WORKER)
    res["neardup_tiers_200k"] = pyleg("neardup_tiers_200k", GRID_WORKER)
    print("COMBINED " + json.dumps(res))


if __name__ == "__main__":
    main()
