"""Hub-cap demonstration for the exact motif counts (VERDICT r4 item #4).

Runs four_cycle_count on the FIXTURES.md §6 mega-repo skew fixture (one
clique of `mega_files` vertices, every member degree mega_files-1, plus
500 3-file repos) twice:

  - capped   (max_hub_degree=100): the whole mega-clique is dropped,
    reported via capped_hubs — completes in seconds at ANY clique size
    because the remaining wedge space is the small repos' only.
  - uncapped (exact): the wedge join materializes
    ~mega_files * C(mega_files-1, 2) rows — quadratic in the hub degree
    (2000 -> ~4.0e9 wedge rows). Runs, but this is the cost the cap
    exists to avoid; pass --skip-uncapped to not pay it.

Usage: python scripts/motif_cap_demo.py [mega_files=2000] [--skip-uncapped]
Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    mega = int(args[0]) if args else 2000
    skip_uncapped = "--skip-uncapped" in sys.argv

    from triangle_counting_spark.session import get_spark
    from triangle_counting_spark.sources.edges import file_cooccurrence_edges
    from triangle_counting_spark.sources.files import skew_fixture
    from triangle_counting_spark.operators.triangles import four_cycle_count

    spark = get_spark("motif-cap-demo", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    edges = file_cooccurrence_edges(skew_fixture(spark, mega_files=mega)).persist()
    m = edges.count()

    t0 = time.time()
    row = four_cycle_count(edges, max_hub_degree=100).collect()[0]
    print(json.dumps({
        "run": "capped", "mega_files": mega, "m": m,
        "max_hub_degree": 100,
        "four_cycles": row["four_cycles"],
        "capped_hubs": row["capped_hubs"],
        "sec": round(time.time() - t0, 1),
    }), flush=True)

    if not skip_uncapped:
        t0 = time.time()
        c4 = four_cycle_count(edges).collect()[0]["four_cycles"]
        print(json.dumps({
            "run": "uncapped", "mega_files": mega, "m": m,
            "four_cycles": c4,
            "sec": round(time.time() - t0, 1),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
