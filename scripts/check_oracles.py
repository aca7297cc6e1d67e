"""Spark-vs-DuckDB oracle parity checker — local stand-in for the driver's
correctness gate. Runs every __spark_entry__.queries() entry and its
oracle_sql() twin at the given sf dir, compares row count, schema (column
names) and order-insensitive values; prints a per-query verdict.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from triangle_counting_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_ = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        t_spark = time.time() - t0
        if name not in os_:
            print(f"SKIP {name}: no oracle (rows-only: {len(got)} rows, {t_spark:.1f}s)")
            continue
        t0 = time.time()
        try:
            want = con.sql(os_[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        t_duck = time.time() - t0
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} vs {sorted(want.columns)}")
        if not problems:
            g, w = normalize(got), normalize(want)
            # Dtype-strict: the driver's value hash is type-sensitive, so a
            # DuckDB HUGEINT landing as float64 vs Spark's int64 must FAIL
            # here too (r4's `sessions` gate failed exactly this way while
            # the old check_dtype=False pass masked it).
            dt_bad = [
                f"{c}: spark {g[c].dtype} vs oracle {w[c].dtype}"
                for c in g.columns
                if g[c].dtype != w[c].dtype
            ]
            if dt_bad:
                problems.append("dtypes: " + "; ".join(dt_bad))
        if not problems:
            try:
                pd.testing.assert_frame_equal(g, w, check_dtype=True, check_exact=True)
            except AssertionError as e:
                msg = str(e).splitlines()
                problems.append("values: " + " | ".join(msg[:3]))
                # show a tiny diff sample
                neq = (g != w).any(axis=1)
                if neq.any():
                    i = neq.idxmax()
                    problems.append(f"first diff row {i}: got={g.loc[i].to_dict()} want={w.loc[i].to_dict()}")
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name}: {len(got)} rows (spark {t_spark:.1f}s, duckdb {t_duck:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
