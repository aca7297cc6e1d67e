"""Single-pass table profiling — the data-quality census a pipeline runs
before touching a new 100 TB table.

``profile_table`` computes per-column row/null/distinct counts and
min/max in ONE scan: all columns' aggregates go into a single ``agg``
(Catalyst plans the multi-distinct via Expand — one pass over the data,
map-side partials, no per-column rescans), then the one result row is
unpivoted with ``stack`` into a (col_name, …) row per column. Exact
distinct counts keep the result oracle-checkable; at 100 TB swap
``exact_distinct=False`` to HLL sketches (``approx_count_distinct``) and
the plan shape is unchanged with the Expand removed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value) —
    one row per profiled column, computed in a single pass. min/max are
    taken on the native type, then rendered as strings (so numeric
    columns order numerically, not lexically)."""
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("no columns to profile")
    distinct = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__nn{i}"),
            distinct(F.col(c)).alias(f"__nd{i}"),
            F.min(F.col(c)).cast("string").alias(f"__mn{i}"),
            F.max(F.col(c)).cast("string").alias(f"__mx{i}"),
        ]
    row = df.agg(*aggs)
    # Column-API stack (not an interpolated SQL string) so column names
    # containing quotes or other SQL-significant characters profile fine
    stack_args: list = []
    for i, c in enumerate(cols):
        stack_args += [
            F.lit(c),
            F.col(f"__nn{i}"),
            F.col(f"__nd{i}"),
            F.col(f"__mn{i}"),
            F.col(f"__mx{i}"),
        ]
    return row.select(
        F.stack(F.lit(len(cols)), *stack_args).alias(
            "col_name", "__nn", "n_distinct", "min_value", "max_value"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )
