"""Event-table analytics (batch side of the streaming module)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_event_stats(events: DataFrame) -> DataFrame:
    """(hour_epoch, event_type, n_events, sum_value, n_users) — tumbling
    1-hour windows as epoch seconds (timezone-free long, so the DuckDB
    oracle compares exactly)."""
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        events.groupBy(
            hour.cast("long").alias("hour_epoch"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_ix, session_start_epoch, session_end_epoch,
    n_events, sum_value) — gap-based sessionization: a user's events more
    than ``gap_minutes`` apart start a new session. The standard
    clickstream/training-log reduction, expressed as two window functions
    (lag + running sum of session-break flags) and one aggregate — all
    codegen, partitioned by user (the natural key; per-user event counts
    bound the window state). Epochs are timezone-free longs so the SQL
    oracle compares exactly.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # to_unix_timestamp, not cast: ANSI Spark 4 refuses TIMESTAMP_NTZ ->
    # BIGINT casts; with the session tz pinned UTC this is exactly
    # epoch_ms // 1000 (floored seconds), matching the oracle
    epoch = F.to_unix_timestamp(F.col("ts"))
    gap = epoch - F.lag(epoch).over(w)
    brk = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    sess = events.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.sum(brk).over(w).alias("session_ix"),
    )
    return sess.groupBy("user_id", "session_ix").agg(
        F.min(F.to_unix_timestamp(F.col("ts"))).alias("session_start_epoch"),
        F.max(F.to_unix_timestamp(F.col("ts"))).alias("session_end_epoch"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
