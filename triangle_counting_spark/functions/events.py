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
