"""Structured Streaming operators.

The reference is strictly batch (SURVEY.md §2.9) — this module is the
engine's forward-looking surface for continuous ingest: a stream of edge
rows (e.g. new files landing in repos → new co-occurrence edges) maintains
incremental degree counts and windowed event statistics. Exact triangle
maintenance under inserts lives in :mod:`.triangles` — a foreachBatch
maintainer over the incremental `triangle_count_delta` operator keeps a
running exact count at |Δ|·deg per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed event counts with late-data handling.

    ``events`` must be a STREAMING DataFrame with (ts timestamp,
    event_type string, value double). Watermark bounds state: rows later
    than ``watermark`` behind the max event time are dropped, so state
    size is O(windows in flight), not O(stream length).
    """
    # watermarks require TIMESTAMP (LTZ); parquet event-time columns often
    # infer as TIMESTAMP_NTZ — normalize via the tz-proof epoch derivation
    # (a bare cast would interpret the NTZ wall clock in the session zone,
    # shifting window boundaries under a non-UTC harness)
    from ..functions.events import epoch_seconds

    events = events.withColumn("ts", F.timestamp_seconds(epoch_seconds(events)))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def streaming_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming twin of ``functions.events.sessionize``: gap-based
    sessions over a live event stream via Spark's native
    ``session_window`` (merging session state per user, closed and
    emitted once the watermark passes a session's end = last event +
    gap). State is bounded by the watermark horizon — open sessions per
    active user, not stream history.

    Emission semantics (append mode): a session emits only when
    watermark ≥ session end, so on a finite stream the final sessions
    inside the last gap stay in state — the batch operator on the sink
    table closes them (same composition note as streaming_exact_dedup).
    Columns match the batch operator's (session start/end as epoch
    seconds of first/last event; sum_value integer-exact) so the two
    results diff directly. The window timestamp is rebuilt from
    ``epoch_seconds`` (the tz-proof derivation both gate queries use) —
    a bare ``cast('timestamp')`` would interpret an NTZ-read wall clock
    in the SESSION zone and shift every session by the UTC offset under
    a non-UTC harness (the r3 ``sessions`` failure mode)."""
    from ..functions.events import epoch_seconds, exact_sum

    events = events.withColumn("ts", F.timestamp_seconds(epoch_seconds(events)))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{int(gap_minutes)} minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", "sum_value"),
            F.min(F.unix_seconds(F.col("ts"))).alias("session_start_epoch"),
            F.max(F.unix_seconds(F.col("ts"))).alias("session_end_epoch"),
        )
        .select(
            "user_id", "session_start_epoch", "session_end_epoch",
            "n_events", "sum_value",
        )
    )


def run_session_stream_demo(
    spark, src_dir: str, out_dir: str, gap_minutes: int = 30,
    watermark: str = "0 seconds", timeout_sec: int = 60,
) -> DataFrame:
    """Drive streaming_sessionize end-to-end (availableNow over staged
    event files → parquet sink); returns the emitted sessions as a batch
    DataFrame. With watermark '0 seconds', emitted = every session whose
    end (last event + gap) the final watermark (max event time) passed."""
    batch = spark.read.parquet(src_dir)
    staged = f"{out_dir}/staged"
    batch.write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(batch.schema).parquet(staged)
    sessions = streaming_sessionize(stream, gap_minutes, watermark)
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
    return spark.read.parquet(f"{out_dir}/data")


def streaming_degree_counts(edge_stream: DataFrame, watermark_col: str | None = None) -> DataFrame:
    """Running degree table over an append-only edge stream (src, dst).

    Complete-mode aggregate: degree(v) = count of incident edge events.
    The batch engine's `degrees` (orientation.py) on a static table and
    this on a stream share one logical definition.
    """
    sym = edge_stream.select(F.col("src").alias("v")).union(
        edge_stream.select(F.col("dst").alias("v"))
    )
    return sym.groupBy("v").agg(F.count(F.lit(1)).alias("degree"))


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first arrival of each text hash.

    Uses ``dropDuplicatesWithinWatermark`` on the md5 of the text: two rows
    with the same hash whose event times fall within the watermark horizon
    dedup to the first arrival, and — unlike plain ``dropDuplicates``,
    whose state never evicts when the event-time column isn't part of the
    key — per-key state IS dropped once the watermark passes it, so state
    stays bounded under continuous ingest. The trade-off: duplicates more
    than ``watermark`` apart both survive; collapse those with the batch
    operator on the sink table (same md5 key as
    `functions/dedup.py:exact_dedup_groups`, so the two compose).
    """
    # tz-proof event time (same epoch_seconds discipline as the session /
    # window twins): a bare cast shifts NTZ wall clocks by the session-zone
    # offset — non-uniformly across a DST boundary, which could move a
    # duplicate pair across the watermark horizon. String columns keep the
    # plain parse (no NTZ ambiguity to neutralize).
    from pyspark.sql.types import StringType

    from ..functions.events import epoch_seconds

    if isinstance(docs.schema[ts_col].dataType, StringType):
        docs = docs.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    d = docs.withColumn(
        ts_col, F.timestamp_seconds(epoch_seconds(docs, ts_col))
    ).withColumn("text_hash", F.md5(F.col(text_col)))
    return d.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["text_hash"]
    )


def run_dedup_stream_demo(
    spark, src_dir: str, out_dir: str, timeout_sec: int = 30
) -> int:
    """Drive streaming_exact_dedup end-to-end over the documents fixture
    (duplicated texts collapse to first arrival). Returns rows written."""
    batch = spark.read.parquet(src_dir)
    if "ts" not in batch.columns:
        batch = batch.withColumn(
            "ts", F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        )
    staged = f"{out_dir}/staged"
    batch.write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(
        spark.read.parquet(staged).schema
    ).parquet(staged)
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
    try:
        return spark.read.parquet(f"{out_dir}/data").count()
    except Exception:  # noqa: BLE001 — empty sink
        return 0


def run_event_stream_demo(spark, src_dir: str, out_dir: str, timeout_sec: int = 30) -> int:
    """Drive the windowed aggregate end-to-end with the file source reading
    parquet event files from ``src_dir`` → parquet sink. Returns rows
    written. Used by tests (file-source streaming is deterministic)."""
    batch = spark.read.parquet(src_dir)
    # the file source streams a DIRECTORY; stage single-file inputs
    staged = f"{out_dir}/staged"
    batch.write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(batch.schema).parquet(staged)
    agg = streaming_event_counts(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", f"{out_dir}/data")
        .option("checkpointLocation", f"{out_dir}/ck")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
    try:
        return spark.read.parquet(f"{out_dir}/data").count()
    except Exception:  # noqa: BLE001 — empty sink (all rows behind watermark)
        return 0
