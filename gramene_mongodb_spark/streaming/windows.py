"""Event-time streaming aggregations over the events stream.

Each builder takes a *streaming* DataFrame (``spark.readStream``) with
an event-time column and returns the transformed streaming DataFrame;
the caller picks the sink/trigger. The same expressions run identically
on a batch DataFrame (verified in tests against the batch twin —
the catalog's ``tumbling_hour_events``/``a3_sessionize_events`` are the
oracle-checked batch equivalents).

Scale notes:
* watermarks bound state: late rows beyond the watermark are dropped,
  so state size is (windows in flight × keys), not unbounded.
* session windows use the native ``session_window`` operator — state is
  merged per key by the streaming state store, no custom
  applyInPandasWithState needed for gap sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_events_stream(
    spark,
    path_glob: str,
    schema: str = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING"
    ),
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source over parquet event files.

    Explicit schema (mandatory for streaming) and bounded per-trigger
    file intake so a backlog replays incrementally instead of as one
    giant micro-batch.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path_glob)


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling event-time window: count + value sum per (window, type).

    Watermark allows ``watermark`` of lateness, then finalizes the
    window (append-mode emittable).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_rates(
    events: DataFrame,
    window_size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding window per event_type — the rate-monitoring shape."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def session_aggregates(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Native gap-based session windows per user — the streaming twin of
    the batch A3 sessionization (catalog ``a3_sessionize_events``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts: str = "ts",
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup for ingestion pipelines: keep the first
    arrival per ``keys`` within the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds state: a key's fingerprint
    is held only until the watermark passes it, so state is
    (arrival rate × delay), not corpus size — the property that lets an
    at-least-once source (kafka replays, file re-lists) feed an
    exactly-once corpus.  The batch twin is ``dedup.dedup_exact``
    (hash-groupBy over the full corpus); use this one on the live path
    and the batch one for backfills.
    """
    return stream.withWatermark(ts, watermark_delay).dropDuplicatesWithinWatermark(keys)


def attribute_conversions(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: purchase attributed to the same user's
    click(s) within ``horizon`` before it — the attribution shape.

    Both sides carry watermarks and the join condition bounds event time
    on BOTH ends (click ≤ purchase ≤ click + horizon), which is what
    lets the state store evict: a buffered click can be dropped once the
    purchase-side watermark passes click_ts + horizon, so state is
    (arrival rate × horizon), not history.  The identical expressions
    run on batch DataFrames — the backfill twin (tested).
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )
