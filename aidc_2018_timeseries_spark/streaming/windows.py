"""Structured Streaming extension (SURVEY §7.8).

The reference's windows are batch computations over an integer time axis
(§2.3); the idiomatic Spark extension exposes the same tumbling/sliding
semantics over event-time streams with watermarked late-data handling.
The batch results over the static table are the golden reference for the
streaming replay (tests/test_streaming.py runs both and compares).

Scale posture: event-time windows + watermark bound state size; the
aggregation state is partitioned by (window, key) — the standard shuffle.
At 100 TB/day the same code runs against Kafka instead of files; only the
``readStream`` source line changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_aggregate(
    df: DataFrame,
    ts_col: str = "ts_utc",
    key: str = "event_type",
    value: str = "value",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (slide=None) or sliding windowed aggregate, streaming-safe.

    Works identically on a static DataFrame (batch golden) and a streaming
    one (the watermark is a no-op in batch mode).

    Output: (window_start, window_end, key, n, sum_value) — window bounds
    emitted as formatted strings so downstream comparisons avoid raw
    timestamp physical types.
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    out = df.groupBy(win.alias("w"), F.col(key)).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum(value), 4).alias("sum_value")
    )
    return out.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        key,
        "n",
        "sum_value",
    )


def sessionize_stream(
    df: DataFrame,
    ts_col: str = "ts_utc",
    key: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows (gap-based) — the streaming sibling of the batch
    ``events_sessionize`` catalog query, using Spark's native session_window
    state machine instead of lag+cumsum."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            key,
            "n_events",
        )
    )
