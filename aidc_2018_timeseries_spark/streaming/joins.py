"""Stream-stream interval join (Structured Streaming extension).

The batch catalog already joins points to trailing intervals
(``range_join_error_followups``); this is the streaming sibling: two
live event streams joined on key with a bounded event-time condition.
Spark requires watermarks on BOTH sides plus a time-range join predicate
so it can bound the join state — without the bound, each side's state
would grow forever waiting for arbitrarily-late matches.

Scale posture: state is partitioned by the join key and pruned at the
watermark, so steady-state memory is (events per key within the
tolerance window), not stream length. Swap the file sources for Kafka
topics and the same plan runs continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts_utc",
    tolerance: str = "10 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join ``right`` events landing within ``[left.ts, left.ts +
    tolerance]`` of a ``left`` event with the same key.

    Works identically on static DataFrames (the batch golden — watermarks
    are no-ops in batch mode) and on streaming ones, where the time-bound
    condition lets Spark evict join state past the watermark.

    Output: (key, left_event_id, right_event_id, gap_us) with the gap in
    the exact microsecond domain.
    """
    if left.isStreaming:
        left = left.withWatermark(ts_col, watermark)
    if right.isStreaming:
        right = right.withWatermark(ts_col, watermark)
    l = left.select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("left_event_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("right_event_id"),
        F.col(ts_col).alias("r_ts"),
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {tolerance}"))
    )
    return l.join(r, cond).select(
        F.col("l_key").alias(key),
        "left_event_id",
        "right_event_id",
        (
            F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("l_ts"))
        ).alias("gap_us"),
    )


def enrich_stream_with_static(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    dim_cols: list[str],
) -> DataFrame:
    """Stream-static enrichment join (the dimension-lookup pattern).

    The static side needs no watermark — Spark re-resolves it every
    micro-batch and plans a broadcast hash join when the dim is small,
    so each batch is enriched map-side with zero streaming state. This
    completes the streaming join family next to the stream-stream
    interval join above: stream-static is stateless (dim broadcast),
    stream-stream is stateful (watermark-bounded buffers).

    LEFT join: stream rows survive a missing dimension row (nulls), the
    semantics a pipeline wants when the dim lags the stream.
    """
    d = dim.select(
        F.col(dim_key).alias("__dk"), *[F.col(c) for c in dim_cols]
    )
    return stream.join(
        F.broadcast(d), stream.__getattr__(stream_key) == F.col("__dk"), "left"
    ).drop("__dk")
