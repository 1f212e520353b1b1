"""Custom stateful streaming operator: per-key EWMA anomaly detection.

The reference's closest relative is the autoregressive inference loop
(``utils/inference.py:18-105``) — a per-series recurrence carried across
time steps. In a stream that recurrence must survive micro-batch
boundaries, which is exactly what ``applyInPandasWithState`` exists for:
Spark's built-in streaming aggregates (count/sum/window) cannot express a
linear recurrence like an exponentially weighted mean, because each row's
output depends on the full prefix of its key's history.

State per key: (n, ewma, ewmvar) — O(1) per key regardless of stream
length, the scale requirement for stateful ops (state store size is
#keys × 24 bytes, not #events). Rows are flagged anomalous when the value
deviates more than ``k``·σ from the EWMA of the PRIOR rows (the detector
never tests a point against a statistic that already includes it).

Determinism caveat (documented, inherent to streams): per-key output
depends on event arrival order across micro-batches. The replay test
feeds time-ordered files; production use pairs this with watermarked
pre-sorting or accepts approximate order, as every streaming EWMA does.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("value", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("ewma", DoubleType()),
        StructField("ewmvar", DoubleType()),
    ]
)


def _ewma_step(
    rows: pd.DataFrame, n: int, mean: float, var: float, alpha: float, k: float
) -> tuple[pd.DataFrame, int, float, float]:
    """Advance the recurrence over one time-sorted chunk of a single key.

    mean_t = (1-α)·mean_{t-1} + α·x_t  (initialized to the first value);
    var is the EWM variance of the same recurrence. A point is anomalous
    vs the statistics BEFORE it: |x - mean_{t-1}| > k·sqrt(var_{t-1}),
    tested only once 2 prior points exist.
    """
    rows = rows.sort_values(["ts", "event_id"], kind="stable")
    out_mean, out_flag = [], []
    for x in rows["value"].astype(float):
        if n >= 2:
            out_flag.append(bool(abs(x - mean) > k * (var**0.5)))
        else:
            out_flag.append(False)
        if n == 0:
            mean, var = x, 0.0
        else:
            delta = x - mean
            mean = mean + alpha * delta
            var = (1.0 - alpha) * (var + alpha * delta * delta)
        n += 1
        out_mean.append(mean)
    out = rows[["user_id", "event_id", "ts", "value"]].copy()
    # emit UNROUNDED: Python round() is exact-binary half-to-even and
    # disagrees with SQL ROUND on decimal midpoints (2-dp inputs make
    # 6-dp midpoints common, not measure-zero); the catalog face rounds
    # with F.round, the established cross-engine pairing with DuckDB ROUND
    out["ewma"] = out_mean
    out["is_anomaly"] = out_flag
    return out, n, mean, var


def make_ewma_state_func(alpha: float = 0.1, k: float = 3.0):
    """Factory for the applyInPandasWithState function (exact arity is
    required by the pandas-UDF harness — no default-arg closures)."""

    def func(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, mean, var = state.get if state.exists else (0, 0.0, 0.0)
        # Materialize ALL Arrow chunks for this key before stepping: a key
        # whose micro-batch rows span multiple chunks would otherwise be
        # processed chunk-by-chunk in shuffle order — each chunk sorted
        # internally but later chunks possibly holding earlier timestamps,
        # silently advancing the recurrence out of order. Memory stays
        # bounded by one key's rows per micro-batch (same contract as the
        # batch applyInPandas sibling).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
            out, n, mean, var = _ewma_step(whole, n, mean, var, alpha, k)
            yield out
        state.update((n, mean, var))

    return func


def ewma_anomaly_stream(
    events: DataFrame, alpha: float = 0.1, k: float = 3.0
) -> DataFrame:
    """Streaming per-user EWMA anomaly flags via applyInPandasWithState.

    Input (streaming or batch-shaped): (user_id, event_id, ts, value).
    State never times out — engine RUL/telemetry keys are long-lived; pass
    a watermark + timeout in a real deployment to reap dead keys.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        make_ewma_state_func(alpha=alpha, k=k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_anomaly_batch(
    events: DataFrame, alpha: float = 0.1, k: float = 3.0
) -> DataFrame:
    """Batch golden sibling: same recurrence via applyInPandas (whole key
    history in one group — fine at test scale; the streaming form is the
    scale path)."""

    def func(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _, _, _ = _ewma_step(pdf, 0, 0.0, 0.0, alpha, k)
        return out

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(func, schema=OUTPUT_SCHEMA)
    )
