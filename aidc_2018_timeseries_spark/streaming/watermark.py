"""Watermark late-data accounting: the micro-batch watermark recurrence
as an oracle-checkable batch computation.

Structured Streaming's watermark is defined BETWEEN micro-batches: the
watermark in force while batch ``b`` processes is

    wm(b) = max(event_time over all batches < b) - delay

and a strict state-eviction policy treats an input row as late when its
event time is below that watermark. This module restates exactly that
recurrence over a static frame whose rows carry an arrival-batch label,
so the watermark trajectory and the late-row ledger become
deterministic, engine-independent arithmetic — and therefore
DuckDB-oracle-checkable, which the live streaming path (micro-batch
timing, state-store eviction) never is. tests/test_watermark.py replays
the same batches through a REAL ``readStream`` + ``withWatermark`` query
(maxFilesPerTrigger=1, one file per arrival batch) and proves the
engine's per-batch watermark (StreamingQueryProgress ``eventTime.
watermark``) equals this restatement batch-for-batch.

One engine subtlety, measured and pinned rather than assumed: since the
multiple-stateful-operator work (SPARK-40925) each micro-batch carries
TWO watermarks — the EVICTION watermark (max event time through the
previous batch, minus delay; what StreamingQueryProgress reports and
state cleanup uses) and the LATE-EVENTS watermark (one batch older
still; what the input-row filter of stateful operators applies).
``flag_late_events(filter_lag=0)`` restates the former (the dashboard /
state-size number), ``filter_lag=1`` the latter (the rows a streaming
``dropDuplicates`` actually refuses) — the replay test pins both
against a live query, batch-for-batch and row-for-row.

Scale shape: one (batch) partial aggregate over the raw rows (tiny output
— one row per micro-batch), a window over THAT bounded relation for the
running max (never over raw rows), and a broadcast join of the per-batch
watermark back onto the events. No global sort or single-partition pass
over the data ever happens; this mirrors the real streaming engine, where
the watermark is an O(#partitions) min/max reduction per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.functions.hashing import hash64_seeded


def arrival_batches(
    df: DataFrame, id_col: str, n_batches: int = 20, seed: int | str = 42
) -> DataFrame:
    """Assign each row a deterministic synthetic arrival micro-batch
    (hash64(seed:id) mod n_batches) — the replayable stand-in for "which
    trigger delivered this row". Scan-shaped, reproducible across engines
    and partitionings (same md5 arithmetic as hash_sample)."""
    h = hash64_seeded(F.col(id_col).cast("string"), f"arrival:{seed}")
    return df.withColumn("arrival_batch", (h % n_batches).cast("long"))


def flag_late_events(
    df: DataFrame,
    t_col: str,
    delay_us: int,
    batch_col: str = "arrival_batch",
    filter_lag: int = 0,
) -> DataFrame:
    """Row-level lateness under the micro-batch watermark recurrence.

    Adds ``watermark_us`` (the watermark in force for the row's batch;
    NULL for the first batch(es) — no data seen yet, nothing can be late,
    exactly like a fresh streaming query) and ``is_late``
    (event time strictly below the watermark — state stores drop rows
    OLDER than the watermark; equality survives).

    ``filter_lag`` selects WHICH of the engine's per-batch watermarks to
    restate (since SPARK-40925 a batch carries two): ``0`` = the
    EVICTION watermark — max event time through batch b-1 minus delay,
    the value StreamingQueryProgress reports and state cleanup uses —
    and ``1`` = the LATE-EVENTS watermark, one batch older still, which
    the input-row filter of stateful operators applies (late rows are
    judged against the watermark as of the batch that was current when
    this batch was PLANNED). tests/test_watermark.py pins both against a
    live query: the progress trajectory equals lag 0 and the surviving
    row set of a streaming dropDuplicates equals not-late under lag 1.
    """
    per_batch = df.groupBy(batch_col).agg(F.max(t_col).alias("batch_max_t"))
    # RANGE (value-based) frame, not ROWS: batch numbers are TRIGGER
    # indices, and a trigger that delivered zero rows still counts in the
    # lag arithmetic — a ROWS frame would skip one OBSERVED batch instead
    # of one trigger and overshoot the lag across gaps (caught by
    # tests/test_watermark_properties.py's sparse-batch examples)
    w = Window.orderBy(batch_col).rangeBetween(
        Window.unboundedPreceding, -1 - filter_lag
    )
    wm = per_batch.select(
        batch_col,
        (F.max("batch_max_t").over(w) - F.lit(delay_us)).alias("watermark_us"),
    )
    return df.join(F.broadcast(wm), batch_col).withColumn(
        "is_late",
        F.coalesce(F.col(t_col) < F.col("watermark_us"), F.lit(False)),
    )


def late_event_accounting(
    df: DataFrame,
    t_col: str,
    delay_us: int,
    batch_col: str = "arrival_batch",
) -> DataFrame:
    """Per-batch watermark audit: (batch, watermark_us, n_rows, n_late).

    The operational dashboard of a watermarked pipeline — how far the
    watermark has advanced and how many rows each trigger dropped as late.
    """
    flagged = flag_late_events(df, t_col, delay_us, batch_col)
    return flagged.groupBy(batch_col, "watermark_us").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("is_late").cast("long")).alias("n_late"),
    )
