"""Watermark late-drop accounting: the batch restatement vs REAL streaming.

`streaming/watermark.py` claims its per-batch recurrence — wm(b) = max
event time over batches < b, minus delay — is exactly Structured
Streaming's micro-batch watermark semantics. The replay test feeds the
same arrival batches through an actual `readStream` + `withWatermark`
query (one parquet file per batch, `maxFilesPerTrigger=1`) and asserts
the engine's per-batch watermark (StreamingQueryProgress
`eventTime.watermark`) equals the restatement batch-for-batch.

It also pins the engine's TWO-watermark design (SPARK-40925), measured
rather than assumed: the late-events filter inside a streaming
`dropDuplicates` applies the watermark one batch OLDER than the
progress-reported eviction watermark — the surviving row set equals the
restatement's not-late set under `filter_lag=1`, row-for-row.

Event times are floored to whole milliseconds first: Spark tracks the
watermark in ms internally, so ms-aligned data makes the µs-domain batch
arithmetic and the engine's ms-domain arithmetic provably identical
(no boundary rows can disagree).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.sources.tables import load_table
from aidc_2018_timeseries_spark.streaming.watermark import (
    arrival_batches,
    flag_late_events,
    late_event_accounting,
)
from tests.conftest import SF_DIR

N_BATCHES = 5
DELAY_US = 3_600_000_000  # 1 hour


@pytest.fixture(scope="module")
def batched_events(spark):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id",
        # floor µs to whole ms so engine-internal ms watermark == µs math
        (F.expr("ts div 1000") - F.expr("ts div 1000") % 1000).alias("t_us"),
    )
    return arrival_batches(ev, "event_id", n_batches=N_BATCHES).cache()


def test_first_batch_never_late(spark, batched_events):
    acct = late_event_accounting(batched_events, "t_us", DELAY_US).collect()
    rows = {r.arrival_batch: r for r in acct}
    assert rows[0].watermark_us is None
    assert rows[0].n_late == 0
    assert sum(r.n_rows for r in acct) == batched_events.count()


def test_recurrence_matches_local_recomputation(spark, batched_events):
    """Pin the arithmetic against an independent driver-side fold."""
    pdf = batched_events.toPandas()
    flagged = {
        (r.event_id, r.is_late)
        for r in flag_late_events(batched_events, "t_us", DELAY_US).collect()
    }
    hwm = None
    expect = set()
    for b in sorted(pdf.arrival_batch.unique()):
        grp = pdf[pdf.arrival_batch == b]
        wm = None if hwm is None else hwm - DELAY_US
        for _, row in grp.iterrows():
            expect.add((row.event_id, wm is not None and row.t_us < wm))
        bmax = int(grp.t_us.max())
        hwm = bmax if hwm is None else max(hwm, bmax)
    assert flagged == expect


def test_stream_replay_watermark_trajectory_matches(spark, batched_events, tmp_path):
    """The real engine, one file per arrival batch, one micro-batch per
    trigger: the watermark reported in force for every batch must equal the
    restatement's wm(b) — and dropDuplicates must be observed NOT filtering
    late rows (the measured behavior the operator contract documents)."""
    from datetime import datetime, timezone

    src = tmp_path / "arrivals"
    src.mkdir()
    with_ts = batched_events.withColumn("ts_utc", F.timestamp_micros("t_us"))
    for b in range(N_BATCHES):
        part = with_ts.where(F.col("arrival_batch") == b).select("event_id", "ts_utc")
        d = src / f"batch_{b:03d}"
        part.coalesce(1).write.mode("overwrite").parquet(str(d))
        # file source orders by modification time; pin strictly increasing
        # mtimes so trigger order == arrival-batch order
        for root, _, files in os.walk(d):
            for f in files:
                os.utime(os.path.join(root, f), (1_000_000 + b * 100,) * 2)

    schema = "event_id long, ts_utc timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
        .withWatermark("ts_utc", "1 hour")
        .dropDuplicates(["event_id", "ts_utc"])
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progress = {p["batchId"]: p for p in q.recentProgress}
    assert len(progress) == N_BATCHES, "expected exactly one micro-batch per file"

    acct = {
        r.arrival_batch: r
        for r in late_event_accounting(batched_events, "t_us", DELAY_US).collect()
    }

    def _iso_to_us(s: str) -> int:
        return int(
            datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fZ")
            .replace(tzinfo=timezone.utc)
            .timestamp()
            * 1_000_000
        )

    any_late = 0
    for b in range(N_BATCHES):
        engine_wm = _iso_to_us(progress[b]["eventTime"]["watermark"])
        ours = acct[b].watermark_us
        if b == 0:
            assert ours is None and engine_wm == 0  # fresh query: epoch
        else:
            assert engine_wm == ours, f"batch {b}: engine {engine_wm} != ours {ours}"
        any_late += acct[b].n_late
    assert any_late > 0, "no late rows — the trajectory check would prove nothing"

    # row-exact parity of the LATE-EVENTS filter: dedup's input filter uses
    # the one-batch-older watermark (SPARK-40925), so survivors == not-late
    # under filter_lag=1; if a Spark upgrade collapses the two watermarks,
    # this fails and the operator contract must be revisited
    survived = {
        r.event_id for r in spark.sql("SELECT event_id FROM wm_dedup").collect()
    }
    lagged = flag_late_events(batched_events, "t_us", DELAY_US, filter_lag=1)
    expected = {r.event_id for r in lagged.where(~F.col("is_late")).collect()}
    assert {r.event_id for r in lagged.where(F.col("is_late")).collect()}, (
        "no late rows under the lagged filter — parity would prove nothing"
    )
    assert survived == expected
