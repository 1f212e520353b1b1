"""Stateful streaming replay: the EWMA recurrence must survive micro-batch
boundaries. The batch applyInPandas form (whole history per key at once)
is the golden; the stream replays the same events split into three
time-ordered files, processed one file per trigger, so per-key state is
exercised across at least three micro-batches.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.sources.tables import load_table
from aidc_2018_timeseries_spark.streaming.stateful import (
    ewma_anomaly_batch,
    ewma_anomaly_stream,
)
from tests.conftest import SF_DIR

COLS = ["user_id", "event_id", "ts", "value"]


@pytest.fixture(scope="module")
def split_stream_dir(spark, tmp_path_factory):
    """Three parquet files covering disjoint, increasing ts ranges, written
    in order (file mod-times ascending) so maxFilesPerTrigger=1 replays
    them chronologically."""
    d = tmp_path_factory.mktemp("events_chunks")
    ev = load_table(spark, SF_DIR, "events").select(*COLS)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    for i, cond in enumerate(
        [
            F.col("ts") <= cut1,
            (F.col("ts") > cut1) & (F.col("ts") <= cut2),
            F.col("ts") > cut2,
        ]
    ):
        ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(str(d / f"chunk_{i}"))
    return [str(d / f"chunk_{i}") for i in range(3)], ev


def test_ewma_stream_matches_batch(spark, split_stream_dir, tmp_path):
    chunk_dirs, ev = split_stream_dir
    golden = sorted(map(tuple, ewma_anomaly_batch(ev).collect()))
    assert len(golden) == ev.count()

    # feed chunks through one directory so arrival order == ts order
    import shutil, glob, os, time

    feed = tmp_path / "feed"
    feed.mkdir()
    for i, cd in enumerate(chunk_dirs):
        for f in glob.glob(os.path.join(cd, "*.parquet")):
            shutil.copy(f, feed / f"{i}.parquet")
            time.sleep(0.05)  # distinct mod-times → deterministic file order

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(feed))
    )
    q = (
        ewma_anomaly_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_anoms")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(map(tuple, spark.sql("SELECT * FROM ewma_anoms").collect()))
    assert got == golden
    # the detector must actually fire on this data or the test is vacuous
    assert any(r[-1] for r in got)


def test_ewma_batch_recurrence_golden(spark):
    """Pin the recurrence against a hand-computed sequence."""
    rows = [(1, i, i * 10, v) for i, v in enumerate([10.0, 10.0, 10.0, 10.0, 50.0])]
    df = spark.createDataFrame(rows, COLS)
    out = {r.event_id: r for r in ewma_anomaly_batch(df, alpha=0.5, k=3.0).collect()}
    # constant prefix: mean stays 10, var stays 0, no flags until the jump
    assert [out[i].is_anomaly for i in range(5)] == [False, False, False, False, True]
    assert out[3].ewma == 10.0
    # after the jump: mean = 10 + 0.5*(50-10) = 30
    assert out[4].ewma == 30.0


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode windowed aggregate with a 1h watermark: an event
    arriving 2h late (behind the watermark) must be DROPPED from its
    already-finalized window, while the same plan in batch mode counts it.
    This pins the late-data policy the streaming extension documents."""
    import time as _time

    from pyspark.sql import functions as F, types as T
    from aidc_2018_timeseries_spark.streaming.windows import windowed_event_aggregate

    schema = T.StructType(
        [
            T.StructField("ts_utc", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    # Watermark mechanics pinned here: eviction of window [00:00,01:00)
    # happens during the batch AFTER the max event time passes
    # window_end + delay (state merges input BEFORE evicting, so a late
    # row arriving in the eviction batch still counts). The drop only
    # happens once the state is gone:
    #   batch 0: 00:10, 00:20, 03:00    (watermark during batch: epoch)
    #   batch 1: 03:30                  (watermark 02:00 -> [0,1h) emitted n=2)
    #   batch 2: 00:30 late, 06:00      (state evicted -> 00:30 DROPPED)
    rows1 = [("00:10", 1.0), ("00:20", 1.0), ("03:00", 1.0)]
    rows2 = [("03:30", 1.0)]
    rows3 = [("00:30", 1.0), ("06:00", 1.0)]
    feed = tmp_path / "feed"
    feed.mkdir()
    for i, rows in enumerate([rows1, rows2, rows3]):
        df = spark.createDataFrame(
            [(r[0], "k", r[1]) for r in rows], ["t", "event_type", "value"]
        ).selectExpr("to_timestamp(concat('2024-01-01 ', t)) AS ts_utc", "event_type", "value")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / f"chunk{i}"))
        import glob, shutil

        for f in glob.glob(str(tmp_path / f"chunk{i}" / "*.parquet")):
            shutil.copy(f, feed / f"{i}.parquet")
        _time.sleep(0.05)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(feed))
    )
    agg = windowed_event_aggregate(
        stream, ts_col="ts_utc", key="event_type", value="value",
        window="1 hour", watermark="1 hour",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_data")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: r["n"]
        for r in spark.sql("SELECT * FROM late_data").collect()
    }
    # streaming evicted [00:00, 01:00) before the late 00:30 arrived -> n=2
    assert got.get("2024-01-01 00:00:00") == 2, got

    # identical plan in batch mode counts the late event
    batch_rows = spark.read.schema(schema).parquet(str(feed))
    batch = {
        r["window_start"]: r["n"]
        for r in windowed_event_aggregate(
            batch_rows, ts_col="ts_utc", key="event_type", value="value", window="1 hour"
        ).collect()
    }
    assert batch["2024-01-01 00:00:00"] == 3


def test_ewma_final_fold_matches_stateful_recurrence(spark):
    """The oracle-checked array-fold face must agree with the
    applyInPandasWithState recurrence: the fold's per-key result equals
    the stateful operator's ewma at each key's LAST row."""
    from pyspark.sql import functions as F

    from aidc_2018_timeseries_spark.operators.metrics import ewma_final
    from aidc_2018_timeseries_spark.streaming.stateful import ewma_anomaly_batch
    from aidc_2018_timeseries_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events").select(
        "user_id", F.expr("ts div 1000").alias("t_us"), "event_id", "value"
    )
    fold = {
        r["user_id"]: (r["n"], r["ewma"])
        for r in ewma_final(ev, "user_id", ["t_us", "event_id"], "value", alpha=0.1).collect()
    }

    per_row = ewma_anomaly_batch(
        load_table(spark, SF_DIR, "events").select("user_id", "event_id", "ts", "value")
    )
    w_last = {}
    for r in per_row.collect():
        key = r["user_id"]
        cur = w_last.get(key)
        if cur is None or (r["ts"], r["event_id"]) > cur[:2]:
            w_last[key] = (r["ts"], r["event_id"], r["ewma"])
    assert set(fold) == set(w_last)
    for k, (_, ewma) in fold.items():
        assert abs(ewma - w_last[k][2]) < 1e-6, k
