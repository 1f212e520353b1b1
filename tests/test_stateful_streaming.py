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
