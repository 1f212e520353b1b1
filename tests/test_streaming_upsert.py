"""foreachBatch upsert sink: after replaying the whole event stream, the
keyed parquet state must equal the batch latest-per-key computation; and
a mid-stream kill + checkpoint restart must converge to the same state
(idempotent latest-wins merge).
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.sources.tables import load_table
from aidc_2018_timeseries_spark.streaming.upsert import (
    latest_per_key,
    start_upsert_stream,
)
from tests.conftest import SF_DIR

COLS = ["user_id", "event_id", "ts", "value"]
KEYS = ["user_id"]
ORDER = ["ts", "event_id"]


@pytest.fixture(scope="module")
def feed_chunks(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("upsert_chunks")
    ev = load_table(spark, SF_DIR, "events").select(*COLS)
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    conds = [
        F.col("ts") <= cut1,
        (F.col("ts") > cut1) & (F.col("ts") <= cut2),
        F.col("ts") > cut2,
    ]
    for i, cond in enumerate(conds):
        ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(str(d / f"chunk_{i}"))
    return [str(d / f"chunk_{i}") for i in range(3)], ev


def _fill_feed(chunk_dirs, feed):
    feed.mkdir(exist_ok=True)
    for i, cd in enumerate(chunk_dirs):
        for f in glob.glob(os.path.join(cd, "*.parquet")):
            shutil.copy(f, feed / f"{i}.parquet")
            time.sleep(0.05)


def _golden(ev):
    return sorted(map(tuple, latest_per_key(ev, KEYS, ORDER).collect()))


def test_upsert_state_equals_batch_latest(spark, feed_chunks, tmp_path):
    chunk_dirs, ev = feed_chunks
    feed = tmp_path / "feed"
    _fill_feed(chunk_dirs, feed)
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = start_upsert_stream(stream, spark, state, ckpt, KEYS, ORDER)
    q.awaitTermination(180)

    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert got == _golden(ev)
    # state is keyed: exactly one row per user
    assert len(got) == ev.select("user_id").distinct().count()


def test_upsert_recovers_from_checkpoint(spark, feed_chunks, tmp_path):
    chunk_dirs, ev = feed_chunks
    feed = tmp_path / "feed"
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")

    # phase 1: only the first chunk exists; stream drains it and stops
    feed.mkdir()
    for f in glob.glob(os.path.join(chunk_dirs[0], "*.parquet")):
        shutil.copy(f, feed / "0.parquet")
    stream1 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q1 = start_upsert_stream(stream1, spark, state, ckpt, KEYS, ORDER)
    q1.awaitTermination(180)
    partial = spark.read.parquet(state).count()
    assert partial > 0

    # phase 2: remaining chunks arrive; restart from the SAME checkpoint
    for i, cd in enumerate(chunk_dirs[1:], start=1):
        for f in glob.glob(os.path.join(cd, "*.parquet")):
            shutil.copy(f, feed / f"{i}.parquet")
            time.sleep(0.05)
    stream2 = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q2 = start_upsert_stream(stream2, spark, state, ckpt, KEYS, ORDER)
    q2.awaitTermination(180)

    got = sorted(map(tuple, spark.read.parquet(state).collect()))
    assert got == _golden(ev)
