"""Streaming replay test: the batch result over the static events table is
the golden reference; the same plan executed as a file stream
(availableNow trigger, memory sink) must produce identical rows.
"""

from __future__ import annotations

import pytest

from aidc_2018_timeseries_spark.sources.tables import load_table
from aidc_2018_timeseries_spark.streaming.windows import (
    sessionize_stream,
    windowed_event_aggregate,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory, spark):
    # Write the stream source from the ALREADY-NORMALIZED frame (ts = int64
    # nanos, ts_utc = µs timestamp) rather than copying the raw parquet:
    # copying raw bytes and reading them back with the normalized schema fed
    # epoch-µs into a nanos-typed column (round-3 red test). Streaming the
    # load_table output guarantees batch and stream see identical values by
    # construction, whatever physical type the testdata uses.
    d = tmp_path_factory.mktemp("events_stream")
    load_table(spark, SF_DIR, "events").write.mode("overwrite").parquet(str(d))
    return str(d)


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_sliding_window_stream_matches_batch(spark, stream_dir):
    static = load_table(spark, SF_DIR, "events")
    golden = sorted(
        map(
            tuple,
            windowed_event_aggregate(
                static, window="6 hours", slide="2 hours"
            ).collect(),
        )
    )
    assert golden, "batch golden must be non-empty for the test to mean anything"

    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    result = _run_stream(
        spark,
        windowed_event_aggregate(stream, window="6 hours", slide="2 hours"),
        "sliding_agg",
    )
    got = sorted(map(tuple, result.collect()))
    assert got == golden


def test_session_window_stream_matches_batch(spark, stream_dir):
    static = load_table(spark, SF_DIR, "events")
    golden = sorted(map(tuple, sessionize_stream(static).collect()))
    assert golden, "batch golden must be non-empty for the test to mean anything"

    stream = spark.readStream.schema(static.schema).parquet(stream_dir)
    result = _run_stream(spark, sessionize_stream(stream), "sessions")
    assert sorted(map(tuple, result.collect())) == golden


def test_interval_join_stream_matches_batch(spark, stream_dir):
    """Stream-stream interval join (clicks x errors within 10 min, per
    user) must equal the same join executed in batch over the static
    table. Both sides stream from the same file source, filtered by
    event type; watermarks + the bounded time condition let Spark evict
    join state, which is what makes the join runnable on infinite
    streams."""
    from pyspark.sql import functions as F

    from aidc_2018_timeseries_spark.streaming.joins import interval_join_streams

    static = load_table(spark, SF_DIR, "events")
    clicks_b = static.filter(F.col("event_type") == "click")
    errors_b = static.filter(F.col("event_type") == "error")
    golden = sorted(map(tuple, interval_join_streams(clicks_b, errors_b).collect()))
    assert golden, "batch golden must be non-empty for the test to mean anything"

    def stream():
        return spark.readStream.schema(static.schema).parquet(stream_dir)

    clicks_s = stream().filter(F.col("event_type") == "click")
    errors_s = stream().filter(F.col("event_type") == "error")
    joined = interval_join_streams(clicks_s, errors_s)
    q = (
        joined.writeStream.format("memory")
        .queryName("interval_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM interval_join").collect()))
    assert got == golden


def test_stream_static_enrich_matches_batch(spark, stream_dir):
    """Stream-static dimension enrichment: each micro-batch broadcast-joins
    the static nation-sized dim with zero streaming state; the result must
    equal the same left join in batch. The dim is derived per-user so some
    stream rows have no match (left-join nulls exercised)."""
    from pyspark.sql import functions as F

    from aidc_2018_timeseries_spark.streaming.joins import enrich_stream_with_static

    static = load_table(spark, SF_DIR, "events")
    # per-user "dimension": tier by user id, only for 2/3 of users so the
    # left join's null path is real
    dim = (
        static.select("user_id").distinct()
        .filter(F.col("user_id") % 3 != 0)
        .withColumn("tier", (F.col("user_id") % 5).cast("long"))
    )
    cols = ["user_id", "event_id", "value"]
    golden = sorted(
        map(
            tuple,
            enrich_stream_with_static(
                static.select(*cols), dim, "user_id", "user_id", ["tier"]
            ).collect(),
        )
    )
    assert any(r[-1] is None for r in golden), "null path must be exercised"
    assert any(r[-1] is not None for r in golden)

    stream = (
        spark.readStream.schema(static.drop("ts_utc").schema)
        .parquet(stream_dir)
        .select(*cols)
    )
    q = (
        enrich_stream_with_static(stream, dim, "user_id", "user_id", ["tier"])
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM enriched").collect()))
    assert got == golden
