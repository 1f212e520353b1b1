"""sessionize_bucketed == plain sessionize, row for row — the hierarchical
stitch must reproduce the exact session numbering on corpora engineered
to cross bucket boundaries every way a session can."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.intervals import sessionize_bucketed

GAP = 1_000
BUCKET = 10_000


def _plain(df):
    w = Window.partitionBy("k").orderBy("us", "id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flags = df.withColumn(
        "new_session",
        F.when(F.col("us") - F.lag("us").over(w) > GAP, 1).otherwise(0),
    )
    return flags.withColumn(
        "session_id", F.sum("new_session").over(cum).cast("long")
    ).drop("new_session")


def _collect(df):
    return sorted(
        (r["k"], r["id"], r["us"], r["session_id"]) for r in df.collect()
    )


def _random_corpus(seed):
    """Timestamps built from gap steps that land on every boundary class:
    exactly GAP (same session), GAP+1 (new session), bucket-crossing
    steps, long dead stretches spanning several empty buckets."""
    rng = random.Random(seed)
    rows = []
    rid = 0
    for k in range(4):
        us = rng.randrange(0, 5_000)
        for _ in range(rng.randrange(30, 120)):
            rows.append((k, rid, us))
            rid += 1
            step = rng.choice(
                [0, 1, GAP, GAP, GAP + 1, 3_000, BUCKET - 1, BUCKET + 1, 4 * BUCKET]
            )
            us += step
    return rows


def test_bucketed_equals_plain_on_random_corpora(spark):
    for seed in range(5):
        df = spark.createDataFrame(
            _random_corpus(seed), "k long, id long, us long"
        )
        got = _collect(
            sessionize_bucketed(df, "k", "us", "id", gap_us=GAP, bucket_us=BUCKET)
        )
        want = _collect(_plain(df))
        assert got == want, f"seed {seed}"


def test_session_spanning_many_buckets_stays_one_session(spark):
    # events every GAP us across 10 buckets: one long session
    rows = [(1, i, i * GAP) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, id long, us long")
    out = sessionize_bucketed(df, "k", "us", "id", gap_us=GAP, bucket_us=BUCKET)
    assert out.select("session_id").distinct().count() == 1
    assert out.agg(F.max("session_id")).first()[0] == 0


def test_hot_key_partitions_are_bounded(spark):
    """The point of the operator: no window partition may exceed the
    bucket's event count, no matter how hot the key."""
    rows = [(1, i, i * 7) for i in range(50_000)]  # one user, dense stream
    df = spark.createDataFrame(rows, "k long, id long, us long")
    out = sessionize_bucketed(df, "k", "us", "id", gap_us=GAP, bucket_us=BUCKET)
    want = _collect(_plain(df))
    assert _collect(out) == want
    # sanity on the plan: the big-side window partitions by (k, bucket)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_sb_b" in plan


def test_negative_timestamps_floor_bucketed(spark):
    """Negative us must land in true floor buckets (ADVICE r6: the old
    truncate-toward-zero cast gave bucket 0 double width below zero —
    numbering still matched, but the partition bound silently doubled).
    Equality to plain AND distinct bucket widths are both checked."""
    rows = [(1, i, -35_000 + i * 900) for i in range(80)]  # spans us < 0 and >= 0
    df = spark.createDataFrame(rows, "k long, id long, us long")
    out = sessionize_bucketed(df, "k", "us", "id", gap_us=GAP, bucket_us=BUCKET)
    assert _collect(out) == _collect(_plain(df))
    # floor semantics: us=-1 and us=0 are in different buckets
    probe = spark.createDataFrame(
        [(1, 0, -1), (1, 1, 0)], "k long, id long, us long"
    ).withColumn(
        "b", F.expr(f"((us - pmod(us, {BUCKET})) div {BUCKET})")
    )
    got = {r["us"]: r["b"] for r in probe.collect()}
    assert got == {-1: -1, 0: 0}


def test_helper_column_collision_raises(spark):
    df = spark.createDataFrame(
        [(1, 1, 1, 9)], "k long, id long, us long, _sb_off long"
    )
    try:
        sessionize_bucketed(df, "k", "us", "id", gap_us=GAP, bucket_us=BUCKET)
    except ValueError as e:
        assert "_sb_off" in str(e)
    else:
        raise AssertionError("expected ValueError on _sb_off collision")
