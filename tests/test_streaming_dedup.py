"""Streaming first-seen dedup replay: documents fed as three ordered
micro-batches must yield exactly one surviving row per distinct content
hash with per-key state carried across micro-batch boundaries — a
duplicate arriving in a LATER file than its original must be dropped.

The corpus has no exact duplicates, so the fixture PLANTS them: copies of
chunk-0 docs in chunks 1 and 2 with uppercasing and doubled whitespace
(normalization-equivalent — also exercises the shared content_hash
normalization)."""

from __future__ import annotations

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.dedup import content_hash
from aidc_2018_timeseries_spark.streaming.dedup import dedup_documents_stream
from aidc_2018_timeseries_spark.sources.tables import load_table
from tests.conftest import SF_DIR

_DUP_OFFSET = 1_000_000


@pytest.fixture(scope="module")
def doc_chunks(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("doc_chunks")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n = docs.count()
    cut1, cut2 = n // 3, 2 * n // 3
    mangled = F.upper(F.regexp_replace(F.col("text"), " ", "  "))
    dup1 = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + _DUP_OFFSET).alias("doc_id"), mangled.alias("text")
    )
    dup2 = docs.filter((F.col("doc_id") >= cut1) & (F.col("doc_id") < cut1 + 20)).select(
        (F.col("doc_id") + 2 * _DUP_OFFSET).alias("doc_id"), mangled.alias("text")
    )
    chunks = [
        docs.filter(F.col("doc_id") < cut1),
        docs.filter((F.col("doc_id") >= cut1) & (F.col("doc_id") < cut2)).unionByName(dup1),
        docs.filter(F.col("doc_id") >= cut2).unionByName(dup2),
    ]
    for i, c in enumerate(chunks):
        c.coalesce(1).write.mode("overwrite").parquet(str(d / f"chunk_{i}"))
    full = docs.unionByName(dup1).unionByName(dup2)
    return [str(d / f"chunk_{i}") for i in range(3)], full


def test_stream_dedup_matches_batch(spark, doc_chunks, tmp_path):
    chunk_dirs, docs = doc_chunks
    batch_hashes = {
        r[0] for r in docs.select(content_hash("text")).distinct().collect()
    }
    # cross-chunk duplicates must exist, or this test proves nothing
    per_chunk_distinct = sum(
        spark.read.parquet(cd).select(content_hash("text")).distinct().count()
        for cd in chunk_dirs
    )
    assert per_chunk_distinct >= len(batch_hashes) + 40, "duplicates not planted"

    feed = tmp_path / "feed"
    feed.mkdir()
    for i, cd in enumerate(chunk_dirs):
        for f in glob.glob(os.path.join(cd, "*.parquet")):
            shutil.copy(f, feed / f"{i}.parquet")
            time.sleep(0.05)  # distinct mod-times → deterministic file order

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed))
    )
    q = (
        dedup_documents_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = spark.sql("SELECT doc_id, content_hash FROM dedup_out").collect()
    got_hashes = [r["content_hash"] for r in out]
    # exactly one survivor per distinct hash, covering the batch hash set
    assert len(got_hashes) == len(set(got_hashes)) == len(batch_hashes)
    assert set(got_hashes) == batch_hashes
    # no planted copy may survive: its original arrived in an earlier chunk
    assert all(r["doc_id"] < _DUP_OFFSET for r in out)
    # every surviving (doc_id, hash) pair is genuine
    valid = {
        (r["doc_id"], r["h"])
        for r in docs.select("doc_id", content_hash("text").alias("h")).collect()
    }
    assert all((r["doc_id"], r["content_hash"]) in valid for r in out)
