"""Catalog queries: sink round-trips (SURVEY §2.1 S7-S8).

The reference's sinks are driver-side JSON metric dumps and model
checkpoints (reference training/timeseries_trainer.py:114-118); the
engine-side analogue is a partitioned columnar write of a derived dataset
that later stages read back with partition pruning. This face makes the
write path driver-checkable: the one §2.1 row that previously only had
pytest coverage (round-4 verdict, "What's missing" item 3).

The oracle ignores the filesystem hop entirely — parquet round-trips
doubles and bigints losslessly, so write → read-back → aggregate must
equal the same aggregate computed directly. That equality (checked by the
driver's value hash) IS the sink correctness statement.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.plans.catalog import register
from aidc_2018_timeseries_spark.sources.sinks import compact_parquet, write_partitioned
from aidc_2018_timeseries_spark.sources.tables import load_table


@register(
    "sink_roundtrip_partitioned",
    """
    WITH per_user AS (
      SELECT event_type, user_id,
             COUNT(*) AS n_events,
             ROUND(SUM(value), 6) AS sum_value
      FROM events GROUP BY event_type, user_id)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           ROUND(SUM(sum_value), 4) AS total_value
    FROM per_user
    WHERE event_type IN ('click', 'view')
    GROUP BY event_type
    """,
    doc="S7/S8 sink round-trip: per-(type, user) aggregates written as "
    "parquet PARTITIONED BY event_type (the downstream filter key), read "
    "back with a partition-pruned filter, re-aggregated. The oracle "
    "computes the same numbers with no filesystem hop — matching hashes "
    "prove the sink is lossless and the read-back path (including "
    "partition-column reconstruction from directory names) is correct. "
    "At 100 TB: writers scale with input partitions (no driver funnel) "
    "and the read prunes to 2 of N type directories before any IO. Inner "
    "sums are rounded at 6 dp on both sides (repo float convention); the "
    "outer re-sum of those exact rounded values rounds at 4 dp so "
    "summation-order ulp noise cannot flip the value hash.",
)
def sink_roundtrip_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    )
    # tempdir is intentionally NOT deleted here: the returned DataFrame
    # reads it lazily, and the driver collects after this function returns
    path = tempfile.mkdtemp(prefix="aidc_sink_roundtrip_")
    write_partitioned(per_user, path, partition_by=["event_type"])
    back = spark.read.parquet(path)
    return (
        back.where(F.col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 4).alias("total_value"),
        )
    )


@register(
    "source_jsonl_roundtrip",
    """
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY lang, source
    """,
    doc="JSONL corpus ingest (the wire format LLM corpora actually ship "
    "in): documents are written as newline-delimited JSON, then read "
    "back with an EXPLICIT schema (never inference — at 100 TB schema "
    "inference is a full extra pass over every byte) in PERMISSIVE mode "
    "with a dead-letter _corrupt_record column (the events_json_"
    "quarantine pattern at the file-source layer), and re-aggregated. "
    "Matching the direct-parquet aggregate proves the JSON round-trip "
    "is lossless for every column type used (strings incl. full unicode "
    "text bodies, bigints) and that zero rows leaked into the corrupt "
    "bucket. Line-delimited JSON splits by newline, so reads "
    "parallelize per HDFS block exactly like CSV",
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="aidc_jsonl_")
    d.write.mode("overwrite").json(path)
    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long, _corrupt_record string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    good = back.where(F.col("_corrupt_record").isNull())
    return good.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


@register(
    "sink_schema_evolution_read",
    """
    WITH v1 AS (
      SELECT user_id, COUNT(*) AS n_events
      FROM events WHERE event_id % 2 = 0 GROUP BY user_id),
    v2 AS (
      SELECT user_id, COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_errors
      FROM events WHERE event_id % 2 = 1 GROUP BY user_id),
    merged AS (
      SELECT 1 AS version, user_id, n_events, CAST(NULL AS BIGINT) AS n_errors FROM v1
      UNION ALL
      SELECT 2 AS version, user_id, n_events, n_errors FROM v2)
    SELECT version,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(SUM(n_errors) AS BIGINT) AS n_errors
    FROM merged GROUP BY version
    """,
    doc="schema-evolution read (the ingest reality of any long-lived "
    "dataset: writers gain columns over time): a v1 writer emits "
    "(user_id, n_events), a v2 writer adds n_errors, each landing under "
    "its own version=N partition directory; the read opens the WHOLE "
    "dataset with mergeSchema=true, so v1 files surface the new column "
    "as NULL and the version partition column is reconstructed from "
    "directory names. The aggregate proves both that no rows were lost "
    "across the schema boundary and that NULL-vs-0 semantics survive "
    "(v1's n_errors aggregates to NULL, never 0). At 100 TB schema "
    "merge reads footers only — data files are never rewritten when a "
    "column is added",
)
def sink_schema_evolution_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v1 = ev.where(F.col("event_id") % 2 == 0).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    v2 = ev.where(F.col("event_id") % 2 == 1).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("n_errors"),
    )
    path = tempfile.mkdtemp(prefix="aidc_schema_evo_")
    v1.write.mode("overwrite").parquet(f"{path}/version=1")
    v2.write.mode("overwrite").parquet(f"{path}/version=2")
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy("version").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n_events").alias("n_events"),
        F.sum("n_errors").alias("n_errors"),
    )


@register(
    "sink_compact_small_files",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="small-file compaction round-trip (the maintenance job every "
    "incremental/streaming sink needs): events are first written "
    "deliberately fragmented (64 round-robin files — a stand-in for "
    "per-trigger micro-batch output), then compacted to "
    "ceil(total_bytes/target) evenly-sized files via one distributed "
    "repartition+rewrite (sizing reads file METADATA only, "
    "tests/test_sinks.py asserts the file count actually shrinks), and "
    "the aggregate over the compacted copy must equal the aggregate "
    "over the raw table — compaction is pure layout, rows are "
    "untouched. At 100 TB the read side of a compacted sink pays one "
    "parquet footer per ~128 MB instead of one per micro-batch trigger",
)
def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    frag = tempfile.mkdtemp(prefix="aidc_frag_")
    compacted = tempfile.mkdtemp(prefix="aidc_compact_")
    ev.repartition(64).write.mode("overwrite").parquet(frag)
    compact_parquet(spark, frag, compacted, target_bytes=4 * 1024 * 1024)
    back = spark.read.parquet(compacted)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
    )
