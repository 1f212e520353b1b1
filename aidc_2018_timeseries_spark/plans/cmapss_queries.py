"""CMAPSS ingest catalog face (SURVEY §2.1 S1–S3) over a committed fixture.

The sf testdata has no CMAPSS-shaped CSV, so this face runs on a small
deterministic fixture committed in ``aidc_2018_timeseries_spark/fixtures/``:
space-delimited headerless lines, 26 real columns plus a trailing-space
ghost column (reference ``datasets/turbofan.py:166-175``), null holes in
sensor columns (bfill path, ``turbofan.py:167``), and a companion RUL file
of one integer per line keyed by file order (positional join,
``turbofan.py:97-104``). The DuckDB oracle re-reads the same files with
``read_csv`` and reproduces every step in SQL, so the driver's gate checks
the full ingest semantics: ghost-column drop, backfill, setting scaling
(``turbofan.py:244-246``), positional RUL join, and the capped RUL label
(base_rul + L − t, capped — ``turbofan.py:151-153`` + label cap P5).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.plans.catalog import register
from aidc_2018_timeseries_spark.sources.cmapss import (
    FEATURE_COLS,
    read_cmapss,
    read_rul_file,
)

_FIXTURES = Path(__file__).resolve().parent.parent / "fixtures"
_DATA = str(_FIXTURES / "cmapss_val.txt")
_RUL = str(_FIXTURES / "cmapss_rul.txt")

_RUL_CAP = 130

# DuckDB column spec: same 26 real columns the Spark reader declares, plus
# the ghost columns (null_padding covers lines with fewer trailing tokens).
_DUCK_COLS = ", ".join(
    ["'trajectory_id': 'INTEGER'", "'t': 'INTEGER'"]
    + [f"'{c}': 'DOUBLE'" for c in FEATURE_COLS]
    + ["'_ghost_1': 'VARCHAR'", "'_ghost_2': 'VARCHAR'"]
)

_ORACLE = f"""
WITH raw AS (
  SELECT * FROM read_csv('{_DATA}', delim=' ', header=false, auto_detect=false,
                         null_padding=true, columns={{{_DUCK_COLS}}})),
filled AS (
  -- backfill EVERY emitted feature column, exactly like the Spark reader
  -- (read_cmapss bfills all 24 feature columns): the oracle must not
  -- depend on WHERE the fixture's null holes happen to sit — a
  -- regenerated fixture with a hole in setting_1 must stay green (r4
  -- advice item 2)
  SELECT trajectory_id, t,
         FIRST_VALUE(setting_1 IGNORE NULLS) OVER w AS setting_1,
         FIRST_VALUE(sensor_2 IGNORE NULLS) OVER w AS s2f,
         FIRST_VALUE(sensor_7 IGNORE NULLS) OVER w AS s7f,
         MAX(t) OVER (PARTITION BY trajectory_id) AS max_t
  FROM raw
  WINDOW w AS (PARTITION BY trajectory_id ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
rul AS (
  SELECT row_number() OVER () AS trajectory_ordinal, base_rul
  FROM read_csv('{_RUL}', header=false, auto_detect=false,
                columns={{'base_rul': 'INTEGER'}}))
SELECT f.trajectory_id, f.t,
       ROUND(f.s2f, 6) AS sensor_2_filled,
       ROUND(f.s7f, 6) AS sensor_7_filled,
       ROUND(f.setting_1 / 100, 6) AS setting_1_scaled,
       r.base_rul,
       LEAST(r.base_rul + f.max_t - f.t, {_RUL_CAP}) AS rul_label
FROM filled f JOIN rul r ON f.trajectory_id = r.trajectory_ordinal
"""


@register(
    "cmapss_ingest_rul",
    _ORACLE,
    doc="S1–S3 CMAPSS ingest on a committed CSV fixture: ghost-column drop, "
    "per-trajectory bfill, setting/100 scaling, positional RUL-file join, "
    "capped RUL label",
)
def cmapss_ingest_rul(spark: SparkSession, sf_dir: str) -> DataFrame:
    # sf_dir is unused: the face reads the committed fixture so the oracle
    # can re-read the identical bytes. Fixture is engine-scale-agnostic —
    # the same plan runs on the real 26-col files at any size.
    df = read_cmapss(spark, _DATA)
    rul = read_rul_file(spark, _RUL)
    max_t = F.max("t").over(Window.partitionBy("trajectory_id"))
    return (
        df.withColumn("max_t", max_t)
        .join(F.broadcast(rul), F.col("trajectory_id") == F.col("trajectory_ordinal"))
        .select(
            "trajectory_id",
            "t",
            F.round("sensor_2", 6).alias("sensor_2_filled"),
            F.round("sensor_7", 6).alias("sensor_7_filled"),
            F.round(F.col("setting_1") / 100, 6).alias("setting_1_scaled"),
            "base_rul",
            # cast: int arithmetic is int32 in Spark, int64 in DuckDB — the
            # driver's value hash is type-sensitive (verify-skill gotcha)
            F.least(F.col("base_rul") + F.col("max_t") - F.col("t"), F.lit(_RUL_CAP))
            .cast("long")
            .alias("rul_label"),
        )
    )
