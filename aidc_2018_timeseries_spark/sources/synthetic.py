"""Synthetic generators (SURVEY §2.1 S5 — the adding problem).

The reference draws from NumPy RNG (``datasets/adding.py:17-31``); RNG
parity across engines is impossible, so this generator derives every
"random" draw from the md5-based hash64 of (sample, position) — fully
deterministic, identical in the DuckDB oracle, and embarrassingly parallel
(``spark.range`` partitions the id space; no data is ever shipped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.functions.hashing import hash64

#: 2^60 — hash64 values divided by this are U[0,1) doubles
_SPACE = float(1 << 60)


def _u(tag: str, *cols) -> F.Column:
    """Deterministic U[0,1) from a tagged tuple of columns."""
    key = F.concat_ws(":", F.lit(tag), *[c.cast("string") for c in cols])
    return hash64(key) / F.lit(_SPACE)


def adding_problem(
    spark: SparkSession, n_samples: int = 1000, seq_len: int = 50
) -> DataFrame:
    """The adding problem: values ~ U(0,1) of length T, a mask with exactly
    two distinct 1-positions, label = sum of the two masked values.

    Distinct positions via the classic trick: draw pos1 uniform on [0,T),
    draw pos2 uniform on [0,T-1) and bump it past pos1 — uniform over
    pairs, no rejection loop.
    """
    df = spark.range(n_samples).withColumnRenamed("id", "sample_id")
    sid = F.col("sample_id")
    pos1 = hash64(F.concat(F.lit("p1:"), sid.cast("string"))) % seq_len
    pos2_raw = hash64(F.concat(F.lit("p2:"), sid.cast("string"))) % (seq_len - 1)
    pos2 = F.when(pos2_raw >= pos1, pos2_raw + 1).otherwise(pos2_raw)
    df = df.withColumn("pos1", pos1.cast("long")).withColumn("pos2", pos2.cast("long"))
    values = F.transform(
        F.sequence(F.lit(0), F.lit(seq_len - 1)), lambda j: _u("v", sid, j)
    )
    df = df.withColumn("values", values)
    label = F.round(
        F.element_at("values", (F.col("pos1") + 1).cast("int"))
        + F.element_at("values", (F.col("pos2") + 1).cast("int")),
        6,
    )
    return df.withColumn("label", label)
