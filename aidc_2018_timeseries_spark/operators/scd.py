"""Slowly-changing-dimension (type 2) compaction from a change stream.

The reference has no mutable state at all (SURVEY §2.7 — batch tensors
only); a production pipeline over the same engine needs the CDC side:
turn an append-only stream of per-key attribute observations into
validity intervals — "key held attribute X from t0 until t1" — the
standard SCD2 dimension build / MERGE-INTO compaction, expressed as a
pure batch plan (no mutable table required).

Algorithm (one shuffle, all windows share the per-key partitioning):
  1. order each key's rows by (time, tiebreak);
  2. run boundary = attribute differs from the previous row's (lag);
  3. run id = cumulative sum of boundaries;
  4. collapse each run to one interval row (groupBy key+run);
  5. valid_to = the NEXT run's valid_from (lead over runs; NULL = still
     current).

Scale shape: the windows in 2/3/5 and the groupBy in 4 are all keyed by
the same column, so Catalyst plans ONE exchange; per-key state is the
key's own history. At 100 TB the change stream is the fact table and
this is a scan + single keyed shuffle — no self-join, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_compact(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Compact consecutive equal ``attr_col`` runs per key into SCD2
    intervals (key, attr, valid_from, valid_to, n_obs).

    ``valid_from`` = first observation time of the run; ``valid_to`` =
    the next run's valid_from (exclusive), NULL for the current run.
    ``ts_col`` must be totally ordered per key once ``tiebreak_col``
    breaks ties.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    runs = df.select(key_col, ts_col, tiebreak_col, attr_col).withColumn(
        "chg",
        F.when(
            F.lag(attr_col).over(w).isNull()
            | (F.lag(attr_col).over(w) != F.col(attr_col)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("run_id", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    iv = runs.groupBy(key_col, "run_id").agg(
        F.min(attr_col).alias("attr"),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    nxt = Window.partitionBy(key_col).orderBy("run_id")
    return iv.select(
        key_col,
        F.col("run_id"),
        "attr",
        "valid_from",
        F.lead("valid_from").over(nxt).alias("valid_to"),
        "n_obs",
    )
