"""Time-series joins: as-of join and point-in-interval range join.

The reference has NO joins (SURVEY §2.7 — its only key alignment is
positional); these are the engine-complete additions every time-series
store needs, and the closest reference behavior is the W4 "last window
before cutoff" extraction (``datasets/turbofan.py:151-153``), which is an
as-of lookup in disguise.

Scale design — the whole point of these implementations:

**As-of join** is NOT expressed as a range join + row_number (that plan is
a BroadcastNestedLoop or an exploding theta-join at 100 TB). It is the
union-merge formulation: tag both sides, union them, hash-partition by
key, sort by (time, side) within partitions, and propagate the most recent
right-side payload with ``last(..., ignorenulls=True)`` over an unbounded
trailing frame. One shuffle, linear work, no row amplification — the same
merge-sort strategy Pandas ``merge_asof`` and kdb ``aj`` use, expressed
declaratively so Catalyst/AQE handle partitioning and skew.

**Range join** (points to intervals) equi-joins on a time BUCKET of fixed
width plus a residual range predicate. Each interval is exploded into the
ceil(len/width)+1 buckets it overlaps; each point probes exactly one
bucket. Catalyst plans a shuffled hash join on (key, bucket) instead of a
nested-loop — bucket width trades replication (long intervals → many
buckets) against selectivity (wide buckets → more residual filtering), so
pick it near the typical interval length.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MATCH_TS = "_asof_match_ts"


def _keys(on: str | Sequence[str]) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str | None = None,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: int | float | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Left as-of join: attach, to every left row, the payload of the
    right row with the greatest ``right_ts`` <= ``left_ts`` (direction
    ``backward``, inclusive) or the smallest ``right_ts`` >= ``left_ts``
    (``forward``) within the same key group. Unmatched left rows keep
    nulls (left-outer semantics, like DuckDB ``ASOF LEFT JOIN`` and pandas
    ``merge_asof``).

    ``tolerance`` (same units as the ts columns — use raw int64 nanos for
    exactness) nulls out matches farther than the bound, like pandas
    ``merge_asof(tolerance=...)``.

    Ties: right rows sharing (key, ts) are matched arbitrarily — callers
    wanting determinism must dedupe or make ts unique. Left/right rows at
    the SAME instant do match (inclusive).

    Returns all left columns + ``right_cols`` (+ ``matched_ts_col`` if
    requested). Column name collisions must be resolved by the caller
    (select/alias) beforehand.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = _keys(on)
    rts = right_ts or left_ts
    right_cols = [c for c in (right_cols or right.columns) if c not in (*keys, rts)]
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"right_cols collide with left columns: {sorted(overlap)}")

    payload = F.struct(*[F.col(c) for c in right_cols])
    payload_type = right.select(payload.alias("p")).schema["p"].dataType
    ts_type = left.schema[left_ts].dataType

    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).cast(ts_type).alias("_t"),
        F.lit(None).cast(payload_type).alias("_p"),
        F.lit(0).alias("_is_right"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        F.col(rts).cast(ts_type).alias("_t"),
        payload.alias("_p"),
        F.lit(1).alias("_is_right"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in keys
        ],
    )
    u = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # At equal ts the right row must be visible to the left row →
        # sort right first (desc on the tag) and look backward.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_is_right").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("_t").asc(), F.col("_is_right").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    m = u.withColumn("_match", pick(F.col("_p"))).withColumn(
        _MATCH_TS, pick(F.when(F.col("_is_right") == 1, F.col("_t")))
    )
    m = m.filter(F.col("_is_right") == 0)

    if tolerance is not None:
        gap = (
            (F.col("_t") - F.col(_MATCH_TS))
            if direction == "backward"
            else (F.col(_MATCH_TS) - F.col("_t"))
        )
        ok = gap <= F.lit(tolerance)
        m = m.withColumn("_match", F.when(ok, F.col("_match"))).withColumn(
            _MATCH_TS, F.when(ok, F.col(_MATCH_TS))
        )

    out_cols: list[Column] = [F.col(c) for c in left.columns]
    out_cols += [F.col("_match")[c].alias(c) for c in right_cols]
    if matched_ts_col:
        out_cols.append(F.col(_MATCH_TS).alias(matched_ts_col))
    return m.select(*out_cols)


def range_join_points_to_intervals(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    on: str | Sequence[str] | None = None,
    bucket_width: int | float = None,
    closed: str = "left",
) -> DataFrame:
    """Inner-join each point row to every interval row it falls inside
    (``start <= point < end`` for ``closed='left'``; ``'both'`` makes the
    end inclusive), optionally also matching on equi-keys ``on``.

    ``bucket_width`` (required; same units as the time columns) is the
    equi-join bucketing trick described in the module docstring. Intervals
    longer than ~100× the width replicate heavily — pick width near the
    typical interval length.

    Output: all point columns + all interval columns (caller resolves name
    collisions beforehand).
    """
    if bucket_width is None or bucket_width <= 0:
        raise ValueError("bucket_width must be a positive number")
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be left|both, got {closed!r}")
    keys = _keys(on) if on else []
    overlap = (set(points.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(f"column collisions between sides: {sorted(overlap)}")

    def _bucket(df: DataFrame, col: str) -> Column:
        # Integral time columns use integer floor-division: `/` casts to
        # double, and int64 ns epochs (~1.7e18) exceed double's 2^53
        # mantissa, losing ~128ns — points/intervals near bucket boundaries
        # would silently land in mismatched buckets.  (Any monotone
        # bucketing is join-correct as long as BOTH sides share it; the
        # exact range predicate below removes false positives.)
        integral_col = dict(df.dtypes).get(col) in ("bigint", "int", "smallint", "tinyint")
        if integral_col and float(bucket_width).is_integer():
            return F.expr(f"`{col}` div {int(bucket_width)}")
        return F.floor(F.col(col) / F.lit(bucket_width))

    p = points.withColumn("_bucket", _bucket(points, point_col))
    i = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(_bucket(intervals, start_col), _bucket(intervals, end_col))),
    )
    end_pred = (
        (F.col(point_col) < F.col(end_col))
        if closed == "left"
        else (F.col(point_col) <= F.col(end_col))
    )
    cond = (F.col(point_col) >= F.col(start_col)) & end_pred
    joined = p.join(i, on=[*keys, "_bucket"], how="inner").filter(cond)
    return joined.drop("_bucket")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: scatter the big side's hot keys across
    ``n_salts`` sub-keys and replicate the small side once per salt, so no
    single reducer receives a whole hot key's rows.

    Use when a shuffle join skews on a few heavy keys AND the small side is
    too big to broadcast (the first resort) — the standard salting
    pattern; AQE's skew-join split only rescues sort-merge joins whose
    skew is visible at shuffle-size level, while salting also fixes
    downstream per-key windowing built on the join's partitioning.

    Cost: small side × n_salts replication; result is row-identical to a
    plain join (salt never leaks into output). Only ``inner`` and ``left``
    are supported: replicating the small side per salt breaks outer/anti
    semantics on that side (an unmatched small row would surface once per
    salt).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner|left, got {how!r}")
    keys = _keys(on)
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    salted_small = small.select("*", salts)
    out = salted_big.join(salted_small, on=[*keys, "_salt"], how=how)
    return out.drop("_salt")
