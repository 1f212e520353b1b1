"""Relational catalog queries: joins / aggregations / set ops / ranking.

The reference has NONE of these (SURVEY §2.7) — its only key alignment is
positional. A complete engine needs them, so they are first-class here,
exercised TPC-H-style on the driver's star schema.

Scale notes baked into each plan:
- dimension joins (region/nation/supplier/part/customer) are explicitly
  ``broadcast()`` — at 100 TB the fact tables shuffle, dims never do;
- aggregations are expressed so partial (map-side) aggregation applies;
- top-k per group uses window rank, not global sort;
- AQE handles skew re-splitting at runtime (enabled in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.plans.catalog import register
from aidc_2018_timeseries_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- TPC-H Q1 shape: scan + filter + groupBy aggregate ---
@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="pricing summary: filter pushdown + hash aggregate with partial agg",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- TPC-H Q3 shape: 3-way join + group + top-k ---
@register(
    "q3_shipping_priority",
    """
    WITH agg AS (
      SELECT l.l_orderkey,
             ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
             STRFTIME(o.o_orderdate, '%Y-%m-%d') AS orderdate
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-03-15'
        AND l.l_shipdate > TIMESTAMP '1996-03-15'
      GROUP BY l.l_orderkey, o.o_orderdate),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, l_orderkey) AS rk FROM agg)
    SELECT l_orderkey, revenue, orderdate FROM ranked WHERE rk <= 10
    """,
    doc="3-way join (customer broadcast) + agg + deterministic top-10",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp_ntz")
    )
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .withColumn("orderdate", F.date_format("o_orderdate", "yyyy-MM-dd"))
    )
    # Top-10 via orderBy+limit → TakeOrderedAndProject (per-partition top-k,
    # merged on one reducer) — NOT a global row_number window, which would
    # move every aggregated row through a single partition at scale.
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate")
    )


# --- TPC-H Q5 shape: 6-way join through the star schema ---
@register(
    "q5_region_revenue",
    """
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_nationkey = s.s_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    doc="local-supplier volume: fact-fact join + 4 broadcast dims",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


# --- semi / anti joins ---
@register(
    "join_anti_customers_without_orders",
    """
    SELECT c_custkey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    doc="left-anti join (NOT EXISTS)",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register(
    "join_semi_parts_ordered",
    """
    SELECT COUNT(*) AS n_parts_ordered FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
    """,
    doc="left-semi join (EXISTS) + count",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_parts_ordered"))
    )


# --- grouping sets: rollup / cube ---
@register(
    "rollup_lineitem",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (absent in reference; engine-complete)",
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "cube_orders",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
           COALESCE(o_orderpriority, 'ALL') AS orderpriority,
           ROUND(SUM(o_totalprice), 2) AS sum_price, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping sets",
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("sum_price"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "sum_price",
            "n",
        )
    )


# --- manual pivot (CASE aggregation — identical SQL shape both engines) ---
@register(
    "pivot_qty_by_status",
    """
    SELECT l_returnflag,
           ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_o,
           ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="pivot on linestatus via conditional aggregation",
)
def pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)), 2
        ).alias("qty_o"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)), 2
        ).alias("qty_f"),
    )


# --- unpivot (melt): wide measures → long (the inverse of pivot) ---
@register(
    "unpivot_lineitem_measures",
    """
    WITH f AS (SELECT * FROM lineitem
               WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                 AND l_shipdate < TIMESTAMP '1996-02-01')
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM f
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM f
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM f
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM f
    """,
    doc="unpivot/melt: four measure columns to long form via the native "
    "DataFrame.unpivot (Expand node — one scan, rows generated "
    "executor-side, no shuffle); oracle restates it as UNION ALL",
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp_ntz"))
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


# --- set operations ---
@register(
    "setop_active_minus_building",
    """
    SELECT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    doc="EXCEPT set difference (reference only has bag-union O5)",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )
    return o.subtract(c)  # EXCEPT DISTINCT semantics, matching the oracle


@register(
    "union_distinct_keys",
    """
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      UNION
      SELECT c_custkey AS custkey FROM customer) u
    """,
    doc="UNION DISTINCT (reference O5 is bag concat; this is the set form)",
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.union(c).distinct()


# --- top-k per group via window rank ---
@register(
    "topk_lineitems_per_supplier",
    """
    WITH r AS (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rk
      FROM lineitem)
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice
    FROM r WHERE rk <= 3
    """,
    doc="top-3 per group by window rank (no global sort)",
)
def topk_per_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    )



#: gap-based sessionization, single source of truth for the 30-min gap and
#: the (µs, event_id) tie order — shared by events_sessionize and
#: events_top_session_paths (SQL and Spark sides each defined ONCE here).
_SESSION_GAP_US = 30 * 60 * 1_000_000

_SESSION_CTES = f"""flags AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
                  > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
      FROM events),
    sess AS (
      SELECT user_id, event_id, event_type, us,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flags)"""


def _sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _SESSION_CTES: events + (us, session_id). Gap compare
    runs in the µs domain on BOTH engines (DuckDB's parquet reader floors
    ts to µs; Spark sees exact int64 nanos) — `div`, never `/`, since ns
    epochs exceed double's 2^53 mantissa."""
    ev = load_table(spark, sf_dir, "events").withColumn("us", F.expr("ts div 1000"))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flags = ev.withColumn(
        "new_session",
        F.when(F.col("us") - F.lag("us").over(w) > _SESSION_GAP_US, 1).otherwise(0),
    )
    return flags.withColumn(
        "session_id", F.sum("new_session").over(cum).cast("long")
    )


# --- sessionization over events (gap-based; streaming sibling in streaming/) ---
@register(
    "events_sessionize",
    f"""
    WITH {_SESSION_CTES}
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    doc="gap-based sessionization (30 min): lag + cumulative sum, one shuffle",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = _sessionized(spark, sf_dir)
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "events_sessionize_bucketed",
    f"""
    WITH {_SESSION_CTES}
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    doc="SKEW-PROOF sessionization (operators/intervals.py:"
    "sessionize_bucketed): the hierarchical prefix-sum stitch applied to "
    "session numbering — per-(user, day-bucket) windows bound every "
    "partition regardless of how hot a user is, and a (user, bucket) "
    "summary relation carries the cross-bucket session recursion. The "
    "round-6 Zipf audit measured plain sessionize degrading 2.4s → 6.0s "
    "when one user holds 45% of a 10M-row stream (one un-splittable "
    "window partition, the case neither salting nor AQE touches); this "
    "face is the relief, and its oracle is the SAME plain-sessionize SQL "
    "as events_sessionize — the stitch must be row-identical, which the "
    "equality pytest also pins on bucket-boundary corpora",
)
def events_sessionize_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.intervals import (
        sessionize_bucketed,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", F.expr("ts div 1000").alias("us"))
    )
    sess = sessionize_bucketed(
        ev,
        "user_id",
        "us",
        "event_id",
        gap_us=_SESSION_GAP_US,
        bucket_us=24 * 3600 * 1_000_000,
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# --- JSON scalar extraction from the events props column ---
@register(
    "events_json_extract",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="JSON field extraction + aggregate (engine-complete scalar functions)",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_variant_extract",
    """
    WITH x AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events)
    SELECT event_type,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(k) AS DOUBLE) / COUNT(*) AS mean_k,
           COUNT(*) AS n
    FROM x GROUP BY event_type
    """,
    doc="Spark 4 VARIANT path for semi-structured JSON: parse_json() once "
    "into the binary variant encoding, then a typed variant_get feeding "
    "several aggregates — the scan parses each JSON string a single "
    "time however many extractions follow, where the string path "
    "(events_json_extract) re-parses per get_json_object call; at 100 TB "
    "with many-field extraction that multiplier is the difference. "
    "mean_k is exact-integer sum / exact count in ONE IEEE division "
    "(a float AVG would be accumulation-order-sensitive); oracle "
    "restates the extraction over DuckDB's JSON functions",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select("event_type", F.variant_get(v, "$.k", "long").alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.sum(F.when(F.col("k") > 50, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_high"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("mean_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --- scalar string/date functions (engine-complete breadth) ---
@register(
    "scalar_string_date_funcs",
    """
    SELECT event_id,
           UPPER(event_type) AS type_upper,
           SUBSTR(event_type, 1, 3) AS type_pfx,
           LENGTH(event_type) AS type_len,
           CAST(strftime(date_trunc('month', ts), '%Y-%m-%d') AS VARCHAR) AS month_start,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hr
    FROM events WHERE event_type IN ('signup', 'purchase')
    """,
    doc="scalar string/date function surface: upper/substr/length, "
    "date_trunc + extract on event time (emitted as strings/ints — never "
    "raw timestamps, per the ns-vs-us physical-type rule)",
)
def scalar_string_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("signup", "purchase")
    )
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.substring("event_type", 1, 3).alias("type_pfx"),
        F.length("event_type").cast("long").alias("type_len"),
        F.date_format(F.date_trunc("month", F.col("ts_utc")), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.hour("ts_utc").alias("hr"),
    )


# --- TPC-H Q6 shape: pure filter+agg — the pushdown showcase ---
@register(
    "q6_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: every predicate pushed to the parquet scan, "
    "map-side partial agg, no shuffle beyond the final reduce",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# --- TPC-H Q12 shape: join + conditional aggregation ---
@register(
    "q12_priority_shipping",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape: fact-fact equi-join (shuffle on orderkey, AQE-"
    "planned) + conditional aggregation",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- TPC-H Q4 shape: correlated EXISTS with inequality → semi join ---
# (testdata lineitem has no commit/receipt dates; "late" is restated as
#  shipped > 60 days after the order date — same correlated-semi shape)
@register(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS with an inequality across both "
    "tables — Catalyst plans a semi join on the equi key with the date "
    "inequality as join residual, never a per-row subquery",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAY")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --- TPC-H Q10 shape: 3-way join + top-20 by aggregated revenue ---
@register(
    "q10_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name, ROUND(c.c_acctbal, 2) AS acctbal,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
    doc="TPC-H Q10 shape: fact-fact shuffle join + broadcast dims + "
    "top-20 via TakeOrderedAndProject (per-partition top-k, no global "
    "sort); c_custkey tie-break keeps the cut deterministic",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            # 4 dp, not 2: the products are exact multiples of 0.0001, so a
            # 2 dp round can land ON a half-cent boundary where engine
            # summation-order ulp noise flips the digit; at 4 dp the true
            # value is always 5e-5 from the nearest boundary.
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "revenue",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --- TPC-H Q13 shape: outer join + two-level aggregation ---
@register(
    "q13_customer_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left outer join with an ON-clause filter (kept "
    "out of the WHERE so customers with zero orders survive), then the "
    "orders-per-customer histogram",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(c["c_custkey"])
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


# --- TPC-H Q14 shape: broadcast dim join + conditional revenue share ---
@register(
    "q14_promo_revenue",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                             THEN l.l_extendedprice * (1 - l.l_discount)
                             ELSE 0.0 END)
                 / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate < TIMESTAMP '1996-10-01'
    """,
    doc="TPC-H Q14 shape: date-pruned fact scan + broadcast part join + "
    "conditional-share aggregate in one partial-agg pass",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp_ntz"))
    )
    p = _t(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(disc), 6).alias("promo_pct"),
        )
    )


# --- TPC-H Q18 shape: HAVING subquery → semi join on grouped keys ---
@register(
    "q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 300)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_totalprice
    ORDER BY totalprice DESC, o.o_orderkey LIMIT 100
    """,
    doc="TPC-H Q18 shape: grouped-HAVING IN-subquery as a semi join on the "
    "aggregated key set; top-100 via TakeOrderedAndProject with an "
    "orderkey tie-break",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .where(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(big, o["o_orderkey"] == big["big_orderkey"], "left_semi")
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(100)
    )


# --- GROUPING SETS (the general form rollup/cube specialize) ---
@register(
    "groupingsets_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    doc="explicit GROUPING SETS: the general multi-granularity aggregate "
    "(rollup/cube are its specializations) — one scan, map-side partials "
    "expanded per set",
)
def groupingsets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty, COUNT(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# --- correlated EXISTS / NOT EXISTS subquery shapes ---
@register(
    "exists_customers_with_open_order",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    """,
    doc="correlated EXISTS + NOT EXISTS: Catalyst rewrites to semi + anti "
    "joins (no per-row subquery execution)",
)
def exists_customers_with_open_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    open_o = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done_o = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return (
        c.join(open_o, c["c_custkey"] == open_o["o_custkey"], "left_semi")
        .join(done_o, c["c_custkey"] == done_o["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
    )


# --- TPC-H Q7 shape: volume shipping between two nations ---
@register(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 4) AS revenue
    FROM (
      SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
          OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate < TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 shape: bidirectional nation-pair revenue by ship year; "
    "fact-fact join shuffles on orderkey, all four dims broadcast",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin("NATION_1", "NATION_2"))
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation"))
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


# --- TPC-H Q8 shape: national market share within a region ---
@register(
    "q8_market_share",
    """
    WITH all_sales AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             ns.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END), 4)
             / ROUND(SUM(volume), 4) AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: NATION_2's share of ASIA-customer STANDARD-part "
    "revenue per order year. Numerator and denominator are rounded to the "
    "exact 1e-4 lattice before the (deterministic IEEE) division so the "
    "share is bit-identical across engines without any outer rounding",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_regionkey").alias("nc_region"))
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("nc_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        joined.withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", vol).otherwise(F.lit(0.0))), 4
            ).alias("num"),
            F.round(F.sum(vol), 4).alias("den"),
        )
    )
    # Unrounded on purpose: num and den are exact 1e-4-lattice values, so
    # the single IEEE division is bit-deterministic — an outer ROUND can
    # only break parity when the ratio lands on a rounding boundary.
    return agg.select("o_year", (F.col("num") / F.col("den")).alias("mkt_share"))


# --- TPC-H Q9 shape: product-line profit by nation and year ---
@register(
    "q9_product_profit",
    """
    SELECT nation, o_year, ROUND(SUM(amount), 4) AS sum_profit
    FROM (
      SELECT ns.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - 0.6 * p.p_retailprice * l.l_quantity AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
    doc="TPC-H Q9 shape (no partsupp table in the testdata, so cost is the "
    "0.6 * p_retailprice proxy): profit per supplier nation per order year. "
    "Fact-fact join on orderkey; part/supplier/nation broadcast",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("nation")
    )
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


# --- TPC-H Q15 shape: top supplier via scalar MAX subquery ---
@register(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, rev.total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15 shape: quarterly revenue per supplier, then the "
    "argmax via a scalar subquery. Spark broadcasts the 1-row max back "
    "onto the aggregate (no global sort); revenue is rounded to the exact "
    "1e-4 lattice before the equality so argmax ties cross engines",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.max_revenue)
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- TPC-H Q16 shape: distinct-supplier counts with a NOT IN exclusion ---
@register(
    "q16_part_supplier_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#11' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (lineitem stands in for the missing partsupp "
    "bridge): distinct suppliers per (brand, type, size), excluding "
    "negative-balance suppliers via NOT IN -> broadcast anti join",
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --- TPC-H Q17 shape: correlated per-part average subquery ---
@register(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(ROUND(SUM(l.l_extendedprice), 4) / 7.0, 4) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
    doc="TPC-H Q17 shape: lines below 20% of their part's average "
    "quantity. The correlated scalar subquery decorrelates to a per-part "
    "aggregate joined back (broadcast: only Brand#13 parts survive). "
    "l_quantity is integer-valued so the parallel AVG is exact and the "
    "0.2*avg threshold is bit-identical across engines",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    li = _t(spark, sf_dir, "lineitem")
    brand_lines = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    thresholds = brand_lines.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    ).withColumnRenamed("l_partkey", "t_partkey")
    return (
        brand_lines.join(
            F.broadcast(thresholds), F.col("l_partkey") == F.col("t_partkey")
        )
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.round(F.sum("l_extendedprice"), 4) / F.lit(7.0), 4).alias("avg_yearly")
        )
    )


# --- TPC-H Q19 shape: disjunctive join predicates ---
@register(
    "q19_discounted_revenue",
    """
    SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#17' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: OR of conjunctive brand/size/quantity clauses. "
    "The disjunction's common p_partkey equi-key keeps the plan a "
    "broadcast hash join (part side pre-filtered by the OR's union of "
    "brand clauses), never a nested-loop",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 15))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


# --- TPC-H Q21 shape: EXISTS + NOT EXISTS over the same fact table ---
@register(
    "q21_sole_latest_supplier",
    """
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape (testdata has no commit/receipt dates, so 'late' "
    "means 'shipped at-or-after every other supplier on the order'): the "
    "correlated EXISTS/NOT EXISTS pair decorrelates into per-order "
    "aggregates (max ship, count at max, second max) joined back on "
    "l_orderkey -- every shuffle in the plan is on the one natural key, "
    "vs the oracle's literal per-row subqueries",
)
def q21_sole_latest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o_f = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    # Per (order, supplier): that supplier's latest ship date on the order.
    # The per-order stats (supplier count, latest ship, how many suppliers
    # share it, second-latest) come from WHOLE-PARTITION window aggregates
    # over this one small aggregate — Spark has no DataFrame-level common
    # subexpression elimination, so the join-back formulation re-scanned
    # lineitem five times; this shape scans it twice (once for the
    # aggregate, once for the qualifying rows).
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("l_shipdate").alias("supp_max_ship")
    )
    w = Window.partitionBy("l_orderkey")
    enriched = per_supp.select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.max("supp_max_ship").over(w).alias("max1"),
    )
    order_stats = enriched.select(
        "*",
        F.sum(
            F.when(F.col("supp_max_ship") == F.col("max1"), 1).otherwise(0)
        ).over(w).alias("cnt_at_max"),
        F.max(
            F.when(F.col("supp_max_ship") < F.col("max1"), F.col("supp_max_ship"))
        ).over(w).alias("max2"),
    )
    qual = (
        li.join(o_f, li.l_orderkey == o_f.o_orderkey)
        .join(order_stats, ["l_orderkey", "l_suppkey"])
        .withColumn(
            "other_max",
            F.when(
                (F.col("supp_max_ship") < F.col("max1")) | (F.col("cnt_at_max") >= 2),
                F.col("max1"),
            ).otherwise(F.col("max2")),
        )
        .filter(
            (F.col("n_supp") >= 2) & (F.col("l_shipdate") >= F.col("other_max"))
        )
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        qual.join(F.broadcast(s), qual.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# --- TPC-H Q22 shape: scalar AVG subquery + anti join ---
@register(
    "q22_dormant_rich_customers",
    """
    WITH pos AS (
      SELECT CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer WHERE c_acctbal > 0.0
    ),
    st AS (
      SELECT CAST(SUM(cents) AS BIGINT) AS total_cents, COUNT(*) AS n_pos FROM pos
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust,
           ROUND(SUM(c.c_acctbal), 2) AS totacctbal
    FROM customer c, st
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) * st.n_pos > st.total_cents
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 shape (c_nationkey stands in for the missing phone "
    "prefix; every testdata customer has SOME order, so dormant = no "
    "currently-open order): customers above the positive-balance average. "
    "The average comparison runs in the exact integer-cents domain "
    "(bal*100 * n_pos > sum_cents) so the threshold is bit-identical "
    "across engines -- a float AVG would be summation-order-sensitive. "
    "Spark: 1-row broadcast of the global stats + broadcast anti join",
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    st = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(cents).alias("total_cents"),
            F.count(F.lit(1)).alias("n_pos"),
        )
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(st))
        .filter(cents * F.col("n_pos") > F.col("total_cents"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "setop_intersect_click_error_users",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
    doc="INTERSECT DISTINCT (completes the set-op family with EXCEPT and "
    "UNION): users with both click and error events; plans as an "
    "aggregate + semi join, one shuffle on the key",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    errors = ev.filter(F.col("event_type") == "error").select("user_id")
    return clicks.intersect(errors)


@register(
    "window_rank_distributions",
    """
    WITH per_user AS (
      SELECT user_id, CAST(ROUND(ROUND(SUM(value), 2) * 100) AS BIGINT) AS total_cents
      FROM events GROUP BY user_id
    )
    SELECT user_id, total_cents,
           ROUND(PERCENT_RANK() OVER (ORDER BY total_cents, user_id), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY total_cents, user_id), 6) AS cume
    FROM per_user
    """,
    doc="PERCENT_RANK + CUME_DIST over per-user totals (exact integer "
    "cents so the rank key is bit-identical cross-engine). The global "
    "window runs over the small AGGREGATED set (one row per user), not "
    "raw events — the acceptable single-partition pattern for "
    "bookkeeping-sized inputs; at raw-event scale you'd bucket first",
)
def window_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.round(F.round(F.sum("value"), 2) * 100).cast("long").alias("total_cents")
    )
    w = Window.orderBy("total_cents", "user_id")
    return per_user.select(
        "user_id",
        "total_cents",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


# --- SQL-text entry path: the IDENTICAL ANSI string runs on both engines ---
_SQL_TEXT_SHARED = """
    SELECT l_returnflag, COUNT(*) AS n,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
"""


@register(
    "sql_text_api",
    _SQL_TEXT_SHARED,
    doc="SQL-text entry path: the Spark side executes spark.sql() over "
    "registered views with the LITERAL SAME ANSI string the DuckDB oracle "
    "runs — proving a SQL-first user can hand this engine their query "
    "text unchanged (Catalyst still does pushdown/pruning/partial agg on "
    "the parsed plan, identically to the DataFrame API)",
)
def sql_text_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql(_SQL_TEXT_SHARED)


@register(
    "join_full_outer_activity",
    """
    WITH c AS (SELECT user_id, COUNT(*) AS n_clicks FROM events
               WHERE event_type = 'click' GROUP BY user_id),
         e AS (SELECT user_id, COUNT(*) AS n_errors FROM events
               WHERE event_type = 'error' GROUP BY user_id)
    SELECT COALESCE(c.user_id, e.user_id) AS user_id,
           COALESCE(c.n_clicks, 0) AS n_clicks,
           COALESCE(e.n_errors, 0) AS n_errors
    FROM c FULL OUTER JOIN e ON c.user_id = e.user_id
    """,
    doc="FULL OUTER join (completes the join family: inner / left / semi "
    "/ anti / as-of / range / salted): reconcile per-user click and error "
    "counts, keeping users present on either side only, with COALESCE "
    "null repair — one shuffle on the key",
)
def join_full_outer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks"))
        .withColumnRenamed("user_id", "c_uid")
    )
    e = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .withColumnRenamed("user_id", "e_uid")
    )
    return c.join(e, c.c_uid == e.e_uid, "full_outer").select(
        F.coalesce("c_uid", "e_uid").alias("user_id"),
        F.coalesce("n_clicks", F.lit(0).cast("long")).alias("n_clicks"),
        F.coalesce("n_errors", F.lit(0).cast("long")).alias("n_errors"),
    )


# --- TPC-H Q2 shape: correlated-min subquery over a derived part-supplier
# relation (testdata has no partsupp; the observed minimum line price per
# (part, supplier) stands in for ps_supplycost) ---
@register(
    "q2_min_cost_supplier",
    """
    WITH ps AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_cents
      FROM lineitem GROUP BY 1, 2
    ),
    eu AS (
      SELECT ps.partkey, ps.cost_cents, s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON ps.suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
           e.cost_cents AS supplycost_cents
    FROM eu e JOIN part p ON e.partkey = p.p_partkey
    WHERE p.p_type LIKE '%STANDARD%' AND p.p_size <= 10
      AND e.cost_cents = (SELECT MIN(e2.cost_cents) FROM eu e2
                          WHERE e2.partkey = e.partkey)
    """,
    doc="TPC-H Q2 shape (reference has no relational layer; completes the "
    "22-query suite with q1-q22): cheapest in-region supplier per part. "
    "Cost lives in the exact integer-cents domain (ROUND before CAST -- "
    "Spark truncates, DuckDB rounds). The oracle keeps the literal "
    "correlated MIN subquery; Spark decorrelates it into a min-over-"
    "partkey window on the already-aggregated (part, supplier) relation, "
    "so the only wide exchanges are the groupBy and one window on the "
    "same key -- dims broadcast, the fact never shuffles twice",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(cents).alias("cost_cents"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eu = ps.join(F.broadcast(dims), ps.suppkey == F.col("s_suppkey"))
    w = Window.partitionBy("partkey")
    best = eu.withColumn("min_cost", F.min("cost_cents").over(w)).filter(
        F.col("cost_cents") == F.col("min_cost")
    )
    p = _t(spark, sf_dir, "part").filter(
        F.col("p_type").like("%STANDARD%") & (F.col("p_size") <= 10)
    )
    return best.join(F.broadcast(p), best.partkey == p.p_partkey).select(
        "s_acctbal",
        "s_name",
        "n_name",
        "p_partkey",
        "p_name",
        F.col("cost_cents").alias("supplycost_cents"),
    )


# --- TPC-H Q11 shape: group aggregate + HAVING against a global scalar ---
@register(
    "q11_important_part_values",
    """
    WITH v AS (
      SELECT l.l_partkey AS p_partkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                  AS BIGINT) AS value_cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_9'
      GROUP BY 1
    )
    SELECT p_partkey, value_cents FROM v
    WHERE value_cents * (SELECT COUNT(*) FROM v)
            > 2 * (SELECT CAST(SUM(value_cents) AS BIGINT) FROM v)
    """,
    doc="TPC-H Q11 shape (lineitem value from NATION_9 suppliers stands in "
    "for partsupp stock value): parts carrying more than twice the MEAN "
    "part value -- TPC-H's fixed 1/1000-of-total fraction empties at "
    "larger scale factors as value spreads over more parts, so the "
    "threshold is restated scale-free. It compares exact integer cents "
    "(value*n > 2*total) -- no float fraction, bit-identical across "
    "engines. Spark computes the global total as a whole-partition window "
    "over the ALREADY-AGGREGATED per-part relation (bounded by distinct "
    "parts, not fact rows) instead of re-scanning lineitem for a scalar "
    "subquery -- Spark has no DataFrame-level CSE, so the oracle's literal "
    "form would scan the fact twice",
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9")
    dims = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    v = (
        li.join(F.broadcast(dims), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(cents).alias("value_cents"))
    )
    w = Window.partitionBy()
    return (
        v.withColumn("total_cents", F.sum("value_cents").over(w))
        .withColumn("n_parts", F.count(F.lit(1)).over(w))
        .filter(F.col("value_cents") * F.col("n_parts") > 2 * F.col("total_cents"))
        .select("p_partkey", "value_cents")
    )


# --- TPC-H Q20 shape: chained semi-joins with a correlated threshold ---
@register(
    "q20_excess_inventory_suppliers",
    """
    WITH pair AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             CAST(ROUND(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                                  AND l_shipdate < TIMESTAMP '1997-01-01'
                                 THEN l_quantity ELSE 0 END)) AS BIGINT)
               AS qty_1996,
             CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS qty_total
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name LIKE 'NATION_1%'
      AND s.s_suppkey IN (
        SELECT suppkey FROM pair
        WHERE partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'small%')
          AND qty_1996 * 4 > qty_total
      )
    """,
    doc="TPC-H Q20 shape ('shipped >1/4 of this part-supplier pair's "
    "lifetime quantity during 1996' stands in for availqty > half a "
    "year's demand): suppliers in the NATION_1* group with a "
    "concentrated 'small%' part. Quantities are integer-valued doubles, "
    "so sums are exact and the 1/4 threshold is the integer comparison "
    "qty*4 > total. Spark chains LEFT SEMI joins (part filter -> pair "
    "filter -> supplier) -- each semi join keeps only the key, nothing "
    "fans out, and the part dim broadcasts",
)
def q20_excess_inventory_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    in_1996 = (
        F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    pair = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.round(F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(0.0)))
        .cast("long")
        .alias("qty_1996"),
        F.round(F.sum("l_quantity")).cast("long").alias("qty_total"),
    )
    small = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    hot = (
        pair.join(F.broadcast(small), pair.partkey == F.col("p_partkey"), "left_semi")
        .filter(F.col("qty_1996") * 4 > F.col("qty_total"))
        .select("suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name").like("NATION_1%"))
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(hot, s.s_suppkey == hot.suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )


# --- window value-extraction family: FIRST/LAST/NTH_VALUE with IGNORE NULLS ---
@register(
    "window_first_last_ignore_nulls",
    """
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             CASE WHEN event_type = 'purchase' THEN value END AS pval
      FROM events
    ),
    w AS (
      SELECT user_id,
             first_value(pval IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS first_purchase,
             nth_value(pval, 2 IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_purchase,
             last_value(pval IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_purchase,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
               AS rn
      FROM t
    )
    SELECT user_id, first_purchase, second_purchase, last_purchase
    FROM w WHERE rn = 1
    """,
    doc="FIRST_VALUE / NTH_VALUE / LAST_VALUE with IGNORE NULLS (the "
    "null-skipping window extraction surface): first, second and latest "
    "purchase value per user in event-time order. Nulls are derived "
    "deterministically (value is only meaningful on purchase events); "
    "ordering runs in the µs domain with event_id tiebreak (ns-vs-µs "
    "parquet parity). Values are raw parquet doubles -- no arithmetic, "
    "exact cross-engine equality. One shuffle on user_id serves all "
    "three extractions and the row_number",
)
def window_first_last_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t = ev.select(
        "user_id",
        F.expr("ts div 1000").alias("ts_us"),
        "event_id",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("pval"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return (
        t.select(
            "user_id",
            F.first("pval", ignorenulls=True).over(w).alias("first_purchase"),
            F.nth_value("pval", 2, ignoreNulls=True).over(w).alias("second_purchase"),
            F.last("pval", ignorenulls=True).over(w).alias("last_purchase"),
            F.row_number().over(wo).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


# --- null-safe equality join (<=> / IS NOT DISTINCT FROM) ---
@register(
    "join_null_safe_buckets",
    """
    WITH t AS (
      SELECT event_type,
             NULLIF(CAST(json_extract_string(props, '$.k') AS BIGINT) % 7, 0)
               AS kb
      FROM events
    ),
    dim AS (
      SELECT event_type, kb, COUNT(*) AS n_events
      FROM t GROUP BY event_type, kb
    )
    SELECT e.event_type, e.kb, dim.n_events, COUNT(*) AS n_matched
    FROM t e
    JOIN dim ON e.event_type = dim.event_type
            AND e.kb IS NOT DISTINCT FROM dim.kb
    GROUP BY e.event_type, e.kb, dim.n_events
    """,
    doc="null-safe equality join: events carry a NULLable derived bucket "
    "(NULLIF(k % 7, 0)) and must still match their dimension row when "
    "the bucket is NULL -- Spark's <=> (eqNullSafe) against DuckDB's "
    "IS NOT DISTINCT FROM. A plain equi-join silently drops every "
    "NULL-bucket row; the n_matched = n_events invariant proves none "
    "were lost. Null-safe equality still plans as a HASH join (the key "
    "is hashable with NULL as a value), so the scale shape is identical "
    "to a normal equi-join shuffle",
)
def join_null_safe_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t = ev.select(
        "event_type",
        F.nullif(
            F.get_json_object("props", "$.k").cast("long") % 7, F.lit(0)
        ).alias("kb"),
    )
    dim = t.groupBy("event_type", "kb").agg(F.count(F.lit(1)).alias("n_events"))
    e = t.alias("e")
    d = dim.alias("d")
    return (
        e.join(
            d,
            (F.col("e.event_type") == F.col("d.event_type"))
            & F.col("e.kb").eqNullSafe(F.col("d.kb")),
        )
        .groupBy(F.col("e.event_type").alias("event_type"), F.col("e.kb").alias("kb"), "n_events")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )


# --- RANK vs DENSE_RANK tie semantics ---
@register(
    "window_rank_dense_rank_ties",
    """
    WITH s AS (
      SELECT l_suppkey, CAST(ROUND(SUM(l_quantity)) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT l_suppkey, total_qty,
           RANK() OVER (ORDER BY total_qty DESC) AS rnk,
           DENSE_RANK() OVER (ORDER BY total_qty DESC) AS drnk
    FROM s
    QUALIFY rnk <= 25
    """,
    doc="RANK vs DENSE_RANK around ties (completes the ranking family "
    "next to row_number / percent_rank / cume_dist / ntile): suppliers "
    "by total shipped quantity -- integer-valued sums, so ties are real "
    "and exact on both engines. The global window runs over the "
    "PRE-AGGREGATED per-supplier relation (bounded by supplier count), "
    "never the fact table; Spark's top-25 cut is the same QUALIFY "
    "predicate DuckDB applies",
)
def window_rank_dense_rank_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = li.groupBy("l_suppkey").agg(
        F.round(F.sum("l_quantity")).cast("long").alias("total_qty")
    )
    w = Window.orderBy(F.col("total_qty").desc())
    return (
        s.select(
            "l_suppkey",
            "total_qty",
            # BIGINT to match DuckDB's int64 rank output (the driver's
            # value-hash is type-sensitive; Spark rank() is int32)
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(F.col("rnk") <= 25)
    )


# --- data-quality audit: constraint violation counts ---
@register(
    "dq_audit_constraints",
    """
    SELECT 'lineitem_orphan_orderkey' AS check_name,
           CAST(COUNT(*) AS BIGINT) AS n_violations
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST(COUNT(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem_nonpositive_price',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_extendedprice <= 0.0
    UNION ALL
    SELECT 'lineitem_discount_out_of_range',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem WHERE l_discount < 0.0 OR l_discount > 0.5
    UNION ALL
    SELECT 'lineitem_ship_before_order',
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate < o.o_orderdate
    UNION ALL
    SELECT 'events_null_user', CAST(COUNT(*) AS BIGINT)
    FROM events WHERE user_id IS NULL
    """,
    doc="data-quality audit as one query: referential-integrity orphans "
    "(LEFT ANTI joins), range checks, cross-table temporal sanity "
    "(shipped-before-ordered via an orderkey join) and null checks, "
    "emitted as (check_name, n_violations) rows. At 100 TB each check "
    "is a scan-shaped aggregate or a single-key join -- no check fans "
    "out, and Spark runs the unioned branches as independent stages. "
    "Counts are exact BIGINTs; the testdata is clean on purpose for "
    "most checks, and nonzero on the temporal one, so both outcomes "
    "are exercised",
)
def dq_audit_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    ev = _t(spark, sf_dir, "events")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count(F.lit(1)).alias("n_violations"),
        )

    checks = [
        one(
            "lineitem_orphan_orderkey",
            li.join(o, li.l_orderkey == o.o_orderkey, "left_anti"),
        ),
        one(
            "orders_orphan_custkey",
            o.join(c, o.o_custkey == c.c_custkey, "left_anti"),
        ),
        one(
            "lineitem_nonpositive_price",
            li.filter(F.col("l_extendedprice") <= 0.0),
        ),
        one(
            "lineitem_discount_out_of_range",
            li.filter((F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.5)),
        ),
        one(
            "lineitem_ship_before_order",
            li.join(o, li.l_orderkey == o.o_orderkey).filter(
                F.col("l_shipdate") < F.col("o_orderdate")
            ),
        ),
        one("events_null_user", ev.filter(F.col("user_id").isNull())),
    ]
    out = checks[0]
    for ch in checks[1:]:
        out = out.unionAll(ch)
    return out


# --- LATERAL correlated subquery (shared SQL text on both engines) ---
_LATERAL_SHARED = """
    SELECT n.n_name, t.s_name, t.s_acctbal
    FROM nation n, LATERAL (
      SELECT s_name, s_acctbal FROM supplier s
      WHERE s.s_nationkey = n.n_nationkey
      ORDER BY s_acctbal DESC, s_name
      LIMIT 2
    ) t
"""


@register(
    "lateral_topk_per_nation",
    _LATERAL_SHARED,
    doc="LATERAL correlated subquery with per-row ORDER BY + LIMIT (the "
    "SQL-standard form of top-k-per-group): two richest suppliers per "
    "nation, the LITERAL SAME ANSI string on both engines. Catalyst "
    "decorrelates the lateral into a ranked window join -- same physical "
    "shape as the DataFrame top-k face, proving the SQL surface and the "
    "DataFrame surface meet in one plan",
)
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.sources.tables import register_views

    register_views(spark, sf_dir, ("nation", "supplier"))
    return spark.sql(_LATERAL_SHARED)


# --- malformed-record quarantine (dead-letter accounting at ingest) ---
@register(
    "events_json_quarantine",
    """
    WITH c AS (
      SELECT event_type,
             CASE WHEN event_id % 37 = 0
                  THEN substr(props, 1, length(props) - 1)
                  ELSE props END AS js
      FROM events),
    p AS (
      SELECT event_type,
             CASE WHEN json_valid(js)
                  THEN CAST(json_extract_string(js, '$.k') AS BIGINT) END AS k,
             CASE WHEN json_valid(js) THEN 0 ELSE 1 END AS bad
      FROM c)
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(bad) AS BIGINT) AS n_quarantined,
           CAST(SUM(k) AS BIGINT) AS sum_k_good
    FROM p GROUP BY event_type
    """,
    doc="dead-letter accounting for semi-structured ingest: rows whose "
    "JSON fails to parse are QUARANTINED (counted per type, excluded "
    "from downstream aggregates) instead of failing the job or silently "
    "nulling — the ingest-robustness pattern every 100 TB pipeline "
    "needs, since at that scale malformed records are a certainty, not "
    "an edge case. Corruption is planted deterministically (event_id % "
    "37 -> closing brace stripped, invalid JSON in both engines); Spark "
    "detects it via try_parse_json returning NULL, DuckDB via "
    "json_valid. Scan-shaped parse + one (type) agg shuffle",
)
def events_json_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    js = F.when(
        F.col("event_id") % 37 == 0,
        F.expr("substring(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    v = F.try_parse_json(js)
    parsed = ev.select(
        "event_type",
        F.variant_get(v, "$.k", "long").alias("k"),
        F.when(v.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("bad"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("bad").cast("long").alias("n_quarantined"),
        F.sum("k").alias("sum_k_good"),
    )


@register(
    "graph_pagerank_activity",
    """
    WITH RECURSIVE
    e0 AS (SELECT DISTINCT 's' || CAST(l_suppkey AS VARCHAR) AS src,
                  'c' || CAST(o_custkey AS VARCHAR) AS dst
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
    nn AS (SELECT CAST(COUNT(DISTINCT src) AS DOUBLE) AS n FROM e),
    pr(iter, node, rank) AS (
      SELECT 0, src, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn)
      FROM (SELECT DISTINCT src FROM e)
      UNION ALL
      SELECT iter + 1, e.dst,
             CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
               + 0.85 * SUM(pr.rank / deg.outdeg)
      FROM pr JOIN e ON e.src = pr.node JOIN deg ON deg.src = pr.node
      WHERE iter < 5
      GROUP BY iter, e.dst
    )
    SELECT node, ROUND(rank, 6) AS pagerank FROM pr WHERE iter = 5
    """,
    doc="PageRank (5 fixed power iterations, damping 0.85) over the "
    "supplier-customer activity graph (symmetrized bipartite edges from "
    "lineitem x orders) — real iterative linear algebra, hash-checked: "
    "the oracle restates the identical recurrence as a recursive CTE "
    "with an iteration counter. Spark loop caches the degree-weighted "
    "edge relation once (partitioned by src); each round shuffles only "
    "the (node, rank) table with map-side partial sums, lineage "
    "truncated per round. Intermediate ranks unrounded; final 6 dp",
)
def graph_pagerank_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    e0 = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    sym = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    return pagerank(sym, iters=5, damping=0.85)


@register(
    "graph_triangles_copurchase",
    """
    WITH pp AS (
      SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
    tri AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM pp e1
      JOIN pp e2 ON e2.pa = e1.pb
      JOIN pp e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
    pernode AS (
      SELECT node, COUNT(*) AS n_triangles
      FROM (SELECT a AS node FROM tri UNION ALL
            SELECT b FROM tri UNION ALL
            SELECT c FROM tri)
      GROUP BY node)
    SELECT node AS part, n_triangles FROM pernode
    ORDER BY n_triangles DESC, part LIMIT 20
    """,
    doc="triangle counting over the co-purchase graph: parts are linked "
    "when they appear in the same order (market-basket projection — "
    "bounded per order, never a hot-key cross product), triangles are "
    "triads of mutually co-purchased parts, output = top-20 parts by "
    "triangle participation (the triadic-closure signal behind "
    "'frequently bought together' and community seeds). Enumeration is "
    "DEGREE-ORDERED (operators/graph.py:triangle_participation): edges "
    "orient low-degree → high-degree before the wedge join, bounding the "
    "wedge relation O(m^1.5) on power-law graphs where the id-ordered "
    "a<b<c form fans out Σdeg² from a hot node (the round-5 verdict's "
    "one scale-killer). Triangle set — and therefore the oracle hash — "
    "is orientation-invariant; the DuckDB oracle keeps the simpler "
    "id-ordered statement. Per-node counts then TakeOrderedAndProject; "
    "(count desc, part) tie order keeps the cut deterministic",
)
def graph_triangles_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aidc_2018_timeseries_spark.operators.graph import triangle_participation

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pp = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .distinct()
    )
    pernode = triangle_participation(pp, "pa", "pb")
    return (
        pernode.select(F.col("node").alias("part"), "n_triangles")
        .orderBy(F.desc("n_triangles"), "part")
        .limit(20)
    )


@register(
    "events_top_session_paths",
    f"""
    WITH {_SESSION_CTES},
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY us, event_id) AS path
      FROM sess GROUP BY user_id, session_id),
    counts AS (SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
               FROM paths GROUP BY path)
    SELECT path, n_sessions FROM counts
    ORDER BY n_sessions DESC, path LIMIT 10
    """,
    doc="top-10 session PATHS (sequence mining lite): sessionize, fold "
    "each session's time-ordered event types into a '>'-joined path "
    "string, count identical paths corpus-wide — the product-analytics "
    "view behind 'what do users actually do' funnels. Composes the "
    "sessionize shuffle with a per-session ordered fold (array_sort on "
    "(us, event_id, type) structs — collect_list alone has NO intra-"
    "group order guarantee after a shuffle) and a path-keyed count; "
    "top-10 via TakeOrderedAndProject with (count desc, path) tie order",
)
def events_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = _sessionized(spark, sf_dir)
    ordered = F.array_sort(
        F.collect_list(F.struct("us", "event_id", "event_type"))
    )
    paths = sess.groupBy("user_id", "session_id").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["event_type"]), ">"
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(10)
    )


@register(
    "graph_copurchase_lift",
    """
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM b),
    item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
             FROM b GROUP BY l_partkey),
    pp AS (SELECT x.l_partkey AS pa, y.l_partkey AS pb,
                  CAST(COUNT(*) AS BIGINT) AS n_pair
           FROM b x JOIN b y
             ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
           GROUP BY 1, 2)
    SELECT pa, pb, n_pair,
           ROUND(CAST(pp.n_pair AS DOUBLE) * n.n_orders
                 / (ia.n_item * ib.n_item), 6) AS lift
    FROM pp
    JOIN item ia ON ia.l_partkey = pp.pa
    JOIN item ib ON ib.l_partkey = pp.pb
    CROSS JOIN n
    WHERE n_pair >= 3
    ORDER BY ROUND(CAST(pp.n_pair AS DOUBLE) * n.n_orders
                   / (ia.n_item * ib.n_item), 6) DESC, pa, pb
    LIMIT 20
    """,
    doc="association-rule LIFT over co-purchase pairs: lift(a,b) = "
    "P(ab)/(P(a)P(b)) over order baskets, min support 3, top-20 by lift "
    "— the normalized 'frequently bought together' statistic (raw pair "
    "counts just rank popular items; lift surfaces genuinely dependent "
    "pairs). Pair generation is bounded per order; item and pair counts "
    "are catalog-bound relations; the order total enters as one bounded "
    "count job (the oracle states it as a scalar subquery — Spark "
    "folds the literal to keep the plan free of nested-loop joins). "
    "Deterministic (rounded lift desc, pa, pb) cut",
)
def graph_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = b.select("l_orderkey").distinct().count()
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    x, y = b.alias("x"), b.alias("y")
    pp = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .groupBy(
            F.col("x.l_partkey").alias("pa"), F.col("y.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("pa"), F.col("n_item").alias("na"))
    ib = item.select(F.col("l_partkey").alias("pb"), F.col("n_item").alias("nb"))
    lift = F.round(
        F.col("n_pair").cast("double") * F.lit(n_orders) / (F.col("na") * F.col("nb")),
        6,
    )
    return (
        pp.join(ia, "pa")
        .join(ib, "pb")
        .select("pa", "pb", "n_pair", lift.alias("lift"))
        .orderBy(F.desc("lift"), "pa", "pb")
        .limit(20)
    )
