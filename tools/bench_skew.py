"""Zipf-skew decade audit for the join family (round-6 verdict item 7).

SCALING.md's decade audits use near-uniform synthetic keys; this tool
builds a 10x decade whose KEYS are Zipf-distributed — the distribution a
real events/orders workload actually has — and measures:

- events_sessionize: uniform-keyed vs Zipf-keyed 10x events (per-user
  window: a hot user is one un-splittable sort partition);
- q21_sole_latest_supplier: uniform vs Zipf l_suppkey (its shuffles are
  l_orderkey-keyed and its aggregates partial, so suppkey skew should
  NOT hurt — the audit verifies the claimed insensitivity);
- the per-supplier revenue join: plain sort-merge (AQE skew off), plain
  sort-merge (AQE skew on), and salted_join, all with broadcast disabled
  so the skew actually lands on a reducer — the salt-vs-AQE-vs-nothing
  contrast the brief's scale posture names.

Writes parquet decades under .bench_skew/ (git-ignored, deletable);
prints one line per measurement. Usage: python tools/bench_skew.py
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

import duckdb
import numpy as np

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

SRC = Path("/root/testdata/sf0.1")
OUT = HERE / ".bench_skew"
ZIPF_A = 1.1


def _zipf_ranks(rng: np.random.Generator, n: int, universe: int) -> np.ndarray:
    """Zipf(a) ranks clipped to [0, universe): rank 0 is the hottest key."""
    r = rng.zipf(ZIPF_A, n)
    return np.minimum(r - 1, universe - 1)


def build(con: duckdb.DuckDBPyConnection) -> None:
    rng = np.random.default_rng(7)
    for mode in ("uniform", "zipf"):
        d = OUT / mode
        d.mkdir(parents=True, exist_ok=True)
        for t in ("supplier", "nation", "region", "customer", "part"):
            shutil.copy(SRC / f"{t}.parquet", d / f"{t}.parquet")

    # --- events: 100 id-shifted copies (the hot-user window partition only
    # becomes visible at millions of rows per key); zipf remaps user_id ---
    ev = con.sql(f"SELECT * FROM '{SRC}/events.parquet'").df()
    users = np.sort(ev["user_id"].unique())
    frames = []
    for i in range(100):
        c = ev.copy()
        c["event_id"] = c["event_id"] + i * 10_000_000
        frames.append(c)
    import pandas as pd

    ev10 = pd.concat(frames, ignore_index=True)
    con.register("ev10", ev10)
    con.sql(f"COPY ev10 TO '{OUT}/uniform/events.parquet' (FORMAT PARQUET)")
    evz = ev10.copy()
    evz["user_id"] = users[_zipf_ranks(rng, len(evz), len(users))]
    con.register("evz", evz)
    con.sql(f"COPY evz TO '{OUT}/zipf/events.parquet' (FORMAT PARQUET)")
    hot = evz["user_id"].value_counts().iloc[0]
    print(f"events decade: {len(ev10):,} rows; zipf hot user holds {hot:,} "
          f"({100 * hot / len(evz):.0f}%)")

    # --- lineitem + orders: 10 orderkey-shifted copies; zipf remaps l_suppkey ---
    li = con.sql(f"SELECT * FROM '{SRC}/lineitem.parquet'").df()
    orders = con.sql(f"SELECT * FROM '{SRC}/orders.parquet'").df()
    supps = np.sort(
        con.sql(f"SELECT s_suppkey FROM '{SRC}/supplier.parquet'").df()["s_suppkey"]
    )
    shift = int(max(li["l_orderkey"].max(), orders["o_orderkey"].max())) + 1
    li_frames, o_frames = [], []
    for i in range(10):
        cl = li.copy()
        cl["l_orderkey"] = cl["l_orderkey"] + i * shift
        li_frames.append(cl)
        co = orders.copy()
        co["o_orderkey"] = co["o_orderkey"] + i * shift
        o_frames.append(co)
    li10 = pd.concat(li_frames, ignore_index=True)
    o10 = pd.concat(o_frames, ignore_index=True)
    con.register("li10", li10)
    con.register("o10", o10)
    for mode in ("uniform", "zipf"):
        con.sql(f"COPY o10 TO '{OUT}/{mode}/orders.parquet' (FORMAT PARQUET)")
    con.sql(f"COPY li10 TO '{OUT}/uniform/lineitem.parquet' (FORMAT PARQUET)")
    liz = li10.copy()
    liz["l_suppkey"] = supps[_zipf_ranks(rng, len(liz), len(supps))]
    con.register("liz", liz)
    con.sql(f"COPY liz TO '{OUT}/zipf/lineitem.parquet' (FORMAT PARQUET)")
    hot = liz["l_suppkey"].value_counts().iloc[0]
    print(f"lineitem decade: {len(li10):,} rows; zipf hot supplier holds "
          f"{hot:,} ({100 * hot / len(liz):.0f}%)")

    # documents/embeddings unused by these faces but load_table may want them
    for mode in ("uniform", "zipf"):
        for t in ("documents", "embeddings"):
            shutil.copy(SRC / f"{t}.parquet", OUT / mode / f"{t}.parquet")


def min2(fn) -> float:
    walls = []
    for _ in range(2):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return min(walls)


def main() -> None:
    con = duckdb.connect()
    if not (OUT / "zipf" / "lineitem.parquet").exists():
        build(con)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from __spark_entry__ import queries
    from aidc_2018_timeseries_spark.operators.joins import salted_join
    from aidc_2018_timeseries_spark.sources.tables import load_table

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    q = queries()

    for name in ("events_sessionize", "q21_sole_latest_supplier"):
        for mode in ("uniform", "zipf"):
            df = q[name](spark, str(OUT / mode))
            rows = df.count()
            w = min2(lambda: q[name](spark, str(OUT / mode)).count())
            print(f"{name} [{mode}]: {w:.1f}s  ({rows:,} result rows)")

    # per-supplier revenue join on the zipf decade, broadcast disabled.
    # Revenue sums integer micro-units (like the face): salted and plain
    # accumulate in different orders, so only an exact sum is comparable.
    def revenue(join_mode: str):
        li = load_table(spark, str(OUT / "zipf"), "lineitem").withColumnRenamed(
            "l_suppkey", "s_suppkey"
        )
        s = load_table(spark, str(OUT / "zipf"), "supplier")
        if join_mode == "salted":
            j = salted_join(li, s, on="s_suppkey", n_salts=16, how="inner")
        else:
            j = li.join(s, "s_suppkey")
        rev_u = F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 1_000_000, 0
        ).cast("decimal(38,0)")
        return j.groupBy("s_suppkey", "s_name").agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(rev_u).cast("double") / F.lit(1_000_000.0), 4
            ).alias("revenue"),
        )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    for label, skew_on, mode in (
        ("plain SMJ, AQE skew OFF", "false", "plain"),
        ("plain SMJ, AQE skew ON", "true", "plain"),
        ("salted_join(16)", "true", "salted"),
    ):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
        w = min2(lambda: revenue(mode).count())
        print(f"supplier_revenue_join [{label}]: {w:.1f}s")
    # row-identity: salt must not leak
    plain = revenue("plain")
    salted = revenue("salted")
    diff = plain.exceptAll(salted).count() + salted.exceptAll(plain).count()
    print(f"salted == plain row-identical: {diff == 0}")

    # --- the skew CLIFF, isolated: 50M-row narrow join, 50% on one key,
    # counted without aggregation so the sort-merge reducer sort is the
    # work. This is where one hot reducer owns half the data and the
    # salt/AQE levers separate from noise (the parquet faces above are
    # partial-agg-rescued or orderkey-shuffled, which is itself the
    # finding). ---
    N = 20_000_000
    big = spark.range(N).select(
        F.when(F.col("id") % 2 == 0, F.lit(7))
        .otherwise(F.col("id") % 1000)
        .alias("k"),
        F.col("id").alias("v"),
        # incompressible 32-byte payload: the hot reducer must MOVE and
        # SORT real bytes (a constant pad compresses ~40x and hides both
        # from the byte-based skew detector and from the sort cost)
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    dim = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("payload")
    )
    for label, skew_on, tuned, salted_mode in (
        ("plain SMJ, AQE skew OFF", "false", False, False),
        ("plain SMJ, AQE skew ON (default thresholds)", "true", False, False),
        ("plain SMJ, AQE skew ON (tuned thresholds)", "true", True, False),
        ("salted_join(32)", "false", False, True),
    ):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_on)
        if tuned:
            # AQE skew detection reads COMPRESSED shuffle-partition bytes
            # against the 256MB default threshold, so a row-heavy hot key
            # can evade it (salting is row-based and does not care). These
            # are the thresholds tests/test_aqe_skew.py pins skew=true
            # with; at cluster scale you tune them against real shuffle
            # sizes instead.
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "64KB",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
            )
        if salted_mode:
            j = salted_join(big, dim, on="k", n_salts=32, how="inner")
        else:
            j = big.join(dim, "k")
        w = min2(j.count)
        print(f"synthetic_20M_hotkey_join [{label}]: {w:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
