"""One-series decade audit for the bucketed rolling window (round-6
verdict item 6): the regime where the len10x/keys10x axes diverge —
a SINGLE series outgrowing a single task.

Plain W1/A2 partition their window by series key, so one series is one
un-splittable sort task no matter the cluster size; the round-5
continuation-12 audit showed the axes only separate past per-task
memory. `rolling_window_agg_bucketed` / `trailing_window_zscore_bucketed`
(the hierarchical prefix-sum template with T-1 rows of explicit
carry-in per row-bucket) bound every partition by construction.

Builds ONE series of N rows (uniform 3us spacing) at N = 1M / 10M /
100M under .bench_rolling/ (git-ignored, deletable) and measures both
forms; equality is asserted at 1M (the pytest battery covers the edge
corpora). min-of-2 warm everywhere — round-7 follow-up measurements
showed single cold runs at 100M carry +/-2x page-cache noise, so a
plain-form 100M pair is ~12 min; use --only to split across invocations.

Usage: python tools/bench_rolling_bucketed.py [--only w1|a2] [N ...]
(default decades: 1000000 10000000 100000000; --only splits the 100M
run across tool invocations — plain A2 alone is ~10 min there)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

OUT = HERE / ".bench_rolling"
SEQ = 50                 # seq_len: a typical W1 window
ROW_BUCKET = 1_000_000   # rows per trailing-frame partition
VALUE_BUCKET = 3_000_000 # us per rn-stage bucket (~1M rows at 3us spacing)


def build(n: int) -> str:
    path = OUT / f"series_{n}.parquet"
    if not path.exists():
        OUT.mkdir(exist_ok=True)
        duckdb.sql(
            f"COPY (SELECT 1::BIGINT AS k, range::BIGINT AS id, "
            f"(range * 3)::BIGINT AS us, random() AS v FROM range({n})) "
            f"TO '{path}' (FORMAT PARQUET)"
        )
    return str(path)


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from aidc_2018_timeseries_spark.operators.normalize import (
        trailing_window_zscore,
        trailing_window_zscore_bucketed,
    )
    from aidc_2018_timeseries_spark.operators.windowing import (
        rolling_window_agg,
        rolling_window_agg_bucketed,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def plain_agg(df):
        return rolling_window_agg(
            df, "k", ["us", "id"], {"w_avg": F.avg(F.col("v"))}, SEQ
        )

    def buck_agg(df):
        return rolling_window_agg_bucketed(
            df, "k", "us", "id", {"w_avg": F.avg(F.col("v"))},
            SEQ, VALUE_BUCKET, ROW_BUCKET,
        )

    def plain_z(df):
        return trailing_window_zscore(df, "k", ["us", "id"], "v", SEQ)

    def buck_z(df):
        return trailing_window_zscore_bucketed(
            df, "k", "us", "id", "v", SEQ, VALUE_BUCKET, ROW_BUCKET
        )

    def force(out, col):
        # sum the window column so Catalyst cannot prune the computation
        return out.select(F.sum(F.col(col))).collect()[0][0]

    argv = sys.argv[1:]
    only = None
    if argv[:1] == ["--only"]:
        only, argv = argv[1].lower(), argv[2:]
    sizes = [int(a) for a in argv] or [1_000_000, 10_000_000, 100_000_000]
    for n in sizes:
        df = spark.read.parquet(build(n))
        runs = 2
        for label, fn, col in (
            ("plain  W1", plain_agg, "w_avg"),
            ("bucket W1", buck_agg, "w_avg"),
            ("plain  A2", plain_z, "v_z"),
            ("bucket A2", buck_z, "v_z"),
        ):
            if only and only not in label.lower().replace(" ", ""):
                continue
            walls = []
            for _ in range(runs):
                t0 = time.time()
                force(fn(df), col)
                walls.append(time.time() - t0)
            print(f"n={n:>11,}  {label}: {min(walls):6.1f}s", flush=True)
        if n == 1_000_000:
            p, b = plain_agg(df), buck_agg(df)
            d = p.exceptAll(b.select(*p.columns)).count() + \
                b.select(*p.columns).exceptAll(p).count()
            pz, bz = plain_z(df), buck_z(df)
            dz = pz.exceptAll(bz.select(*pz.columns)).count() + \
                bz.select(*pz.columns).exceptAll(pz).count()
            print(f"n={n:>11,}  equality: W1 diff={d}, A2 diff={dz}", flush=True)


if __name__ == "__main__":
    main()
