"""Accumulation-order sensitivity audit (round-6, after the backtest red).

The only driver red ever recorded (forecast_backtest_folds, r5) was a
double-sum whose partial-aggregation order could flip a 6-dp rounding
boundary. This audit hunts that class PROACTIVELY: every oracle-bearing
catalog face runs twice — once at the session default (32 shuffle
partitions) and once at a deliberately awkward 7 — and the outputs must
be BYTE-identical (float repr, not approx). A face that differs depends
on accumulation order and needs the integer micro-unit restatement
(events_cusum_alarms pattern) before the driver ever catches it.

Too heavy for the pytest suite (~2x the full sweep); run per-round:
    python tools/audit_order_sensitivity.py [sf_dir]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def nv(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v)
        return str(v)

    return sorted(tuple(nv(r[i]) for i in order) for r in rows)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from __spark_entry__ import oracle_sql, queries

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    names = sorted(oracle_sql())
    bad, errs = [], []
    t0 = time.time()
    for i, name in enumerate(names):
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            df = qs[name](spark, sf)
            a = canon([tuple(r) for r in df.collect()], df.columns)
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            df = qs[name](spark, sf)
            b = canon([tuple(r) for r in df.collect()], df.columns)
            if a != b:
                bad.append(name)
                print(f"ORDER-SENSITIVE: {name}", flush=True)
        except Exception as e:  # noqa: BLE001 — audit must survive any face
            errs.append(f"{name}: {type(e).__name__}: {str(e)[:100]}")
        if (i + 1) % 40 == 0:
            print(f"...{i + 1}/{len(names)} ({time.time() - t0:.0f}s)", flush=True)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    print(f"checked {len(names)} faces in {time.time() - t0:.0f}s")
    print("order-sensitive:", bad if bad else "none")
    if errs:
        print("errors:", errs)
    spark.stop()
    sys.exit(1 if bad or errs else 0)


if __name__ == "__main__":
    main()
