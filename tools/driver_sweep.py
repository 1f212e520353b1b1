"""Strict local replica of the driver's correctness gate at sf0.01.

The driver compares row count + schema + an order-insensitive value HASH —
i.e. EXACT values, not approximate. tests/test_oracle_parity.py compares
with 1e-9 tolerance (right for a fast dev loop), so a float that differs in
the last bit passes locally but fails the driver. This sweep compares exact
repr-level equality after the same column-name sort the driver applies, and
reports which queries would only pass approximately — each of those is a
driver-hash risk to fix before the round ends.

Usage: python tools/driver_sweep.py [sf_dir] [name ...]
(default sf_dir /root/testdata/sf0.01; extra args restrict the sweep to
those query names — the fast loop when hardening a handful of new faces)
Prints one line per query; exit 1 if any EXACT mismatch or error.
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aidc_2018_timeseries_spark.session import get_spark  # noqa: E402
from aidc_2018_timeseries_spark.sources.tables import TABLES  # noqa: E402


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def _approx_eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_approx_eq(x, y) for x, y in zip(a, b))
    return a == b


def main(sf_dir: str, only: list[str] | None = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from __spark_entry__ import oracle_sql, queries

    spark = get_spark()
    qs, oracles = queries(), oracle_sql()
    if only:
        missing = [n for n in only if n not in qs]
        if missing:
            print(f"unknown query names: {missing}")
            return 1
        qs = {n: qs[n] for n in only}
    n_exact = n_approx = n_bad = n_rows_only = 0
    for name in sorted(qs):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: spark: {e}")
            n_bad += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS   {name}: {len(s_rows)} rows ({time.time() - t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            res = con.sql(sql)
            d_cols = res.columns
            d_rows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR  {name}: duckdb: {e}")
            n_bad += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL   {name}: columns {s_cols} vs {d_cols}")
            n_bad += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL   {name}: rows {len(s_rows)} vs {len(d_rows)}")
            n_bad += 1
            continue
        _, s_n = _normalize(s_rows, s_cols)
        _, d_n = _normalize(d_rows, d_cols)
        if s_n == d_n:
            print(f"EXACT  {name}: {len(s_rows)} rows ({time.time() - t0:.1f}s)")
            n_exact += 1
        elif all(_approx_eq(a, b) for sr, dr in zip(s_n, d_n) for a, b in zip(sr, dr)):
            diff = next(
                (sr, dr) for sr, dr in zip(s_n, d_n) if sr != dr
            )
            print(f"APPROX {name}: values equal only to 1e-9 — DRIVER-HASH RISK; first diff {diff}")
            n_approx += 1
        else:
            diffs = [(sr, dr) for sr, dr in zip(s_n, d_n) if sr != dr][:3]
            print(f"FAIL   {name}: value mismatch, first {diffs}")
            n_bad += 1
    print(
        f"\n{n_exact} exact, {n_approx} approx-only (risk), {n_rows_only} rows-only, "
        f"{n_bad} fail/error out of {len(qs)}"
    )
    return 1 if (n_bad or n_approx) else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
            sys.argv[2:] or None,
        )
    )
