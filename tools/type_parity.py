"""Audit physical OUTPUT TYPES of every oracle pair (Spark vs DuckDB).

The driver's value-hash is TYPE-sensitive: DuckDB SUM over integers yields
HUGEINT (int128) while Spark emits BIGINT, so two result sets with equal
values can still hash differently (round-1 failures ``events_json_extract``
and ``q12_priority_shipping``).  Local value-parity (tests/test_oracle_
parity.py) cannot catch this; this tool compares the Arrow schemas of both
engines' results and flags any column whose types differ.

Usage:  python tools/type_parity.py [sf_dir]     (default sf0.001)
Exit code 1 when any mismatch is found.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from aidc_2018_timeseries_spark.session import get_spark  # noqa: E402
from aidc_2018_timeseries_spark.sources.tables import TABLES  # noqa: E402

# Arrow type pairs considered hash-equivalent (Spark emits the left form,
# DuckDB the right) — extend only when the driver demonstrably accepts it.
_OK = {
    ("string", "large_string"),
}


def _flag(spark_t: str, duck_t: str) -> bool:
    if spark_t == duck_t:
        return False
    return (spark_t, duck_t) not in _OK


def main(sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from __spark_entry__ import oracle_sql, queries

    spark = get_spark()
    bad = 0
    for name, sql in oracle_sql().items():
        duck_schema = {f.name: str(f.type) for f in con.execute(sql).fetch_arrow_table().schema}
        spark_schema = {
            f.name: str(f.type) for f in queries()[name](spark, sf_dir).limit(0).toArrow().schema
        }
        for col, st in spark_schema.items():
            dt = duck_schema.get(col)
            if dt is None:
                print(f"MISMATCH {name}.{col}: missing from oracle output")
                bad += 1
            elif _flag(st, dt):
                print(f"MISMATCH {name}.{col}: spark={st} duckdb={dt}")
                bad += 1
    print(f"{'FAIL' if bad else 'OK'}: {bad} type mismatches across {len(oracle_sql())} oracles")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
