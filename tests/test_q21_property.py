"""Property test for the q21 decorrelation (EXISTS + NOT EXISTS →
per-order window aggregates).

The catalog query's oracle (DuckDB literal EXISTS subqueries) already
cross-checks it on two scale factors of one dataset; this test drives the
SAME decorrelated plan over randomized small worlds and compares against
a brute-force Python evaluation of the original correlated semantics:
count lineitem rows l1 (on 'F' orders) such that

  - some other supplier has a line on the same order, and
  - no other supplier's line on the order shipped strictly later.

Random worlds deliberately generate heavy shipdate ties (dates drawn
from a 5-day range) because the tie cases — several suppliers sharing
the order's max ship date — are exactly where the cnt_at_max/max2
decorrelation can go wrong.
"""

from __future__ import annotations

import collections

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_line = st.tuples(
    st.integers(min_value=1, max_value=8),   # orderkey
    st.integers(min_value=1, max_value=5),   # suppkey
    st.integers(min_value=0, max_value=4),   # shipdate day offset
)


def _brute_force(lines, f_orders):
    """Literal correlated-subquery semantics, per l1 row."""
    by_order = collections.defaultdict(list)
    for ok, sk, d in lines:
        by_order[ok].append((sk, d))
    counts: dict[int, int] = collections.defaultdict(int)
    for ok, sk, d in lines:
        if ok not in f_orders:
            continue
        others = [(s2, d2) for s2, d2 in by_order[ok] if s2 != sk]
        if not others:
            continue
        if any(d2 > d for _, d2 in others):
            continue
        counts[sk] += 1
    return dict(counts)


@_SETTINGS
@given(
    lines=st.lists(_line, min_size=1, max_size=60),
    f_mask=st.integers(min_value=0, max_value=255),
)
def test_q21_decorrelation_matches_brute_force(spark, tmp_path_factory, lines, f_mask):
    from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all

    load_all()
    f_orders = {ok for ok in range(1, 9) if f_mask & (1 << (ok - 1))}
    d = tmp_path_factory.mktemp("q21w")

    li = pd.DataFrame(
        {
            "l_orderkey": [ok for ok, _, _ in lines],
            "l_suppkey": [sk for _, sk, _ in lines],
            "l_shipdate": pd.to_datetime(
                [f"1996-01-0{day + 1}" for _, _, day in lines]
            ),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": list(range(1, 9)),
            "o_orderstatus": ["F" if ok in f_orders else "O" for ok in range(1, 9)],
        }
    )
    supplier = pd.DataFrame(
        {"s_suppkey": list(range(1, 6)), "s_name": [f"S{i}" for i in range(1, 6)]}
    )
    spark.createDataFrame(li).write.parquet(str(d / "lineitem.parquet"))
    spark.createDataFrame(orders).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(supplier).write.parquet(str(d / "supplier.parquet"))

    got = {
        r["s_name"]: r["numwait"]
        for r in CATALOG["q21_sole_latest_supplier"].spark_fn(spark, str(d)).collect()
    }
    want = {f"S{sk}": n for sk, n in _brute_force(lines, f_orders).items()}
    assert got == want
