"""Regression tests for __spark_entry__._sweep_order — the driver checks
~50 catalog queries per round, so ordering IS verification coverage.
Round 3 lost an entire round to a bug here (green set read from only the
latest CORRECTNESS file, so truncated sweeps ping-ponged between two query
sets and never reached the tail); these tests pin the fixed semantics
against the real repo correctness files plus synthetic ones.
"""

from __future__ import annotations

import json

import __spark_entry__ as entry
from aidc_2018_timeseries_spark.plans.catalog import CATALOG


def _green_union() -> set[str]:
    status: dict[str, bool] = {}
    for p in sorted(entry._HERE.glob("CORRECTNESS_r*.json")):
        rep = json.loads(p.read_text())
        for n, r in rep.items():
            status[n] = bool(
                r.get("rows_match")
                and r.get("schema_match", True)
                and r.get("hash_match", True)
                and not r.get("err")
            )
    return {n for n, ok in status.items() if ok}


def test_order_is_a_permutation_of_the_catalog():
    order = entry._sweep_order()
    assert sorted(order) == sorted(CATALOG)
    assert len(order) == len(set(order))


def test_greens_union_across_all_rounds_and_sort_last():
    """The core round-3 fix: a query green in ANY prior round must sit
    after every never-checked query, so a truncated sweep spends its slots
    on new coverage."""
    order = entry._sweep_order()
    green = _green_union() & set(CATALOG)
    if not green or green == set(CATALOG):
        return  # degenerate repo state; nothing to order
    last_unchecked = max(i for i, n in enumerate(order) if n not in green)
    first_green = min(i for i, n in enumerate(order) if n in green)
    assert last_unchecked < first_green, (
        "a cumulative-green query was ordered before a never-checked one"
    )


def test_unchecked_rows_only_queries_are_not_banished_to_the_end():
    """Rows-only queries interleave into the unverified block (they starved
    for three rounds when always ordered last)."""
    order = entry._sweep_order()
    green = _green_union() & set(CATALOG)
    unchecked = [n for n in order if n not in green]
    rows_only = [n for n in unchecked if CATALOG[n].oracle is None]
    oracle = [n for n in unchecked if CATALOG[n].oracle is not None]
    if len(rows_only) < 2 or len(oracle) < 4:
        return  # not enough of each kind to interleave
    # at least one rows-only query must appear before the last oracle one
    first_rows_only = unchecked.index(rows_only[0])
    last_oracle = unchecked.index(oracle[-1])
    assert first_rows_only < last_oracle


def test_latest_verdict_wins_over_earlier_green(tmp_path, monkeypatch):
    """A query that was green in an old round but regressed in a newer one
    must re-enter the unverified front, not stay hidden at the tail (a
    plain union over rounds would hide the regression forever)."""
    regressed, still_green = sorted(CATALOG)[:2]
    ok = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    bad = {"rows_match": False, "schema_match": True, "hash_match": False, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({regressed: ok, still_green: ok})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({regressed: bad}))
    monkeypatch.setattr(entry, "_HERE", tmp_path)
    order = entry._sweep_order()
    assert order.index(regressed) < order.index(still_green)
    assert order.index(still_green) == len(order) - 1  # sole green → tail


def test_queries_and_oracle_sql_follow_the_same_order():
    q = entry.queries()
    o = entry.oracle_sql()
    assert list(q) == entry._sweep_order()
    assert set(o) == {n for n in q if CATALOG[n].oracle is not None}
