"""Golden semantics for the fixed-iteration PageRank operator."""

from __future__ import annotations

import pytest

from aidc_2018_timeseries_spark.operators.graph import pagerank


def _sym(spark, pairs):
    e = spark.createDataFrame(pairs, "src string, dst string")
    return e.union(e.selectExpr("dst as src", "src as dst")).distinct()


def test_ring_is_uniform(spark):
    # symmetric ring: perfect symmetry -> uniform rank 1/n at any iteration
    n = 6
    ring = _sym(spark, [(f"v{i}", f"v{(i + 1) % n}") for i in range(n)])
    got = {r.node: r.pagerank for r in pagerank(ring, iters=4).collect()}
    assert all(v == pytest.approx(1 / n, abs=1e-6) for v in got.values())
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)


def test_star_center_dominates(spark):
    star = _sym(spark, [("hub", f"leaf{i}") for i in range(5)])
    got = {r.node: r.pagerank for r in pagerank(star, iters=5).collect()}
    assert got["hub"] > 2 * max(v for k, v in got.items() if k != "hub")
    # all leaves identical by symmetry
    leaves = {v for k, v in got.items() if k != "hub"}
    assert len(leaves) == 1


def test_rank_mass_is_conserved(spark):
    chain = _sym(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = [r.pagerank for r in pagerank(chain, iters=6).collect()]
    # symmetric graph, every node has outdegree >= 1 -> total mass 1
    assert sum(got) == pytest.approx(1.0, abs=1e-4)
