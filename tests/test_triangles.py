"""Degree-ordered triangle enumeration: correctness vs brute force, plus
the scale property that motivates the orientation — on a planted
power-law (star) graph the wedge relation shrinks from the hub's Σdeg²
fan to the O(m^1.5) bound (round-5 verdict item 2)."""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.graph import (
    orient_edges_by_degree,
    triangle_participation,
)


def _brute_counts(edges):
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def _star_graph():
    """Hub 0 with 20 spokes, spokes chained pairwise: 10 triangles through
    the hub, hub degree 20, every spoke degree 2. Hub id 0 is the
    adversarial case for id-ordering: all 20 hub edges stay outgoing."""
    edges = [(0, i) for i in range(1, 21)]
    edges += [(i, i + 1) for i in range(1, 21, 2)]  # (1,2), (3,4), ...
    return edges


def test_counts_match_brute_force_on_star(spark):
    edges = _star_graph()
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_participation(edf).collect()
    }
    assert got == _brute_counts(edges)


def test_counts_match_brute_force_on_clique_plus_tail(spark):
    # 5-clique (10 triangles, many rank ties) + triangle-free tail
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(5, 6), (6, 7), (7, 8)]
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_participation(edf).collect()
    }
    assert got == _brute_counts(edges)


def _wedge_count(oriented):
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    rank_lt = (F.col("e1.dv") < F.col("e2.dv")) | (
        (F.col("e1.dv") == F.col("e2.dv")) & (F.col("e1.v") < F.col("e2.v"))
    )
    return e1.join(e2, (F.col("e1.u") == F.col("e2.u")) & rank_lt).count()


def test_degree_orientation_bounds_hub_wedges(spark):
    edges = _star_graph()
    edf = spark.createDataFrame(edges, "src long, dst long")

    deg_oriented = orient_edges_by_degree(edf)
    # hub has the highest degree -> every hub edge points INTO the hub;
    # no edge leaves it, so the hub contributes zero wedges
    assert deg_oriented.filter(F.col("u") == 0).count() == 0
    deg_wedges = _wedge_count(deg_oriented)

    # id-ordering (the pre-round-6 plan): hub 0 keeps all 20 edges
    # outgoing -> C(20,2) = 190 wedges from the hub alone
    deg = (
        edf.select(F.col("src").alias("node"))
        .unionByName(edf.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    id_oriented = (
        edf.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
        .select("u", "v", "dv")
    )
    # id-rank comparison for the wedge join: plain v < w
    e1, e2 = id_oriented.alias("e1"), id_oriented.alias("e2")
    id_wedges = e1.join(
        e2, (F.col("e1.u") == F.col("e2.u")) & (F.col("e1.v") < F.col("e2.v"))
    ).count()

    assert id_wedges >= 190  # the hub explosion the orientation removes
    # every spoke has out-degree <= 2 under degree order -> tiny wedge set
    assert deg_wedges <= 40
    assert deg_wedges < id_wedges / 4
