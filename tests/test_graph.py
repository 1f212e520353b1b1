"""Connected components: distributed min-label propagation vs a local
union-find ground truth, on shapes that stress the loop (long chains need
~diameter rounds; cliques converge in one)."""

from __future__ import annotations

import pytest

from aidc_2018_timeseries_spark.operators.graph import connected_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node id in the component
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


GRAPHS = {
    # path graph: worst diameter per edge count — exercises multiple rounds
    "chain": (12, [(i, i + 1) for i in range(11)]),
    # two cliques + singletons + an isolated pair
    "cliques": (
        10,
        [(0, 1), (0, 2), (1, 2), (5, 6), (5, 7), (6, 7), (8, 9)],
    ),
    # edges listed high->low and duplicated: direction/dup insensitivity
    "reversed_dups": (6, [(4, 0), (4, 0), (0, 4), (5, 4), (2, 1)]),
}


@pytest.mark.parametrize("shape", sorted(GRAPHS))
def test_components_match_union_find(spark, shape):
    n, edges = GRAPHS[shape]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["label"]
        for r in connected_components(vertices, edf).collect()
    }
    assert got == _union_find(n, edges)


def test_unconverged_raises(spark):
    vertices = spark.createDataFrame([(i,) for i in range(8)], "node long")
    edf = spark.createDataFrame([(i, i + 1) for i in range(7)], "src long, dst long")
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(vertices, edf, max_iter=2)
