"""Properties of the Johnson-Lindenstrauss random projection."""

from __future__ import annotations

import numpy as np

from aidc_2018_timeseries_spark.operators.similarity import (
    hyperplane_rows,
    random_projection,
)


def _vectors_df(spark, n=40, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_matches_numpy_matrix_product(spark):
    dim, k = 16, 4
    df = _vectors_df(spark, n=10, dim=dim)
    got = {
        (r.vec_id, r.comp_id): r.coord
        for r in random_projection(df, dim, k, seed=5).collect()
    }
    planes = np.array([p for _, _, p in sorted(hyperplane_rows(dim, 1, k, 5))])
    x = np.array([r.embedding for r in df.orderBy("vec_id").collect()])
    want = (x @ planes.T) / np.sqrt(k)
    for i in range(10):
        for b in range(k):
            assert abs(got[(i, b)] - round(want[i, b], 6)) < 1e-9


def test_norms_preserved_in_expectation(spark):
    # E[||Px||^2] = ||x||^2 for scale 1/sqrt(k) Gaussian directions; with
    # k=8 and 40 vectors the MEAN ratio concentrates near 1 (fixed seeds)
    dim, k = 16, 8
    df = _vectors_df(spark, n=40, dim=dim)
    proj = random_projection(df, dim, k, seed=11).toPandas()
    orig = {r.vec_id: np.linalg.norm(r.embedding) ** 2 for r in df.collect()}
    ratios = [
        (g.coord**2).sum() / orig[vid] for vid, g in proj.groupby("vec_id")
    ]
    assert 0.7 < float(np.mean(ratios)) < 1.3
