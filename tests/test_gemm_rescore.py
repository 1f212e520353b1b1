"""GEMM-rescore sibling (round-7 verdict item 4): the Arrow pair-rescore
must reproduce the fold form's verdicts — same pair set after the
threshold, sims within one 6-dp ulp, with measured margin to the
threshold boundary (the dedup_embedding_lsh_scaled pattern)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators import similarity as sim
from aidc_2018_timeseries_spark.sources.tables import load_table
from tests.conftest import SF_DIR

THRESHOLD = 0.35


def _both(spark):
    v = load_table(spark, SF_DIR, "embeddings")
    bits = sim.scaled_n_bits(v.count())
    planes = sim.hyperplane_rows_stable(64, 8, bits, 7)
    fold = sim.embedding_lsh_dup_pairs(
        v, threshold=THRESHOLD, planes=planes, arrow=True
    )
    gemm = sim.embedding_lsh_dup_pairs_gemm(
        v, threshold=THRESHOLD, planes=planes
    )
    return fold, gemm


def test_pair_sets_identical(spark):
    fold, gemm = _both(spark)
    f = {(r.id_a, r.id_b): r.sim for r in fold.collect()}
    g = {(r.id_a, r.id_b): r.sim for r in gemm.collect()}
    assert set(f) == set(g)
    assert f, "corpus produced no pairs — the test is vacuous"
    worst = max(abs(f[k] - g[k]) for k in f)
    assert worst <= 1e-6, worst  # one 6-dp ulp of accumulation-order noise


def test_threshold_margin_measured(spark):
    """No surviving pair (either form) sits within 2 ulps of the
    threshold, so accumulation-order noise cannot flip membership on
    this corpus — the condition under which test_pair_sets_identical is
    meaningful rather than lucky."""
    fold, gemm = _both(spark)
    for df in (fold, gemm):
        near = df.filter(
            (F.col("sim") >= THRESHOLD) & (F.col("sim") < THRESHOLD + 2e-6)
        ).count()
        assert near == 0, near


def test_rescore_null_on_zero_norm(spark):
    v = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [1.0, 0.0, 0.0, 0.0]), (3, [1.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    rows = {
        (r.id_a, r.id_b): r.sim
        for r in sim.cosine_rescore_arrow(pairs, v).collect()
    }
    assert rows[(1, 2)] is None
    assert abs(rows[(2, 3)] - 0.707107) < 1e-6
