"""Persisted IVF index (round-7 verdict item 3): build-once, probe-later.

Three claims the face's docstring makes, pinned here:
1. the persisted probe is BIT-EQUAL to the in-memory ivf_topk on the
   expression path (parquet round-trip adds no approximation);
2. the probe's index scan is a bucketed scan with bucket PRUNING — it
   selects strictly fewer buckets than the table has (the on-disk
   n_probe/C story, not just a post-scan filter);
3. the GEMM (arrow=True) build persists the same inverted file as the
   expression build — the production path serves the same index.
"""

from __future__ import annotations

import re
import tempfile

from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators import similarity as sim
from aidc_2018_timeseries_spark.sources.tables import load_table
from tests.conftest import SF_DIR

STRIDE, PROBE, K = 50, 3, 5


def _frames(spark):
    v = load_table(spark, SF_DIR, "embeddings")
    q = v.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = sim.stride_centroids(v, STRIDE)
    return v, q, cents


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_persisted_probe_equals_in_memory(spark):
    v, q, cents = _frames(spark)
    path = tempfile.mkdtemp(prefix="aidc_ivf_test_")
    index = sim.ivf_build_persisted(
        v, cents, "aidc_ivf_test_idx", path, n_buckets=8, arrow=False
    )
    pred = sim.ivf_probe_persisted(index, q, cents, n_probe=PROBE, k=K)
    ref = sim.ivf_topk(
        v, q, centroid_stride=STRIDE, n_probe=PROBE, k=K, arrow=False
    )
    assert _rows(pred) == _rows(ref)


def test_probe_scan_prunes_buckets(spark):
    v, q, cents = _frames(spark)
    path = tempfile.mkdtemp(prefix="aidc_ivf_test_")
    index = sim.ivf_build_persisted(
        v, cents, "aidc_ivf_test_idx2", path, n_buckets=8, arrow=False
    )
    pred = sim.ivf_probe_persisted(index, q, cents, n_probe=PROBE, k=K)
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        pred.explain("formatted")
    plan = buf.getvalue()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, f"index scan is not planned as a pruned bucketed scan:\n{plan}"
    selected, total = int(m.group(1)), int(m.group(2))
    assert selected < total, (selected, total)
    # and the probed-cell filter reaches the parquet reader
    assert "PushedFilters" in plan or "pushedfilters" in plan.lower()


def test_gemm_build_persists_same_index(spark):
    v, _, cents = _frames(spark)
    p1 = tempfile.mkdtemp(prefix="aidc_ivf_test_")
    p2 = tempfile.mkdtemp(prefix="aidc_ivf_test_")
    a = sim.ivf_build_persisted(
        v, cents, "aidc_ivf_test_a", p1, n_buckets=8, arrow=False
    ).select("vec_id", "centroid_id")
    b = sim.ivf_build_persisted(
        v, cents, "aidc_ivf_test_b", p2, n_buckets=8, arrow=True
    ).select("vec_id", "centroid_id")
    assert _rows(a) == _rows(b)


def test_arrow_probe_matches_expression_probe(spark):
    """The arrow=True deployment rescore must reproduce the expression
    probe's top-k exactly on this corpus (same 6-dp round, same NULL
    policy, same tiebreak)."""
    v, q, cents = _frames(spark)
    path = tempfile.mkdtemp(prefix="aidc_ivf_test_")
    index = sim.ivf_build_persisted(
        v, cents, "aidc_ivf_test_idx3", path, n_buckets=8, arrow=False
    )
    a = sim.ivf_probe_persisted(index, q, cents, n_probe=PROBE, k=K)
    b = sim.ivf_probe_persisted(
        index, q, cents, n_probe=PROBE, k=K, arrow=True
    )
    assert _rows(a) == _rows(b)


def test_arrow_router_edge_cases(spark):
    """_route_queries_arrow must mirror the expression router's edge
    semantics: zero-norm queries probe nothing, zero-norm centroids are
    dropped, n_probe > C degrades to all live cells, empty centroid set
    yields an empty probe relation."""
    from pyspark.sql import functions as F

    q = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.6, 0.8])],
        "query_id long, query_vec array<double>",
    )
    cents = spark.createDataFrame(
        [(10, [1.0, 0.0]), (20, [0.0, 1.0]), (30, [0.0, 0.0])],
        "centroid_id long, centroid_vec array<double>",
    )
    got = {
        (r.query_id, r.centroid_id)
        for r in sim._route_queries_arrow(
            q, cents, n_probe=5, query_id_col="query_id",
            query_vec_col="query_vec",
        ).collect()
    }
    # query 2 (zero norm) probes nothing; centroid 30 (zero norm) never
    # appears; n_probe=5 > 2 live cells -> both cells per live query
    assert got == {(1, 10), (1, 20), (3, 10), (3, 20)}

    empty = cents.filter(F.lit(False))
    assert (
        sim._route_queries_arrow(
            q, empty, n_probe=3, query_id_col="query_id",
            query_vec_col="query_vec",
        ).count()
        == 0
    )


def test_arrow_router_matches_expression_router_ranking(spark):
    """Tie and ordering parity on a crafted grid: same probed cells as
    the expression router (6-dp round, smaller centroid_id on ties)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from aidc_2018_timeseries_spark.functions.vectors import cosine_similarity

    q = spark.createDataFrame(
        [(i, [float(i % 3 + 1), float((7 * i) % 5)]) for i in range(1, 9)],
        "query_id long, query_vec array<double>",
    )
    # duplicate centroid vectors force rounded-cosine TIES
    cents = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [1.0, 1.0]), (3, [2.0, 1.0]), (4, [0.5, 2.0])],
        "centroid_id long, centroid_vec array<double>",
    )
    arrow = {
        (r.query_id, r.centroid_id)
        for r in sim._route_queries_arrow(
            q, cents, n_probe=2, query_id_col="query_id",
            query_vec_col="query_vec",
        ).collect()
    }
    qc = q.crossJoin(F.broadcast(cents))
    qsim = F.round(cosine_similarity(F.col("query_vec"), F.col("centroid_vec")), 6)
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("centroid_id")
    )
    expr = {
        (r.query_id, r.centroid_id)
        for r in qc.select("query_id", "centroid_id", qsim.alias("qsim"))
        .filter(F.col("qsim").isNotNull())
        .withColumn("rk", F.row_number().over(wq))
        .filter(F.col("rk") <= 2)
        .collect()
    }
    assert arrow == expr
