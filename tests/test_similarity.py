"""Similarity-search tests: IVF recall vs the brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    stride_centroids,
)
from aidc_2018_timeseries_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def _queries(v):
    return v.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_ivf_recall_against_brute_force(spark):
    v = load_table(spark, SF_DIR, "embeddings")
    q = _queries(v)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(v, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(v, q, centroid_stride=50, n_probe=3, k=5).collect()
    }
    # IVF probes 3 of ~10 cells; random 64-d data has weak cluster structure,
    # so recall is bounded by probe coverage — assert a sane floor and that
    # every IVF result is well-formed (no self-matches, ranks 1..5).
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"recall {recall}"
    ranks = {}
    for r in ivf_topk(v, q, centroid_stride=50, n_probe=3, k=5).collect():
        assert r["neighbor_id"] != r["query_id"]
        ranks.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())


def test_ivf_full_probe_equals_brute_force(spark):
    """Probing EVERY cell must reproduce the exact result — the recall loss
    is purely probe pruning, not a scoring bug."""
    v = load_table(spark, SF_DIR, "embeddings")
    q = _queries(v).limit(2)
    n_cells = stride_centroids(v, 50).count()
    exact = sorted(map(tuple, brute_force_topk(v, q, k=5).collect()))
    full = sorted(map(tuple, ivf_topk(v, q, centroid_stride=50, n_probe=n_cells, k=5).collect()))
    assert exact == full


def test_rp_lsh_recall_against_brute_force(spark):
    from aidc_2018_timeseries_spark.operators.similarity import rp_lsh_topk

    v = load_table(spark, SF_DIR, "embeddings")
    q = _queries(v)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(v, q, k=5).collect()
    }
    rows = rp_lsh_topk(v, q, n_tables=16, n_bits=5, k=5).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(exact & approx) / len(exact)
    # random 64-d data has almost no cosine structure (near-neighbors are
    # barely closer than random pairs), so buckets must stay coarse:
    # 16 tables x 5 bits measures 0.68-0.84 recall across SFs. The floor
    # guards against bucketing bugs (a broken key sends recall to ~0).
    assert recall >= 0.5, f"recall {recall}"
    for r in rows:
        assert r["neighbor_id"] != r["query_id"]


def test_lsh_dup_pairs_precision_and_recall(spark):
    """The LSH dedup face vs the brute-force pair baseline: precision must
    be EXACT (every emitted pair is a true ≥-threshold pair with the same
    rounded sim — rescoring is exact, LSH only prunes candidates), recall
    pinned with a floor (weak-cosine testdata: pairs sit at 0.35-0.51 where
    sign-LSH collision probability is modest by design)."""
    from aidc_2018_timeseries_spark.operators.similarity import (
        embedding_cosine_dup_pairs,
        embedding_lsh_dup_pairs,
    )

    v = load_table(spark, SF_DIR, "embeddings")
    exact = {(r["id_a"], r["id_b"]): r["sim"] for r in embedding_cosine_dup_pairs(v, 0.35).collect()}
    got = {(r["id_a"], r["id_b"]): r["sim"] for r in embedding_lsh_dup_pairs(v, 0.35).collect()}
    assert got, "LSH face found no pairs at all"
    for pair, sim in got.items():
        assert pair in exact and exact[pair] == sim  # exact precision
    recall = len(got) / len(exact)
    assert recall >= 0.2, f"recall {recall}"


def test_lsh_dup_pairs_one_bit_recovers_exact(spark):
    """1-bit tables ≈ full candidate coverage (any pair agrees on one sign
    bit in some of 16 tables w.h.p.) → the LSH face must equal brute force:
    pruning, not scoring, is the only approximation."""
    from aidc_2018_timeseries_spark.operators.similarity import (
        embedding_cosine_dup_pairs,
        embedding_lsh_dup_pairs,
    )

    v = load_table(spark, SF_DIR, "embeddings")
    exact = sorted(map(tuple, embedding_cosine_dup_pairs(v, 0.35).collect()))
    got = sorted(map(tuple, embedding_lsh_dup_pairs(v, 0.35, n_tables=16, n_bits=1).collect()))
    assert exact == got


def test_rp_lsh_wide_tables_recover_exact(spark):
    """With 1-bit tables every pair collides in a table with prob ~1 per
    table; 16 such tables ≈ full candidate coverage → must equal brute
    force on the checked queries (pruning, not scoring, is the only
    approximation)."""
    from aidc_2018_timeseries_spark.operators.similarity import rp_lsh_topk

    v = load_table(spark, SF_DIR, "embeddings")
    q = _queries(v).limit(2)
    exact = sorted(map(tuple, brute_force_topk(v, q, k=5).collect()))
    got = sorted(map(tuple, rp_lsh_topk(v, q, n_tables=16, n_bits=1, k=5).collect()))
    assert exact == got


def test_assign_centroids_arrow_matches_expression_form(spark):
    """The Arrow GEMM assignment (the scale path inside ivf_topk) must pick
    the SAME centroid per vector as the expression form, including the
    smallest-centroid-id tiebreak on the 6-dp-rounded similarity."""
    from aidc_2018_timeseries_spark.operators.similarity import (
        assign_centroids,
        assign_centroids_arrow,
    )

    v = load_table(spark, SF_DIR, "embeddings")
    cents = stride_centroids(v, 50)
    expr = {
        r["vec_id"]: r["centroid_id"] for r in assign_centroids(v, cents).collect()
    }
    arrow = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_centroids_arrow(v, cents).collect()
    }
    assert expr.keys() == arrow.keys()
    diff = {k for k in expr if expr[k] != arrow[k]}
    # identical up to genuine 6-dp rounding boundaries (none in this data)
    assert not diff, f"{len(diff)} assignment diffs, e.g. {sorted(diff)[:3]}"


def test_ivf_n_centroids_knob(spark):
    """n_centroids derives the stride from a count so cell count stays
    corpus-size-independent; results remain well-formed and recall holds."""
    v = load_table(spark, SF_DIR, "embeddings")
    q = _queries(v)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(v, q, k=5).collect()
    }
    got = ivf_topk(v, q, n_centroids=10, n_probe=3, k=5).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    assert len(exact & approx) / len(exact) >= 0.2
    ranks = {}
    for r in got:
        assert r["neighbor_id"] != r["query_id"]
        ranks.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in ranks.values())


def test_embedding_lsh_scaled_face_precision_and_recall(spark):
    """The scaled (Arrow-GEMM, prefix-stable-plane) face: every emitted
    pair is a TRUE pair (precision exact by rescore), and recall vs the
    brute-force thresholded truth clears the sign-LSH floor. (Until
    round 7 this compared against the fixed face's pair set — the two
    faces shared a plane generator then; with prefix-stable planes the
    sets are independent samples of the truth and only precision/recall
    are invariants.)"""
    import numpy as np

    from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all

    load_all()
    scaled = {
        (r["id_a"], r["id_b"])
        for r in CATALOG["dedup_embedding_lsh_scaled"].spark_fn(spark, SF_DIR).collect()
    }
    assert scaled
    v = load_table(spark, SF_DIR, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in v])
    V = np.array([r["embedding"] for r in v], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = Vn @ Vn.T
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = np.round(S[iu, ju], 6) >= 0.35
    lo = np.minimum(ids[iu[keep]], ids[ju[keep]])
    hi = np.maximum(ids[iu[keep]], ids[ju[keep]])
    truth = set(zip(lo.tolist(), hi.tolist()))
    assert scaled <= truth, f"false positives: {sorted(scaled - truth)[:5]}"
    recall = len(scaled & truth) / len(truth)
    assert recall >= 0.5, f"recall {recall}"


def test_hyperplane_rows_stable_prefix_property(spark):
    """plane (t, b) must not depend on the bit budget — the property the
    scaled face's static oracle rests on (mask bit_idx < b over one
    inlined max-budget set)."""
    from aidc_2018_timeseries_spark.operators.similarity import (
        hyperplane_rows_stable,
    )

    big = {(t, b): p for t, b, p in hyperplane_rows_stable(16, 4, 9, 7)}
    for bits in (1, 4, 7):
        for t, b, p in hyperplane_rows_stable(16, 4, bits, 7):
            assert big[(t, b)] == p


def test_lsh_signature_arrow_matches_expression(spark):
    """GEMM signatures == expression signatures on the stable planes at
    test SF — the bucket-level certification behind the scaled face's
    oracle (sign margins are ~50x the 6-dp rounding boundary on this
    data, so the np.round/GEMM vs JVM-fold/HALF_UP difference cannot
    flip a bit)."""
    from aidc_2018_timeseries_spark.operators.similarity import (
        hyperplane_rows_stable,
        lsh_signatures,
        lsh_signatures_arrow,
    )

    v = load_table(spark, SF_DIR, "embeddings")
    planes = hyperplane_rows_stable(64, 8, 5, 7)
    expr = {
        (r["vec_id"], r["table_id"]): r["bucket"]
        for r in lsh_signatures(v, planes).collect()
    }
    arrow = {
        (r["vec_id"], r["table_id"]): r["bucket"]
        for r in lsh_signatures_arrow(v, planes).collect()
    }
    assert expr == arrow


def test_assign_centroids_arrow_empty_centroids(spark):
    """No centroids → empty assignment (not a driver-side numpy crash),
    matching the expression form's degradation."""
    from aidc_2018_timeseries_spark.operators.similarity import (
        assign_centroids_arrow,
    )

    v = load_table(spark, SF_DIR, "embeddings")
    none = stride_centroids(v, 50).filter("centroid_id < 0")
    out = assign_centroids_arrow(v, none)
    assert out.count() == 0
    assert out.columns == ["vec_id", "embedding", "centroid_id"]


def test_topk_arrow_path_matches_expression_path(spark):
    """ivf_topk / rp_lsh_topk: the Arrow GEMM production path and the
    bit-reproducible expression path (what the oracle-checked
    knn_ivf_eval / knn_rp_lsh_eval faces run) must produce the SAME
    ranked result on the testdata — the link that lets a driver-green
    eval face certify the GEMM path's quality too. A genuine divergence
    needs |dot| within float ulps of the 6-dp rounding boundary; if this
    ever trips, the eval faces no longer speak for the arrow=True path."""
    from aidc_2018_timeseries_spark.operators.similarity import rp_lsh_topk

    v = load_table(spark, SF_DIR, "embeddings")
    q = _queries(v)
    for fn, kw in (
        (ivf_topk, dict(centroid_stride=50, n_probe=3, k=5)),
        (rp_lsh_topk, dict(n_tables=8, n_bits=8, k=5, seed=7, dim=64)),
    ):
        gemm = {
            (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
            for r in fn(v, q, arrow=True, **kw).collect()
        }
        expr = {
            (r["query_id"], r["rank"], r["neighbor_id"], r["sim"])
            for r in fn(v, q, arrow=False, **kw).collect()
        }
        assert gemm == expr, fn.__name__


def test_lsh_signature_matches_python_sequential_fold(spark):
    """The broadcast-relation signature form (round 7) == a pure-Python
    sequential-fold reference, element for element: left-fold dot in
    array order, round-half-up at 6 dp, sign test, bit-shift accumulate.
    This is the construction-level pin behind the oracle contract — the
    DuckDB hash checks one configuration per face; this checks the
    arithmetic CONTRACT on several plane shapes, including per-table
    bit counts that differ (the prefix-stable masked regime)."""
    from decimal import ROUND_HALF_UP, Decimal

    from aidc_2018_timeseries_spark.operators.similarity import (
        hyperplane_rows,
        lsh_signatures,
    )

    v = load_table(spark, SF_DIR, "embeddings")
    rows = {r["vec_id"]: list(r["embedding"]) for r in v.collect()}

    def ref_bucket(vec, planes_for_table):
        bucket = 0
        for b, plane in sorted(planes_for_table):
            acc = 0.0
            for x, y in zip(vec, plane):
                acc += float(x) * y  # left fold, array order
            # Spark F.round = BigDecimal(double) HALF_UP at 6 dp: use the
            # exact binary value, not repr — Decimal(acc) is exact.
            r = Decimal(acc).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            if r > 0:
                bucket += 1 << b
        return bucket

    configs = [
        hyperplane_rows(64, 3, 4, 11),
        hyperplane_rows(64, 1, 10, 5),
        # mixed per-table widths: drop the high bit from table 0 only
        [p for p in hyperplane_rows(64, 2, 5, 99) if not (p[0] == 0 and p[1] == 4)],
    ]
    for planes in configs:
        per_table = {}
        for t, b, plane in planes:
            per_table.setdefault(t, []).append((b, plane))
        got = {
            (r["vec_id"], r["table_id"]): r["bucket"]
            for r in lsh_signatures(v, planes).collect()
        }
        want = {
            (vid, t): ref_bucket(vec, ps)
            for vid, vec in rows.items()
            for t, ps in per_table.items()
        }
        assert got == want
