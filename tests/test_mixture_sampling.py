"""upweight_mixture semantics: per-stratum copy counts, determinism, and
the 'epochs per domain' expectation (mean multiplicity tracks the weight).
"""

from __future__ import annotations

from collections import Counter

from aidc_2018_timeseries_spark.operators.split import upweight_mixture
from aidc_2018_timeseries_spark.sources.tables import load_table
from tests.conftest import SF_DIR

WEIGHTS = {"src0": 2.5, "src1": 0.5, "src2": 0.0, "src3": 3.0}


def _copies(spark):
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    out = upweight_mixture(d, "doc_id", "source", WEIGHTS, seed=7).collect()
    per_doc = Counter((r["doc_id"], r["source"]) for r in out)
    return d.collect(), per_doc, out


def test_copy_counts_per_stratum(spark):
    docs, per_doc, out = _copies(spark)
    by_source: dict[str, list[int]] = {}
    for (doc_id, source), n in per_doc.items():
        by_source.setdefault(source, []).append(n)
    # integer weight -> exact count; fractional -> floor or floor+1
    assert set(by_source["src3"]) == {3}
    assert set(by_source["src0"]) <= {2, 3}
    assert set(by_source["src1"]) <= {1}  # 0-copy docs simply absent
    assert "src2" not in by_source  # weight 0.0 drops the stratum
    # unlisted strata pass through exactly once
    others = [s for s in by_source if s not in WEIGHTS]
    assert others and all(set(by_source[s]) == {1} for s in others)
    # fractional part actually exercised both branches
    assert 2 in set(by_source["src0"]) and 3 in set(by_source["src0"])


def test_copy_idx_is_dense_and_deterministic(spark):
    _, per_doc, out = _copies(spark)
    idx: dict[tuple, list[int]] = {}
    for r in out:
        idx.setdefault((r["doc_id"], r["source"]), []).append(r["copy_idx"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in idx.values())
    # deterministic: a second run yields the identical multiset
    _, per_doc2, _ = _copies(spark)
    assert per_doc == per_doc2


def test_mean_multiplicity_tracks_weight(spark):
    docs, per_doc, _ = _copies(spark)
    n_src0 = sum(1 for r in docs if r["source"] == "src0")
    total_src0 = sum(n for (d, s), n in per_doc.items() if s == "src0")
    # hash-Bernoulli over the stratum: mean within ±0.35 of 2.5 for n≈25
    assert abs(total_src0 / n_src0 - 2.5) <= 0.35
