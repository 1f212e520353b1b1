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


def test_redact_pii_operator(spark):
    """Planted spans must be fully replaced and counted; placeholder
    tokens must never re-match a later pattern."""
    from aidc_2018_timeseries_spark.operators.text import pii_counts, redact_pii

    rows = [
        (1, "reach me at a.b+c@mail.example.org or 192.168.1.10 now"),
        (2, "call +1 555-123 4567 twice: +44 20-7946 0958 end"),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            redact_pii("t").alias("red"),
            *[c.alias(f"n_{k}") for k, c in pii_counts("t").items()],
        ).collect()
    }
    assert out[1]["red"] == "reach me at <EMAIL> or <IP> now"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 1, 0)
    assert out[2]["red"] == "call <PHONE> twice: <PHONE> end"
    assert out[2]["n_phone"] == 2
    assert out[3]["red"] == "no pii here at all"
    assert (out[3]["n_email"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0)


def test_multiplicity_formula_exact(spark):
    """Non-statistical check: every doc's copy count equals
    floor(w) + [md5('mix:7:'||id) % 1e6 < frac(w)·1e6], replicated here
    with hashlib — the full determinism contract, row by row."""
    import hashlib

    docs, per_doc, _ = _copies(spark)

    def h(doc_id):
        return int(hashlib.md5(f"mix:7:{doc_id}".encode()).hexdigest()[:15], 16)

    for r in docs:
        w = WEIGHTS.get(r["source"], 1.0)
        base = int(w)
        frac = int(round((w - base) * 1_000_000))
        expect = base + (1 if h(r["doc_id"]) % 1_000_000 < frac else 0)
        assert per_doc.get((r["doc_id"], r["source"]), 0) == expect


def test_fixed_k_per_group(spark):
    """Exactly min(k, |group|) rows per group, deterministic membership."""
    from aidc_2018_timeseries_spark.operators.split import fixed_k_per_group

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    out = fixed_k_per_group(d, "doc_id", "source", k=5, seed=7).collect()
    sizes = Counter(r["source"] for r in out)
    group_sizes = Counter(r["source"] for r in d.collect())
    assert sizes == {s: min(5, n) for s, n in group_sizes.items()}
    again = fixed_k_per_group(d, "doc_id", "source", k=5, seed=7).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # a different seed picks a different committee (overwhelmingly likely)
    other = fixed_k_per_group(d, "doc_id", "source", k=5, seed=8).collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))
