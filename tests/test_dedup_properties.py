"""Randomized property tests for the exact similarity-join family:
prefix-filtered Jaccard and one-sided-filtered containment must equal a
brute-force pure-Python computation on every random corpus — i.e. the
candidate filters are LOSSLESS, not approximately so. Seeded random (not
hypothesis) because each example pays a Spark job; 6 corpora × 2 ops
covers the filter edge cases (boundary ratios, subset docs, shared
vocabulary) deterministically.
"""

from __future__ import annotations

import random

from aidc_2018_timeseries_spark.operators.dedup import (
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)


def _shingles(text: str, n: int = 3) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _brute_jaccard(docs: dict[int, str], t: float) -> set[tuple[int, int]]:
    out = set()
    ids = sorted(docs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = _shingles(docs[a]), _shingles(docs[b])
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= t - 1e-9:
                out.add((a, b))
    return out


def _brute_containment(docs: dict[int, str], t: float) -> set[tuple[int, int]]:
    out = set()
    for a in docs:
        for b in docs:
            if a == b:
                continue
            sa, sb = _shingles(docs[a]), _shingles(docs[b])
            if not sa:
                continue
            if len(sa & sb) / len(sa) >= t - 1e-9:
                out.add((a, b))
    return out


def _random_corpus(seed: int) -> dict[int, str]:
    """Corpora engineered to stress the filters: shared vocabulary, planted
    near-dups (token edits), planted subsets (quotes), tiny docs."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    docs: dict[int, str] = {}
    did = 0
    for _ in range(8):
        docs[did] = " ".join(rng.choices(vocab, k=rng.randint(2, 14)))
        did += 1
    # near-duplicate: copy with one token swapped
    base = docs[rng.randrange(did)].split()
    if len(base) > 4:
        pos = rng.randrange(len(base))
        base[pos] = rng.choice(vocab)
        docs[did] = " ".join(base)
        did += 1
    # subset: a contiguous slice of a longer doc (containment case)
    long_doc = max(docs.values(), key=lambda s: len(s.split())).split()
    if len(long_doc) >= 6:
        docs[did] = " ".join(long_doc[1 : 1 + rng.randint(4, len(long_doc) - 1)])
        did += 1
    return docs


def test_prefix_filtered_jaccard_is_lossless(spark):
    for seed in range(6):
        docs = _random_corpus(seed)
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.8).collect()
        }
        assert got == _brute_jaccard(docs, 0.8), f"seed {seed}"


def test_one_sided_filtered_containment_is_lossless(spark):
    for seed in range(6):
        docs = _random_corpus(seed)
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in ngram_containment_pairs(
                df, "doc_id", "text", threshold=0.9
            ).collect()
        }
        assert got == _brute_containment(docs, 0.9), f"seed {seed}"
