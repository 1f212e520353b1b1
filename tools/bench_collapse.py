"""Worst-case duplicate-corpus audits for the pairwise dedup family —
the reproducible source of SCALING.md's round-5/6 collapse tables.

Round 8: the gates are now per-family (containment on redundancy > 2%,
the MinHash family on mean copies/content > 20 — the measured
crossover), so a K=10 corpus would auto-route the minhash forms DIRECT.
The "collapsed" arms therefore force ``collapse=True``: this tool's job
is to measure the collapse machinery itself, which is exactly what the
tri-state knob exists for.

Builds the adversarial corpora from sf0.1 documents in memory:
- ``copies K``: every doc duplicated K times under shifted ids (the
  ten-identical-copies worst case; compute/output quadratic in K for
  the direct pairwise operators).
- ``vocab V``: V disjoint-vocabulary variants (every token prefixed
  v0..vV), copies 10 each — unique content grows V×, variants never
  near-dup each other (the 100× second-decade frame).

Usage:
    python tools/bench_collapse.py pairs [K]     # minhash pairs direct vs collapsed
    python tools/bench_collapse.py cc [K]        # minhash CC direct vs collapsed
    python tools/bench_collapse.py containment [K]
    python tools/bench_collapse.py second-decade # vocab x10 collapsed containment+linkage

Protocol: min-of-2 warm per form (matching bench.py); the second-decade
run is single-run (documented as such in SCALING.md). Synthetic unions
are repartitioned before use — a K-way union of a small parquet scan
otherwise inherits K partitions and benchmarks the harness, not the
operator (the `_spread` hazard, verified round 6).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def get_spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "64g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def load_docs(spark):
    from aidc_2018_timeseries_spark.sources.tables import load_table

    return load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text", "lang"
    )


def with_copies(d, k: int):
    out = d
    for i in range(1, k):
        out = out.unionByName(
            d.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                "text",
                "lang",
            )
        )
    # repartition only when the union is UNDER-parallel (a K-way union of
    # a one-partition parquet scan yields K partitions; K < cores starves
    # the hot projections). When the union already exceeds core count,
    # keep the natural partitioning — forcing 32 measured 382s vs 213s on
    # the 100x containment run (coarser partitions → straggler skew).
    if out.rdd.getNumPartitions() < 32:
        out = out.repartition(32, "doc_id")
    return out.persist()


def with_vocab_variants(d, v: int, copies: int = 10):
    def prefix(tag):
        return lambda x: F.concat(F.lit(tag), x)

    var = None
    for i in range(v):
        dv = d.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat_ws(
                " ", F.transform(F.split(F.col("text"), " "), prefix(f"v{i}"))
            ).alias("text"),
            "lang",
        )
        var = dv if var is None else var.unionByName(dv)
    return with_copies(var, copies)


def timeit(tag, fn, runs=2):
    best = None
    for _ in range(runs):
        t = time.time()
        n = fn()
        w = time.time() - t
        best = w if best is None else min(best, w)
    print(f"{tag}: {best:.1f}s rows={n}", flush=True)


def main() -> None:
    from aidc_2018_timeseries_spark.operators import dedup as dd
    from aidc_2018_timeseries_spark.operators.graph import connected_components
    from aidc_2018_timeseries_spark.operators.text import shingle_hashes, tokenize

    mode = sys.argv[1] if len(sys.argv) > 1 else "pairs"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark()
    d0 = load_docs(spark)

    if mode == "pairs":
        big = with_copies(d0, k)
        print("docs:", big.count())
        timeit("direct", lambda: dd.minhash_candidate_pairs(big, "doc_id", "text").count())
        timeit("collapsed", lambda: dd.minhash_candidate_pairs_collapsed(big, "doc_id", "text", collapse=True).count())
    elif mode == "cc":
        big = with_copies(d0, k)
        print("docs:", big.count())

        def direct():
            pairs = dd.minhash_candidate_pairs(big, "doc_id", "text")
            nodes = big.select("doc_id").where(
                F.size(shingle_hashes(F.col("text"), n=3)) > 0
            )
            return connected_components(
                nodes, pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
            ).count()

        timeit("direct", direct)
        timeit("collapsed", lambda: dd.minhash_components_collapsed(big, "doc_id", "text", collapse=True).count())
    elif mode == "containment":
        big = with_copies(d0, k)
        print("docs:", big.count())
        timeit("direct", lambda: dd.ngram_containment_pairs(big, "doc_id", "text", threshold=0.9).count())
        timeit("collapsed", lambda: dd.ngram_containment_pairs_collapsed(big, "doc_id", "text", threshold=0.9, collapse=True).count())
    elif mode == "second-decade":
        big = with_vocab_variants(d0, 10, copies=10)
        print("docs:", big.count())
        timeit(
            "containment collapsed 100x",
            lambda: dd.ngram_containment_pairs_collapsed(big, "doc_id", "text", threshold=0.9).count(),
            runs=1,
        )

        def linkage():
            mapping, reps = dd.exact_collapse(big, "doc_id", "text", key_cols=["lang"])
            rep_pairs = dd.blocked_edit_distance_pairs(
                reps, "doc_id", "text", block_cols=["lang"], prefix_tokens=4, max_dist=3
            ).select("id_a", "id_b")
            tokened = reps.filter(F.size(tokenize(F.col("text"))) > 0).select(
                F.col("doc_id").alias("canonical_id")
            )
            star = (
                mapping.filter(F.col("doc_id") != F.col("canonical_id"))
                .join(tokened, "canonical_id", "semi")
                .select(F.col("doc_id").alias("id_a"), F.col("canonical_id").alias("id_b"))
            )
            return connected_components(
                big.select("doc_id"),
                rep_pairs.unionByName(star),
                id_col="doc_id",
                src_col="id_a",
                dst_col="id_b",
            ).count()

        timeit("linkage collapsed 100x", linkage, runs=1)
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
