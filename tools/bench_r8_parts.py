"""Round-8 decade workloads too heavy for the pytest suite — imported by
bench_decades_r8.py (see its docstring for the framing)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

R7 = HERE / ".bench_r7"


def _spark():
    from aidc_2018_timeseries_spark.session import get_spark

    return get_spark(cpus=32)


def gemm_rescore() -> None:
    """The output-bound regime (emb100: 200k vectors, planted copies,
    ~10.9M true pairs — standing fold-form number 417s single-run):
    same corpus-scaled config as dedup_embedding_lsh_scaled, rescore
    swapped to the Arrow form. Single run each (minutes-scale)."""
    from pyspark.sql import functions as F  # noqa: F401

    from aidc_2018_timeseries_spark.operators import similarity as sim

    spark = _spark()
    for tag in ("emb10", "emb100"):
        v = spark.read.parquet(str(R7 / tag / "embeddings.parquet"))
        bits = sim.scaled_n_bits(v.count(), floor=4)
        planes = sim.hyperplane_rows_stable(64, 8, bits, 7)
        t = time.time()
        n = sim.embedding_lsh_dup_pairs_gemm(
            v, threshold=0.35, planes=planes
        ).count()
        print(f"{tag} gemm-rescore: {n} pairs in {time.time() - t:.1f}s")
        if tag == "emb10":  # cheap enough for a same-session fold A/B
            t = time.time()
            nf = sim.embedding_lsh_dup_pairs(
                v, threshold=0.35, planes=planes, arrow=True
            ).count()
            print(f"{tag} fold-rescore: {nf} pairs in {time.time() - t:.1f}s")


def bpe_batched() -> None:
    """Vocab decade at m>=8 (verdict item 5): 1M-distinct-word corpus
    (.bench_r7/vocab1000k), 24 merges — sequential (24 rounds) vs
    batched m=8 (3 rounds). Single run each (the loop is many jobs; job
    noise averages out inside it)."""
    from aidc_2018_timeseries_spark.operators.bpe import (
        train_bpe_merges,
        train_bpe_merges_batched,
    )

    spark = _spark()
    for tag in ("vocab100k", "vocab1000k"):
        docs = spark.read.parquet(str(R7 / tag / "documents.parquet"))
        t = time.time()
        seq = train_bpe_merges(docs, "text", n_merges=24)
        ts = time.time() - t
        t = time.time()
        bat = train_bpe_merges_batched(docs, "text", n_merges=24, m=8)
        tb = time.time() - t
        print(
            f"{tag}: sequential 24 merges {ts:.1f}s ({ts / 24:.2f}s/merge), "
            f"batched m=8 {tb:.1f}s ({tb / 24:.2f}s/merge), "
            f"overlap {len(set(seq) & set(bat))}/24"
        )


def pipeline_clean() -> None:
    raise NotImplementedError  # filled in later this round
