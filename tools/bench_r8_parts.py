"""Round-8 decade workloads too heavy for the pytest suite — imported by
bench_decades_r8.py (see its docstring for the framing)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

R7 = HERE / ".bench_r7"
OUT = HERE / ".bench_r8"


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
    """llm_corpus_pipeline at 100x CLEAN docs (verdict item 7): 100
    disjoint-vocabulary variants, ONE copy each — unique content grows
    100x, no new near-dup structure, so this separates corpus-VOLUME
    growth from the dup-REGIME growth measured in r7 (10x identical
    copies, 125.1s, quadratic-clique attribution).

    Builder nuance vs bench_collapse.with_vocab_variants: the pipeline's
    language gate is stopword-driven, so prefixing EVERY token would
    flip every variant to lang!='en' and the decade would measure only
    the scan+gates. Here STOPWORDS KEEP THEIR SURFACE FORM and only
    content tokens get the variant prefix: variants stay 'en', quality
    stays comparable, and cross-variant Jaccard is near zero (shared
    shingles need 3 consecutive stopwords), so the corpus is genuinely
    clean at 100x volume. Single run per point (minutes-scale)."""
    import shutil

    from pyspark.sql import functions as F

    from aidc_2018_timeseries_spark.operators.text import LANG_STOPWORDS
    from aidc_2018_timeseries_spark.plans.catalog import CATALOG, load_all
    from aidc_2018_timeseries_spark.sources.tables import load_table

    load_all()
    spark = _spark()
    base = load_table(spark, "/root/testdata/sf0.1", "documents")
    stop = F.array(*[F.lit(w) for w in sorted(LANG_STOPWORDS["en"])])

    def variants(v: int) -> str:
        out = None
        for i in range(v):
            keep = F.transform(
                F.split(F.col("text"), " "),
                lambda x, i=i: F.when(
                    F.array_contains(stop, F.lower(x)), x
                ).otherwise(F.concat(F.lit(f"v{i}"), x)),
            )
            dv = base.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                F.concat_ws(" ", keep).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            out = dv if out is None else out.unionByName(dv)
        path = OUT / f"docs{v}clean"
        shutil.rmtree(path, ignore_errors=True)
        out.repartition(32, "doc_id").write.parquet(
            str(path / "documents.parquet")
        )
        return str(path)

    fn = CATALOG["llm_corpus_pipeline"].spark_fn
    for v in (1, 10, 100):
        d = variants(v) if v > 1 else "/root/testdata/sf0.1"
        t = time.time()
        n = fn(spark, d).count()
        print(f"clean {v}x: {n} rows in {time.time() - t:.1f}s", flush=True)


def ivf_million() -> None:
    """Persisted-IVF third decade: 1M vectors (dim 64), one more decade
    past emb100, proving the build-once/probe-decoupled story holds as C
    and corpus grow together (C = √n = 1000). Corpus: 100k seeded base
    vectors × 10 deterministic perturbed copies (the r4/r7 ANN-corpus
    style, regenerated here because the earlier builders were ad hoc —
    absolute numbers are not comparable across corpora; the build/probe
    SPLIT is the signal)."""
    import shutil
    import tempfile

    import numpy as np
    from pyspark.sql import functions as F

    from aidc_2018_timeseries_spark.operators import similarity as sim

    spark = _spark()
    path = OUT / "emb1000" / "embeddings.parquet"
    if not path.exists():
        rng = np.random.RandomState(11)
        base = rng.standard_normal((100_000, 64))
        rows = []
        import pandas as pd

        shutil.rmtree(path, ignore_errors=True)
        for copy in range(10):
            pert = base + 0.02 * rng.standard_normal(base.shape)
            pdf = pd.DataFrame(
                {
                    "vec_id": np.arange(100_000, dtype=np.int64)
                    + copy * 1_000_000,
                    "embedding": list(pert),
                }
            )
            sdf = spark.createDataFrame(pdf)
            sdf.write.mode("append").parquet(str(path))
        del rows
    v = spark.read.parquet(str(path))
    n = v.count()
    stride = max(1, n // max(32, int(n**0.5)))
    cents = sim.stride_centroids(v, stride)
    idx_path = tempfile.mkdtemp(prefix="aidc_ivf_emb1000_")
    t = time.time()
    index = sim.ivf_build_persisted(
        v, cents, "aidc_ivf_emb1000", idx_path, n_buckets=64, arrow=True
    )
    index.count()
    build = time.time() - t
    print(f"emb1000 n={n} C~{int(n**0.5)} build+write={build:.1f}s")
    for mod, tag in ((1000, "2000q"), (100_000, "small")):
        q = v.filter(F.col("vec_id") % mod == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        nq = q.count()
        runs = []
        for _ in range(2):
            t = time.time()
            sim.ivf_probe_persisted(
                index, q, cents, n_probe=3, k=5, arrow=True
            ).count()
            runs.append(round(time.time() - t, 2))
        print(f"emb1000 probe[{tag} {nq}q arrow]={runs}")
