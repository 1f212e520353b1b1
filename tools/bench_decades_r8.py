"""Round-8 decade audits (r7 verdict items 3, 4, 5, 7).

- ``ivf-persisted``: the build-once/probe-later split at the 100x ANN
  corpus (re-uses .bench_r7/emb100, 200k vectors — the corpus behind the
  standing 118.8s end-to-end knn_ivf number). Build = GEMM assignment +
  bucketed write (paid once at ingest); probe = read-back + routed
  rescore, measured for a full 2k-query batch AND a 20-query batch
  (where bucket pruning actually skips files).
- ``gemm-rescore``: the output-bound LSH regime (planted-copy 100x,
  10.9M true pairs, standing 417s on the exact HOF fold) re-run on the
  GEMM rescore sibling.
- ``bpe-batched``: vocab decade at m>=8 merges/round vs the single-merge
  trainer (driver round trips ~m x fewer).
- ``pipeline-clean``: llm_corpus_pipeline at 100x CLEAN docs (disjoint
  vocab variants — skip-gate path), separating corpus-volume growth from
  dup-regime growth.

Corpora build under .bench_r8/ (git-ignored, deletable); min-of-2 warm
except where a single run is already minutes (noted inline).
Usage: python tools/bench_decades_r8.py <ivf-persisted|gemm-rescore|bpe-batched|pipeline-clean>
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

R7 = HERE / ".bench_r7"
OUT = HERE / ".bench_r8"


def _spark():
    from aidc_2018_timeseries_spark.session import get_spark

    return get_spark(cpus=32)


def ivf_persisted() -> None:
    from pyspark.sql import functions as F

    from aidc_2018_timeseries_spark.operators import similarity as sim

    spark = _spark()
    for tag, qmod in (("emb10", 100), ("emb100", 100)):
        v = spark.read.parquet(str(R7 / tag / "embeddings.parquet"))
        n = v.count()
        stride = max(1, n // max(32, int(n**0.5)))
        cents = sim.stride_centroids(v, stride)
        path = tempfile.mkdtemp(prefix=f"aidc_ivf_{tag}_")
        t = time.time()
        index = sim.ivf_build_persisted(
            v, cents, f"aidc_ivf_{tag}", path, n_buckets=32, arrow=True
        )
        index.count()  # force the write + read-back registration
        build = time.time() - t
        for qtag, mod in (("full", qmod), ("small", qmod * 100)):
            q = v.filter(F.col("vec_id") % mod == 0).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("query_vec"),
            )
            nq = q.count()
            for arrow in (False, True):
                runs = []
                for _ in range(2):
                    t = time.time()
                    sim.ivf_probe_persisted(
                        index, q, cents, n_probe=3, k=5, arrow=arrow
                    ).count()
                    runs.append(round(time.time() - t, 2))
                print(
                    f"{tag} n={n} C~{int(n**0.5)} build+write={build:.1f}s "
                    f"probe[{qtag} {nq}q arrow={arrow}]={runs} "
                    f"(min {min(runs)}s)"
                )


def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "ivf-persisted"
    if cmd == "ivf-persisted":
        ivf_persisted()
    elif cmd == "ivf-million":
        from tools.bench_r8_parts import ivf_million

        ivf_million()
    elif cmd == "gemm-rescore":
        from tools.bench_r8_parts import gemm_rescore

        gemm_rescore()
    elif cmd == "bpe-batched":
        from tools.bench_r8_parts import bpe_batched

        bpe_batched()
    elif cmd == "pipeline-clean":
        from tools.bench_r8_parts import pipeline_clean

        pipeline_clean()
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")


if __name__ == "__main__":
    main()
