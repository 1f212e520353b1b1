"""Round-7 decade audits (round-6 verdict item 5): the three round-6
operators that only had one decade on record.

- ``events_sessionize_bucketed`` at Zipf 100× (100M events, hot user
  ~45%): does the bucket-width partition bound hold an order of
  magnitude past the round-6 10M audit? Plain ``events_sessionize`` is
  measured for contrast (its hot-user partition is ~45M rows — ONE
  task's sort).
- ``graph_triangles_copurchase`` at 100× lineitem (100 orderkey-shifted
  copies of sf0.1 = 60M rows): the round-5 10× row predates the
  degree-ordered orientation; this is the first 100× row on the r6 plan.
- ``llm_corpus_pipeline`` (+``_packed``) at 10× documents (10 id-shifted
  IDENTICAL copies, 50k docs — the duplicated-corpus regime, declared:
  every doc gains a 10-clique in the candidate graph, so this stresses
  the CC + canonicalization stages, not just the scan).

Corpora build under .bench_r7/ (git-ignored, deletable); min-of-2 warm
except where a single run is already minutes (noted inline).
Usage: python tools/bench_decades_r7.py [sessionize|triangles|pipeline]
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

import duckdb
import numpy as np

HERE = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(HERE))

SRC = Path("/root/testdata/sf0.1")
OUT = HERE / ".bench_r7"
ZIPF_A = 1.1


def build_events_zipf_100x() -> Path:
    """100M events: 1,000 event_id-shifted copies of sf0.1 events with
    user_id Zipf(1.1)-remapped over the real user universe (the
    bench_skew recipe, one decade further)."""
    d = OUT / "zipf100"
    if (d / "events.parquet").exists():
        return d
    d.mkdir(parents=True, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    con = duckdb.connect()
    base = con.sql(
        f"SELECT event_id, epoch_us(ts) AS us, user_id "
        f"FROM '{SRC}/events.parquet'"
    ).fetchnumpy()
    users = np.sort(np.unique(base["user_id"]))
    n, copies = len(base["event_id"]), 1_000
    rng = np.random.default_rng(7)
    ranks = rng.zipf(ZIPF_A, n * copies)
    uid = users[np.minimum(ranks - 1, len(users) - 1)]
    eid = np.tile(base["event_id"], copies) + np.repeat(
        np.arange(copies, dtype=np.int64) * 10_000_000, n
    )
    us = np.tile(base["us"], copies)
    tbl = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(us, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
        }
    )
    pq.write_table(tbl, d / "events.parquet")
    hot = np.bincount(np.searchsorted(users, uid)).max()
    print(f"zipf100 events: {n * copies:,} rows; hot user holds {hot:,} "
          f"({100 * hot / (n * copies):.0f}%)", flush=True)
    return d


def build_lineitem_100x() -> Path:
    d = OUT / "li100"
    if (d / "lineitem.parquet").exists():
        return d
    d.mkdir(parents=True, exist_ok=True)
    duckdb.sql(
        f"COPY (SELECT l_orderkey + i * 1_000_000_000 AS l_orderkey, "
        f"l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
        f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
        f"FROM '{SRC}/lineitem.parquet' CROSS JOIN range(100) t(i)) "
        f"TO '{d}/lineitem.parquet' (FORMAT PARQUET)"
    )
    for t in ("part", "orders", "supplier", "nation", "region", "customer"):
        shutil.copy(SRC / f"{t}.parquet", d / f"{t}.parquet")
    print("li100 lineitem: 60,000,000 rows", flush=True)
    return d


def build_documents_10x() -> Path:
    d = OUT / "docs10"
    if (d / "documents.parquet").exists():
        return d
    d.mkdir(parents=True, exist_ok=True)
    duckdb.sql(
        f"COPY (SELECT doc_id + i * 1_000_000 AS doc_id, text, lang, "
        f"source, n_chars FROM '{SRC}/documents.parquet' "
        f"CROSS JOIN range(10) t(i)) "
        f"TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    shutil.copy(SRC / "embeddings.parquet", d / "embeddings.parquet")
    print("docs10 documents: 50,000 rows (10 identical copies)", flush=True)
    return d


def build_documents_10x_vocab() -> Path:
    """10 copies with a per-copy word salt ('z' || copy || word): distinct
    vocabulary grows 10x alongside the corpus — the worst-case (super-
    Heaps-law) axis for BPE, whose merge rounds are vocab-cost. The salt
    survives the pipeline's lowercasing tokenizer (digits + lowercase)."""
    d = OUT / "docs10v"
    if (d / "documents.parquet").exists():
        return d
    d.mkdir(parents=True, exist_ok=True)
    duckdb.sql(
        f"COPY (SELECT doc_id + i * 1_000_000 AS doc_id, "
        f"array_to_string(list_transform("
        f"list_filter(string_split_regex(text, '\\s+'), w -> w <> ''), "
        f"w -> 'z' || i || w), ' ') AS text, lang, source, n_chars "
        f"FROM '{SRC}/documents.parquet' CROSS JOIN range(10) t(i)) "
        f"TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    shutil.copy(SRC / "embeddings.parquet", d / "embeddings.parquet")
    print("docs10v documents: 50,000 rows (10 word-salted copies, "
          "vocab x10)", flush=True)
    return d


def build_documents_vocab(n_words: int) -> Path:
    """Pure vocab-axis corpus: ``n_words`` DISTINCT 8-char hex words
    (md5 prefixes), 200 words/doc. The sf0.1 testdata has only 31
    distinct words, so the copy-based builders can never grow the BPE
    merge loop's state relation — this one grows nothing else."""
    d = OUT / f"vocab{n_words // 1000}k"
    if (d / "documents.parquet").exists():
        return d
    d.mkdir(parents=True, exist_ok=True)
    duckdb.sql(
        f"COPY (SELECT i // 200 AS doc_id, "
        f"string_agg(substr(md5(i::VARCHAR), 1, 8), ' ') AS text, "
        f"'en' AS lang, 'synth' AS source, "
        f"CAST(9 * 200 AS INT) AS n_chars "
        f"FROM range({n_words}) t(i) GROUP BY i // 200) "
        f"TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    shutil.copy(SRC / "embeddings.parquet", d / "embeddings.parquet")
    print(f"{d.name}: {n_words:,} distinct words, "
          f"{n_words // 200:,} docs", flush=True)
    return d


def measure(q, name: str, sf_dir: Path, runs: int = 2) -> None:
    walls = []
    rows = None
    for _ in range(runs):
        t0 = time.time()
        rows = q[name](spark_q[0], str(sf_dir)).count()
        walls.append(time.time() - t0)
    note = "" if runs > 1 else "  (single run)"
    print(f"{name} [{sf_dir.name}]: {min(walls):.1f}s "
          f"({rows:,} result rows){note}", flush=True)


spark_q = [None]


def main() -> None:
    from pyspark.sql import SparkSession

    from __spark_entry__ import queries

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "32g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark_q[0] = spark
    q = queries()
    which = set(sys.argv[1:]) or {"sessionize", "triangles", "pipeline"}

    if "sessionize" in which:
        d = build_events_zipf_100x()
        measure(q, "events_sessionize_bucketed", d)
        measure(q, "events_sessionize", d, runs=1)
    if "triangles" in which:
        d = build_lineitem_100x()
        measure(q, "graph_triangles_copurchase", d, runs=1)
    if "pipeline" in which:
        d = build_documents_10x()
        measure(q, "llm_corpus_pipeline", d)
        measure(q, "llm_corpus_pipeline_packed", d)
    if "bpe" in which:
        # 1x reference walls, then the two 10x regimes: identical copies
        # (corpus axis — vocab flat, scan 10x) and salted copies (vocab
        # axis — the merge loop's state relation grows 10x).
        measure(q, "text_bpe_train_merges", SRC)
        measure(q, "text_bpe_encode_counts", SRC)
        d = build_documents_10x()
        measure(q, "text_bpe_train_merges", d)
        measure(q, "text_bpe_encode_counts", d)
        dv = build_documents_10x_vocab()
        measure(q, "text_bpe_train_merges", dv)
        measure(q, "text_bpe_encode_counts", dv)
    if "bpevocab" in which:
        # the vocab-cost decade proper: 10k -> 100k -> 1M distinct words
        # (testdata vocab is 31 words; copies cannot grow this axis)
        for n in (10_000, 100_000, 1_000_000):
            dv = build_documents_vocab(n)
            measure(q, "text_bpe_train_merges", dv)
            measure(q, "text_bpe_encode_counts", dv)


if __name__ == "__main__":
    main()
