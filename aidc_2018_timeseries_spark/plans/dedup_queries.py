"""Catalog queries: deduplication over ``documents`` / ``embeddings``.

The DuckDB oracles restate each dedup algorithm in SQL with the SAME
md5-derived constants (generated from one Python source of truth), so the
driver's hash check verifies the algorithm, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.functions.hashing import hash64_sql
from aidc_2018_timeseries_spark.operators import dedup as dd
from aidc_2018_timeseries_spark.operators.similarity import (
    embedding_lsh_dup_pairs,
    hyperplane_rows,
)
from aidc_2018_timeseries_spark.operators.graph import connected_components
from aidc_2018_timeseries_spark.operators.text import shingle_hashes, tokenize_sql
from aidc_2018_timeseries_spark.plans.catalog import register
from aidc_2018_timeseries_spark.sources.tables import load_table

_TOKS = tokenize_sql("text")
_SHINGLE_N = 3
_NUM_HASHES = 16
_NUM_BANDS = 4

# word-3-gram shingles → distinct 30-bit hashes, as DuckDB SQL over `toks`
_SHINGLES = (
    f"list_transform(range(1, len(toks) - {_SHINGLE_N} + 2), "
    f"i -> array_to_string(list_slice(toks, i, i + {_SHINGLE_N} - 1), ' '))"
)
_SH30 = f"list_distinct(list_transform({_SHINGLES}, s -> {hash64_sql('s')} % 1073741824))"


# --- exact dedup (hash-groupBy) ---
@register(
    "dedup_exact",
    f"""
    WITH h AS (
      SELECT doc_id, md5(array_to_string({_TOKS}, ' ')) AS content_hash FROM documents),
    c AS (SELECT content_hash, MIN(doc_id) AS canonical_id FROM h GROUP BY content_hash)
    SELECT h.doc_id, c.canonical_id FROM h JOIN c USING (content_hash)
    """,
    doc="exact dedup: normalized content hash → min-id canonical mapping",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.exact_duplicates(d, "doc_id", "text")


# --- MinHash + LSH candidate pairs ---
def _minhash_pair_ctes() -> str:
    """Shared CTE chain ``t, sh, sigs, bands, pairs`` restating the whole
    MinHash+LSH candidate generation in DuckDB (same md5-derived constants
    as the Spark side). Docs with no shingles (< n tokens) are excluded,
    mirroring the explode-based Spark implementation."""
    sig_exprs = []
    for i, (a, b) in enumerate(dd._minhash_params(_NUM_HASHES)):
        sig_exprs.append(
            f"list_min(list_transform(sh30, h -> ({a} * h + {b}) % "
            f"{dd.MINHASH_PRIME})) AS s{i}"
        )
    rows = _NUM_HASHES // _NUM_BANDS
    band_rows = []
    for band in range(_NUM_BANDS):
        cols = ", ".join(f"s{band * rows + j}::VARCHAR" for j in range(rows))
        bh = hash64_sql(f"array_to_string([{cols}], ',')")
        band_rows.append(f"SELECT doc_id, {band} AS band_id, {bh} AS band_hash FROM sigs")
    bands_union = " UNION ALL ".join(band_rows)
    return f"""t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    sh AS (SELECT doc_id, {_SH30} AS sh30 FROM t WHERE len({_SH30}) > 0),
    sigs AS (SELECT doc_id, {", ".join(sig_exprs)} FROM sh),
    bands AS ({bands_union}),
    pairs AS (
      SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
      FROM bands l JOIN bands r
        ON l.band_id = r.band_id AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id)"""


def _minhash_oracle() -> str:
    return f"WITH {_minhash_pair_ctes()} SELECT id_a, id_b FROM pairs"


@register(
    "dedup_minhash_pairs",
    _minhash_oracle(),
    doc="MinHash(16)+LSH(4 bands) candidate pairs — shingle→minhash→band→"
    "bucket-join; only band keys shuffle, never the doc cross product",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.minhash_candidate_pairs(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=_SHINGLE_N
    )


# --- exact n-gram Jaccard over candidate-generating inverted index ---
@register(
    "dedup_ngram_jaccard",
    f"""
    WITH t AS (SELECT doc_id, {_SH30} AS sh FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)),
    sh AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM t),
    inter AS (
      SELECT l.doc_id AS id_a, r.doc_id AS id_b, l.n_sh AS size_a, r.n_sh AS size_b,
             COUNT(*) AS n_common
      FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY 1, 2, 3, 4)
    SELECT id_a, id_b,
           ROUND(CAST(n_common AS DOUBLE) / (size_a + size_b - n_common), 6) AS jaccard
    FROM inter
    WHERE ROUND(CAST(n_common AS DOUBLE) / (size_a + size_b - n_common), 6) >= 0.8
    """,
    doc="exact 3-gram Jaccard ≥ 0.8 via inverted-index self-join",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=_SHINGLE_N, threshold=0.8)


# --- SimHash buckets ---
def _simhash_oracle() -> str:
    votes = []
    for j in range(32):
        div = float(1 << j)
        votes.append(
            f"CASE WHEN CAST(list_sum(list_transform(th, h -> CASE WHEN "
            f"CAST(FLOOR(h / {div}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END)) AS BIGINT) > 0 "
            f"THEN {1 << j} ELSE 0 END"
        )
    simhash = " + ".join(votes)
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    th AS (SELECT doc_id,
                  list_transform(toks, x -> {hash64_sql('x')} % 4294967296) AS th
           FROM t),
    s AS (SELECT doc_id, CAST({simhash} AS BIGINT) AS simhash FROM th)
    SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_id
    FROM s GROUP BY simhash
    """


@register(
    "dedup_simhash_buckets",
    _simhash_oracle(),
    doc="32-bit SimHash bucket dedup: scan-local signature, groupBy signature",
)
def dedup_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dd.simhash_buckets(d, "doc_id", "text")


# --- embedding near-dup pairs, LSH-bucketed (the 100 TB face) ---
_LSH_DIM, _LSH_TABLES, _LSH_BITS, _LSH_SEED = 64, 8, 4, 7
_LSH_THRESHOLD = 0.35  # testdata max sim ≈0.51 — 0.95 would be vacuously empty


def _embedding_lsh_oracle() -> str:
    """Restate the WHOLE LSH algorithm in DuckDB with the same hyperplane
    constants (one Python source of truth: similarity.hyperplane_rows), so
    the driver's hash check verifies the algorithm — signature packing,
    bucket join, rescore — not just row counts. The sign test uses the
    6-dp-rounded dot product on both engines so a 1-ulp difference cannot
    flip a bit."""
    rows = hyperplane_rows(_LSH_DIM, _LSH_TABLES, _LSH_BITS, _LSH_SEED)
    values = ",\n      ".join(
        f"({t}, {b}, [{', '.join(repr(x) for x in plane)}]::DOUBLE[])"
        for t, b, plane in rows
    )
    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    planes(table_id, bit_idx, plane) AS (VALUES
      {values}),
    sig AS (
      SELECT v.vec_id, p.table_id,
             CAST(SUM(CASE WHEN ROUND(list_dot_product(v.e, p.plane), 6) > 0
                           THEN (CAST(1 AS BIGINT) << p.bit_idx) ELSE 0 END)
                  AS BIGINT) AS bucket
      FROM v CROSS JOIN planes p GROUP BY v.vec_id, p.table_id),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sig a JOIN sig b
        ON a.table_id = b.table_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id),
    scored AS (
      SELECT c.id_a, c.id_b,
             ROUND(list_dot_product(va.e, vb.e)
                   / (SQRT(list_dot_product(va.e, va.e))
                      * SQRT(list_dot_product(vb.e, vb.e))), 6) AS sim
      FROM cand c JOIN v va ON va.vec_id = c.id_a JOIN v vb ON vb.vec_id = c.id_b)
    SELECT id_a, id_b, sim FROM scored WHERE sim >= {_LSH_THRESHOLD}
    """


# --- near-dup clustering: candidate pairs → connected components ---
def _cc_oracle() -> str:
    """Transitive closure of the MinHash candidate-pair graph via a
    recursive CTE: reach(node, root) accumulates every id reachable from
    each node; MIN(root) per node is exactly the min-label-propagation
    fixpoint the Spark loop computes."""
    return f"""
    WITH RECURSIVE {_minhash_pair_ctes()},
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach(node, root) AS (
      SELECT doc_id, doc_id FROM sh
      UNION
      SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node)
    SELECT node AS doc_id, MIN(root) AS component_id FROM reach GROUP BY node
    """


@register(
    "dedup_clusters_cc",
    _cc_oracle(),
    doc="near-dup clusters: MinHash+LSH candidate pairs → connected "
    "components (min-label propagation, operators/graph.py). The full "
    "dedup pipeline's final step: every doc labeled with its duplicate "
    "cluster's canonical (minimum) id; singletons label themselves. "
    "Oracle = recursive-CTE transitive closure over the same pairs.",
)
def dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.minhash_candidate_pairs(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, num_bands=_NUM_BANDS, shingle_n=_SHINGLE_N
    )
    nodes = d.select("doc_id").where(
        F.size(shingle_hashes(F.col("text"), n=_SHINGLE_N)) > 0
    )
    return connected_components(
        nodes, pairs, id_col="doc_id", src_col="id_a", dst_col="id_b"
    ).select(F.col("node").alias("doc_id"), F.col("label").alias("component_id"))


@register(
    "dedup_embedding_lsh",
    _embedding_lsh_oracle(),
    doc="embedding near-dup pairs via sign-LSH buckets + exact cosine "
    "rescore: scan-local signatures (planes inlined as constants — no join, "
    "no shuffle), only (table_id, bucket) keys shuffle, corpus never "
    "self-joined all-pairs. Brute force remains the pytest recall baseline "
    "(tests/test_similarity.py).",
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return embedding_lsh_dup_pairs(
        e,
        threshold=_LSH_THRESHOLD,
        n_tables=_LSH_TABLES,
        n_bits=_LSH_BITS,
        seed=_LSH_SEED,
        dim=_LSH_DIM,
    )
