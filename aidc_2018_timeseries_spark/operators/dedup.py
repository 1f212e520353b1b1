"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine (BASELINE.json north star — first-class at 100 TB).

Design for scale:
- exact dedup = one shuffle on a 128-bit content hash; the canonical-id
  (min id) is a window-min within each hash partition — no join-back.
- MinHash+LSH: per-doc signature is scan-local (no shuffle); candidate
  generation shuffles only (band_id, band_hash) keys — never the cross
  product. Verification re-joins only candidate pairs. This is the standard
  shingle→minhash→band→bucket-join pipeline (Broder '97 / Leskovec MMDS).
- SimHash: scan-local 32-bit signature; near-dup = same signature bucket
  (or small hamming radius via multi-probe); groupBy on the signature.
- every pseudo-random constant derives from md5 (functions/hashing.py), so
  all of it is DuckDB-oracle-checkable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.functions.hashing import hash64
from aidc_2018_timeseries_spark.operators.partitioning import spread_for_compute
from aidc_2018_timeseries_spark.operators.text import shingle_hashes, tokenize

#: modulus for the universal hash family (prime > 2^30 shingle space)
MINHASH_PRIME = 2147483647  # 2^31 - 1


def _spread(df: DataFrame, col: str) -> DataFrame:
    """Spread a small CPU-bound input across cores before md5-heavy
    projections — shared gate; policy and scale rationale documented on
    :func:`~aidc_2018_timeseries_spark.operators.partitioning.spread_for_compute`
    (round 9: byte-stat gate, no forced physical planning)."""
    return spread_for_compute(df, col)


def _minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs derived from md5 — reproducible in SQL
    text (the literals are inlined into oracles)."""
    params = []
    for i in range(num_hashes):
        a = int(hashlib.md5(f"a:{i}".encode()).hexdigest()[:15], 16) % (1 << 30) | 1
        b = int(hashlib.md5(f"b:{i}".encode()).hexdigest()[:15], 16) % (1 << 30)
        params.append((a, b))
    return params


def content_hash(text_col: Column | str) -> Column:
    """Normalized-content md5: lowercase + whitespace-collapse before
    hashing, so trivially-reformatted copies collide. Shared by the batch
    exact dedup and the streaming first-seen dedup."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.md5(F.concat_ws(" ", tokenize(c)))


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via content hash: returns (doc_id, canonical_id) for
    EVERY doc; duplicates share a canonical (minimum) id.
    """
    hashed = _spread(df, id_col).select(
        F.col(id_col), content_hash(text_col).alias("content_hash")
    )
    # window-min instead of groupBy + join-back: one shuffle on the content
    # hash assigns every doc its group's canonical id in the same pass.
    w = Window.partitionBy("content_hash")
    return hashed.select(
        id_col, F.min(id_col).over(w).alias("canonical_id")
    )


def minhash_signature(
    text: Column | str, num_hashes: int = 16, shingle_n: int = 3
) -> Column:
    """MinHash signature as array<bigint> of length num_hashes.

    sig[i] = min over shingles s of (a_i * h30(s) + b_i) mod p; empty
    shingle sets (docs shorter than n tokens) get sentinel p.
    """
    sh = shingle_hashes(text, n=shingle_n)

    def universal(a: int, b: int):
        # factory: pyspark inspects lambda arity, so defaults-as-closure fails
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)

    parts = []
    for a, b in _minhash_params(num_hashes):
        mh = F.array_min(F.transform(sh, universal(a, b)))
        parts.append(F.coalesce(mh, F.lit(MINHASH_PRIME)))
    return F.array(*parts)


def minhash_bands(sig: Column, num_bands: int, rows_per_band: int) -> Column:
    """array<struct<band_id, band_hash>>: hash of each r-row slice of the
    signature. Equal band_hash in any band → candidate pair."""
    entries = []
    for band in range(num_bands):
        chunk = F.slice(sig, band * rows_per_band + 1, rows_per_band)
        band_hash = hash64(F.concat_ws(",", F.transform(chunk, lambda x: x.cast("string"))))
        entries.append(F.struct(F.lit(band).alias("band_id"), band_hash.alias("band_hash")))
    return F.array(*entries)


def minhash_signature_agg(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signatures via explode + aggregate-min — the scale path.

    Each shingle is md5-hashed ONCE in the explode projection; the 16
    universal hashes are cheap arithmetic per (doc, shingle) row, and the
    min-aggregation is map-side partial, so only num_hashes values per doc
    per partition ever shuffle. (The array-expression form recomputes the
    shingle hashing per hash function × per band — a ~64× expression
    blow-up that measured 400+s at sf0.1 vs seconds for this form.)

    Docs with no shingles (< n tokens) are dropped — they have no content
    to near-dup on.
    """
    exploded = _spread(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(shingle_hashes(F.col(text_col), n=shingle_n)).alias("h"),
    )
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_PRIME)).alias(f"s{i}")
        for i, (a, b) in enumerate(_minhash_params(num_hashes))
    ]
    return exploded.groupBy("doc").agg(*aggs)


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b), deduplicated across bands.

    Only (band_id, band_hash) shuffles; bucket self-join happens after a
    groupBy that collapses each bucket — the cross product never forms.
    """
    rows_per_band = num_hashes // num_bands
    sigs = minhash_signature_agg(df, id_col, text_col, num_hashes, shingle_n)
    band_structs = []
    for band in range(num_bands):
        cols = [F.col(f"s{band * rows_per_band + j}") for j in range(rows_per_band)]
        band_hash = hash64(F.concat_ws(",", *[c.cast("string") for c in cols]))
        band_structs.append(
            F.struct(F.lit(band).alias("band_id"), band_hash.alias("band_hash"))
        )
    banded = (
        sigs.select("doc", F.explode(F.array(*band_structs)).alias("b"))
        .select("doc", "b.band_id", "b.band_hash")
        # Materialize once: the self-join below would otherwise run the
        # whole shingle-explode + minhash aggregation TWICE (Spark never
        # reuses a subplan across self-join sides — the graph.py
        # oriented-edges / similarity.py signature pattern). The banded
        # relation is narrow and bounded: num_bands rows per doc.
        .localCheckpoint(eager=True)
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard ≥ threshold via PREFIX FILTERING (the
    AllPairs/PPJoin family, Bayardo et al. WWW'07) — lossless.

    The naive inverted-index self-join generates a candidate PAIR for
    every shared shingle: with hot shingles (shared by thousands of docs)
    that is quadratic in posting-list length — measured >1.1M intermediate
    pairs for 256 true results on the sf0.1 corpus. Prefix filtering uses
    the threshold itself to prune: order each doc's shingle set by a
    global canonical order (rarest first), and index only the first
    floor((1-t)·|A|)+1 shingles. Two sets with Jaccard ≥ t MUST share a
    prefix shingle, and rare-first ordering makes prefix posting lists
    short — hot shingles land at the back and are never indexed. A size
    filter (min ≥ t·max) prunes further; survivors are verified exactly,
    JVM-side, with array_intersect on the full (distinct) shingle arrays.

    Plan: document frequency as COUNT OVER (PARTITION BY shingle) — one
    shuffle of the exploded relation, replacing the aggregate+join-back
    form that shuffled it twice — then one window rank on doc, a
    candidate join on short prefix postings, and a verify join keyed by
    doc id. Returns (id_a, id_b, jaccard ≥ t).
    """
    hashed, cand = ngram_jaccard_candidates(
        df, id_col, text_col, shingle_n=shingle_n, threshold=threshold
    )

    a = hashed.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = hashed.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        # Unrounded: intersection/union of exact integers is a single
        # bit-deterministic IEEE division on both engines; rounding can
        # only break parity (ties when the ratio terminates at 7 digits).
        .withColumn(
            "jaccard",
            n_common / (F.size("sh_a") + F.size("sh_b") - n_common),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> tuple[DataFrame, DataFrame]:
    """The prefix-filtered candidate stage of :func:`ngram_jaccard_pairs`,
    exposed separately so the candidate-pair count — the real scale signal
    for this operator (wall time tracks it, SCALING.md) — can be measured
    without re-deriving the plan. Returns ``(hashed, candidates)`` where
    ``hashed`` is (doc, sh: array<shingle-hash>) and ``candidates`` is the
    distinct (id_a, id_b) surviving prefix + size filtering, BEFORE exact
    verification.
    """
    # Repartition BEFORE the md5 shingle computation: a small-file corpus
    # otherwise arrives as one scan task and hashes serially. Materialized
    # once: it feeds the prefix relation AND both sides of the verify
    # join — without the checkpoint the shingle hashing runs ~4× (Spark
    # never reuses a subplan across join sides).
    hashed = (
        _spread(df, id_col)
        .select(
            F.col(id_col).alias("doc"),
            shingle_hashes(F.col(text_col), n=shingle_n).alias("sh"),
        )
        .localCheckpoint(eager=True)
    )
    sh = hashed.select("doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))

    wdf = Window.partitionBy("shingle")
    w = Window.partitionBy("doc").orderBy("df", "shingle")
    # prefix length n - ceil(t·n) + 1, with an epsilon so double rounding
    # of t (0.8 is 0.80000000000000004 in binary) never shortens the
    # prefix at integer boundaries — a too-short prefix silently LOSES
    # true pairs (measured: exactly one pair at sf0.1).
    eps = 1e-9
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(eps)) + 1
    ).cast("int")
    pref = (
        sh.withColumn("df", F.count(F.lit(1)).over(wdf))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= prefix_len)
        .select("doc", "n_sh", "rk", "shingle")
        # Self-joined below — materialize so the two windows compute once.
        # Bounded: floor((1-t)·|A|)+1 rows per doc (~20% of shingles at
        # t=0.8), rarest-first.
        .localCheckpoint(eager=True)
    )

    # positional filter (PPJoin, Xiao et al. WWW'08): a match on a prefix
    # shingle at ranks (i, j) bounds the achievable overlap by
    # 1 + min(|A|−i, |B|−j), which must reach the Jaccard-equivalent
    # overlap requirement α = ceil(t/(1+t)·(|A|+|B|)). Lossless in this
    # EXISTS form: for any true pair the FIRST common shingle in the
    # canonical order sits inside both prefixes (prefix-filter guarantee)
    # and every common shingle ranks at or after it on both sides, so the
    # bound holds there; pairs whose every prefix match fails the bound
    # cannot reach α. (Same 1e-9 guard against the binary representation
    # of t as the prefix/size filters.)
    alpha = F.ceil(
        F.lit(threshold / (1.0 + threshold))
        * (F.col("l.n_sh") + F.col("r.n_sh"))
        - F.lit(1e-9)
    )
    ubound = F.lit(1) + F.least(
        F.col("l.n_sh") - F.col("l.rk"), F.col("r.n_sh") - F.col("r.rk")
    )
    cand = (
        pref.alias("l")
        .join(
            pref.alias("r"),
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col("l.doc") < F.col("r.doc"))
            # size filter: Jaccard >= t forces min(|A|,|B|) >= t*max(|A|,|B|)
            # (same epsilon guard against the double representation of t)
            & (
                F.least("l.n_sh", "r.n_sh")
                >= threshold * F.greatest("l.n_sh", "r.n_sh") - F.lit(1e-9)
            )
            & (ubound >= alpha),
        )
        .select(F.col("l.doc").alias("id_a"), F.col("r.doc").alias("id_b"))
        .distinct()
    )
    return hashed, cand


def simhash32(text: Column | str) -> Column:
    """32-bit SimHash of the token multiset.

    Per token: 32-bit hash; bit j votes +1/−1; signature bit j = majority.
    Bit extraction uses floor(h / 2^j) % 2 — exact in double for h < 2^32,
    and identical in DuckDB (no engine-specific bit ops).
    """
    toks = tokenize(text)
    th = F.transform(toks, lambda t: hash64(t) % F.lit(1 << 32))

    def voter(j: int):
        return lambda acc, h: acc + F.when(
            (F.floor(h / F.lit(float(1 << j))) % 2) == 1, 1
        ).otherwise(-1)

    bits = []
    for j in range(32):
        vote = F.aggregate(th, F.lit(0), voter(j))
        bits.append(F.when(vote > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def simhash_buckets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Group docs by identical SimHash — the scan-local near-dup bucket.

    (Hamming-radius probing is a union of bit-flipped bucket keys; exact-
    match buckets are the oracle-checkable core.)
    """
    return (
        _spread(df, id_col)
        .select(F.col(id_col), simhash32(F.col(text_col)).alias("simhash"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("canonical_id"))
    )


def incremental_ingest_verdicts(
    corpus: DataFrame, arrivals: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Incremental-ingest dedup: classify each ARRIVING doc against the
    standing corpus — the daily-crawl admission step of a living corpus
    (only novel content is appended; re-crawls and within-batch copies are
    refused at the door, so the expensive full-corpus dedup never has to
    re-run).

    Verdict per arrival:
    - ``dup_corpus``  — normalized content hash already in the corpus;
    - ``dup_batch``   — novel vs the corpus but another arrival in the
      same batch with the same hash has a smaller id (that one wins);
    - ``ingested``    — novel; this row would be appended.

    Scale shape: both sides reduce to fixed-width digests before any
    join — the corpus contributes DISTINCT hashes only (one partial-agg
    shuffle over digests, never bodies), arrivals carry (id, hash). The
    batch-internal canonical is a window over the arrival batch keyed by
    hash. At 100 TB the corpus digest set is the thing you MATERIALIZE
    once (it is exactly ``exact_duplicates``' group keys) and incrementally
    maintain; with it stored, admission cost is one join of the day's
    batch against a digest table — independent of corpus body bytes. A
    bloom/semi-join pushdown on the digest column cuts the corpus-side
    scan further when the batch is small.
    """
    corpus_hashes = (
        _spread(corpus, id_col)
        .select(content_hash(text_col).alias("content_hash"))
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    arr = _spread(arrivals, id_col).select(
        F.col(id_col), content_hash(text_col).alias("content_hash")
    )
    w = Window.partitionBy("content_hash")
    arr = arr.withColumn("batch_min_id", F.min(id_col).over(w))
    joined = arr.join(corpus_hashes, "content_hash", "left")
    return joined.select(
        id_col,
        F.when(F.col("in_corpus"), F.lit("dup_corpus"))
        .when(F.col(id_col) != F.col("batch_min_id"), F.lit("dup_batch"))
        .otherwise(F.lit("ingested"))
        .alias("verdict"),
    )


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Exact duplicated token-SPAN detection: the substring-level dedup of
    Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
    Better"), whose suffix-array pass is re-expressed as its scalable
    surrogate — a corpus-wide duplicated-k-gram join + per-document
    gaps-and-islands merge. Doc-level dedup (``exact_duplicates``/MinHash)
    misses text duplicated INSIDE otherwise-distinct documents (licenses,
    boilerplate headers, quoted passages); this operator finds those spans
    so a curation pipeline can cut them instead of dropping whole docs.

    Algorithm (reference data model: per-sample window extraction,
    ``datasets/timeseries.py`` rolling windows — same explode shape):
    1. tokenize; emit every k-token gram with its 1-based start position
       (scan-local explode, ~L rows per doc — exactly the W1 rolling-window
       row shape);
    2. a gram is DUPLICATED iff its md5-derived ``hash64`` occurs >= 2
       times corpus-wide, counted as a window-count over the gram-hash
       partition (ONE shuffle keyed by the 8-byte hash, never gram text —
       and no second join-back pass);
    3. per doc, chain duplicated starts whose gap <= k into maximal spans
       (lag + running-sum islands over a per-doc window);
    4. one row per span: (id, span_start, span_end, span_tokens, n_grams),
       token indices 1-based inclusive.

    Scale: the only corpus-wide shuffle is keyed by gram hash — uniform by
    construction (md5), so no skew; state per key is the occurrence list of
    one gram. The per-doc island window repartitions by doc id. Both are
    the same shapes the MinHash band join already proved at 100 TB. Memory
    per task is bounded by (rows per gram-hash partition), not corpus size.
    """
    toks = tokenize(F.col(text_col))
    starts = F.when(
        F.size("toks") >= k, F.sequence(F.lit(1), F.size("toks") - k + 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = (
        df.select(F.col(id_col), toks.alias("toks"))
        .select(F.col(id_col), F.explode(starts).alias("pos"), F.col("toks"))
        .select(
            F.col(id_col),
            F.col("pos").cast("long").alias("pos"),
            hash64(F.array_join(F.slice("toks", F.col("pos"), k), " ")).alias("gh"),
        )
    )
    dup = grams.withColumn(
        "cnt", F.count(F.lit(1)).over(Window.partitionBy("gh"))
    ).filter(F.col("cnt") >= 2)
    wdoc = Window.partitionBy(id_col).orderBy("pos")
    islands = dup.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(wdoc) > k, F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).withColumn("island", F.sum("brk").over(wdoc))
    return islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + k - 1).alias("span_end"),
        (F.max("pos") - F.min("pos") + k).alias("span_tokens"),
        F.count(F.lit(1)).alias("n_grams"),
    ).drop("island")


def blocked_edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_cols: list[str] | None = None,
    prefix_tokens: int = 4,
    max_dist: int = 3,
    block_size_cap: int | None = None,
) -> DataFrame:
    """Entity-resolution-style near-duplicate pairing by EDIT DISTANCE
    under blocking: build a short "title" key (the first ``prefix_tokens``
    whitespace tokens), self-join only WITHIN a blocking key, and keep
    pairs whose title Levenshtein distance is ≤ ``max_dist``. This is the
    record-linkage family the shingle/MinHash ops don't cover: character
    -level typo/OCR variants of short keys (titles, names, URLs), where
    Jaccard over word shingles is blind (one edited character changes at
    most one token) but edit distance is the right metric.

    Blocking key = (``block_cols``…, first token, title-length bucket of 4
    chars). Both join sides carry the SAME key, so only same-block rows
    ever pair — the classic blocking trade-off: a pair whose FIRST token
    differs (or whose lengths differ by a bucket) is missed by this pass;
    production linkage runs 2-3 passes with rotated keys and unions the
    pairs, each pass this exact shape.

    Scale: one shuffle keyed by the blocking key; pair generation is
    quadratic ONLY within a block, so the key must keep blocks bounded.
    ``block_size_cap`` is the skew guard: blocks with more rows are
    EXCLUDED from pairing (their candidate count is quadratic in the
    block size — the round-5 10× audit measured a fully-duplicated
    corpus growing candidates 105× for 10× rows; a production run
    diverts those blocks to a stronger key or the MinHash pass, the same
    skew relief the salted-join face demonstrates). The size relation is
    block-count-bound (vocabulary-sized), joined back on the block key.
    Levenshtein runs JVM-side (Catalyst ``levenshtein``), no Python in
    the plan.
    """
    toks = tokenize(F.col(text_col))
    title = F.array_join(F.slice(toks, 1, prefix_tokens), " ")
    keyed = df.select(
        F.col(id_col),
        *[F.col(c) for c in (block_cols or [])],
        title.alias("title"),
        # try_element_at: a token-less doc has no leading token to block
        # on — it gets a NULL key and simply never pairs (plain element_at
        # throws INVALID_ARRAY_INDEX under ANSI; edge-corpus battery)
        F.try_element_at(toks, F.lit(1)).alias("_tok1"),
        F.floor(F.length(title) / 4).alias("_lbucket"),
    )
    block_key = [*(block_cols or []), "_tok1", "_lbucket"]
    if block_size_cap is not None:
        # Materialized: the capped relation feeds both self-join legs
        # below, which would otherwise re-run the size aggregate and its
        # join twice. The uncapped path stays lazy — there a leg recompute
        # is a narrow parquet re-scan, cheaper than materializing.
        sizes = keyed.groupBy(block_key).count()
        keyed = (
            keyed.join(sizes, block_key)
            .filter(F.col("count") <= block_size_cap)
            .drop("count")
            .localCheckpoint(eager=True)
        )
    a = keyed.select(
        *block_key,
        F.col(id_col).alias("id_a"),
        F.col("title").alias("title_a"),
    )
    b = keyed.select(
        *block_key,
        F.col(id_col).alias("id_b"),
        F.col("title").alias("title_b"),
    )
    pairs = (
        a.join(b, block_key)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("title_dist", F.levenshtein("title_a", "title_b"))
        .filter(F.col("title_dist") <= max_dist)
    )
    return pairs.select("id_a", "id_b", *(block_cols or []), "title_dist")


def exact_collapse(
    df: DataFrame,
    id_col: str,
    text_col: str,
    key_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Exact-duplicate PRE-COLLAPSE for the quadratic pairwise operators:
    group docs by normalized content hash (plus ``key_cols``, when the
    downstream operator blocks on extra columns), pick each group's
    minimum id as representative, and return ``(mapping, representatives)``
    — mapping is (id_col, canonical_id) for EVERY doc, representatives is
    the subset of ``df`` rows whose id is their group's canonical id.

    Why: the round-5 10× audits showed the worst case for containment /
    edit-distance linkage is a corpus of identical copies — the TRUE pair
    relation is quadratic in copy count, so any direct computation is
    output-bound. But every pairwise verdict between docs is a function
    of their (normalized content, key_cols) alone, so computing on one
    representative per identical group and expanding verdicts back over
    members is exact and reduces the quadratic to the UNIQUE-content
    corpus. One content-hash-keyed window shuffle + one id semi-join.
    """
    keys = ["_chash", *(key_cols or [])]
    # project to (id, keys, digest) BEFORE the window: the content-hash
    # shuffle must carry 16-byte digests, never document bodies
    hashed = _spread(df, id_col).select(
        F.col(id_col),
        *[F.col(c) for c in (key_cols or [])],
        content_hash(text_col).alias("_chash"),
    )
    w = Window.partitionBy(*keys)
    # Materialized once: the mapping feeds the reps semi-join here plus
    # the caller's two expansion joins — three consumers of the
    # content-hash window. Narrow and doc-count-bounded (id, canonical).
    mapping = hashed.select(
        F.col(id_col), F.min(id_col).over(w).alias("canonical_id")
    ).localCheckpoint(eager=True)
    reps = df.join(
        mapping.filter(F.col(id_col) == F.col("canonical_id")).select(id_col),
        id_col,
        "semi",
    )
    return mapping, reps


#: default redundancy fraction above which the collapsed operators engage
#: the exact-dup pre-collapse. The collapse pays a roughly FIXED overhead
#: (content-hash window + semi-join + expansion joins, ~0.8s per face at
#: sf0.1) and wins QUADRATICALLY in copy-group size — so a corpus that is
#: barely duplicated (sf0.1 documents: 16 of 5000 rows in dup groups,
#: 0.3%) loses by collapsing, while the round-5 worst case (every doc
#: copied 10×, 90% redundancy) wins 3.3×. 2% is comfortably between the
#: two regimes; both paths are exact, so the gate is a pure compute knob.
COLLAPSE_REDUNDANCY_THRESHOLD = 0.02

#: mean copies-per-content above which the MinHash-family collapse wins.
#: The redundancy threshold is the WRONG statistic for this family: a
#: corpus of all-doubled docs is 50% redundant yet the direct form still
#: wins, because the collapse's mapping/expansion joins cost more than
#: the few bucket rows a 2-group saves. Mean group size n/d falls out of
#: the SAME gate aggregate for free (round-7 verdict item 6). The two
#: operators cross over at DIFFERENT sizes (round-8 solo-JVM sweep,
#: SCALING.md: pairs — direct wins at K=3, collapsed at K=10/30/60, so
#: the wall is ~5-10; CC — direct wins at K=3/10, collapsed at K=30,
#: wall ~10-30): the pairs collapse saves the signature/banding stage
#: outright, while CC's star-vs-clique advantage only beats the mapping
#: overhead once cliques are large.
MINHASH_PAIRS_COLLAPSE_MEAN_COPIES = 8.0
MINHASH_CC_COLLAPSE_MEAN_COPIES = 20.0
#: kept as the CC alias for round-7 compatibility in external callers
MINHASH_COLLAPSE_MEAN_COPIES = MINHASH_CC_COLLAPSE_MEAN_COPIES


def exact_dup_stats(
    df: DataFrame, text_col: str, key_cols: list[str] | None = None
) -> tuple[int, int]:
    """The skip-gate aggregate, shared by every gate statistic:
    (row count n, distinct (content hash, key_cols) count d). ONE scan +
    a map-side-combined count/distinct-count; the ``.first()`` is bounded
    scalar bookkeeping (one row), the same class as knn_ivf's corpus
    count. Callers composing SEVERAL collapsed operators over one corpus
    should run this once and pass each operator an explicit
    ``collapse=`` verdict instead of paying the aggregate per operator
    (ADVICE r7 item 2).

    Keys are packed into a struct so NULL-able ``key_cols`` (e.g. lang)
    count as distinct values rather than being dropped by countDistinct's
    multi-column NULL rule — matching exact_collapse's window, which
    groups NULLs together.
    """
    keys = [content_hash(text_col).alias("_chash")] + [
        F.col(c) for c in (key_cols or [])
    ]
    row = (
        df.select(F.struct(*keys).alias("_k"))
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("_k").alias("d"))
        .first()
    )
    return int(row["n"]), int(row["d"])


def exact_dup_redundancy(
    df: DataFrame, text_col: str, key_cols: list[str] | None = None
) -> float:
    """Skip-gate statistic for the exact-dup pre-collapse (round-6 verdict
    item 2): the fraction of rows that are redundant exact copies,
    (n − d) / n over :func:`exact_dup_stats` — 0.0 on a clean corpus,
    → 1.0 as copy groups dominate. The right statistic for operators
    whose collapse overhead is near-fixed (containment, linkage); the
    MinHash family gates on :func:`exact_dup_mean_copies` instead.
    """
    n, d = exact_dup_stats(df, text_col, key_cols)
    return 0.0 if n == 0 else (n - d) / n


def exact_dup_mean_copies(
    df: DataFrame, text_col: str, key_cols: list[str] | None = None
) -> float:
    """Mean exact-copy group size n/d (1.0 on a clean corpus) — the
    MinHash-family gate statistic (see MINHASH_COLLAPSE_MEAN_COPIES)."""
    n, d = exact_dup_stats(df, text_col, key_cols)
    return 1.0 if d == 0 else n / d


def corpus_has_exact_dups(
    df: DataFrame, text_col: str, key_cols: list[str] | None = None
) -> bool:
    """True iff ≥ 2 docs share (normalized content hash, ``key_cols``)."""
    return exact_dup_redundancy(df, text_col, key_cols) > 0.0


def ngram_containment_pairs_collapsed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.9,
    max_df: int | None = None,
    collapse_threshold: float = COLLAPSE_REDUNDANCY_THRESHOLD,
    collapse: bool | None = None,
) -> DataFrame:
    """:func:`ngram_containment_pairs` with :func:`exact_collapse` in
    front — identical output, but the posting join and exact verification
    run over one representative per identical-content group.

    Expansion is exact because containment is a pure function of the two
    shingle SETS, and identical normalized content ⟹ identical token
    sequence ⟹ identical (distinct) shingle set:
    - cross-group: C(a→b) = C(rep(a)→rep(b)) for every member pair —
      two membership joins against the rep-level result;
    - within-group: every ordered pair of distinct members has
      containment exactly 1.0 (n/n — exact in IEEE), PROVIDED the group's
      content has ≥ 1 shingle; shingle-less docs (< n tokens) produce no
      output in the direct operator and are guarded out here too.

    On the round-5 worst case (every doc duplicated 10×) this turns an
    output-bound 1000× pair explosion into rep-level work that matches
    the 1× corpus plus a membership-join expansion that is linear in the
    true output size — which is the best possible, since the output must
    be written either way.

    ``max_df`` caveat: under collapse, shingle document frequencies are
    counted over REPRESENTATIVES (one per unique content), not raw docs —
    for the equality-to-direct guarantee pass ``max_df=None`` (the
    default, and what the catalog face uses). With a cap set, the
    rep-counted df is arguably the BETTER boilerplate signal (copy count
    no longer inflates a shingle's df), but it is a different valve than
    the direct operator's raw-df cap, so the two forms may keep/drop
    different boilerplate-only pairs. The divergence also reaches INTRA
    pairs (ADVICE r6): collapse always emits identical-copy pairs at
    containment 1.0, whereas the direct operator with ``max_df`` drops
    even those when EVERY shingle of the doc exceeds the cap (a doc made
    entirely of boilerplate has no posting rows left to join on).

    Skip-gate: when :func:`exact_dup_redundancy` says the corpus is
    (nearly) exact-clean — redundant-copy fraction ≤ ``collapse_threshold``
    — the mapping/expansion joins would collapse (almost) nothing — run
    the direct operator outright (round-6 verdict: the collapse pre-pass
    cost ~0.8s at sf0.1 to collapse 8 pairs). Both paths are exact; the
    gate is purely a compute knob. The tri-state ``collapse`` overrides
    it: True/False skips the gate aggregate entirely (the DataFrame
    construction becomes lazy again — ADVICE r7 item 2), so callers
    composing several collapsed operators over one corpus can pay
    :func:`exact_dup_stats` once and route all of them.
    """
    if collapse is None:
        collapse = exact_dup_redundancy(df, text_col) > collapse_threshold
    if not collapse:
        return ngram_containment_pairs(
            df, id_col, text_col, shingle_n, threshold, max_df
        )
    mapping, reps = exact_collapse(df, id_col, text_col)
    rep_pairs = ngram_containment_pairs(
        reps, id_col, text_col, shingle_n, threshold, max_df
    )
    ma = mapping.select(
        F.col("canonical_id").alias("id_a"), F.col(id_col).alias("_ma")
    )
    mb = mapping.select(
        F.col("canonical_id").alias("id_b"), F.col(id_col).alias("_mb")
    )
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.col("_ma").alias("id_a"),
            F.col("_mb").alias("id_b"),
            "containment",
        )
    )
    shingled = reps.select(
        F.col(id_col).alias("_canon"),
        (F.size(shingle_hashes(F.col(text_col), n=shingle_n)) > 0).alias(
            "_has_sh"
        ),
    )
    mx = mapping.select(
        F.col("canonical_id").alias("_canon"), F.col(id_col).alias("_ma")
    )
    my = mapping.select(
        F.col("canonical_id").alias("_canon"), F.col(id_col).alias("_mb")
    )
    intra = (
        mx.join(my, "_canon")
        .filter(F.col("_ma") != F.col("_mb"))
        .join(shingled.filter(F.col("_has_sh")), "_canon", "semi")
        .select(
            F.col("_ma").alias("id_a"),
            F.col("_mb").alias("id_b"),
            F.lit(1.0).alias("containment"),
        )
    )
    return cross.unionByName(intra)


def minhash_candidate_pairs_collapsed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_n: int = 3,
    mean_copies_threshold: float = MINHASH_PAIRS_COLLAPSE_MEAN_COPIES,
    collapse: bool | None = None,
) -> DataFrame:
    """:func:`minhash_candidate_pairs` with :func:`exact_collapse` in
    front — identical (id_a < id_b) pair relation, but signatures, band
    explode, and the bucket join run over one representative per
    identical-content group.

    Expansion is exact because the MinHash signature is a pure function
    of the (distinct) shingle set, which identical normalized content
    shares:
    - cross-group: members inherit their reps' band-collision verdict
      (member sig == rep sig), so two membership joins expand the
      rep-level pairs; least/greatest restores the id_a < id_b normal
      form (member ids need not order like their reps);
    - within-group: identical signatures collide in EVERY band, so each
      unordered pair of distinct members of a shingled group is always a
      candidate; shingle-less groups (< n tokens ⇒ no signature) produce
      no pairs in the direct operator and are guarded out here too.

    Why it matters at 100 TB: a duplicate-heavy crawl is the NORM, and
    in the direct form each k-copy group contributes k·num_bands band
    rows and C(k,2)·num_bands bucket-join matches before the distinct
    (the round-5 bench's own worst case). Collapsed, the shingle explode
    + signature aggregation — the dominant cost — touch unique content
    only, and the copy-quadratic appears solely in the expanded OUTPUT,
    which must be written either way.

    Skip-gate (round-7 verdict item 6 — per-FAMILY statistic): the
    MinHash family gates on mean copy-group size n/d, not redundancy —
    the round-8 solo-JVM sweep put the PAIRS crossover at ~5-10
    copies/content (direct wins at K=3, collapsed from K=10 on), hence
    the default threshold 8. Tri-state ``collapse`` (True/False)
    skips the gate aggregate and restores lazy construction (ADVICE r7
    item 2) — pair it with one shared :func:`exact_dup_stats` call when
    composing several collapsed operators.
    """
    if collapse is None:
        collapse = exact_dup_mean_copies(df, text_col) > mean_copies_threshold
    if not collapse:
        return minhash_candidate_pairs(
            df, id_col, text_col, num_hashes, num_bands, shingle_n
        )
    mapping, reps = exact_collapse(df, id_col, text_col)
    rep_pairs = minhash_candidate_pairs(
        reps, id_col, text_col, num_hashes, num_bands, shingle_n
    )
    ma = mapping.select(
        F.col("canonical_id").alias("id_a"), F.col(id_col).alias("_ma")
    )
    mb = mapping.select(
        F.col("canonical_id").alias("id_b"), F.col(id_col).alias("_mb")
    )
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("_ma", "_mb").alias("id_a"),
            F.greatest("_ma", "_mb").alias("id_b"),
        )
    )
    shingled = reps.select(
        F.col(id_col).alias("_canon"),
        (F.size(shingle_hashes(F.col(text_col), n=shingle_n)) > 0).alias(
            "_has_sh"
        ),
    )
    mx = mapping.select(
        F.col("canonical_id").alias("_canon"), F.col(id_col).alias("_ma")
    )
    my = mapping.select(
        F.col("canonical_id").alias("_canon"), F.col(id_col).alias("_mb")
    )
    intra = (
        mx.join(my, "_canon")
        .filter(F.col("_ma") < F.col("_mb"))
        .join(shingled.filter(F.col("_has_sh")), "_canon", "semi")
        .select(F.col("_ma").alias("id_a"), F.col("_mb").alias("id_b"))
    )
    return cross.unionByName(intra)


def minhash_components_collapsed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    num_bands: int = 4,
    shingle_n: int = 3,
    mean_copies_threshold: float = MINHASH_CC_COLLAPSE_MEAN_COPIES,
    collapse: bool | None = None,
) -> DataFrame:
    """Connected components over the MinHash candidate graph, with
    :func:`exact_collapse` in front — (node, label) over the SHINGLED
    docs, byte-identical to ``connected_components(shingled nodes,
    minhash_candidate_pairs(df))`` (pytest-pinned).

    Instead of expanding the copy-quadratic intra-group pair cliques and
    feeding them to CC, each identical-content group enters the graph as
    a linear STAR — member → canonical edges (the
    ``dedup_linkage_clusters`` pattern) — which preserves connectivity
    exactly: within a group the star connects what the clique connected;
    across groups an (a, b) band collision exists iff the (rep(a),
    rep(b)) collision does, and the rep edge plus two star paths restores
    it. Labels agree because min-label CC labels a component by its
    minimum node id, and the node SET per component is unchanged (the
    rep is its group's min id by construction, so star edges never
    introduce a smaller id than the clique would).

    Star edges attach only to groups whose content has ≥ 1 shingle: an
    unshingled doc has no signature and stays a CC singleton in the
    direct form, so its identical copies must stay singletons here too
    (they are not CC nodes at all — the face layer handles unshingled
    docs as self-components).

    This is the scale path for cluster-then-select pipelines
    (keep-best-quality canonicalization): the CC iteration — the
    heaviest stage — runs on the unique-content graph, and copies rejoin
    via |members| star edges rather than Σ C(k,2) clique edges.

    Skip-gate (round-7 verdict item 6): gates on mean copy-group size
    n/d > ``mean_copies_threshold`` like its pairs sibling, but at the
    CC family's own measured wall (~10-30 copies/content — direct wins
    at K=3/10, collapsed at K=30; the star relation only beats clique
    expansion once cliques are large), hence the deeper default 20.
    Tri-state ``collapse`` (True/False) skips the gate aggregate and
    restores lazy construction (ADVICE r7 item 2).
    """
    from aidc_2018_timeseries_spark.operators.graph import connected_components

    if collapse is None:
        collapse = exact_dup_mean_copies(df, text_col) > mean_copies_threshold
    if not collapse:
        pairs = minhash_candidate_pairs(
            df, id_col, text_col, num_hashes, num_bands, shingle_n
        )
        nodes = df.filter(
            F.size(shingle_hashes(F.col(text_col), n=shingle_n)) > 0
        ).select(id_col)
        return connected_components(
            nodes, pairs, id_col=id_col, src_col="id_a", dst_col="id_b"
        )
    mapping, reps = exact_collapse(df, id_col, text_col)
    rep_pairs = minhash_candidate_pairs(
        reps, id_col, text_col, num_hashes, num_bands, shingle_n
    )
    shingled_canon = reps.filter(
        F.size(shingle_hashes(F.col(text_col), n=shingle_n)) > 0
    ).select(F.col(id_col).alias("canonical_id"))
    star = (
        mapping.filter(F.col(id_col) != F.col("canonical_id"))
        .join(shingled_canon, "canonical_id", "semi")
        .select(
            F.col(id_col).alias("id_a"), F.col("canonical_id").alias("id_b")
        )
    )
    nodes = mapping.join(shingled_canon, "canonical_id", "semi").select(id_col)
    return connected_components(
        nodes,
        rep_pairs.unionByName(star),
        id_col=id_col,
        src_col="id_a",
        dst_col="id_b",
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.9,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram CONTAINMENT ≥ threshold — the ASYMMETRIC sibling of
    :func:`ngram_jaccard_pairs`: C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)|.
    Jaccard misses the quote/subset/wrapper cases entirely (a doc fully
    embedded in one 10× longer has Jaccard ≤ 0.1 but containment 1.0);
    containment is how curation pipelines catch wire-copy embedding,
    quotation farms, and template-wrapped bodies. Output is DIRECTIONAL:
    (id_a, id_b, containment) means a's shingles are ≥ t covered by b's.

    Prefix filtering adapts to the asymmetry: only the A side can be
    prefix-pruned (C(A→B) ≥ t forces B to share one of A's first
    |A| − ⌈t·|A|⌉ + 1 rare-first shingles), while the B side must index
    its FULL shingle set — B may be arbitrarily larger, that is the
    point. The size filter is one-sided too: |B| ≥ t·|A|. Because the B
    side is full postings, hot (boilerplate) shingles make the candidate
    join quadratic in their document frequency; ``max_df`` caps the B
    postings to discriminative shingles (lossy ONLY for pairs whose
    entire overlap is boilerplate shingles — exactly the pairs a
    curation pass does not want), the same relief valve as the
    edit-distance blocker's ``block_size_cap``. Survivors verify exactly
    JVM-side on the full distinct-shingle arrays; the ratio stays
    UNROUNDED (exact-integer division is bit-deterministic on both
    engines, rounding can only break parity).
    """
    # Materialized once: feeds the ranked posting relation AND both sides
    # of the verify join (the jaccard-sibling pattern — without it the
    # shingle hashing runs ~4× across self-join legs). FOOTPRINT
    # (ADVICE r7 item 4): localCheckpoint stores the full distinct-
    # shingle relation (~n_sh int64s per doc, i.e. about the tokenized
    # corpus size) in executor block storage — deliberate: every byte of
    # it is consumed ≥ 3× downstream (postings build + two verify legs),
    # and MEMORY_AND_DISK spills rather than OOMs, so at corpus scale
    # the trade is storage-for-recompute at worst 1:3. eager=False keeps
    # construction lazy; the first action materializes it once.
    hashed = (
        _spread(df, id_col)
        .select(
            F.col(id_col).alias("doc"),
            shingle_hashes(F.col(text_col), n=shingle_n).alias("sh"),
        )
        .localCheckpoint(eager=False)
    )
    sh = hashed.select(
        "doc", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    eps = 1e-9
    wdf = Window.partitionBy("shingle")
    w = Window.partitionBy("doc").orderBy("df", "shingle")
    prefix_len = (
        F.col("n_sh") - F.ceil(F.lit(threshold) * F.col("n_sh") - F.lit(eps)) + 1
    ).cast("int")
    # Both the prefix side and the full-postings side derive from this
    # ranked relation — materialize so its two window shuffles compute
    # once instead of twice (storage is bounded by the exploded shingle
    # relation, which the windows already shuffle in full either way;
    # same spill-not-OOM footprint note as `hashed` above). eager=False:
    # lazy construction, materialized by the first downstream action.
    with_rk = (
        sh.withColumn("df", F.count(F.lit(1)).over(wdf))
        .withColumn("rk", F.row_number().over(w))
        .localCheckpoint(eager=False)
    )
    pref = with_rk.filter(F.col("rk") <= prefix_len).select(
        F.col("doc").alias("id_a"),
        F.col("n_sh").alias("n_a"),
        F.col("rk").alias("rk_a"),
        "shingle",
    )
    full = with_rk
    if max_df is not None:
        full = full.filter(F.col("df") <= max_df)
    full = full.select(
        F.col("doc").alias("id_b"),
        F.col("n_sh").alias("n_b"),
        F.col("rk").alias("rk_b"),
        "shingle",
    )
    # positional filter, containment-adapted (PPJoin, Xiao et al. WWW'08):
    # a match at per-doc ranks (i, j) in the SHARED (df, shingle) canonical
    # order bounds the overlap by 1 + min(|A|−i, |B|−j), which must reach
    # α = ceil(t·|A|). Lossless in EXISTS form: for a true pair the first
    # common shingle sits inside A's prefix (else A's whole prefix is
    # non-common and overlap ≤ ceil(t|A|)−1 < α) and B indexes its full
    # set, so that match row exists and satisfies the bound. Hot
    # boilerplate shingles rank LATE on both sides — exactly the matches
    # this prunes, complementing (not replacing) the lossy max_df valve.
    # (rk is computed BEFORE the max_df filter, so the bound is unchanged
    # by the valve.)
    alpha = F.ceil(F.lit(threshold) * F.col("n_a") - F.lit(eps))
    ubound = F.lit(1) + F.least(
        F.col("n_a") - F.col("rk_a"), F.col("n_b") - F.col("rk_b")
    )
    cand = (
        pref.join(
            full,
            (pref["shingle"] == full["shingle"])
            & (pref["id_a"] != full["id_b"])
            & (F.col("n_b") >= F.lit(threshold) * F.col("n_a") - F.lit(eps))
            & (ubound >= alpha),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    a = hashed.select(F.col("doc").alias("id_a"), F.col("sh").alias("sh_a"))
    b = hashed.select(F.col("doc").alias("id_b"), F.col("sh").alias("sh_b"))
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("containment", n_common / F.size("sh_a"))
        .filter(F.col("containment") >= F.lit(threshold) - F.lit(eps))
        .select("id_a", "id_b", "containment")
    )
