"""Catalog queries: text analysis over the ``documents`` table.

Oracle-parity conventions: tokenization, stopword lists and hash constants
are shared between the Spark operators (operators/text.py) and the DuckDB
SQL generated here (single source of truth for the constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.functions.hashing import FINGERPRINT_PRIME, hash64_sql
from aidc_2018_timeseries_spark.operators import text as tx
from aidc_2018_timeseries_spark.plans.catalog import register
from aidc_2018_timeseries_spark.sources.tables import load_table

# DuckDB token list for `text` column — must mirror operators/text.tokenize
_TOKS = tx.tokenize_sql("text")


def _in_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# --- token statistics ---
@register(
    "text_token_stats",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks, length(text) AS n_chars FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                 / len(toks), 6) AS mean_token_len,
           ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS ttr
    FROM t
    """,
    doc="token counting: counts, mean token length, type-token ratio",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.token_count("text").cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        F.round(tx.mean_token_length("text"), 6).alias("mean_token_len"),
        F.round(tx.type_token_ratio("text"), 6).alias("ttr"),
    )


# --- quality scoring ---
@register(
    "text_quality_score",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id,
             CAST(len(toks) AS DOUBLE) AS n,
             CAST(len(list_filter(toks, x -> x IN ({_in_list(tx.LANG_STOPWORDS["en"])})))
                  AS DOUBLE) AS n_stop,
             CAST(len(list_distinct(toks)) AS DOUBLE) AS n_distinct
      FROM t)
    SELECT doc_id,
           ROUND(0.4 * LEAST(n_stop / n * 5.0, 1.0)
                 + 0.3 * (n_distinct / n)
                 + 0.3 * (LEAST(n, 200.0) / 200.0), 6) AS quality
    FROM s
    """,
    doc="heuristic quality score: stopword ratio + TTR + length (Gopher/C4-style)",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", F.round(tx.quality_score("text"), 6).alias("quality"))


# --- language identification ---
def _langid_oracle() -> str:
    score = {
        lang: f"CAST(len(list_filter(toks, x -> x IN ({_in_list(words)}))) AS BIGINT)"
        for lang, words in tx.LANG_STOPWORDS.items()
    }
    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    s AS (SELECT doc_id,
                 {score['en']} AS s_en, {score['de']} AS s_de, {score['es']} AS s_es,
                 {score['fr']} AS s_fr, {score['zh']} AS s_zh
          FROM t)
    SELECT doc_id,
           CASE WHEN s_en > 0 AND s_en >= GREATEST(s_de, s_es, s_fr, s_zh) THEN 'en'
                WHEN s_de > 0 AND s_de >= GREATEST(s_es, s_fr, s_zh) THEN 'de'
                WHEN s_es > 0 AND s_es >= GREATEST(s_fr, s_zh) THEN 'es'
                WHEN s_fr > 0 AND s_fr >= s_zh THEN 'fr'
                WHEN s_zh > 0 THEN 'zh'
                ELSE 'unknown' END AS lang_pred
    FROM s
    """


@register(
    "text_lang_id",
    _langid_oracle(),
    doc="stopword-list language ID with deterministic tie-break order",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.lang_id("text").alias("lang_pred"))


# --- document fingerprint (rolling hash) ---
@register(
    "text_fingerprint",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(toks, x -> {hash64_sql('x')} % {FINGERPRINT_PRIME})),
             (acc, h) -> (acc * 31 + h) % {FINGERPRINT_PRIME}) AS fingerprint
    FROM t
    """,
    doc="order-sensitive rolling-hash document fingerprint (md5-derived, "
    "bit-identical across engines)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.doc_fingerprint("text").alias("fingerprint"))


# --- corpus vocabulary stats (tokenizer/vocab-building step) ---
@register(
    "text_vocab_top_terms",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    terms AS (SELECT doc_id, unnest(toks) AS term FROM t),
    stats AS (SELECT term, COUNT(*) AS tf_total,
                     COUNT(DISTINCT doc_id) AS df_docs
              FROM terms GROUP BY term)
    SELECT term, tf_total, df_docs FROM stats
    ORDER BY tf_total DESC, term LIMIT 50
    """,
    doc="corpus vocabulary: top-50 terms by total frequency with document "
    "frequency — the vocab-construction scan of a tokenizer pipeline; "
    "per-term partial aggregation then TakeOrderedAndProject (per-"
    "partition top-k merge, no global sort), (count desc, term asc) "
    "tie-break keeps the cut deterministic",
)
def text_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    terms = d.select("doc_id", F.explode(tx.tokenize(F.col("text"))).alias("term"))
    return (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf_total"),
            F.countDistinct("doc_id").alias("df_docs"),
        )
        .orderBy(F.desc("tf_total"), "term")
        .limit(50)
    )


# --- TF-IDF top terms ---
@register(
    "text_tfidf_top_terms",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    terms AS (SELECT doc_id, unnest(toks) AS term FROM t),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term,
             ROUND(tf * (LN((1.0 + n_docs) / (1.0 + df)) + 1.0), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      FROM scored)
    SELECT doc_id, term, tfidf, CAST(rk AS INTEGER) AS rk FROM ranked WHERE rk <= 3
    """,
    doc="top-3 terms per doc by smoothed TF-IDF (idf = ln((1+N)/(1+df))+1), "
    "rounded before ranking with (score desc, term asc) tie-break so the "
    "rank order is cross-engine deterministic",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return tx.tfidf_top_terms(d, "doc_id", "text", k=3)


@register(
    "text_subword_count",
    f"""
    SELECT doc_id,
           CAST({tx.subword_count_sql('text')} AS BIGINT) AS n_subwords,
           CAST(len({_TOKS}) AS BIGINT) AS n_words
    FROM documents
    """,
    doc="BPE-ish token budget per doc: GPT-2-style pretokenizer regex "
    "(RE2-compatible, byte-identical across engines) next to the "
    "whitespace word count",
)
def text_subword_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        tx.subword_count("text").cast("long").alias("n_subwords"),
        tx.token_count("text").cast("long").alias("n_words"),
    )
