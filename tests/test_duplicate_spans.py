"""Golden semantics for duplicate_spans (substring-level exact dedup).

The oracle-parity sweep proves Spark == DuckDB on real data; this pins the
ALGORITHM on a hand-built corpus where the right answer is computable by
eye: which spans are duplicated, how adjacent duplicated grams merge, and
that sub-k docs and unique text produce nothing.
"""

from __future__ import annotations

from aidc_2018_timeseries_spark.operators.dedup import duplicate_spans

_SHARED = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens


def _rows(df):
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_grams)
        for r in df.collect()
    )


def test_shared_passage_found_in_both_docs(spark):
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma {_SHARED} delta epsilon"),
            (2, f"{_SHARED} zeta eta theta iota kappa"),
            (3, "completely unrelated words with no repeats at all here"),
        ],
        "doc_id long, text string",
    )
    got = _rows(duplicate_spans(docs, "doc_id", "text", k=5))
    # doc 1: shared passage occupies tokens 4..13 -> starts 4..9 (6 grams)
    # doc 2: tokens 1..10 -> starts 1..6 (6 grams)
    assert got == [(1, 4, 13, 10, 6), (2, 1, 10, 10, 6)]


def test_within_doc_repetition_counts_as_duplicated(spark):
    body = "one two three four five"
    docs = spark.createDataFrame(
        [(7, f"{body} filler filler2 filler3 filler4 filler5 {body}")],
        "doc_id long, text string",
    )
    got = _rows(duplicate_spans(docs, "doc_id", "text", k=5))
    # the 5-gram "one..five" occurs at starts 1 and 11 -> gap 10 > k,
    # so two separate 5-token spans
    assert got == [(7, 1, 5, 5, 1), (7, 11, 15, 5, 1)]


def test_adjacent_grams_merge_across_small_gap(spark):
    # two duplicated grams starting at 1 and 1+k chain into ONE span
    a = "a b c d e f g h i j"  # 10 tokens; grams at 1 and 6 cover all
    docs = spark.createDataFrame(
        [(1, f"{a} unique1 unique2"), (2, f"noise {a}")],
        "doc_id long, text string",
    )
    got = _rows(duplicate_spans(docs, "doc_id", "text", k=5))
    assert (1, 1, 10, 10, 6) in got  # every start 1..6 duplicated, merged
    assert (2, 2, 11, 10, 6) in got


def test_short_and_unique_docs_yield_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "all words here are entirely fresh today")],
        "doc_id long, text string",
    )
    assert duplicate_spans(docs, "doc_id", "text", k=5).count() == 0
