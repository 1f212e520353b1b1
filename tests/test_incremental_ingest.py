"""Unit semantics of incremental-ingest admission (operators/dedup.py).

The catalog face checks the composed query against DuckDB; these pin the
operator's contract on a hand-built frame where every classification and
tie-break is visible by eye.
"""

from __future__ import annotations

from aidc_2018_timeseries_spark.operators.dedup import incremental_ingest_verdicts


def test_verdicts_cover_all_cases(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    arrivals = spark.createDataFrame(
        [
            # re-crawl of doc 1, trivially reformatted (case/whitespace):
            # the normalized content hash must still collide
            (10, "  Alpha   BETA "),
            # fresh content arriving twice: smaller id wins
            (11, "epsilon zeta"),
            (12, "epsilon zeta"),
            # fresh unique content
            (13, "eta theta"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.verdict
        for r in incremental_ingest_verdicts(corpus, arrivals, "doc_id", "text").collect()
    }
    assert got == {
        10: "dup_corpus",
        11: "ingested",
        12: "dup_batch",
        13: "ingested",
    }


def test_corpus_dup_beats_batch_dup(spark):
    """A re-crawl that ALSO has a batch twin is dup_corpus for both copies
    — corpus membership is checked first (neither row may be appended)."""
    corpus = spark.createDataFrame([(1, "alpha")], "doc_id long, text string")
    arrivals = spark.createDataFrame(
        [(10, "alpha"), (11, "alpha")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.verdict
        for r in incremental_ingest_verdicts(corpus, arrivals, "doc_id", "text").collect()
    }
    assert got == {10: "dup_corpus", 11: "dup_corpus"}
