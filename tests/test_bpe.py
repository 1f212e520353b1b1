"""Distributed BPE trainer vs an independent pure-Python reference.

Merge-list equality is the strongest statement available: if every merge
decision (argmax with the pinned tie order) and every merge application
(boundary-anchored regex vs the reference's explicit symbol walk) agree
for N rounds, the two implementations compute the same tokenizer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aidc_2018_timeseries_spark.operators.bpe import (
    reference_bpe,
    train_bpe_merges,
    word_vocab,
)
from aidc_2018_timeseries_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_merges_match_reference_on_corpus(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = train_bpe_merges(docs, "text", n_merges=12)
    freqs = {r.word: r.freq for r in word_vocab(docs, "text").collect()}
    want = reference_bpe(freqs, 12)
    assert got == want
    assert len(got) == 12


def test_merges_handle_regex_metachar_symbols(spark):
    """Tokens full of regex metachars (punctuation-only 'words') must not
    break the merge regex or the replacement grammar."""
    docs = spark.createDataFrame(
        [(1, "a$b a$b a$b x.y x.y (z) (z) (z) (z)")], "doc_id long, text string"
    )
    got = train_bpe_merges(docs, "text", n_merges=4)
    freqs = {r.word: r.freq for r in word_vocab(docs, "text").collect()}
    want = reference_bpe(freqs, 4)
    assert got == want


def test_repeated_symbol_runs_merge_left_to_right(spark):
    """'aaaa' exercises the overlap rule: pairs merge left-to-right,
    non-overlapping — regex application must agree with the symbol walk."""
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa aaa ba ba")], "doc_id long, text string"
    )
    got = train_bpe_merges(docs, "text", n_merges=3)
    freqs = {r.word: r.freq for r in word_vocab(docs, "text").collect()}
    want = reference_bpe(freqs, 3)
    assert got == want
