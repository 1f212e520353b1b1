"""Golden semantics for bigram_lm_topk."""

from __future__ import annotations

from aidc_2018_timeseries_spark.operators.text import bigram_lm_topk


def test_counts_probabilities_and_rank_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "the cat sat"),
            (4, "the dog sat"),
            (5, "x"),  # too short: no bigrams
        ],
        "doc_id long, text string",
    )
    got = {
        (r.w1, r.w2): (r.n_pair, r.p_next, r.rank)
        for r in bigram_lm_topk(docs, "text", k=3, min_count=2).collect()
    }
    # "the"->"cat" 3 of 4, "the"->"dog" 1 (below min_count, dropped)
    assert got[("the", "cat")] == (3, 0.75, 1)
    assert ("the", "dog") not in got
    # "cat"->"sat" 2 of 3 -> rank 1; "cat"->"ran" 1 dropped by min_count
    assert got[("cat", "sat")] == (2, 0.666667, 1)
    assert ("cat", "ran") not in got


def test_tie_breaks_alphabetically(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "a c")],
        "doc_id long, text string",
    )
    got = {r.w2: r.rank for r in bigram_lm_topk(docs, "text").collect()}
    assert got == {"b": 1, "c": 2}  # equal counts -> lexicographic w2
