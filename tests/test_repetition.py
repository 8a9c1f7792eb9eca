from __future__ import annotations

import pytest

from planar_spark.kernels.textops import corpus_ngram_dedup, repetition_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # "a b a b a": bigrams [a b, b a, a b, b a] -> top 2/4;
        # trigrams [a b a, b a b, a b a] -> 3 total, 2 distinct -> dup 1/3
        (0, "a b a b a"),
        (1, "x y z"),          # all bigrams/trigrams unique -> 0, 0
        (2, "solo"),           # <2 tokens -> both 0
        (3, "a b a b a"),      # exact copy of doc 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_hand_values(spark, docs):
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert got[0]["n_tokens"] == 5
    assert got[0]["top_bigram_frac"] == pytest.approx(0.5)
    assert got[0]["dup_trigram_frac"] == pytest.approx(round(1 / 3, 6))
    assert got[1]["top_bigram_frac"] == pytest.approx(0.5)  # 1/2
    assert got[1]["dup_trigram_frac"] == 0.0
    assert got[2]["n_tokens"] == 1
    assert got[2]["top_bigram_frac"] == 0.0
    assert got[2]["dup_trigram_frac"] == 0.0


def test_corpus_ngram_dedup_hand_values(spark, docs):
    # n=2 for hand-checkable sets
    got = {r["doc_id"]: r for r in corpus_ngram_dedup(docs, n=2).collect()}
    # doc 0 and doc 3 are identical: all their distinct bigrams {a b, b a}
    # are shared -> dup_frac 1.0
    for d in (0, 3):
        assert got[d]["n_grams"] == 2
        assert got[d]["n_dup_grams"] == 2
        assert got[d]["dup_frac"] == pytest.approx(1.0)
    # doc 1's bigrams {x y, y z} appear nowhere else
    assert got[1]["n_dup_grams"] == 0
    assert got[1]["dup_frac"] == 0.0
    # doc 2 (<n tokens) falls back to its whole text as one shingle
    assert got[2]["n_grams"] == 1
    assert got[2]["n_dup_grams"] == 0
