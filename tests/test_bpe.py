"""BPE train/segment/apply: hand-computed merges, tie-breaks,
overlap rule, count pipeline, partition invariance."""

from __future__ import annotations

import pytest

from codeindex_spark.ops.bpe import (
    bpe_learn_from_freqs,
    bpe_merges_df,
    bpe_segment,
    bpe_segment_words,
    bpe_token_counts,
    bpe_train,
)


def test_learn_hand_computed():
    # ab:3, cab:1 -> pairs (a,b):4 (b,</w>):4 (c,a):1; tie at 4
    # breaks lexicographically -> ('a','b') first
    merges = bpe_learn_from_freqs([("ab", 3), ("cab", 1)], 5)
    assert merges == [
        ("a", "b", 4),
        ("ab", "</w>", 4),
        ("c", "ab</w>", 1),
    ]  # loop stops early when no pairs remain


def test_segment_and_overlap():
    merges = bpe_learn_from_freqs([("ab", 3), ("cab", 1)], 5)
    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}
    assert bpe_segment("cab", ranks) == ["cab</w>"]
    assert bpe_segment("ab", ranks) == ["ab</w>"]
    assert bpe_segment("x", ranks) == ["x", "</w>"]
    # all non-overlapping occurrences merge left-to-right
    assert bpe_segment("aaa", {("a", "a"): 0}) == ["aa", "a", "</w>"]
    assert bpe_segment("aaaa", {("a", "a"): 0, ("aa", "aa"): 1}) == [
        "aaaa",
        "</w>",
    ]


def test_train_and_counts(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab ab cab"), (2, "ab x"), (3, "")],
        "doc_id long, text string",
    )
    merges = bpe_train(docs, n_merges=3)
    assert [(l, r) for l, r, _ in merges] == [
        ("a", "b"),
        ("ab", "</w>"),
        ("c", "ab</w>"),
    ]
    mdf = bpe_merges_df(spark, merges)
    assert [r["merged"] for r in mdf.orderBy("rank").collect()] == [
        "ab",
        "ab</w>",
        "cab</w>",
    ]
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, merges).collect()
    }
    # doc1: ab(1)+ab(1)+ab(1)+cab(1) = 4 tokens; doc2: ab(1)+x(2) = 3
    assert got[1] == (4, 4)
    assert got[2] == (2, 3)
    assert got[3] == (0, 0)


def test_segment_words_kernel(spark):
    merges = [("a", "b", 4)]
    words = spark.createDataFrame([("ab",), ("ba",)], "word string")
    got = {
        r["word"]: (list(r["pieces"]), r["n_sub"])
        for r in bpe_segment_words(words, merges).collect()
    }
    assert got["ab"] == (["ab", "</w>"], 2)
    assert got["ba"] == (["b", "a", "</w>"], 3)


def test_caps_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab ab cab")], "doc_id long, text string"
    )
    # max_words=1 keeps only the most frequent word ('ab', freq 3)
    merges = bpe_train(docs, n_merges=5, max_words=1)
    assert [(l, r) for l, r, _ in merges] == [
        ("a", "b"),
        ("ab", "</w>"),
    ]
    # min_freq drops 'cab'
    merges2 = bpe_train(docs, n_merges=5, min_freq=2)
    assert merges == merges2
    with pytest.raises(ValueError):
        bpe_train(docs, n_merges=0)
    with pytest.raises(ValueError):
        bpe_train(docs, max_words=0)


def test_partition_invariance(spark):
    docs = spark.createDataFrame(
        [(i, "ab ab cab xy" if i % 2 else "ab xy zq") for i in range(20)],
        "doc_id long, text string",
    )
    m1 = bpe_train(docs, n_merges=4)
    m2 = bpe_train(docs.repartition(7), n_merges=4)
    assert m1 == m2
    c1 = sorted(bpe_token_counts(docs, m1).collect())
    c2 = sorted(bpe_token_counts(docs.repartition(5), m1).collect())
    assert c1 == c2
