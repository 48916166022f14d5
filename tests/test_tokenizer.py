"""Tokenizer goldens transliterated from the reference's test suite:
/root/reference/src/CodeIndex.Test/IndexBuilder/CodeAnalyzerTest.cs:14-72.
These pin term identity — everything downstream (docIDs, BM25 scores,
rank order) depends on them being bit-exact.
"""

from __future__ import annotations

import pandas as pd
import pytest

from codeindex_spark.tokenizer import (
    HINT_MAX_LEN,
    HINT_MIN_LEN,
    doc_term_stats,
    get_words,
    token_count_series,
    tokenize,
    tokenize_lower,
    tokenize_series,
)


def test_analyzer_golden_cased():
    # CodeAnalyzerTest.cs:17-28
    content = " LucenePool.SaveResultsAndClearLucenePool(TempIndexDir);"
    assert tokenize(content) == [
        "LucenePool",
        ".",
        "SaveResultsAndClearLucenePool",
        "(",
        "TempIndexDir",
        ")",
        ";",
    ]


def test_analyzer_golden_lowercased():
    # CodeAnalyzerTest.cs:30-40
    content = " LucenePool.SaveResultsAndClearLucenePool(TempIndexDir);"
    assert tokenize_lower(content) == [
        "lucenepool",
        ".",
        "saveresultsandclearlucenepool",
        "(",
        "tempindexdir",
        ")",
        ";",
    ]


def test_analyzer_golden_multiline():
    # CodeAnalyzerTest.cs:42-55 — newlines are space-like, dropped
    content = "Line One\nLine Two\n\nLine Four"
    assert tokenize(content) == ["Line", "One", "Line", "Two", "Line", "Four"]


def test_snake_case_splits_camel_case_does_not():
    assert tokenize("index_writer.add_documents(batch_size)") == [
        "index", "_", "writer", ".", "add", "_", "documents",
        "(", "batch", "_", "size", ")",
    ]
    assert tokenize("SaveResultsAndClearLucenePool") == [
        "SaveResultsAndClearLucenePool"
    ]


def test_get_words_golden():
    # CodeAnalyzerTest.cs:61-64 (Environment.NewLine -> \n here)
    content = "It's a content for test\n这是一个例句,我知道了"
    assert get_words(content) == [
        "It", "s", "a", "content", "for", "test", "这是一个例句", "我知道了",
    ]
    assert get_words(content, 2, 4) == ["It", "for", "test", "我知道了"]
    assert get_words("a" + "b" * 200) == []


def test_get_words_arg_validation():
    # CodeAnalyzerTest.cs:66-71
    with pytest.raises(ValueError):
        get_words(None)  # type: ignore[arg-type]
    content = "abc"
    with pytest.raises(ValueError):
        get_words(content, 0)
    with pytest.raises(ValueError):
        get_words(content, 200)
    with pytest.raises(ValueError):
        get_words(content, 3, 1)
    with pytest.raises(ValueError):
        get_words(content, 3, -1)
    with pytest.raises(ValueError):
        get_words(content, 3, 1001)


def test_special_char_classes():
    # WordSegmenter.cs:104-110 — every special char is its own token
    specials = "".join(
        chr(c)
        for lo, hi in ((33, 47), (58, 64), (91, 96), (123, 126))
        for c in range(lo, hi + 1)
    )
    for ch in specials:
        assert tokenize(f"a{ch}b") == ["a", ch, "b"], repr(ch)
    # ideographic space drops (WordSegmenter.cs:97-100)
    assert tokenize("a　b") == ["a", "b"]
    # non-ASCII runs stay whole (CJK as one run until special/space)
    assert tokenize("这是一个例句,我知道了") == ["这是一个例句", ",", "我知道了"]


def test_empty_and_null():
    assert tokenize("") == []
    assert tokenize("   \t\r\n") == []


def test_hint_length_bounds():
    # CodeIndexBuilder.cs:111-112 — hints are words of length 4..199
    long_ok = "x" * HINT_MAX_LEN
    too_long = "x" * (HINT_MAX_LEN + 1)
    words = get_words(f"abc abcd {long_ok} {too_long}", HINT_MIN_LEN, HINT_MAX_LEN)
    assert words == ["abcd", long_ok]


def test_series_kernels_match_scalar():
    texts = pd.Series(
        [" LucenePool.Save(TempDir);", "Line One\nLine Two", "", None]
    )
    lists = tokenize_series(texts)
    assert lists[0] == tokenize(texts[0])
    assert lists[1] == ["Line", "One", "Line", "Two"]
    assert lists[2] == []
    assert lists[3] == []
    counts = token_count_series(texts)
    assert counts.tolist() == [len(lists[i]) for i in range(4)]


def test_doc_term_stats_positions():
    tokens = tokenize("get set get")
    pos, dlen = doc_term_stats(tokens)
    assert dlen == 3
    assert pos == {"get": [0, 2], "set": [1]}


def test_camel_subtokens():
    from codeindex_spark.tokenizer import camel_subtokens, camel_token_stream

    assert camel_subtokens("SaveResultsAndClearLucenePool") == [
        "save", "results", "and", "clear", "lucene", "pool",
    ]
    assert camel_subtokens("HTTPServer2Response") == [
        "http", "server", "2", "response",
    ]
    assert camel_subtokens("lowercase") == ["lowercase"]
    assert camel_subtokens("ABC") == ["abc"]
    # snake parts come pre-split by '_' being a special char; the
    # full stream drops specials entirely
    assert camel_token_stream("index_writer.AddDocs(batchSize);") == [
        "index", "writer", "add", "docs", "batch", "size",
    ]
    assert camel_token_stream("这是一个例句") == []
