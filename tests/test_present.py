"""Presentation ops (V1/V2/V3) — goldens in the spirit of
/root/reference/src/CodeIndex.Test/Search/CodeIndexSearcherTest.cs:33-148."""

from __future__ import annotations

import pytest

from codeindex_spark.corpus import CorpusSpec, spark_documents
from codeindex_spark.index.build import IndexParams
from codeindex_spark.index.segments import IndexBuilder, IndexReader
from codeindex_spark.query.planner import SearchEngine
from codeindex_spark.query.present import (
    MAX_CONTENT_HIGHLIGHT_LENGTH,
    TOO_LONG_MESSAGE,
    highlight_html,
    matched_lines,
    search_with_matched_lines,
    search_with_preview,
)


def test_highlight_wraps_tokens_and_escapes():
    out = highlight_html("ABCD <tag> abcd", {"abcd"}, cased=False)
    # both case variants match the insensitive term; markup escaped
    assert out == (
        "<span class='highlight'>ABCD</span> &lt;tag&gt; "
        "<span class='highlight'>abcd</span>"
    )


def test_highlight_token_exact_not_substring():
    out = highlight_html("get together", {"get"})
    assert out == "<span class='highlight'>get</span> together"


def test_highlight_case_sensitive():
    out = highlight_html("ABCD abcd", {"ABCD"}, cased=True)
    assert out == "<span class='highlight'>ABCD</span> abcd"


def test_highlight_too_long_guard():
    big = "x" * (MAX_CONTENT_HIGHLIGHT_LENGTH + 1)
    assert highlight_html(big, {"x"}) == TOO_LONG_MESSAGE


def test_matched_lines_numbers_and_trim():
    # line numbers are 1-based and count blank lines (reference
    # CodeIndexSearcherTest.cs:139-148); matched lines come trimmed
    text = "ABCD\n\n  EFGH ABCD  \nnope"
    lines = matched_lines(text, {"abcd"})
    assert lines == [("ABCD", 1), ("EFGH ABCD", 3)]


def test_matched_lines_cap():
    text = "\n".join(["hit"] * 10)
    assert len(matched_lines(text, {"hit"}, max_results=4)) == 4


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pidx"))
    docs = spark_documents(spark, CorpusSpec(n_docs=60), partitions=2)
    IndexBuilder(spark, d, IndexParams(num_buckets=8, block_size=32), n_groups=1).build(
        docs, resume=False
    )
    return SearchEngine(IndexReader(spark, d))


def test_search_with_preview(engine):
    rows = search_with_preview(engine, "get", k=5).collect()
    assert 0 < len(rows) <= 5
    for r in rows:
        assert "<span class='highlight'>" in r["preview_html"]
        assert "get" in r["preview_html"].lower()


def test_search_with_matched_lines(engine):
    rows = search_with_matched_lines(engine, "LucenePool", k=5, max_lines=20).collect()
    assert rows
    for r in rows:
        assert r["line_number"] >= 1
        assert "lucenepool" in r["line_text"].lower()
        assert r["line_text"] == r["line_text"].strip()


def test_preview_wildcard_expansion(engine):
    rows = search_with_preview(engine, "stri*", k=3).collect()
    assert rows
    assert any("highlight" in r["preview_html"] for r in rows)
