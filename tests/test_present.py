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


def test_best_fragments_matches_bruteforce(engine):
    from codeindex_spark.query.present import (
        best_fragments,
        matched_content_terms,
        _token_match,
    )
    from codeindex_spark.tokenizer import tokenize

    q = "get OR string"
    got = best_fragments(
        engine, q, k=10, fragment_tokens=8, n_fragments=2
    ).toPandas()
    terms, cased = matched_content_terms(engine, q)
    top = engine.search(q, k=10).toPandas()
    content = {
        r["doc_id"]: r["content"]
        for r in engine.reader.docs.select("doc_id", "content").collect()
    }
    exp = []
    for doc_id, score in zip(top["doc_id"], top["score"]):
        toks = tokenize(content[doc_id] or "")
        hits = [1 if _token_match(t, terms, cased) else 0 for t in toks]
        frags = []
        for i0 in range(0, len(toks), 8):
            n = sum(hits[i0 : i0 + 8])
            if n:
                frags.append((i0 // 8, n))
        frags.sort(key=lambda f: (-f[1], f[0]))
        for fi, n in frags[:2]:
            exp.append((doc_id, fi, n, " ".join(toks[fi * 8 : (fi + 1) * 8])))
    exp.sort()
    got_rows = sorted(
        zip(got["doc_id"], got["frag_idx"], got["n_hits"], got["fragment"])
    )
    assert [tuple(r) for r in got_rows] == exp and exp
    # every returned fragment contains at least one matched token
    for f in got["fragment"]:
        assert any(_token_match(t, terms, cased) for t in tokenize(f))


def test_best_fragments_ordering_and_cap(engine):
    from codeindex_spark.query.present import best_fragments

    got = best_fragments(
        engine, "get", k=5, fragment_tokens=6, n_fragments=1
    ).toPandas()
    assert got.groupby("doc_id").size().max() <= 1
    scores = list(got["score"])
    assert scores == sorted(scores, reverse=True)
    assert (got["n_hits"] >= 1).all()
