"""Parser shape tests — transliterated from the reference's
QueryGeneratorTest (/root/reference/src/CodeIndex.Test/MaintainIndex/
QueryGeneratorTest.cs:39-201): wildcard lowercasing, fuzzy suffix,
phrase construction, leading-wildcard rejection, field scoping."""

from __future__ import annotations

import pytest

from codeindex_spark.query import ast
from codeindex_spark.query.ast import (
    And,
    Fuzzy,
    Not,
    Or,
    Phrase,
    QueryParseError,
    Term,
    Wildcard,
    parse_phrase_query,
    parse_query,
)


def test_simple_term_lowercased():
    assert parse_query("ABC") == Term("abc", "content")


def test_case_sensitive_keeps_case():
    assert parse_query("ABC", case_sensitive=True) == Term("ABC", "content_cs")


def test_wildcard_lowercased_expansion():
    # QueryGeneratorTest.cs:41-49 — "ABC*" parses to +Content:abc*
    assert parse_query("ABC*") == Wildcard("abc*", "content")


def test_fuzzy():
    # QueryGeneratorTest.cs:60-76 — "Abc~2"
    assert parse_query("Abc~2") == Fuzzy("abc", 2, "content")
    assert parse_query("abc~") == Fuzzy("abc", 2, "content")


def test_boolean_and_or_not():
    q = parse_query("index AND writer")
    assert q == And((Term("index"), Term("writer")))
    q = parse_query("string OR return NOT get")
    assert q == Or((Term("string"), Not(Term("return"), Term("get"))))


def test_implicit_or():
    assert parse_query("abc def") == Or((Term("abc"), Term("def")))


def test_grouping():
    q = parse_query("(a OR b) AND c")
    assert q == And((Or((Term("a"), Term("b"))), Term("c")))


def test_quoted_phrase():
    assert parse_query('"add documents"') == Phrase(("add", "documents"))


def test_phrase_mode_whole_input():
    # PhaseQuery=true wraps the whole input (QueryGenerator.cs:107-213)
    assert parse_phrase_query("add documents") == Phrase(("add", "documents"))
    assert parse_phrase_query("index_wri* batch") == Phrase(
        ("index_wri*", "batch")
    )
    assert parse_phrase_query("Single") == Term("single", "content")


def test_leading_wildcard_rejected():
    # QueryGenerator.cs:154-158
    with pytest.raises(QueryParseError):
        parse_phrase_query("*abc def")
    with pytest.raises(QueryParseError):
        parse_query("*abc")


def test_field_scoping():
    q = parse_query("FileName:efg AND Content:abc*")
    assert q == And((Term("efg", "file_name"), Wildcard("abc*", "content")))
    q = parse_query('FilePath:"src core"')
    assert q == Phrase(("src", "core"), "file_path")


def test_empty_query_rejected():
    with pytest.raises(QueryParseError):
        parse_query("   ")


def test_collect_leaves():
    q = parse_query("(a OR b*) AND c NOT d~1")
    leaves = ast.collect_leaves(q)
    assert len(leaves) == 4
