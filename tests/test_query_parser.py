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
    Range,
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


# ---------------- Lucene classic extras: boost, slop, ranges ----------------


def test_boost_on_leaves():
    # QueryGenerator.cs:217-222 hands the classic QueryParser (and its
    # full syntax doc) to users — term^2 must parse, not raise
    assert parse_query("abc^2") == Term("abc", "content", 2.0)
    assert parse_query("ABC^0.5") == Term("abc", "content", 0.5)
    assert parse_query("stri*^1.5") == Wildcard("stri*", "content", 1.5)
    assert parse_query("strng~1^3") == Fuzzy("strng", 1, "content", 3.0)
    assert parse_query("Content:abc^2") == Term("abc", "content", 2.0)


def test_boost_on_phrase_and_group():
    assert parse_query('"a b"^2') == Phrase(("a", "b"), "content", 2.0)
    # group boost distributes onto leaves (score algebra is sum-based)
    assert parse_query("(a b)^2") == Or(
        (Term("a", "content", 2.0), Term("b", "content", 2.0))
    )
    q = parse_query("(x AND y)^3 OR z")
    assert q == Or(
        (
            And((Term("x", "content", 3.0), Term("y", "content", 3.0))),
            Term("z"),
        )
    )


def test_phrase_slop():
    assert parse_query('"a b"~3') == Phrase(("a", "b"), "content", 1.0, 3)
    assert parse_query('"a b"~3^2') == Phrase(("a", "b"), "content", 2.0, 3)
    assert parse_query('Content:"a b"~1') == Phrase(
        ("a", "b"), "content", 1.0, 1
    )
    # slop on a single-term phrase degrades to a plain term (Lucene)
    assert parse_query('"abc"~2') == Term("abc", "content")


def test_slop_on_group_rejected():
    with pytest.raises(QueryParseError, match="slop"):
        parse_query("(a b)~3")


def test_range_in_boolean_context():
    assert parse_query("x AND {1 TO 5}") == And(
        (Term("x"), Range("1", "5", False, False, "content"))
    )


def test_bad_boost_rejected():
    with pytest.raises(QueryParseError):
        parse_query("abc^0")
    with pytest.raises(QueryParseError):
        parse_query("abc^x")
    with pytest.raises(QueryParseError):
        parse_query("^2")


def test_backslash_escaping():
    # Lucene classic escaping: an escaped char is literal, never an
    # operator — the last documented parser surface (QueryParser
    # syntax doc via QueryGenerator.cs:217-222)
    assert parse_query(r"foo\*bar") == Term("foo*bar", "content")
    assert parse_query(r"foo\~2") == Term("foo~2", "content")
    assert parse_query(r"foo\^2") == Term("foo^2", "content")
    assert parse_query(r"foo\:bar") == Term("foo:bar", "content")
    assert parse_query(r"foo\ bar") == Term("foo bar", "content")
    assert parse_query(r"a\\b") == Term("a\\b", "content")
    # escaped leading star is a literal char, not a leading wildcard
    assert parse_query(r"\*abc") == Term("*abc", "content")
    # operators still work next to escapes
    assert parse_query(r"foo\:bar~1") == Fuzzy("foo:bar", 1, "content")
    assert parse_query(r"foo\*x^2") == Term("foo*x", "content", 2.0)
    # mixing literal and operator wildcard chars is refused loudly
    with pytest.raises(QueryParseError, match="escaped wildcard"):
        parse_query(r"foo\*b*r")


def test_range_queries():
    # inclusive / exclusive / mixed brackets (Lucene classic grammar)
    assert parse_query("[apple TO banana]") == Range(
        "apple", "banana", True, True, "content"
    )
    assert parse_query("{apple TO banana}") == Range(
        "apple", "banana", False, False, "content"
    )
    assert parse_query("[apple TO banana}") == Range(
        "apple", "banana", True, False, "content"
    )
    # field-qualified, boost suffix, open side
    assert parse_query("FileName:[a TO m]^2") == Range(
        "a", "m", True, True, "file_name", 2.0
    )
    assert parse_query("[apple TO *]") == Range(
        "apple", None, True, True, "content"
    )
    assert parse_query("[* TO apple]") == Range(
        None, "apple", True, True, "content"
    )
    # endpoints follow the field analyzer's casing
    assert parse_query("Content:[A TO B]") == Range("a", "b", True, True, "content")
    assert parse_query("Content:[A TO B]", case_sensitive=True) == Range(
        "A", "B", True, True, "content_cs"
    )
    # composes with boolean structure and group boost
    assert parse_query("foo AND [a TO b]") == And(
        (Term("foo"), Range("a", "b", True, True, "content"))
    )
    assert parse_query("([a TO b])^3") == Range(
        "a", "b", True, True, "content", 3.0
    )
    # escapes decode literally inside endpoints
    assert parse_query(r"[foo\:a TO foo\:b]") == Range(
        "foo:a", "foo:b", True, True, "content"
    )
    # an ESCAPED closing bracket is endpoint content, not the range
    # terminator (only an even backslash run before ]/} closes)
    assert parse_query(r"[a\] TO b]") == Range(
        "a]", "b", True, True, "content"
    )
    assert parse_query(r"[a TO b\}]") == Range(
        "a", "b}", True, True, "content"
    )
    # an even backslash run (escaped backslash) does NOT escape the
    # bracket: '[a\\]' closes immediately and has no TO -> loud error
    with pytest.raises(QueryParseError):
        parse_query(r"[a\\] TO c]")


def test_range_query_errors():
    for bad in (
        "[a TO b",          # unterminated
        "[a TO",            # unterminated, no hi
        "[* TO *]",         # unbounded both sides
        "[a b TO c]",       # multi-term endpoint
        "[a TO b c]",       # multi-term endpoint
        "[a TO b]^nan",     # non-finite boost
        "[a TO b]^0",       # non-positive boost
        "[TO b]",           # missing lo
    ):
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_nonfinite_boost_rejected():
    for bad in ("abc^nan", "abc^inf", "abc^-1"):
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_phrase_slot_escaping():
    # escapes unescape inside phrase slots like bare terms...
    assert parse_query(r'"foo\:bar baz"') == Phrase(
        ("foo:bar", "baz"), "content"
    )
    # ...but literal (escaped) wildcard chars cannot ride in a slot
    # string — refused loudly instead of silently expanded
    with pytest.raises(QueryParseError, match="escaped wildcard"):
        parse_query(r'"sort\* fast"')


def test_fuzzy_lucene_slop_semantics():
    """QueryParserBase.HandleBareFuzzy + FuzzyQuery.FloatToEdits: bare
    ~ is 2 edits, integers clamp to the 2-edit max, 0<s<1 is a legacy
    minimum-similarity converted by term length, fractions > 1 and
    negatives are parse errors."""
    assert parse_query("spark~") == Fuzzy("spark", 2, "content")
    assert parse_query("spark~3") == Fuzzy("spark", 2, "content")  # clamp
    assert parse_query("spark~0") == Fuzzy("spark", 0, "content")
    # (1 - 0.8) * 5 rounds down to 0 in both float and double
    assert parse_query("spark~0.8") == Fuzzy("spark", 0, "content")
    # (1 - 0.9) * 13 = 1.3 -> 1
    assert parse_query("organization~0.9") == Fuzzy(
        "organization", 1, "content"
    )
    for bad in ("spark~1.5", "spark~-1", "spark~nan", "spark~x"):
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_required_prohibited_clauses():
    """Lucene classic +/- clause prefixes (QueryParserBase: '+' =
    MUST, '-' = MUST_NOT, unsigned = SHOULD; reachable because the
    reference hands users the full classic parser,
    QueryGenerator.cs:217-222)."""
    Bool = ast.Bool
    # irreducible mixed case: must + should
    assert parse_query("+spark index") == Bool(
        must=(Term("spark"),), should=(Term("index"),)
    )
    assert parse_query("+spark -legacy index") == Bool(
        must=(Term("spark"),),
        should=(Term("index"),),
        must_not=(Term("legacy"),),
    )
    # reducible cases rewrite to plain trees
    assert parse_query("spark -legacy") == Not(Term("spark"), Term("legacy"))
    assert parse_query("-legacy spark") == Not(Term("spark"), Term("legacy"))
    assert parse_query("+spark +index") == And((Term("spark"), Term("index")))
    assert parse_query("+spark") == Term("spark")
    # pure-negative query matches nothing (Lucene BooleanQuery with
    # only MUST_NOT clauses)
    assert parse_query("-spark") == Bool(must_not=(Term("spark"),))
    assert parse_query("-spark -index") == Bool(
        must_not=(Term("spark"), Term("index"))
    )
    # signs compose with fields, groups, phrases
    assert parse_query("-filename:log spark") == Not(
        Term("spark"), Term("log", "file_name")
    )
    assert parse_query('+(a b) -c') == Not(
        Or((Term("a"), Term("b"))), Term("c")
    )
    assert parse_query('-"the phrase" x') == Not(
        Term("x"), Phrase(("the", "phrase"))
    )


def test_and_not_compound():
    assert parse_query("a AND NOT b") == Not(Term("a"), Term("b"))
    assert parse_query("a AND NOT b AND c") == Not(
        And((Term("a"), Term("c"))), Term("b")
    )
    with pytest.raises(QueryParseError):
        parse_query("a AND NOT +b")
    # truncated at the operator: loud error, NOT must not silently
    # degrade into the literal term 'not'
    for bad in ("foo AND NOT", "foo AND", "foo NOT", "foo OR"):
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_field_scoped_group():
    assert parse_query("filename:(a b)") == Or(
        (Term("a", "file_name"), Term("b", "file_name"))
    )
    assert parse_query("content:(spark OR index)") == Or(
        (Term("spark"), Term("index"))
    )
    # group boost distributes to leaves
    assert parse_query("filename:(a b)^2") == Or(
        (Term("a", "file_name", 2.0), Term("b", "file_name", 2.0))
    )
    # signs inside a field group
    assert parse_query("content:(+x -y z)") == ast.Bool(
        must=(Term("x"),), should=(Term("z"),), must_not=(Term("y"),)
    )
    # nested field prefix overrides the group field; nested 'content:'
    # routes to the SESSION content field, not the group's
    assert parse_query("filename:(a content:b)") == Or(
        (Term("a", "file_name"), Term("b", "content"))
    )
    q = parse_query("filename:(a content:b)", case_sensitive=True)
    assert q == Or((Term("a", "file_name"), Term("b", "content_cs")))
    with pytest.raises(QueryParseError):
        parse_query("filename:(a b")


def test_term_regexp_queries():
    from codeindex_spark.query.ast import Regexp

    assert parse_query("/st.*ng/") == Regexp("st.*ng", "content")
    assert parse_query("FileName:/[a-z]+_\\d+/") == Regexp(
        "[a-z]+_\\d+", "file_name"
    )
    assert parse_query("/ab+c/^2") == Regexp("ab+c", "content", 2.0)
    # escaped slash decodes into the pattern body
    assert parse_query(r"/a\/b/") == Regexp("a/b", "content")
    # composes with booleans
    got = parse_query("foo AND /ba[rz]/")
    assert got == And((Term("foo"), Regexp("ba[rz]", "content")))
    for bad in ("/abc", "//", "/a(b/", "/a/x", "/a/^0", "/a/^nan"):
        with pytest.raises(QueryParseError):
            parse_query(bad)


def test_regex_literal_prefix():
    from codeindex_spark.query.planner import regex_literal_prefix

    assert regex_literal_prefix("string") == "string"
    assert regex_literal_prefix("str.*") == "str"
    assert regex_literal_prefix("str*x") == "st"   # '*' repeats the 'r'
    assert regex_literal_prefix("ab+c") == "a"
    assert regex_literal_prefix("[ab]c") == ""
    assert regex_literal_prefix("a\\d+") == "a"
    assert regex_literal_prefix("(?:ab)") == ""


def test_regexp_lexer_edges():
    from codeindex_spark.query.ast import Regexp

    # an ESCAPED colon is term content: the '/' after it must not
    # open a regex body and swallow the next token
    assert parse_query(r"foo\:/bar baz") == Or(
        (Term("foo:/bar", "content"), Term("baz", "content"))
    )
    # parens and spaces inside slashes are pattern content
    assert parse_query("(/a b/)") == Regexp("a b", "content")
    # Python-valid but Java-invalid patterns parse, then fail loudly
    # at expansion time (planner compiles with java.util.regex) —
    # here just assert the parse accepts them
    assert parse_query("/a{,3}/") == Regexp("a{,3}", "content")


def test_interval_regex_semantics():
    """interval_regex reproduces Automata.makeDecimalInterval: fixed
    digit count when the bound strings share a length, otherwise free
    digits with any number of leading zeros."""
    import re

    from codeindex_spark.query.ast import (
        expand_lucene_intervals,
        interval_regex,
    )

    for smin, smax in [("1", "100"), ("01", "10"), ("0", "5"), ("7", "7"),
                       ("090", "120"), ("5", "23"), ("000", "999")]:
        rx = re.compile("^(?:" + interval_regex(smin, smax) + ")$")
        lo, hi, fixed = int(smin), int(smax), len(smin) == len(smax)
        for n in range(0, max(hi * 2, 200)):
            for s in {str(n), str(n).zfill(len(smin)), "0" + str(n)}:
                want = lo <= int(s) <= hi and (
                    len(s) == len(smin) if fixed else True
                )
                assert bool(rx.fullmatch(s)) == want, (smin, smax, s)

    with pytest.raises(ValueError, match="min > max"):
        interval_regex("9", "3")
    # rewrite leaves escapes and non-interval angle brackets alone
    assert expand_lucene_intervals(r"\<1-2>") == r"\<1-2>"
    assert expand_lucene_intervals("<a-b>") == "<a-b>"
    # '<' inside a character class stays literal (injecting a group
    # there would change the class's membership)
    assert expand_lucene_intervals("[x<1-2>y]") == "[x<1-2>y]"
    assert expand_lucene_intervals("[ab]<1-2>") == "[ab](?:1|2)"
    out = expand_lucene_intervals(r"v<1-12>\.txt")
    assert out.startswith("v0*(?:") and out.endswith(r")\.txt")
