"""Lucene RegexpQuery extended operators (~ complement, & intersection,
@ anystring, # empty, "quoted"): the DFA compiler
(query/luceneregex.py) against three independent checks — Python re
on the plain-regex common subset, hand-stated semantics models, and
the oracle's set-of-end-positions interpreter (query/oracle.py).

Reference parity: the classic parser hands /pattern/ to RegexpQuery
wholesale (QueryGenerator.cs:217-222), whose syntax is
org.apache.lucene.util.automaton.RegExp with ALL operators on.
"""

from __future__ import annotations

import itertools
import re

import pytest

from codeindex_spark.query import ast
from codeindex_spark.query.luceneregex import (
    _Parser,
    compile_lucene_regexp,
    uses_extended_ops,
)
from codeindex_spark.query.oracle import _lucene_fullmatch

ALPHA = "abc"
UNIVERSE = [""] + [
    "".join(p)
    for n in range(1, 5)
    for p in itertools.product(ALPHA, repeat=n)
]

PLAIN = [
    "a",
    "ab*",
    "(a|b)c",
    "a?b+c",
    "a{2,3}",
    "a{2,}b",
    "[ab]c",
    "[^a]b",
    ".b",
    "a.*c",
    "(ab|ba)*",
    "(a|bc)(c|b)?",
]

EXTENDED = [
    ("~a", lambda s: s != "a"),
    ("~(ab)", lambda s: s != "ab"),
    ("a&a", lambda s: s == "a"),
    ("a&b", lambda s: False),
    (
        "[ab]*&~(a*)",
        lambda s: all(c in "ab" for c in s)
        and not all(c == "a" for c in s),
    ),
    ("@", lambda s: True),
    ("a@", lambda s: s.startswith("a")),
    ("@c", lambda s: s.endswith("c")),
    ("#", lambda s: False),
    ("~#", lambda s: True),
    ("#a", lambda s: False),
    (
        "(a|b)@&~(@(bc))",
        lambda s: s[:1] in ("a", "b") and not s.endswith("bc"),
    ),
    ('"ab"c', lambda s: s == "abc"),
    ("~(a)&~(b)", lambda s: s not in ("a", "b")),
    ("~(a|b)c", None),  # model-free: DFA vs interpreter only
    ("a~(b)c", None),
    ("(~b)*", None),
    ("~(a*)&~(b*)", None),
    ("(a&a)b", lambda s: s == "ab"),
]


def test_plain_subset_matches_python_re():
    for pat in PLAIN:
        m = compile_lucene_regexp(pat)
        rx = re.compile(pat)
        for s in UNIVERSE:
            assert m.match(s) == bool(rx.fullmatch(s)), (pat, s)


def test_extended_ops_vs_semantic_models():
    for pat, model in EXTENDED:
        if model is None:
            continue
        m = compile_lucene_regexp(pat)
        for s in UNIVERSE:
            assert m.match(s) == model(s), (pat, s, m.match(s))


def test_dfa_agrees_with_oracle_interpreter():
    """The two independent implementations — compiled DFA (engine)
    and end-position-set interpreter (oracle) — must agree on every
    string of the enumerated universe, for every pattern."""
    for pat in PLAIN + [p for p, _ in EXTENDED]:
        m = compile_lucene_regexp(pat)
        node = _Parser(pat).parse()
        for s in UNIVERSE:
            assert m.match(s) == _lucene_fullmatch(node, s), (pat, s)


def test_match_many_equals_match():
    m = compile_lucene_regexp("(a|b)@&~(@(bc))")
    got = list(m.match_many(UNIVERSE))
    assert got == [m.match(s) for s in UNIVERSE]
    assert list(m.match_many([])) == []


def test_embedded_complement_concat():
    # a ~(b) c == 'a' + (any string except exactly "b") + 'c'
    m = compile_lucene_regexp("a~(b)c")
    assert m.match("ac") and m.match("axc") and m.match("abbc")
    assert not m.match("abc")


def test_interval_composes_with_extended_ops():
    m = compile_lucene_regexp("v<1-12>&~(v1)")
    for s, want in [
        ("v1", False),
        ("v2", True),
        ("v12", True),
        ("v012", True),  # free-length interval accepts leading zeros
        ("v13", False),
        ("v07", True),
    ]:
        assert m.match(s) == want, (s, want)


def test_literal_prefix_pushdown():
    assert compile_lucene_regexp("get@&~(gets@)").literal_prefix() == "get"
    assert compile_lucene_regexp("abc(d|e)").literal_prefix() == "abc"
    assert compile_lucene_regexp("(a|b)x").literal_prefix() == ""
    # accepting start state: empty string allowed, no forced prefix
    assert compile_lucene_regexp("a*").literal_prefix() == ""


def test_matches_nothing_detected():
    assert compile_lucene_regexp("#").matches_nothing
    assert compile_lucene_regexp("a&b").matches_nothing
    assert not compile_lucene_regexp("~#").matches_nothing


def test_escapes_are_literal():
    # Lucene rule: backslash makes the next char literal — \d is 'd',
    # and escaped operators lose their meaning
    assert compile_lucene_regexp(r"\d").match("d")
    assert not compile_lucene_regexp(r"\d").match("5")
    m = compile_lucene_regexp(r"a\&b")
    assert m.match("a&b") and not m.match("ab")
    assert not uses_extended_ops(r"a\&b")


def test_uses_extended_ops_detector():
    assert uses_extended_ops("a&b")
    assert uses_extended_ops("~x")
    assert uses_extended_ops("a@")
    assert uses_extended_ops("#")
    assert uses_extended_ops('"lit"')
    assert not uses_extended_ops("(qu|s).*t")
    assert not uses_extended_ops(r"a\&b")
    assert not uses_extended_ops("[~&@#]x")  # class members are literal


def test_parser_errors_are_loud():
    for bad in ["~", "a&", "(a", "[a", "a{2,1}", "[b-a]", '"unterm', ""]:
        with pytest.raises(ValueError):
            compile_lucene_regexp(bad)


def test_classic_parser_accepts_extended_regexp():
    node = ast.parse_query("/(s|t)@&~(@(ing|ed))/")
    assert isinstance(node, ast.Regexp)
    assert node.pattern == "(s|t)@&~(@(ing|ed))"
    with pytest.raises(ast.QueryParseError):
        ast.parse_query("/a&/")  # extended-syntax errors surface too
