"""Property-based tests for the Lucene-regexp DFA compiler: random
pattern trees, two independent implementations (compiled DFA vs the
oracle's end-position-set interpreter) must agree on an enumerated
string universe, and the algebraic identities of the extended
operators must hold observationally.

No Spark session — pure Python, runs in milliseconds per example.
"""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from codeindex_spark.query.luceneregex import _Parser, compile_lucene_regexp
from codeindex_spark.query.oracle import _lucene_fullmatch

ALPHA = "abc"
UNIVERSE = [""] + [
    "".join(p)
    for n in range(1, 5)
    for p in itertools.product(ALPHA, repeat=n)
]

_BASE = st.sampled_from(
    ["a", "b", "c", ".", "@", "#", "()", '"ab"', "[ab]", "[^a]", "ab"]
)


def _unary(p):
    return st.sampled_from(
        ["~({})", "({})*", "({})?", "({}){{0,2}}", "({})"]
    ).map(lambda t: t.format(p))


def _binary(pq):
    p, q = pq
    return st.sampled_from(
        ["({}|{})", "({}&{})", "({}{})"]
    ).map(lambda t: t.format(p, q))


PATTERNS = st.recursive(
    _BASE,
    lambda inner: st.one_of(
        inner.flatmap(_unary),
        st.tuples(inner, inner).flatmap(_binary),
    ),
    max_leaves=6,
)


def _lang(pattern: str) -> frozenset:
    m = compile_lucene_regexp(pattern)
    return frozenset(s for s in UNIVERSE if m.match(s))


@settings(max_examples=300, deadline=None)
@given(PATTERNS)
def test_dfa_equals_interpreter(pattern):
    """The compiled DFA and the set-of-end-positions interpreter are
    independent implementations of the same semantics — they must
    agree on every universe string for every generated pattern."""
    m = compile_lucene_regexp(pattern)
    node = _Parser(pattern).parse()
    for s in UNIVERSE:
        assert m.match(s) == _lucene_fullmatch(node, s), (pattern, s)


@settings(max_examples=150, deadline=None)
@given(PATTERNS)
def test_complement_involution_and_de_morgan(pattern):
    """~~e == e, and e&e == e (observationally over the universe);
    complement really is set complement w.r.t. the universe."""
    lang = _lang(pattern)
    assert _lang(f"~(~({pattern}))") == lang
    assert _lang(f"({pattern})&({pattern})") == lang
    comp = _lang(f"~({pattern})")
    assert comp == frozenset(UNIVERSE) - lang


@settings(max_examples=150, deadline=None)
@given(PATTERNS, PATTERNS)
def test_intersection_union_algebra(p, q):
    """L(p&q) == L(p) & L(q) and L(p|q) == L(p) | L(q) — the operator
    semantics reduce to set algebra over any finite universe."""
    lp, lq = _lang(p), _lang(q)
    assert _lang(f"({p})&({q})") == lp & lq
    assert _lang(f"({p})|({q})") == lp | lq


@settings(max_examples=150, deadline=None)
@given(PATTERNS)
def test_literal_prefix_sound(pattern):
    """Every accepted string must start with the DFA's forced literal
    prefix — the pushdown predicate can never drop a match."""
    m = compile_lucene_regexp(pattern)
    pfx = m.literal_prefix()
    for s in UNIVERSE:
        if m.match(s):
            assert s.startswith(pfx), (pattern, s, pfx)


@settings(max_examples=100, deadline=None)
@given(PATTERNS)
def test_match_many_equals_match(pattern):
    m = compile_lucene_regexp(pattern)
    got = list(m.match_many(UNIVERSE))
    assert got == [m.match(s) for s in UNIVERSE]
