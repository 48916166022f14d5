"""Query AST + a small Lucene-classic-style parser.

Mirrors the query surface the reference exposes through
``QueryGenerator`` (/root/reference/src/CodeIndex.MaintainIndex/QueryGenerator.cs):

- keyword terms, boolean AND / OR / NOT with grouping (QueryGenerator.cs:217-222
  delegates to Lucene's classic QueryParser; expected shapes pinned by
  /root/reference/src/CodeIndex.Test/MaintainIndex/QueryGeneratorTest.cs:39-201)
- field-scoped leaves ``FileName:x AND Content:y`` (GetSearchStr,
  QueryGenerator.cs:229-259)
- wildcard ``stri*`` / ``organi?ation`` with term-dictionary expansion;
  leading wildcard rejected (QueryGenerator.cs:154-158 keeps Lucene's
  restriction — we keep it everywhere for symmetry)
- fuzzy ``strng~2`` (QueryGeneratorTest.cs:60-76)
- phrase mode: quoted exact-order adjacency, wildcard-in-phrase
  (SpanNearQuery(..., 0, True) — QueryGenerator.cs:107-213)
- CodePK point lookup short-circuit (QueryGenerator.cs:56-59)
- classic-parser extras reachable when the reference hands users the
  full QueryParser (QueryGenerator.cs:217-222): boost ``term^2``,
  proximity slop ``"a b"~3``, term ranges ``[a TO b]`` / ``{a TO b}``
  with open sides ``[a TO *]``, backslash escaping, required /
  prohibited clause prefixes ``+a b -c`` (MUST / SHOULD / MUST_NOT),
  the ``a AND NOT b`` compound, and field-scoped groups
  ``FileName:(a OR b)``

The AST is engine-neutral: the Spark planner and the pure-Python
oracle both evaluate it, which is what makes rank-identity checkable.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Union

Node = Union[
    "Term", "Wildcard", "Regexp", "Fuzzy", "Range", "Phrase", "Synonyms",
    "SpanFirst", "SpanOr", "SpanNot", "DisMax", "ConstantScore", "And",
    "Or", "Not", "Bool",
]

# user-facing field names (reference SearchRequest.cs:6-28) -> index fields
FIELD_ALIASES = {
    "content": "content",
    "filename": "file_name",
    "file_name": "file_name",
    "filepath": "file_path",
    "file_path": "file_path",
    # extra CamelCase-subtoken identifier field (always lowercased)
    "camel": "content_camel",
    "content_camel": "content_camel",
    "path_trigram": "path_trigram",
}
DEFAULT_FIELD = "content"


@dataclass(frozen=True)
class Term:
    term: str
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard:
    pattern: str  # contains * or ?
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Regexp:
    """Classic-parser term regexp ``/pattern/`` (QueryParserBase
    handles forward-slash regexps since Lucene 4.0; the reference
    hands users the full classic parser, QueryGenerator.cs:217-222).
    Matches DICTIONARY TERMS as a full anchored match — like
    Lucene's RegexpQuery, never a content substring scan (that is
    search_content_regex's job). The pattern is Java-regex syntax,
    kept as written: lowercased fields store lowercase terms, so
    uppercase literals simply match nothing there."""

    pattern: str
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Synonyms:
    """Lucene SynonymQuery (public semantics, lucene/core
    SynonymQuery.java): the group scores as ONE pseudo-term — the
    members' term frequencies SUM per doc BEFORE BM25 saturation and
    the blended docFreq is the MAX of the members' docFreqs — unlike
    an OR over the same terms, which saturates each term separately
    and sums the scores. Lucene produces these from analyzer synonym
    graphs, not parser syntax, so there is no query-string form here
    either; build the node programmatically."""

    terms: tuple[str, ...]
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class SpanFirst:
    """Lucene SpanFirstQuery over a single-term span OR a SpanOr of
    terms (public semantics, lucene SpanFirstQuery.java +
    SpanScorer): matches docs where the inner span occurs with span
    end <= ``end`` — a single-position span at 0-based position p
    has end p+1, so the match condition is p < end. ``term`` may be
    a plain string (single-term span, the r4 surface) or a tuple of
    strings (SpanFirst over SpanOr: the union of the member spans —
    distinct terms never share a position, so the restricted freq is
    the summed member count of positions < end, saturated ONCE).
    Scored BM25 with idf = SUM of the present members' FULL-df idfs
    (SpanWeight gathers every term's TermStatistics from the span
    tree; BM25Similarity sums idfExplain terms — the same convention
    SpanOr documents; one member degenerates to the single idf).
    Like Synonyms there is no query-string form — Lucene span
    queries are built programmatically."""

    term: str | tuple[str, ...]
    end: int
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class SpanOr:
    """Lucene SpanOrQuery over single-term spans (public semantics,
    lucene SpanOrQuery.java + SpanWeight): the union of the member
    spans. Single-term spans occupy one position each and two terms
    never share a position, so the union's span freq per doc is the
    SUM of member tfs — like SynonymQuery's blend — but the idf
    differs observably: SpanWeight.buildSimWeight passes EVERY
    member's TermStatistics to the similarity, and BM25Similarity
    with multiple term stats SUMS the per-term idfs
    (BM25Similarity.idfExplain(collectionStats, termStats[])), where
    SynonymQuery blends docFreq = max first and takes one idf.
    Members missing from the dictionary contribute nothing (no term
    states). Programmatic only, like every span query."""

    terms: tuple[str, ...]
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class SpanNot:
    """Lucene SpanNotQuery over single-term spans or SpanOr clauses
    (public semantics, lucene SpanNotQuery.java ctor
    ``SpanNotQuery(include, exclude, pre, post)``): matches
    occurrences of ``include`` whose span does not overlap any
    ``exclude`` span, with the forbidden window widened ``pre``
    tokens before and ``post`` tokens after the include span. For
    single-position spans that reduces to: include position p
    survives iff no exclude position q has p - pre <= q <= p + post
    (pre = post = 0 is "not at the same position", useful with
    multi-term fields; the classic use is pre/post windows, e.g.
    "new not within 2 tokens of york"). ``include`` and ``exclude``
    each accept a plain string or a tuple of strings (a SpanOr
    clause: the union of the member spans — distinct terms never
    share a position). freq = the surviving include-occurrence
    count, saturated once; BM25-scored with idf = SUM of the present
    INCLUDE members' FULL-df idfs (the SpanOr convention; the
    exclude side gates matches but never contributes statistics —
    same contract the r4 single-term node documented). Docs where no
    ``exclude`` member occurs keep every occurrence. Programmatic
    only — Lucene span queries have no parser syntax."""

    include: str | tuple[str, ...]
    exclude: str | tuple[str, ...]
    pre: int = 0
    post: int = 0
    field: str = DEFAULT_FIELD
    boost: float = 1.0


def span_member_terms(spec) -> tuple[str, ...]:
    """Normalize a span clause spec — a plain term string, a tuple/
    list of terms, or a SpanOr node — to the member-term tuple."""
    if isinstance(spec, str):
        return (spec,)
    if isinstance(spec, SpanOr):
        return tuple(spec.terms)
    return tuple(spec)


def SpanNear(
    clauses,
    slop: int = 0,
    in_order: bool = True,
    field: str = DEFAULT_FIELD,
    boost: float = 1.0,
) -> "Phrase":
    """Lucene SpanNearQuery over term or SpanOr clauses (public
    semantics, SpanNearQuery.java ctor ``SpanNearQuery(clauses, slop,
    inOrder)``) — the nested span composition Lucene users build
    programmatically: SpanNear(SpanOr(...), term, ...).

    Returns the equivalent Phrase node: each clause becomes a slot —
    a single term stays a string slot, a SpanOr clause (or a plain
    list/tuple of terms) becomes a TUPLE slot any of whose members
    may bind that slot's position. Proximity semantics are exactly
    the Phrase machinery's (in_order=True: nondecreasing q-chain with
    total gap <= slop; in_order=False: Lucene SloppyPhraseScorer
    distinct-position windows). This also gives synonym-in-phrase:
    Phrase(("run", ("fast", "quick"))).

    Scoring: the sum over slots of each member term's
    idf(full df) * tfnorm contribution in the matched doc — per-term
    statistics, the same contract the single-term span nodes
    (SpanFirst/SpanNot) document.

    A SpanOr clause's ``field`` must match the enclosing span's field
    (Lucene requires same-field clauses; SpanNearQuery.java throws
    IllegalArgumentException)."""
    slots = []
    for c in clauses:
        if isinstance(c, str):
            slots.append(c)
        elif isinstance(c, SpanOr):
            if c.field != field:
                raise ValueError(
                    f"SpanNear clauses must share the field: "
                    f"{c.field!r} != {field!r}"
                )
            if len(c.terms) == 1:
                slots.append(c.terms[0])
            else:
                slots.append(tuple(c.terms))
        elif isinstance(c, (tuple, list)):
            if not c or not all(isinstance(t, str) for t in c):
                raise ValueError(
                    "SpanNear tuple clause must be non-empty strings"
                )
            slots.append(c[0] if len(c) == 1 else tuple(c))
        else:
            raise TypeError(
                f"SpanNear clause must be str, SpanOr or tuple: {c!r}"
            )
    if len(slots) < 2:
        raise ValueError("SpanNear needs at least two clauses")
    return Phrase(
        tuple(slots), field=field, boost=boost, slop=slop, in_order=in_order
    )


@dataclass(frozen=True)
class Fuzzy:
    term: str
    max_edits: int = 2
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Range:
    """Lucene classic term range ``field:[a TO b]`` / ``{a TO b}``:
    every dictionary term lexicographically between the endpoints
    matches, scored like any other multi-term expansion (per-term
    BM25 contributions summed). ``None`` endpoint = open side
    (``[a TO *]``). Inclusive brackets ``[]``, exclusive ``{}``,
    mixed allowed (QueryParserBase range grammar — the reference
    hands users the full classic parser, QueryGenerator.cs:217-222)."""

    lo: str | None
    hi: str | None
    lo_inc: bool = True
    hi_inc: bool = True
    field: str = DEFAULT_FIELD
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase:
    # each slot is a literal term, a Wildcard pattern string, or a
    # TUPLE of literal terms (a SpanOr clause inside a SpanNear — any
    # member may bind the slot's position; see the SpanNear factory).
    # Multi-term slots ride the same kernel path as wildcard
    # expansions: per-member posting rows share the slot index and
    # merge in-kernel.
    slots: tuple
    field: str = DEFAULT_FIELD
    boost: float = 1.0
    # proximity slop ("a b"~N), Lucene SloppyPhraseScorer semantics
    # (the classic-parser surface QueryGenerator.cs:217-222 exposes):
    # a match is an assignment of slots to DISTINCT positions whose
    # normalized span max(pos-slot) - min(pos-slot) <= slop, so
    # out-of-order occurrences match once slop covers the reorder
    # cost (a swap of two adjacent terms costs 2). slop=0 is exact
    # in-order adjacency.
    slop: int = 0
    # in_order=True restores the SpanNearQuery(inOrder=true) variant:
    # slots must match in order with at most `slop` total skipped
    # positions. Not reachable from the classic parser syntax —
    # construct the node directly.
    in_order: bool = False


@dataclass(frozen=True)
class DisMax:
    """Lucene DisjunctionMaxQuery (public semantics,
    DisjunctionMaxQuery.java): matches the union of the children;
    score = max(child scores) + tie_breaker * (sum of the OTHER
    matching children's scores), 0 <= tie_breaker <= 1. tie=0 is the
    pure max (the classic "don't double-count a term that appears in
    several fields" query); tie=1 degenerates to Or. No boost field:
    dismax is linear in the child scores, so a boost distributes into
    the children exactly (apply_boost does that) — which also keeps
    the WAND block bound sound: max + tie*rest <= sum(children) <=
    the summed per-row bound. Built programmatically, like Lucene."""

    children: tuple[Node, ...]
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class ConstantScore:
    """Lucene ConstantScoreQuery (public semantics,
    ConstantScoreQuery.java): every doc matching ``child`` scores
    exactly ``boost``, regardless of tf/idf — the query-as-filter
    wrapper (Lucene uses it for FILTER clauses and as
    MultiTermQuery's CONSTANT_SCORE rewrite). Composes anywhere a
    query can. WAND note: a constant boost is NOT bounded by the
    BM25 block maxima, so search_wand falls back to exact scoring
    when the tree contains one. Built programmatically."""

    child: Node
    boost: float = 1.0


@dataclass(frozen=True)
class And:
    children: tuple[Node, ...]


@dataclass(frozen=True)
class Or:
    children: tuple[Node, ...]


@dataclass(frozen=True)
class Not:
    positive: Node
    negative: Node


@dataclass(frozen=True)
class Bool:
    """Lucene classic ``+``/``-`` clause semantics (BooleanClause
    MUST / SHOULD / MUST_NOT — ``+a b -c`` parses to MUST a, SHOULD
    b, MUST_NOT c via QueryParserBase, reachable because the
    reference hands users the whole classic parser,
    QueryGenerator.cs:217-222).

    Matching set: docs containing every ``must`` clause (or, when
    ``must`` is empty, at least one ``should`` clause), minus docs
    matching any ``must_not``. Score: sum of the scores of every
    MATCHING positive clause — a should clause a doc happens to match
    adds its score, one it doesn't match costs nothing. The parser
    only emits this node for the irreducible mixed case (must AND
    should both non-empty, or no positives at all — a match-nothing
    query, Lucene's pure-negative BooleanQuery); every other sign
    combination rewrites to And/Or/Not.

    ``min_should_match`` carries Lucene's
    ``BooleanQuery.Builder.setMinimumNumberShouldMatch(n)`` (public
    semantics, BooleanQuery.java / MinShouldMatchSumScorer): a doc
    matches only if it satisfies at least ``n`` SHOULD clauses (in
    addition to every MUST clause); scoring is unchanged — the sum of
    every matching positive clause. Programmatic only, like Lucene
    (no classic-parser syntax sets it). ``n <= 0`` means the default
    optional-SHOULD behaviour; ``n > len(should)`` matches nothing,
    mirroring Lucene's unsatisfiable-scorer case.

    ``filter`` carries Lucene's ``BooleanClause.Occur.FILTER``
    (public semantics, BooleanQuery.java): like MUST for MATCHING —
    every filter clause must match — but contributing ZERO score
    (Lucene's query-as-filter clause; IndexSearcher wraps filters so
    they are never scored). A Bool with only filter clauses matches
    every doc satisfying them all, each scoring 0.0 — exactly
    Lucene's behaviour for a FILTER-only BooleanQuery. Programmatic
    only (the classic parser has no FILTER syntax)."""

    must: tuple[Node, ...] = ()
    should: tuple[Node, ...] = ()
    must_not: tuple[Node, ...] = ()
    min_should_match: int = 0
    filter: tuple[Node, ...] = ()


class QueryParseError(ValueError):
    pass


def apply_boost(node: Node, factor: float) -> Node:
    """Fold a score boost onto the leaves. Every combinator scores by
    summing its children (And/Or sum, Not filters), so boost
    distributes — a group boost ``(a b)^2`` rewrites to per-leaf
    boosts and no structural Boost node is needed. Keeping boost on
    the leaf also keeps the planner's WAND upper bounds sound: the
    bound is computed from per-leaf idf, which carries the boost."""
    from dataclasses import replace

    if isinstance(
        node,
        (Term, Wildcard, Regexp, Fuzzy, Range, Phrase, Synonyms,
         SpanFirst, SpanOr, SpanNot),
    ):
        return replace(node, boost=node.boost * factor)
    if isinstance(node, And):
        return And(tuple(apply_boost(c, factor) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(apply_boost(c, factor) for c in node.children))
    if isinstance(node, DisMax):
        # dismax is linear in child scores: boost*(max + tie*rest)
        # == dismax over boosted children
        return DisMax(
            tuple(apply_boost(c, factor) for c in node.children),
            node.tie_breaker,
        )
    if isinstance(node, ConstantScore):
        # the constant IS the score: scale it, leave the child alone
        return ConstantScore(node.child, node.boost * factor)
    if isinstance(node, Not):
        # the negative side only filters docs out; its scores are
        # never summed, so boosting it would change nothing
        return Not(apply_boost(node.positive, factor), node.negative)
    if isinstance(node, Bool):
        # must_not only filters and filter clauses never score, so
        # neither is boosted; min_should_match is matching semantics,
        # carried through unchanged
        return Bool(
            tuple(apply_boost(c, factor) for c in node.must),
            tuple(apply_boost(c, factor) for c in node.should),
            node.must_not,
            node.min_should_match,
            node.filter,
        )
    raise TypeError(node)


def _is_wildcard(tok: str) -> bool:
    return "*" in tok or "?" in tok


def _check_leading_wildcard(tok: str) -> None:
    if tok.startswith("*") or tok.startswith("?"):
        raise QueryParseError(
            f"leading wildcard is not supported: {tok!r}"
        )


def _split_unescaped(word: str) -> list[tuple[str, bool]]:
    """(char, escaped) pairs — Lucene classic ``\\`` escaping: an
    escaped char is always literal (never an operator)."""
    out: list[tuple[str, bool]] = []
    i = 0
    while i < len(word):
        if word[i] == "\\" and i + 1 < len(word):
            out.append((word[i + 1], True))
            i += 2
        else:
            out.append((word[i], False))
            i += 1
    return out


_MAX_FUZZY_EDITS = 2  # Lucene FuzzyQuery.MAXIMUM_SUPPORTED_DISTANCE


def _fuzzy_edits(suffix: str, term: str, word: str) -> int:
    """Lucene classic fuzzy-slop semantics — the exact code path the
    reference delegates to (QueryParserBase.HandleBareFuzzy +
    FuzzyQuery.FloatToEdits, via QueryGenerator.cs:217-222): bare
    ``~`` = 2 edits; a value >= 1 must be integral and clamps to the
    2-edit maximum (``~3`` means 2, not an error); ``0 < s < 1`` is a
    legacy minimum-similarity that converts to edits by term length
    (``abcde~0.8`` -> int(0.2 * 5) = 1); negative / nan rejected."""
    if suffix == "":
        return _MAX_FUZZY_EDITS
    try:
        s = float(suffix)
    except ValueError as e:
        raise QueryParseError(f"bad fuzzy suffix in {word!r}") from e
    if not (0 <= s < float("inf")):  # also rejects nan
        raise QueryParseError(
            f"fuzzy value must be 0..1 (similarity) or an integer "
            f"edit distance: {word!r}"
        )
    if s >= 1:
        if s != int(s):
            raise QueryParseError(
                f"fractional edit distances are not allowed: {word!r}"
            )
        return min(int(s), _MAX_FUZZY_EDITS)
    if s == 0:
        return 0
    return min(int((1.0 - s) * len(term)), _MAX_FUZZY_EDITS)


def _find_unescaped_slash(text: str, start: int) -> int | None:
    """Index of the first unescaped ``/`` at or after ``start`` —
    THE definition of where a regexp body ends, shared by the lexer
    (token boundary) and _regexp_leaf (body extraction) so the two
    can never disagree."""
    j, n = start, len(text)
    while j < n:
        if text[j] == "\\" and j + 1 < n:
            j += 2
            continue
        if text[j] == "/":
            return j
        j += 1
    return None


def _regexp_leaf(word: str, fld: str) -> Node:
    """``/pattern/`` (optional ``^boost``): forward-slash term regexp
    from the classic parser grammar. The body keeps backslash escapes
    verbatim for the regex engine, except ``\\/`` which decodes to a
    literal slash (the one escape the DELIMITER needs). The pattern
    must compile (checked with Python re — a conservative subset of
    Java regex; exotic Java-only constructs are rejected loudly
    rather than silently diverging between planner and oracle)."""
    body_end = _find_unescaped_slash(word, 1)
    if body_end is None:
        raise QueryParseError(f"unterminated regexp {word!r}")
    if body_end == 1:
        raise QueryParseError(f"empty regexp {word!r}")
    pat = word[1:body_end].replace("\\/", "/")
    suffix = word[body_end + 1 :]
    boost = 1.0
    if suffix:
        if not suffix.startswith("^"):
            raise QueryParseError(
                f"trailing characters after regexp: {word!r}"
            )
        try:
            boost = float(suffix[1:])
        except ValueError as e:
            raise QueryParseError(f"bad boost suffix in {word!r}") from e
        if not (0 < boost < float("inf")):
            raise QueryParseError(f"bad boost in {word!r}")
    from codeindex_spark.query.luceneregex import (
        compile_lucene_regexp,
        uses_extended_ops,
    )

    if uses_extended_ops(pat):
        # Lucene RegexpQuery extended operators (~ & @ # "..") —
        # validated by the automaton compiler that will also serve
        # the query (luceneregex.py); Java/Python regex never sees
        # these patterns
        try:
            compile_lucene_regexp(pat)
        except ValueError as e:
            raise QueryParseError(f"bad regexp {pat!r}: {e}") from e
    else:
        try:
            re.compile(pat)
        except re.error as e:
            raise QueryParseError(f"bad regexp {pat!r}: {e}") from e
    return Regexp(pat, fld, boost)


def _leaf(word: str, fld: str, lowercase: bool) -> Node:
    if word.startswith("/"):
        return _regexp_leaf(word, fld)
    chars = _split_unescaped(word)

    def find_op(op: str, from_right: bool = False):
        rng = range(len(chars) - 1, -1, -1) if from_right else range(len(chars))
        for i in rng:
            if chars[i][0] == op and not chars[i][1]:
                return i
        return None

    boost = 1.0
    bi = find_op("^", from_right=True)
    if bi is not None:  # term^2 / stri*^1.5 / strng~1^3 (boost is last)
        bsuf = "".join(c for c, _ in chars[bi + 1 :])
        try:
            boost = float(bsuf)
        except ValueError as e:
            raise QueryParseError(f"bad boost suffix in {word!r}") from e
        # not(boost > 0) also catches NaN, which float() accepts but
        # which would silently poison every score and WAND bound
        if not (0 < boost < float("inf")) or bi == 0:
            raise QueryParseError(f"bad boost in {word!r}")
        chars = chars[:bi]
    fuzzy_raw: str | None = None
    fi = find_op("~")
    if fi is not None:
        fuzzy_raw = "".join(c for c, _ in chars[fi + 1 :])
        chars = chars[:fi]
    wild = any(c in "*?" and not esc for c, esc in chars)
    has_escaped_wild = any(c in "*?" and esc for c, esc in chars)
    term = "".join(c for c, _ in chars)
    if lowercase:
        term = term.lower()
    if not term:
        raise QueryParseError("empty term")
    if fuzzy_raw is not None:
        if wild:
            raise QueryParseError("fuzzy and wildcard cannot combine")
        return Fuzzy(term, _fuzzy_edits(fuzzy_raw, term, word), fld, boost)
    if wild:
        if has_escaped_wild:
            # a pattern mixing operator and literal */? would need
            # escape-aware expansion — refuse loudly over mis-matching
            raise QueryParseError(
                f"escaped wildcard chars inside a wildcard pattern are "
                f"not supported: {word!r}"
            )
        if term.startswith("*") or term.startswith("?"):
            raise QueryParseError(
                f"leading wildcard is not supported: {term!r}"
            )
        return Wildcard(term, fld, boost)
    return Term(term, fld, boost)


def _phrase(text: str, fld: str, lowercase: bool) -> Node:
    # whitespace-split slots; wildcard allowed mid/end, never leading
    # (QueryGenerator.cs:154-158). Backslash escapes unescape the
    # same way as bare terms, EXCEPT escaped wildcard chars: a slot
    # string cannot carry per-char literalness downstream, so a
    # literal-*/? slot is refused loudly instead of silently
    # re-detected as a wildcard pattern by the planner.
    slots = []
    for w in text.split():
        if not w:
            continue
        chars = _split_unescaped(w)
        if any(c in "*?" and esc for c, esc in chars):
            raise QueryParseError(
                f"escaped wildcard chars are not supported inside "
                f"phrase slots: {w!r}"
            )
        s = "".join(c for c, _ in chars)
        if lowercase:
            s = s.lower()
        if _is_wildcard(s):
            _check_leading_wildcard(s)
        slots.append(s)
    if not slots:
        raise QueryParseError("empty phrase")
    if len(slots) == 1 and not _is_wildcard(slots[0]):
        return Term(slots[0], fld)
    return Phrase(tuple(slots), fld)


def _one_or(nodes) -> Node:
    return nodes[0] if len(nodes) == 1 else Or(tuple(nodes))


def _bool_node(must, should, must_not) -> Node:
    """Normalize a +/- clause list to the smallest equivalent tree:
    only the irreducible cases (must AND should together; no
    positives at all) need the Bool node — everything else is plain
    And/Or/Not, which keeps the hot kernels on their existing paths."""
    if must and should:
        return Bool(tuple(must), tuple(should), tuple(must_not))
    if not must and not should:
        return Bool((), (), tuple(must_not))  # matches nothing
    pos = (
        (must[0] if len(must) == 1 else And(tuple(must)))
        if must
        else _one_or(should)
    )
    if must_not:
        return Not(pos, _one_or(must_not))
    return pos


class _Parser:
    """Recursive descent over a token stream. Default operator is OR
    (Lucene classic default)."""

    def __init__(self, text: str, field_default: str, lowercase: bool):
        self.toks = self._lex(text)
        self.i = 0
        self.field_default = field_default
        # the session's content field ('content' or the cased twin) —
        # field_default temporarily changes inside Field:(...) groups,
        # but a nested 'content:' prefix must still route to the
        # session's content field, not the group's
        self.content_field = field_default
        self.lowercase = lowercase

    @staticmethod
    def _regex_end(text: str, j: int, n: int) -> int:
        """``text[j]`` is the opening ``/`` of a regexp token: return
        the index just past the token. The body runs to the closing
        unescaped ``/`` — parens, quotes, and spaces inside are
        pattern content, not query syntax (same as Lucene's grammar,
        where the slashes delimit) — then the ``^boost`` suffix runs
        to the next delimiter. An unclosed regexp swallows the rest
        of the input and _regexp_leaf raises 'unterminated'."""
        close = _find_unescaped_slash(text, j + 1)
        j = n if close is None else close + 1
        while j < n and not text[j].isspace() and text[j] not in '()"':
            j += 1
        return j

    def _lex(self, text: str) -> list[str]:
        toks, i, n = [], 0, len(text)
        while i < n:
            c = text[i]
            if c.isspace():
                i += 1
            elif c in "()":
                toks.append(c)
                i += 1
            elif c == '"':
                j = text.find('"', i + 1)
                if j < 0:
                    raise QueryParseError("unterminated quote")
                toks.append(text[i : j + 1])
                i = j + 1
            elif c == "/":
                j = self._regex_end(text, i, n)
                toks.append(text[i:j])
                i = j
            else:
                j = i
                after_colon = False  # previous char was an UNESCAPED ':'
                while j < n and not text[j].isspace() and text[j] not in '()"':
                    if text[j] == "\\" and j + 1 < n:
                        j += 2  # escaped char stays inside the token
                        after_colon = False
                        continue
                    if text[j] == "/" and after_colon:
                        # field-qualified regexp Content:/re/ — the
                        # slash after an unescaped colon opens a
                        # regex body (an ESCAPED colon is term
                        # content, so foo\:/bar stays a plain term)
                        j = self._regex_end(text, j, n)
                        break
                    after_colon = text[j] == ":"
                    j += 1
                toks.append(text[i:j])
                i = j
        return toks

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise QueryParseError("unexpected end of query")
        self.i += 1
        return t

    def parse(self) -> Node:
        node = self.or_expr()
        if self.peek() is not None:
            raise QueryParseError(f"unexpected token {self.peek()!r}")
        return node

    def or_expr(self) -> Node:
        parts = [self.signed_and_expr()]
        while True:
            t = self.peek()
            if t is not None and t.upper() in ("OR", "||"):
                self.next()
                parts.append(self.signed_and_expr())
            elif t is not None and t not in (")",) and t.upper() not in (
                "AND", "&&", "NOT",
            ):
                # implicit operator = OR (Lucene classic default)
                parts.append(self.signed_and_expr())
            else:
                break
        if all(sign is None for sign, _ in parts):
            nodes = [n for _, n in parts]
            return nodes[0] if len(nodes) == 1 else Or(tuple(nodes))
        # Lucene classic +/- clause list (QueryParserBase): '+' =
        # MUST, '-' = MUST_NOT, unsigned = SHOULD
        return _bool_node(
            tuple(n for s, n in parts if s == "+"),
            tuple(n for s, n in parts if s is None),
            tuple(n for s, n in parts if s == "-"),
        )

    def signed_and_expr(self) -> tuple[str | None, Node]:
        """One OR-level clause: an AND/NOT chain whose members may
        carry ``+``/``-`` signs. A single-member chain propagates its
        sign up to the OR clause list; a multi-member chain resolves
        signs internally ('+' is redundant under AND, '-' members
        become the NOT filter)."""
        chain = [self.signed_unary()]
        while True:
            t = self.peek()
            if t is not None and t.upper() in ("AND", "&&"):
                self.next()
                nxt = self.peek()
                if nxt is not None and nxt.upper() == "NOT":
                    # 'a AND NOT b' — classic-parser compound: the
                    # clause after NOT is prohibited
                    self.next()
                    s2, n2 = self.signed_unary()
                    if s2 == "+":
                        raise QueryParseError(
                            "cannot combine NOT with a '+' clause"
                        )
                    chain.append(("-", n2))
                else:
                    chain.append(self.signed_unary())
            elif t is not None and t.upper() == "NOT":
                self.next()
                s2, n2 = self.signed_unary()
                if s2 == "+":
                    raise QueryParseError(
                        "cannot combine NOT with a '+' clause"
                    )
                chain.append(("-", n2))
            else:
                break
        if len(chain) == 1:
            return chain[0]
        positives = [n for s, n in chain if s != "-"]
        negatives = [n for s, n in chain if s == "-"]
        if not positives:
            # 'AND' of only prohibited clauses — surface as one
            # prohibited clause (docs matching ANY of them are out;
            # alone at top level this matches nothing, like Lucene)
            return ("-", _one_or(negatives))
        node = positives[0] if len(positives) == 1 else And(tuple(positives))
        if negatives:
            node = Not(node, _one_or(negatives))
        return (None, node)

    def signed_unary(self) -> tuple[str | None, Node]:
        """Optional Lucene ``+``/``-`` clause prefix, then an atom.
        The sign is usually glued to its clause token (``+spark``,
        ``-filename:x``); before a group or quoted phrase the lexer
        emits it bare (``- ( a b )`` tokens)."""
        t = self.peek()
        sign: str | None = None
        if t is not None and t != "" and t[0] in "+-":
            if len(t) > 1:
                sign = t[0]
                self.toks[self.i] = t[1:]
            else:
                if self.i + 1 >= len(self.toks):
                    raise QueryParseError(
                        f"{t!r} must be followed by a clause"
                    )
                sign = t
                self.next()
        return sign, self.atom()

    _SUFFIX_RE = re.compile(r"^(?:~(\d+))?(?:\^(\d+(?:\.\d+)?))?$")

    def _consume_suffix(self, allow_slop: bool) -> tuple[int, float]:
        """Optional ``~N`` (slop) and/or ``^F`` (boost) token right
        after a quoted phrase or closed group — the lexer emits it as
        a separate token because the quote/paren ended the previous
        one. Unrecognized ~/^ tokens are left in place (they fail
        later with the normal term errors)."""
        t = self.peek()
        if t is None or not (t.startswith("~") or t.startswith("^")):
            return 0, 1.0
        m = self._SUFFIX_RE.match(t)
        if not m or (m.group(1) is None and m.group(2) is None):
            return 0, 1.0
        slop = int(m.group(1)) if m.group(1) else 0
        boost = float(m.group(2)) if m.group(2) else 1.0
        if slop and not allow_slop:
            raise QueryParseError(
                "proximity slop (~N) applies only to quoted phrases"
            )
        if m.group(2) is not None and boost <= 0:
            raise QueryParseError(f"bad boost in {t!r}")
        self.next()
        return slop, boost

    def _phrase_with_suffix(self, text: str, fld: str) -> Node:
        from dataclasses import replace

        node = _phrase(text, fld, self._lower_for(fld))
        slop, boost = self._consume_suffix(allow_slop=True)
        if slop and isinstance(node, Phrase):
            node = replace(node, slop=slop)
        if boost != 1.0:
            node = apply_boost(node, boost)
        return node

    _RANGE_RE = re.compile(
        r"^([\[{])(.+?) TO (.+?)([\]}])(?:\^(\S+))?$"
    )
    _RANGE_END_RE = re.compile(r"(\\*)([\]}])(\^\S*)?$")

    @classmethod
    def _closes_range(cls, tok: str) -> bool:
        """True when the token ends with an UNESCAPED ``]``/``}``
        (modulo an optional ``^boost`` suffix). An even run of
        backslashes before the bracket means the bracket itself is
        literal syntax; an odd run escapes it into the endpoint."""
        m = cls._RANGE_END_RE.search(tok)
        return m is not None and len(m.group(1)) % 2 == 0

    def _range_tail(self, first: str, fld: str) -> Node:
        """``[a TO b]`` / ``{a TO b}`` term range. The lexer splits on
        whitespace, so the range arrives as >= 3 tokens (``[a``,
        ``TO``, ``b]``) that are re-joined here; an optional ``^F``
        boost rides the closing token. ``*`` endpoint = open side.
        Endpoints are plain terms: backslash escapes decode, all
        chars are literal (no wildcard operators inside ranges), and
        they lowercase with the field's analyzer like every other
        leaf."""
        parts = [first]
        while not self._closes_range(parts[-1]):
            nxt = self.peek()
            if nxt is None or nxt in ("(", ")") or nxt.startswith('"'):
                raise QueryParseError(
                    f"unterminated range query {' '.join(parts)!r} "
                    "(expected [a TO b])"
                )
            parts.append(self.next())
        raw = " ".join(parts)
        m = self._RANGE_RE.match(raw)
        if not m:
            raise QueryParseError(
                f"bad range syntax {raw!r} (expected [a TO b], "
                "{a TO b}, open sides via *)"
            )
        lo_raw, hi_raw = m.group(2), m.group(3)
        if " " in lo_raw or " " in hi_raw:
            raise QueryParseError(
                f"range endpoints must be single terms: {raw!r}"
            )
        boost = 1.0
        if m.group(5) is not None:
            try:
                boost = float(m.group(5))
            except ValueError as e:
                raise QueryParseError(f"bad boost suffix in {raw!r}") from e
            if not (0 < boost < float("inf")):
                raise QueryParseError(f"bad boost in {raw!r}")

        def endpoint(s: str) -> str | None:
            if s == "*":
                return None
            term = "".join(c for c, _ in _split_unescaped(s))
            return term.lower() if self._lower_for(fld) else term

        lo, hi = endpoint(lo_raw), endpoint(hi_raw)
        if lo is None and hi is None:
            raise QueryParseError(
                "[* TO *] matches every term — use a match-all scan "
                "instead of an unbounded range"
            )
        return Range(
            lo, hi, m.group(1) == "[", m.group(4) == "]", fld, boost
        )

    def atom(self) -> Node:
        t = self.next()
        if t == "(":
            node = self.or_expr()
            if self.next() != ")":
                raise QueryParseError("expected ')'")
            _, boost = self._consume_suffix(allow_slop=False)
            return apply_boost(node, boost) if boost != 1.0 else node
        if t and t[0] in "[{":
            return self._range_tail(t, self.field_default)
        fld = self.field_default
        if ":" in t and not t.startswith('"'):
            prefix, _, rest = t.partition(":")
            alias = FIELD_ALIASES.get(prefix.lower())
            if alias is not None:
                # "content" routes to the mode's content field (cased
                # twin in case-sensitive mode); other fields are as-is
                fld = self.content_field if alias == "content" else alias
                t = rest
                if t == "" and self.peek() == "(":
                    # field-scoped group Field:(a OR b) — classic
                    # QueryParser grouping with a field override
                    self.next()
                    saved = self.field_default
                    self.field_default = fld
                    try:
                        node = self.or_expr()
                    finally:
                        self.field_default = saved
                    if self.next() != ")":
                        raise QueryParseError("expected ')'")
                    _, boost = self._consume_suffix(allow_slop=False)
                    return apply_boost(node, boost) if boost != 1.0 else node
                if t and t[0] in "[{":  # FileName:[a TO b]
                    return self._range_tail(t, fld)
                if t == "" and (self.peek() or "").startswith('"'):
                    t = self.next()  # Field:"quoted phrase" splits in lexer
                if t.startswith('"'):
                    if not t.endswith('"') or len(t) < 2:
                        raise QueryParseError(f"bad quoted field value {t!r}")
                    return self._phrase_with_suffix(t[1:-1], fld)
        if t.startswith('"') and t.endswith('"') and len(t) >= 2:
            return self._phrase_with_suffix(t[1:-1], fld)
        if not t:
            raise QueryParseError("empty token")
        return _leaf(t, fld, self._lower_for(fld))

    def _lower_for(self, fld: str) -> bool:
        # content_cs keeps case; every other field is lowercased at
        # index time (CodeAnalyzer.cs:34-48)
        return fld != "content_cs"


def parse_query(
    text: str, case_sensitive: bool = False, default_field: str | None = None
) -> Node:
    """Parse a user query string.

    case_sensitive routes the default content field to the cased twin
    (reference: IndexMaintainerWrapper.cs:38-45 selects the
    non-lowercasing parser + ContentCaseSensitive field).
    """
    fld = default_field or ("content_cs" if case_sensitive else "content")
    if not text or not text.strip():
        raise QueryParseError("empty query")
    return _Parser(text, fld, lowercase=not case_sensitive).parse()


def parse_phrase_query(
    text: str, case_sensitive: bool = False
) -> Node:
    """Phrase mode (reference PhaseQuery=true): the whole input is one
    exact-order phrase, wildcards allowed per-slot
    (QueryGenerator.AddPhaseQuery, QueryGenerator.cs:107-213)."""
    fld = "content_cs" if case_sensitive else "content"
    return _phrase(text, fld, lowercase=not case_sensitive)


def expand_synonyms(node: Node, synonyms: dict[str, tuple[str, ...]]) -> Node:
    """Query-time synonym expansion (the public behavior of Lucene's
    SynonymGraphFilter applied at query time by QueryBuilder): every
    Term whose text has an entry in ``synonyms`` is rewritten to a
    SynonymQuery over {term} | synonyms[term], preserving field and
    boost — which gives the Lucene blend (summed tf, max df), NOT an
    OR. Other leaves (wildcard, fuzzy, phrase slots, ranges) are left
    alone, exactly as Lucene's query-time analysis leaves multi-term
    expansions alone. The mapping is directional: apply it to a
    symmetric thesaurus by listing each member's full group."""
    from dataclasses import replace as _replace

    def walk(n: Node) -> Node:
        if isinstance(n, Term):
            group = synonyms.get(n.term)
            if not group:
                return n
            members = (n.term, *[t for t in group if t != n.term])
            return Synonyms(members, field=n.field, boost=n.boost)
        if isinstance(n, (And, Or)):
            return _replace(n, children=tuple(walk(c) for c in n.children))
        if isinstance(n, DisMax):
            return DisMax(tuple(walk(c) for c in n.children), n.tie_breaker)
        if isinstance(n, ConstantScore):
            return ConstantScore(walk(n.child), n.boost)
        if isinstance(n, Not):
            return Not(walk(n.positive), walk(n.negative))
        if isinstance(n, Bool):
            return Bool(
                tuple(walk(c) for c in n.must),
                tuple(walk(c) for c in n.should),
                tuple(walk(c) for c in n.must_not),
                n.min_should_match,
                tuple(walk(c) for c in n.filter),
            )
        return n

    return walk(node)


def collect_leaves(node: Node) -> list[Node]:
    if isinstance(
        node,
        (Term, Wildcard, Regexp, Fuzzy, Range, Phrase, Synonyms,
         SpanFirst, SpanOr, SpanNot),
    ):
        return [node]
    if isinstance(node, (And, Or, DisMax)):
        out = []
        for c in node.children:
            out.extend(collect_leaves(c))
        return out
    if isinstance(node, ConstantScore):
        return collect_leaves(node.child)
    if isinstance(node, Not):
        return collect_leaves(node.positive) + collect_leaves(node.negative)
    if isinstance(node, Bool):
        out = []
        for c in node.must + node.should + node.must_not + node.filter:
            out.extend(collect_leaves(c))
        return out
    raise TypeError(f"unknown node {node!r}")


# ------------------------------------------------- Lucene regexp intervals

_INTERVAL_RE = re.compile(r"<(\d+)-(\d+)>")


def _digit_span(a: str, b: str) -> str:
    if a == b:
        return a
    return f"[{a}-{b}]"


def _num_ge(t: str) -> list[str]:
    """Alternatives for fixed-length digit strings >= t."""
    if not t:
        return [""]
    d, rest = t[0], len(t) - 1
    out = [d + tail for tail in _num_ge(t[1:])]
    if d < "9":
        out.append(_digit_span(chr(ord(d) + 1), "9") + "[0-9]" * rest)
    return out


def _num_le(t: str) -> list[str]:
    """Alternatives for fixed-length digit strings <= t."""
    if not t:
        return [""]
    d, rest = t[0], len(t) - 1
    out = [d + tail for tail in _num_le(t[1:])]
    if d > "0":
        out.append(_digit_span("0", chr(ord(d) - 1)) + "[0-9]" * rest)
    return out


def _num_between(lo: str, hi: str) -> list[str]:
    """Alternatives for fixed-length digit strings in [lo, hi]
    (lo and hi have the same length, lo <= hi)."""
    if not lo:
        return [""]
    a, b = lo[0], hi[0]
    if a == b:
        return [a + tail for tail in _num_between(lo[1:], hi[1:])]
    rest = len(lo) - 1
    out = [a + tail for tail in _num_ge(lo[1:])]
    if ord(b) - ord(a) >= 2:
        out.append(
            _digit_span(chr(ord(a) + 1), chr(ord(b) - 1)) + "[0-9]" * rest
        )
    out.extend(b + tail for tail in _num_le(hi[1:]))
    return out


def interval_regex(smin: str, smax: str) -> str:
    """Plain-regex equivalent of Lucene's ``<min-max>`` numeric
    interval operator (RegExp.java INTERVAL syntax; the automaton is
    Automata.makeDecimalInterval). Semantics reproduced exactly:

    - min > max raises (as Lucene's parser does);
    - when the two bound strings have the SAME length, that length is
      fixed: candidates are exactly that many digits, zero-padded
      (``<01-10>`` matches "01".."10" and nothing else);
    - otherwise the digit count is free and any number of leading
      zeros is accepted (``<1-100>`` matches "007").
    """
    lo, hi = int(smin), int(smax)
    if lo > hi:
        raise ValueError(f"invalid interval <{smin}-{smax}>: min > max")
    if len(smin) == len(smax):
        alts = _num_between(smin, smax)
        return "(?:" + "|".join(alts) + ")"
    parts: list[str] = []
    for ln in range(len(str(lo)), len(str(hi)) + 1):
        blo = max(lo, 10 ** (ln - 1) if ln > 1 else 0)
        bhi = min(hi, 10**ln - 1)
        if blo > bhi:
            continue
        parts.extend(_num_between(str(blo).zfill(ln), str(bhi).zfill(ln)))
    return "0*(?:" + "|".join(parts) + ")"


def expand_lucene_intervals(pattern: str) -> str:
    """Rewrite Lucene RegexpQuery ``<m-n>`` numeric-interval operators
    inside ``pattern`` to plain-regex groups; everything else passes
    through untouched. A ``\\<`` stays literal, and ``<`` inside a
    character class ``[...]`` stays literal too (Lucene's parser does
    not recognize the interval operator there, and injecting a group
    would change the class's membership). Dictionary terms never
    contain '<', so a literal interval-looking run could only ever
    match nothing anyway."""
    out = []
    i = 0
    in_class = False
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(pattern[i : i + 2])
            i += 2
            continue
        if c == "[" and not in_class:
            in_class = True
        elif c == "]" and in_class:
            in_class = False
        elif c == "<" and not in_class:
            m = _INTERVAL_RE.match(pattern, i)
            if m:
                out.append(interval_regex(m.group(1), m.group(2)))
                i = m.end()
                continue
        out.append(c)
        i += 1
    return "".join(out)
