"""Lucene RegexpQuery syntax compiled from scratch to a DFA —
including the three operators Java regex has no equivalent for:
``~`` (complement), ``&`` (intersection) and ``@`` (any string).

Reference parity: the classic parser the reference exposes hands
``/pattern/`` bodies to Lucene's RegexpQuery wholesale
(/root/reference/src/CodeIndex.MaintainIndex/QueryGenerator.cs:217-222),
whose syntax is org.apache.lucene.util.automaton.RegExp with ALL
optional operators enabled. Plain patterns are served by the JVM
``rlike`` fast path in the planner (documented Java-regex semantics);
patterns that USE an extended operator route here instead, so their
semantics are Lucene's automaton semantics exactly.

Grammar (RegExp.java class javadoc, operators-as-documented):

    unionexp   ::= interexp ( '|' unionexp )?
    interexp   ::= concatexp ( '&' interexp )?          INTERSECTION
    concatexp  ::= repeatexp concatexp?
    repeatexp  ::= repeatexp ('?'|'*'|'+'|{n}|{n,}|{n,m}) | complexp
    complexp   ::= '~' complexp | charclassexp          COMPLEMENT
    charclassexp ::= '[' ['^'] ranges ']' | simpleexp
    simpleexp  ::= charexp | '.' | '#' | '@' | '"' str '"'
                 | '(' ')' | '(' unionexp ')' | '<' n '-' m '>'
    charexp    ::= any char | '\\' any char             (\\c == c!)

Note the escape rule: in Lucene RegExp a backslash makes the next
character LITERAL — there are no \\d/\\w/\\s classes. ``#`` is the
empty language (matches nothing), ``()`` the empty string, ``@`` any
string, ``.`` any single character. ``<m-n>`` is the numeric interval
(Automata.makeDecimalInterval), reused from ast.interval_regex.

Compilation pipeline — all standard constructions, written here from
first principles (Thompson 1968 NFA; Rabin–Scott subset
determinization; Moore partition-refinement minimization):

    parse -> AST -> Thompson NFA over an ATOMIZED alphabet ->
    complete DFA -> minimized DFA

Complement and intersection are automaton operations, exactly as
Lucene does them: ``~e`` determinizes the sub-NFA, completes it and
flips accepting states; ``e1&e2`` is De Morgan over complements.
The alphabet is atomized first (every codepoint range mentioned
anywhere in the pattern splits [0, 0x10FFFF] into disjoint atoms),
so completion and complementation are finite-table operations no
matter what Unicode the pattern names.

Scale shape: the compiled matcher is a (n_states x n_atoms) int32
numpy table plus a sorted atom-boundary array — a few KB that
broadcasts inside a mapInPandas closure. ``match_many`` evaluates a
whole Arrow batch in lockstep: one utf-32 decode of the joined batch
(vectorized codepoints), one searchsorted for all atom ids, then
max-term-length table-gather steps. No per-row Python in the hot
loop; the term dictionary never collects to the driver unfiltered.
"""

from __future__ import annotations

from bisect import bisect_right

import numpy as np

__all__ = [
    "LuceneRegexMatcher",
    "compile_lucene_regexp",
    "uses_extended_ops",
]

_MAX_CP = 0x10FFFF
_POSTFIX = "?*+{"


def uses_extended_ops(pattern: str) -> bool:
    """True when ``pattern`` uses a RegexpQuery operator Java regex
    cannot express (or treats differently): ``~`` ``&`` ``@`` ``#``
    or a quoted-literal ``"..."`` — unescaped and outside ``[...]``.
    These route to the automaton engine; everything else keeps the
    planner's JVM rlike fast path."""
    i, n, in_class = 0, len(pattern), False
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c in '~&@#"':
            return True
        i += 1
    return False


# ----------------------------------------------------------- parser


class _Parser:
    """Recursive-descent parser for the grammar above. AST nodes are
    plain tuples: ('class', [(lo,hi),...]) ('concat', a, b)
    ('union', a, b) ('inter', a, b) ('comp', a)
    ('repeat', a, min, max|None) ('empty',) ('nothing',)."""

    def __init__(self, pattern: str):
        self.s = pattern
        self.i = 0

    def err(self, msg: str) -> ValueError:
        return ValueError(
            f"bad Lucene regexp {self.s!r} at position {self.i}: {msg}"
        )

    def peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def take(self) -> str:
        c = self.peek()
        if not c:
            raise self.err("unexpected end of pattern")
        self.i += 1
        return c

    def parse(self):
        node = self.union()
        if self.i != len(self.s):
            raise self.err(f"unexpected {self.peek()!r}")
        return node

    def union(self):
        node = self.inter()
        if self.peek() == "|":
            self.take()
            return ("union", node, self.union())
        return node

    def inter(self):
        node = self.concat()
        if self.peek() == "&":
            self.take()
            return ("inter", node, self.inter())
        return node

    def concat(self):
        node = self.repeat()
        while self.peek() and self.peek() not in "|&)":
            node = ("concat", node, self.repeat())
        return node

    def repeat(self):
        node = self.comp()
        while self.peek() and self.peek() in _POSTFIX:
            c = self.take()
            if c == "?":
                node = ("repeat", node, 0, 1)
            elif c == "*":
                node = ("repeat", node, 0, None)
            elif c == "+":
                node = ("repeat", node, 1, None)
            else:  # {n} {n,} {n,m}
                lo = self._digits("{n[,m]}")
                hi = lo
                if self.peek() == ",":
                    self.take()
                    hi = (
                        self._digits("{n,m}") if self.peek() != "}" else None
                    )
                if self.take() != "}":
                    raise self.err("expected '}'")
                if hi is not None and hi < lo:
                    raise self.err(f"bad repeat bounds {{{lo},{hi}}}")
                node = ("repeat", node, lo, hi)
        return node

    def _digits(self, what: str) -> int:
        ds = ""
        while self.peek().isdigit():
            ds += self.take()
        if not ds:
            raise self.err(f"expected digits in {what}")
        return int(ds)

    def comp(self):
        if self.peek() == "~":
            self.take()
            return ("comp", self.comp())
        return self.charclassexp()

    def charclassexp(self):
        if self.peek() == "[":
            return self._char_class()
        return self.simpleexp()

    def _char_class(self):
        self.take()  # '['
        negate = self.peek() == "^"
        if negate:
            self.take()
        ranges: list[tuple[int, int]] = []
        if not self.peek():
            raise self.err("unterminated character class")
        while self.peek() != "]":
            lo = self._class_char()
            hi = lo
            if self.peek() == "-" and self.s[self.i + 1 : self.i + 2] != "]":
                self.take()
                hi = self._class_char()
                if hi < lo:
                    raise self.err("reversed range in class")
            ranges.append((lo, hi))
            if not self.peek():
                raise self.err("unterminated character class")
        self.take()  # ']'
        if not ranges:
            raise self.err("empty character class")
        if negate:
            ranges = _negate_ranges(ranges)
            if not ranges:
                return ("nothing",)
        return ("class", _merge_ranges(ranges))

    def _class_char(self) -> int:
        c = self.take()
        if c == "\\":
            c = self.take()
        return ord(c)

    def simpleexp(self):
        c = self.take()
        if c == ".":
            return ("class", [(0, _MAX_CP)])
        if c == "#":
            return ("nothing",)
        if c == "@":
            return ("repeat", ("class", [(0, _MAX_CP)]), 0, None)
        if c == '"':
            node = ("empty",)
            while self.peek() != '"':
                node = (
                    "concat",
                    node,
                    ("class", [(ord(self.take()),) * 2]),
                )
            self.take()
            return node
        if c == "(":
            if self.peek() == ")":
                self.take()
                return ("empty",)
            node = self.union()
            if self.take() != ")":
                raise self.err("expected ')'")
            return node
        if c == "<":
            lo = str(self._digits("<m-n>"))
            if self.take() != "-":
                raise self.err("expected '-' in interval")
            hi = str(self._digits("<m-n>"))
            if self.take() != ">":
                raise self.err("expected '>' in interval")
            return self._interval(lo, hi)
        if c == "\\":
            c = self.take()  # \c is literal c — ALWAYS
            return ("class", [(ord(c), ord(c))])
        if c == ")":
            raise self.err("unbalanced ')'")
        return ("class", [(ord(c), ord(c))])

    def _interval(self, lo: str, hi: str):
        """<m-n> via the shared interval machinery: ast.interval_regex
        emits only (?:..), |, [a-b], digits and a 0* prefix — all of
        which this grammar parses once (?: is normalized to (."""
        from codeindex_spark.query.ast import interval_regex

        try:
            plain = interval_regex(lo, hi)
        except ValueError as e:
            raise self.err(str(e)) from e
        return _Parser(plain.replace("(?:", "(")).parse()


def _merge_ranges(ranges):
    out: list[tuple[int, int]] = []
    for lo, hi in sorted(ranges):
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def _negate_ranges(ranges):
    merged = _merge_ranges(ranges)
    out, prev = [], 0
    for lo, hi in merged:
        if lo > prev:
            out.append((prev, lo - 1))
        prev = hi + 1
    if prev <= _MAX_CP:
        out.append((prev, _MAX_CP))
    return out


# ------------------------------------------------- alphabet atomizing


def _collect_ranges(node, acc):
    kind = node[0]
    if kind == "class":
        acc.extend(node[1])
    elif kind in ("concat", "union", "inter"):
        _collect_ranges(node[1], acc)
        _collect_ranges(node[2], acc)
    elif kind in ("comp",):
        _collect_ranges(node[1], acc)
    elif kind == "repeat":
        _collect_ranges(node[1], acc)


def _atomize(node):
    """Disjoint atoms covering [0, MAX_CP] such that every character
    class in the AST is an exact union of atoms. Returns the sorted
    array of atom start codepoints (atom i spans
    [starts[i], starts[i+1]-1])."""
    acc: list[tuple[int, int]] = []
    _collect_ranges(node, acc)
    bounds = {0, _MAX_CP + 1}
    for lo, hi in acc:
        bounds.add(lo)
        bounds.add(hi + 1)
    return sorted(bounds)[:-1]  # drop the terminal sentinel


def _class_atoms(ranges, starts) -> list[int]:
    out = []
    for lo, hi in ranges:
        i = bisect_right(starts, lo) - 1
        while i < len(starts) and starts[i] <= hi:
            out.append(i)
            i += 1
    return out


# ------------------------------------------------------ NFA building


class _NFA:
    """Thompson fragment: eps[i] = set of eps-successors; trans[i] =
    {atom: set(successors)}; one start, one accept."""

    def __init__(self):
        self.eps: list[set[int]] = []
        self.trans: list[dict[int, set[int]]] = []

    def state(self) -> int:
        self.eps.append(set())
        self.trans.append({})
        return len(self.eps) - 1

    def edge(self, a: int, atom: int, b: int) -> None:
        self.trans[a].setdefault(atom, set()).add(b)


def _build(nfa: _NFA, node, starts, n_atoms: int):
    """Returns (start, accept) fragment for ``node``."""
    kind = node[0]
    if kind == "empty":
        s = nfa.state()
        return s, s
    if kind == "nothing":
        return nfa.state(), nfa.state()  # disconnected: matches nothing
    if kind == "class":
        s, a = nfa.state(), nfa.state()
        for atom in _class_atoms(node[1], starts):
            nfa.edge(s, atom, a)
        return s, a
    if kind == "concat":
        s1, a1 = _build(nfa, node[1], starts, n_atoms)
        s2, a2 = _build(nfa, node[2], starts, n_atoms)
        nfa.eps[a1].add(s2)
        return s1, a2
    if kind == "union":
        s, a = nfa.state(), nfa.state()
        for child in (node[1], node[2]):
            cs, ca = _build(nfa, child, starts, n_atoms)
            nfa.eps[s].add(cs)
            nfa.eps[ca].add(a)
        return s, a
    if kind == "repeat":
        _, child, lo, hi = node
        s = nfa.state()
        cur = s
        for _ in range(lo):  # mandatory copies
            cs, ca = _build(nfa, child, starts, n_atoms)
            nfa.eps[cur].add(cs)
            cur = ca
        if hi is None:  # Kleene tail
            cs, ca = _build(nfa, child, starts, n_atoms)
            nfa.eps[cur].add(cs)
            nfa.eps[ca].add(cur)
            return s, cur
        a = nfa.state()
        nfa.eps[cur].add(a)
        for _ in range(hi - lo):  # optional copies
            cs, ca = _build(nfa, child, starts, n_atoms)
            nfa.eps[cur].add(cs)
            nfa.eps[ca].add(a)
            cur = ca
        return s, a
    if kind == "inter":
        # De Morgan: e1 & e2 == ~(~e1 | ~e2) — intersection and
        # complement are the same automaton-level machinery
        return _build(
            nfa,
            ("comp", ("union", ("comp", node[1]), ("comp", node[2]))),
            starts,
            n_atoms,
        )
    if kind == "comp":
        # determinize the sub-fragment, complete it, flip accepts,
        # then re-embed the (complete) DFA as an NFA fragment
        sub = _NFA()
        ss, sa = _build(sub, node[1], starts, n_atoms)
        table, accept = _determinize(sub, ss, {sa}, n_atoms)
        accept = ~accept  # complement: flip every (complete) state
        s = nfa.state()
        a = nfa.state()
        base = len(nfa.eps)
        for _ in range(table.shape[0]):
            nfa.state()
        nfa.eps[s].add(base)  # DFA start is subset-state 0
        for st in range(table.shape[0]):
            for atom in range(n_atoms):
                nfa.edge(base + st, atom, base + int(table[st, atom]))
            if accept[st]:
                nfa.eps[base + st].add(a)
        return s, a
    raise AssertionError(f"unknown node {kind}")


def _eps_closure(nfa: _NFA, states: frozenset) -> frozenset:
    stack, seen = list(states), set(states)
    while stack:
        s = stack.pop()
        for t in nfa.eps[s]:
            if t not in seen:
                seen.add(t)
                stack.append(t)
    return frozenset(seen)


def _determinize(nfa: _NFA, start: int, accepts: set, n_atoms: int):
    """Rabin–Scott subset construction to a COMPLETE DFA (the empty
    subset is a real sink state, so complement is a pure accept-flip).
    Returns (int32 table [n_states, n_atoms], bool accept vector)."""
    start_set = _eps_closure(nfa, frozenset([start]))
    index = {start_set: 0}
    order = [start_set]
    rows: list[list[int]] = []
    i = 0
    while i < len(order):
        cur = order[i]
        row = []
        for atom in range(n_atoms):
            nxt = set()
            for s in cur:
                nxt.update(nfa.trans[s].get(atom, ()))
            nxt = _eps_closure(nfa, frozenset(nxt)) if nxt else frozenset()
            if nxt not in index:
                index[nxt] = len(order)
                order.append(nxt)
            row.append(index[nxt])
        rows.append(row)
        i += 1
        if len(order) > 100_000:
            raise ValueError(
                "regexp too complex: determinization exceeded 100k states"
            )
    table = np.asarray(rows, dtype=np.int32)
    accept = np.array(
        [bool(subset & accepts) for subset in order], dtype=bool
    )
    return table, accept


def _minimize(table: np.ndarray, accept: np.ndarray):
    """Moore partition refinement; keeps the table small after
    complement chains (which otherwise inflate state counts).
    Each round re-partitions states by (own block, successor block
    per atom); refinement only ever SPLITS blocks (the old block id
    is part of the signature), so an unchanged block count is the
    fixpoint."""
    n, n_atoms = table.shape
    part = accept.astype(np.int64)
    nb = len(np.unique(part))
    while True:
        sig = np.empty((n, n_atoms + 1), dtype=np.int64)
        sig[:, 0] = part
        for atom in range(n_atoms):
            sig[:, atom + 1] = part[table[:, atom]]
        _, new_part = np.unique(sig, axis=0, return_inverse=True)
        new_part = new_part.reshape(-1)
        nb_new = int(new_part.max()) + 1
        part = new_part
        if nb_new == nb:
            break
        nb = nb_new
    new_table = np.zeros((nb, n_atoms), dtype=np.int32)
    new_accept = np.zeros(nb, dtype=bool)
    for st in range(n):  # any representative per block is valid
        b = part[st]
        new_table[b] = part[table[st]]
        new_accept[b] = accept[st]
    return new_table, new_accept, int(part[0])


# ---------------------------------------------------------- matcher


class LuceneRegexMatcher:
    """Compiled complete DFA. Picklable (numpy arrays + ints), so a
    mapInPandas closure ships it to executors as-is."""

    def __init__(self, starts, table, accept, start):
        self._starts = np.asarray(starts, dtype=np.int64)
        self._table = table
        self._accept = accept
        self._start = start
        # dead states: no accepting state reachable — used by the
        # literal-prefix walk and early batch termination
        self._dead = self._find_dead()

    def _find_dead(self) -> np.ndarray:
        n = self._table.shape[0]
        alive = self._accept.copy()
        changed = True
        while changed:
            changed = False
            for st in range(n):
                if not alive[st] and alive[self._table[st]].any():
                    alive[st] = True
                    changed = True
        return ~alive

    def match(self, term: str) -> bool:
        st = self._start
        tab, starts = self._table, self._starts
        for ch in term:
            st = tab[st, bisect_right(starts, ord(ch)) - 1]
        return bool(self._accept[st])

    def match_many(self, terms) -> np.ndarray:
        """Lockstep batch evaluation: vectorized codepoint + atom
        lookup for the whole batch, then one table-gather per
        character position up to the longest term."""
        n = len(terms)
        if n == 0:
            return np.zeros(0, dtype=bool)
        lens = np.fromiter((len(t) for t in terms), dtype=np.int64, count=n)
        joined = "".join(terms)
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        atoms = (
            np.searchsorted(self._starts, cps, side="right") - 1
            if len(cps)
            else np.zeros(0, dtype=np.int64)
        )
        offs = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=offs[1:])
        states = np.full(n, self._start, dtype=np.int64)
        for j in range(int(lens.max()) if n else 0):
            m = lens > j
            states[m] = self._table[states[m], atoms[offs[m] + j]]
        return self._accept[states]

    def literal_prefix(self, max_len: int = 64) -> str:
        """Longest prefix every accepted string must start with —
        the dictionary-scan pushdown (startswith -> parquet min/max
        row-group pruning), mirroring regex_literal_prefix on the
        rlike path."""
        out = []
        st = self._start
        seen = set()
        while len(out) < max_len and st not in seen:
            if self._accept[st]:
                break  # empty continuation accepted: prefix ends
            seen.add(st)
            nxt = None
            ch = None
            for atom in range(self._table.shape[1]):
                t = int(self._table[st, atom])
                if self._dead[t]:
                    continue
                lo = int(self._starts[atom])
                hi = (
                    int(self._starts[atom + 1]) - 1
                    if atom + 1 < len(self._starts)
                    else _MAX_CP
                )
                if nxt is not None or lo != hi:
                    return "".join(out)  # branching: prefix ends
                nxt, ch = t, chr(lo)
            if nxt is None:
                break  # dead end (empty language)
            out.append(ch)
            st = nxt
        return "".join(out)

    @property
    def matches_nothing(self) -> bool:
        return bool(self._dead[self._start])


def compile_lucene_regexp(pattern: str) -> LuceneRegexMatcher:
    """Parse + compile ``pattern`` (full Lucene RegexpQuery syntax)
    to a minimized complete DFA. Raises ValueError on syntax errors
    or pathological blowup (>100k subset states)."""
    node = _Parser(pattern).parse()
    starts = _atomize(node)
    n_atoms = len(starts)
    nfa = _NFA()
    s, a = _build(nfa, node, starts, n_atoms)
    table, accept = _determinize(nfa, s, {a}, n_atoms)
    table, accept, start = _minimize(table, accept)
    return LuceneRegexMatcher(starts, table, accept, start)
