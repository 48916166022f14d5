"""Pure-Python single-node oracle — independent reimplementation of
the engine's semantics for rank-identity testing (SURVEY.md §5).

Builds an in-memory index from a pandas ``documents`` frame using the
same tokenizer and the same deterministic docID assignment, then
evaluates the same query AST with plain dicts/lists (no numpy set
tricks, no posting encoding) — so agreement between this and the
Spark engine exercises tokenization, docIDs, block codecs, the
distributed boolean/phrase kernel, and BM25 math end-to-end.

Scoring contract (shared with the planner):
  idf = ln(1 + (N - df + 0.5)/(df + 0.5))
  tfnorm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
  score  = Σ_leaf Σ_matched-expansion idf * tfnorm
  phrase: exact-order adjacency (distance 0); score = Σ_slot
          (Σ expansions of that slot present in the doc)
  tie-break: score desc, doc_id asc
"""

from __future__ import annotations

import bisect
import math
import re
from dataclasses import dataclass, field

import pandas as pd

from codeindex_spark.index.docids import assign_doc_ids_pandas
from codeindex_spark.query import ast
from codeindex_spark.query.planner import (
    MAX_EXPANSIONS,
    idf_bm25,
    literal_prefix,
    wildcard_to_regex,
)
from codeindex_spark.tokenizer import tokenize


def _lucene_ends(node, s: str, i: int, memo: dict) -> frozenset:
    """Set of end positions j such that s[i:j] is in the language of
    ``node`` (a luceneregex parse tree). Glushkov-style position-set
    simulation with memoization — the oracle's independent
    implementation of Lucene RegexpQuery semantics (the engine
    compiles a DFA instead). Complement and intersection fall out of
    set algebra over end-position sets:

        ends(~e, i)    = { j in [i, |s|] : j not in ends(e, i) }
        ends(e1&e2, i) = ends(e1, i) & ends(e2, i)

    both exact because a full sub-match s[i:j] is in L(e1)&L(e2) iff
    it is in both languages."""
    key = (id(node), i)
    hit = memo.get(key)
    if hit is not None:
        return hit
    memo[key] = frozenset()  # cycle guard (repeat fixpoint below)
    kind = node[0]
    if kind == "class":
        out = (
            frozenset([i + 1])
            if i < len(s)
            and any(lo <= ord(s[i]) <= hi for lo, hi in node[1])
            else frozenset()
        )
    elif kind == "empty":
        out = frozenset([i])
    elif kind == "nothing":
        out = frozenset()
    elif kind == "concat":
        out = frozenset(
            j
            for m in _lucene_ends(node[1], s, i, memo)
            for j in _lucene_ends(node[2], s, m, memo)
        )
    elif kind == "union":
        out = _lucene_ends(node[1], s, i, memo) | _lucene_ends(
            node[2], s, i, memo
        )
    elif kind == "inter":
        out = _lucene_ends(node[1], s, i, memo) & _lucene_ends(
            node[2], s, i, memo
        )
    elif kind == "comp":
        sub = _lucene_ends(node[1], s, i, memo)
        out = frozenset(j for j in range(i, len(s) + 1) if j not in sub)
    elif kind == "repeat":
        _, child, lo, hi = node
        frontier = frozenset([i])
        k = 0
        while k < lo:  # mandatory copies
            frontier = frozenset(
                j
                for m in frontier
                for j in _lucene_ends(child, s, m, memo)
            )
            k += 1
        out = set(frontier)
        # optional copies to hi (or fixpoint for unbounded): end
        # positions are bounded by |s|+1, so this terminates
        while frontier and (hi is None or k < hi):
            frontier = frozenset(
                j
                for m in frontier
                for j in _lucene_ends(child, s, m, memo)
                if j not in out
            )
            out |= frontier
            k += 1
        out = frozenset(out)
    else:  # pragma: no cover
        raise AssertionError(kind)
    memo[key] = out
    return out


def _lucene_fullmatch(node, s: str) -> bool:
    return len(s) in _lucene_ends(node, s, 0, {})


def _damerau(a: str, b: str, cap: int) -> int:
    """Unrestricted Damerau-Levenshtein (transposition = one edit,
    edits allowed around it), the Lucene FuzzyQuery default the
    engine mirrors and DuckDB's damerau_levenshtein implements.
    Alphabet-row formulation, independent of the engine's version."""
    if abs(len(a) - len(b)) > cap:
        return cap + 1
    la, lb = len(a), len(b)
    big = la + lb + 1
    last_row: dict[str, int] = {}
    # matrix with a sentinel row/col of `big`
    m = [[big] * (lb + 2)]
    m.append([big] + list(range(lb + 1)))
    for i in range(1, la + 1):
        m.append([big, i] + [0] * lb)
    for i in range(1, la + 1):
        last_col = 0
        for j in range(1, lb + 1):
            same = a[i - 1] == b[j - 1]
            swap_i = last_row.get(b[j - 1], 0)
            swap_j = last_col
            if same:
                last_col = j
            m[i + 1][j + 1] = min(
                m[i][j] + (0 if same else 1),
                m[i][j + 1] + 1,
                m[i + 1][j] + 1,
                m[swap_i][swap_j]
                + (i - swap_i - 1)
                + (j - swap_j - 1)
                + 1,
            )
        last_row[a[i - 1]] = i
    return m[la + 1][lb + 1]


@dataclass
class OracleIndex:
    # REQUIRED, no default: the engine's IndexParams default is now
    # scale-adaptive (max(64, 4x parallelism)), and docIDs depend on
    # the bucket count — a fixed pandas-side default would silently
    # assign different docIDs than a default-built engine index.
    # Always pass the engine's resolved params.num_buckets.
    num_buckets: int
    block_size: int = 128
    k1: float = 1.2
    b: float = 0.75
    docs: pd.DataFrame = field(default=None)  # type: ignore[assignment]
    postings: dict = field(default_factory=dict)  # field -> term -> {doc: [pos]}
    dls: dict = field(default_factory=dict)  # field -> {doc: dl}
    stats: dict = field(default_factory=dict)  # field -> (n_docs, avgdl)

    @staticmethod
    def build(
        documents: pd.DataFrame,
        num_buckets: int,
        block_size: int = 128,
        k1: float = 1.2,
        b: float = 0.75,
        fields: tuple[str, ...] | None = None,
    ) -> "OracleIndex":
        # fields=None builds every field (the rank-identity default);
        # the percolator passes only the fields its registry
        # references so per-batch tokenization stays one pass
        idx = OracleIndex(num_buckets, block_size, k1, b)
        docs = assign_doc_ids_pandas(documents, num_buckets, block_size)
        docs["file_name"] = docs["path"].str.split("/").str[-1]
        docs["file_ext"] = docs["file_name"].map(
            lambda n: n.rsplit(".", 1)[1].lower() if "." in n else ""
        )
        idx.docs = docs
        from codeindex_spark.tokenizer import camel_token_stream

        field_sources = {
            "content_cs": lambda r: tokenize(r.content),
            "content": lambda r: [t.lower() for t in tokenize(r.content)],
            "file_name": lambda r: [t.lower() for t in tokenize(r.file_name)],
            "file_path": lambda r: [t.lower() for t in tokenize(r.path)],
            "content_camel": lambda r: camel_token_stream(r.content),
            "path_trigram": lambda r: [
                r.path.lower()[i : i + 3]
                for i in range(max(len(r.path) - 2, 0))
            ],
        }
        if fields is not None:
            unknown = set(fields) - set(field_sources)
            if unknown:
                raise ValueError(f"unknown index fields: {sorted(unknown)}")
            field_sources = {
                f: field_sources[f] for f in field_sources if f in fields
            }
        for fld, fn in field_sources.items():
            post: dict[str, dict[int, list[int]]] = {}
            dls: dict[int, int] = {}
            total = 0
            for r in docs.itertuples():
                toks = fn(r)
                dls[r.doc_id] = len(toks)
                total += len(toks)
                for i, t in enumerate(toks):
                    post.setdefault(t, {}).setdefault(r.doc_id, []).append(i)
            idx.postings[fld] = post
            idx.dls[fld] = dls
            n = len(docs)
            idx.stats[fld] = (n, total / n if n else 0.0)
        return idx

    # ---------- scoring primitives ----------

    def _tfnorm(self, fld: str, doc: int, tf: int) -> float:
        _, avgdl = self.stats[fld]
        dl = self.dls[fld][doc]
        return tf * (self.k1 + 1.0) / (
            tf + self.k1 * (1.0 - self.b + self.b * dl / avgdl)
        )

    def _span_union(self, fld: str, spec, boost):
        """Union the member spans of a term-or-tuple span clause:
        per-doc sorted position lists merged across present members
        (distinct terms never share a position), plus the blended
        idf = Σ present members' FULL-df idfs * boost. Returns
        (None, 0.0) when no member is in the dictionary."""
        members = ast.span_member_terms(spec)
        present = [t for t in members if t in self.postings[fld]]
        if not present:
            return None, 0.0
        n, _ = self.stats[fld]
        idf = sum(
            idf_bm25(n, len(self.postings[fld][t])) for t in present
        ) * float(boost)
        union: dict[int, list[int]] = {}
        for t in present:
            for d, pos in self.postings[fld][t].items():
                union.setdefault(d, []).extend(pos)
        return {d: sorted(ps) for d, ps in union.items()}, idf

    def _term_scores(self, fld: str, term: str) -> dict[int, float]:
        post = self.postings[fld].get(term, {})
        n, _ = self.stats[fld]
        idf = idf_bm25(n, len(post))
        return {d: idf * self._tfnorm(fld, d, len(pos)) for d, pos in post.items()}

    def _expand(self, fld: str, leaf: ast.Node) -> list[str]:
        terms = self.postings[fld].keys()
        if isinstance(leaf, ast.Term):
            return [leaf.term] if leaf.term in terms else []
        if isinstance(leaf, ast.Wildcard):
            return self._expand_pattern(fld, leaf.pattern)
        if isinstance(leaf, ast.Regexp):
            from codeindex_spark.query.luceneregex import (
                uses_extended_ops,
            )

            if uses_extended_ops(leaf.pattern):
                # extended RegexpQuery operators (~ & @ # ".."):
                # evaluated by the set-of-end-positions interpreter
                # below — deliberately a DIFFERENT algorithm from the
                # engine's compiled DFA, so rank-identity tests pit
                # two independent implementations of the semantics
                # against each other
                from codeindex_spark.query.luceneregex import _Parser

                node = _Parser(leaf.pattern).parse()
                return sorted(
                    t for t in terms if _lucene_fullmatch(node, t)
                )[:MAX_EXPANSIONS]
            # re.ASCII: Java regex classes (\d \w \s) are ASCII by
            # default — the oracle must match the engine's rlike;
            # Lucene <m-n> intervals rewritten the same as the engine
            rx = re.compile(
                ast.expand_lucene_intervals(leaf.pattern), re.ASCII
            )
            return sorted(t for t in terms if rx.fullmatch(t))[
                :MAX_EXPANSIONS
            ]
        if isinstance(leaf, ast.Range):
            def ok(t: str) -> bool:
                if leaf.lo is not None:
                    if t < leaf.lo or (t == leaf.lo and not leaf.lo_inc):
                        return False
                if leaf.hi is not None:
                    if t > leaf.hi or (t == leaf.hi and not leaf.hi_inc):
                        return False
                return True

            return sorted(t for t in terms if ok(t))[:MAX_EXPANSIONS]
        if isinstance(leaf, ast.Fuzzy):
            q, k = leaf.term, leaf.max_edits
            out = [
                t
                for t in terms
                if abs(len(t) - len(q)) <= k and _damerau(t, q, k) <= k
            ]
            return sorted(out)[:MAX_EXPANSIONS]
        raise TypeError(leaf)

    def _expand_pattern(self, fld: str, pattern: str) -> list[str]:
        rx = re.compile(wildcard_to_regex(pattern))
        prefix = literal_prefix(pattern)
        out = [
            t
            for t in self.postings[fld]
            if t.startswith(prefix) and rx.match(t)
        ]
        return sorted(out)[:MAX_EXPANSIONS]

    # ---------- evaluation ----------

    def eval(self, node: ast.Node) -> dict[int, float]:
        if isinstance(
            node, (ast.Term, ast.Wildcard, ast.Regexp, ast.Fuzzy, ast.Range)
        ):
            out: dict[int, float] = {}
            boost = float(getattr(node, "boost", 1.0))
            for t in self._expand(node.field, node):
                for d, s in self._term_scores(node.field, t).items():
                    out[d] = out.get(d, 0.0) + s * boost
            return out
        if isinstance(node, ast.Synonyms):
            # Lucene SynonymQuery blend: tf sums BEFORE saturation,
            # idf from docFreq = max over members present in the dict
            fld = node.field
            present = [t for t in node.terms if t in self.postings[fld]]
            if not present:
                return {}
            n, _ = self.stats[fld]
            idf = idf_bm25(
                n, max(len(self.postings[fld][t]) for t in present)
            ) * float(getattr(node, "boost", 1.0))
            tf_by_doc: dict[int, int] = {}
            for t in present:
                for d, pos in self.postings[fld][t].items():
                    tf_by_doc[d] = tf_by_doc.get(d, 0) + len(pos)
            return {
                d: idf * self._tfnorm(fld, d, tf)
                for d, tf in tf_by_doc.items()
            }
        if isinstance(node, ast.SpanOr):
            # Lucene SpanOrQuery: union of single-term spans — freq
            # sums like the Synonyms blend, but idf = SUM of the
            # present members' idfs (BM25Similarity over multiple
            # TermStatistics sums idfExplain terms)
            fld = node.field
            present = [t for t in node.terms if t in self.postings[fld]]
            if not present:
                return {}
            n, _ = self.stats[fld]
            idf = sum(
                idf_bm25(n, len(self.postings[fld][t])) for t in present
            ) * float(getattr(node, "boost", 1.0))
            tf_by_doc: dict[int, int] = {}
            for t in present:
                for d, pos in self.postings[fld][t].items():
                    tf_by_doc[d] = tf_by_doc.get(d, 0) + len(pos)
            return {
                d: idf * self._tfnorm(fld, d, tf)
                for d, tf in tf_by_doc.items()
            }
        if isinstance(node, ast.SpanFirst):
            # Lucene SpanFirstQuery: span end <= end, i.e. 0-based
            # position < end; member positions union (SpanOr inner;
            # one member = the plain single-term span), freq =
            # restricted union count saturated once, idf = Σ present
            # members' FULL-df idfs (SpanWeight term stats)
            fld = node.field
            union, idf = self._span_union(fld, node.term, node.boost)
            if union is None:
                return {}
            out = {}
            for d, pos in union.items():
                tf = sum(1 for p in pos if p < node.end)
                if tf:
                    out[d] = idf * self._tfnorm(fld, d, tf)
            return out
        if isinstance(node, ast.SpanNot):
            # Lucene SpanNotQuery: include position p survives iff no
            # exclude position q in [p-pre, p+post]; both sides are
            # member unions; freq = surviving count, idf = Σ present
            # INCLUDE members' FULL-df idfs (exclude gates only)
            fld = node.field
            inc, idf = self._span_union(fld, node.include, node.boost)
            if inc is None:
                return {}
            exc, _ = self._span_union(fld, node.exclude, 1.0)
            exc = exc or {}
            out = {}
            for d, pos in inc.items():
                bad = exc.get(d, ())
                tf = sum(
                    1
                    for p in pos
                    if not any(p - node.pre <= q <= p + node.post for q in bad)
                )
                if tf:
                    out[d] = idf * self._tfnorm(fld, d, tf)
            return out
        if isinstance(node, ast.DisMax):
            # DisjunctionMaxQuery: max child + tie * (sum - max),
            # same float op order as the kernel
            tot: dict[int, float] = {}
            mx: dict[int, float] = {}
            for child in node.children:
                for d, s in self.eval(child).items():
                    tot[d] = tot.get(d, 0.0) + s
                    if d not in mx or s > mx[d]:
                        mx[d] = s
            tie = node.tie_breaker
            return {d: mx[d] + tie * (tot[d] - mx[d]) for d in tot}
        if isinstance(node, ast.ConstantScore):
            boost = float(node.boost)
            return {d: boost for d in self.eval(node.child)}
        if isinstance(node, ast.Phrase):
            return self._eval_phrase(node)
        if isinstance(node, ast.And):
            child_maps = [self.eval(c) for c in node.children]
            docs = set(child_maps[0])
            for m in child_maps[1:]:
                docs &= set(m)
            return {d: sum(m[d] for m in child_maps) for d in docs}
        if isinstance(node, ast.Or):
            out = {}
            for c in node.children:
                for d, s in self.eval(c).items():
                    out[d] = out.get(d, 0.0) + s
            return out
        if isinstance(node, ast.Not):
            pos = self.eval(node.positive)
            neg = set(self.eval(node.negative))
            return {d: s for d, s in pos.items() if d not in neg}
        if isinstance(node, ast.Bool):
            msm = max(0, int(getattr(node, "min_should_match", 0)))
            flt = tuple(getattr(node, "filter", ()))
            if not node.must and not node.should and not flt:
                return {}
            if msm > len(node.should):
                return {}
            if node.must or flt:
                maps = [self.eval(c) for c in node.must]
                fsets = [set(self.eval(c)) for c in flt]
                docs = set(maps[0]) if maps else set(fsets[0])
                for m in maps[1:]:
                    docs &= set(m)
                for fs in fsets:
                    docs &= fs
                out = {d: sum(m[d] for m in maps) for d in docs}
                hits = {d: 0 for d in docs}
                for c in node.should:
                    m = self.eval(c)
                    for d in out:
                        if d in m:
                            out[d] += m[d]
                            hits[d] += 1
                if msm:
                    out = {d: s for d, s in out.items() if hits[d] >= msm}
            else:
                out = {}
                hits = {}
                for c in node.should:
                    for d, s in self.eval(c).items():
                        out[d] = out.get(d, 0.0) + s
                        hits[d] = hits.get(d, 0) + 1
                if msm:
                    out = {d: s for d, s in out.items() if hits[d] >= msm}
            for c in node.must_not:
                neg = set(self.eval(c))
                out = {d: s for d, s in out.items() if d not in neg}
            return out
        raise TypeError(node)

    def _eval_phrase(self, node: ast.Phrase) -> dict[int, float]:
        fld = node.field
        slot_terms = [self._expand_slot(fld, s) for s in node.slots]
        if any(not ts for ts in slot_terms):
            return {}
        # candidate docs: in all slots (any expansion)
        slot_docs = []
        for ts in slot_terms:
            docs = set()
            for t in ts:
                docs |= set(self.postings[fld].get(t, {}))
            slot_docs.append(docs)
        cand = set.intersection(*slot_docs)
        slop = int(getattr(node, "slop", 0))
        in_order = bool(getattr(node, "in_order", False))
        boost = float(getattr(node, "boost", 1.0))
        out: dict[int, float] = {}
        for d in cand:
            if slop > 0 and not in_order:
                ok = self._sloppy_unordered(fld, slot_terms, d, slop)
            elif slop <= 0:
                valid = set()
                for t in slot_terms[0]:
                    valid |= set(self.postings[fld].get(t, {}).get(d, []))
                for ts in slot_terms[1:]:
                    nxt = set()
                    for t in ts:
                        nxt |= set(self.postings[fld].get(t, {}).get(d, []))
                    valid = {p + 1 for p in valid} & nxt
                    if not valid:
                        break
                ok = bool(valid)
            else:
                # sloppy (in-order, total gap <= slop) via normalized
                # q = pos - slot: need a nondecreasing q-chain across
                # slots with span <= slop — the same best-chain-start
                # DP the Spark kernel runs vectorized
                chain: dict[int, int] = {}  # q -> best (max) start q
                for t in slot_terms[0]:
                    for p in self.postings[fld].get(t, {}).get(d, []):
                        chain[p] = max(chain.get(p, p), p)
                for i, ts in enumerate(slot_terms[1:], start=1):
                    qs = sorted(chain)
                    starts = [chain[q] for q in qs]
                    run = []  # prefix max of best-start over sorted q
                    m = -1
                    for st in starts:
                        m = max(m, st)
                        run.append(m)
                    nxt_chain: dict[int, int] = {}
                    for t in ts:
                        for p in self.postings[fld].get(t, {}).get(d, []):
                            q = p - i
                            j = bisect.bisect_right(qs, q) - 1
                            if j < 0:
                                continue
                            start = run[j]
                            if q - start <= slop:
                                nxt_chain[q] = max(
                                    nxt_chain.get(q, start), start
                                )
                    chain = nxt_chain
                    if not chain:
                        break
                ok = bool(chain)
            if ok:
                score = 0.0
                for ts in slot_terms:
                    for t in ts:
                        score += self._term_scores(fld, t).get(d, 0.0)
                out[d] = score * boost
        return out

    def _sloppy_unordered(self, fld, slot_terms, d, slop) -> bool:
        """Lucene SloppyPhraseScorer semantics: does doc ``d`` admit
        an assignment of slots to DISTINCT positions with normalized
        span max(pos - slot) - min(pos - slot) <= slop? Brute
        reference: try every window start (shifted q2 = pos - slot +
        n - 1 keeps keys nonnegative) and check a system of distinct
        representatives by augmenting paths."""
        n = len(slot_terms)
        avail_q2: list[list[int]] = []
        for i, ts in enumerate(slot_terms):
            ps: set[int] = set()
            for t in ts:
                ps |= set(self.postings[fld].get(t, {}).get(d, []))
            if not ps:
                return False
            avail_q2.append(sorted(p - i + (n - 1) for p in ps))

        def sdr(avails: list[list[int]]) -> bool:
            match: dict[int, int] = {}

            def try_assign(s: int, seen: set[int]) -> bool:
                for p in avails[s]:
                    if p in seen:
                        continue
                    seen.add(p)
                    if p not in match or try_assign(match[p], seen):
                        match[p] = s
                        return True
                return False

            return all(try_assign(s, set()) for s in range(len(avails)))

        for lo in sorted(set().union(*(set(a) for a in avail_q2))):
            hi = lo + slop
            wins = [
                [q2 + i - (n - 1) for q2 in avail_q2[i] if lo <= q2 <= hi]
                for i in range(n)
            ]
            if all(wins) and sdr(wins):
                return True
        return False

    def _expand_slot(self, fld: str, slot) -> list[str]:
        if isinstance(slot, tuple):  # SpanOr clause inside SpanNear
            return [t for t in slot if t in self.postings[fld]]
        if "*" in slot or "?" in slot:
            return self._expand_pattern(fld, slot)
        return [slot] if slot in self.postings[fld] else []

    # ---------- public API ----------

    def search(
        self,
        query: ast.Node | str,
        k: int = 100,
        case_sensitive: bool = False,
        doc_filter=None,
    ) -> list[tuple[int, float]]:
        root = (
            ast.parse_query(query, case_sensitive)
            if isinstance(query, str)
            else query
        )
        scored = self.eval(root)
        if doc_filter is not None:
            allowed = set(
                self.docs[doc_filter(self.docs)]["doc_id"].tolist()
            )
            scored = {d: s for d, s in scored.items() if d in allowed}
        ranked = sorted(scored.items(), key=lambda x: (-x[1], x[0]))
        return ranked[:k]

    def hints(self, prefix: str, case_sensitive: bool = False, limit: int = 20) -> list[str]:
        words = {
            t for t in self.postings["content_cs"] if 4 <= len(t) <= 199
        }
        if case_sensitive:
            out = sorted(w for w in words if w.startswith(prefix))
        else:
            p = prefix.lower()
            out = sorted({w for w in words if w.lower().startswith(p)})
        return out[:limit]
