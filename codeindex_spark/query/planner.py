"""Query planner + executor: AST -> DataFrame plan over posting blocks.

Execution shape (the "joins" of an IR engine, SURVEY.md §2.4):

1. Leaf resolution — wildcard/fuzzy leaves expand against the term
   dictionary. Prefix patterns become a *range* predicate on the
   term-sorted dictionary parquet (row-group pruning); fuzzy uses a
   length window + JVM-side levenshtein. Expansions are capped at
   1024 terms (Lucene's maxClauseCount) deterministically (term asc).
2. Candidate scan — postings filtered to the query's (field, term)
   set: directory pruning on field, min/max row-group pruning on
   term. A broadcast join attaches (leaf_id, slot, idf) to each block
   row.
3. Block-aligned evaluation — groupBy(block_id) + applyInPandas: all
   query terms share doc-aligned blocks (block_id = doc_id //
   BLOCK_SIZE), so boolean intersection / union / difference and
   phrase adjacency are numpy set ops *within one block*, with no
   doc-level shuffle. Posting-list intersection therefore costs one
   equi-shuffle on block_id, the distributed analog of Lucene's
   skip-list merge.
4. Metadata filters (repo/lang/ext/path) are DataFrame predicates on
   the docs table, semi-joined with scored docs. BM25 statistics stay
   corpus-global, like Lucene filter (non-scoring) clauses.
5. Top-k — orderBy(score desc, doc_id asc).limit(k) — Catalyst
   TakeOrderedAndProject (per-partition heap + driver merge).

Scoring: BM25 (k1/b from index params),
idf = ln(1 + (N - df + 0.5)/(df + 0.5)) (Lucene BM25Similarity form),
score(q,d) = Σ_leaf idf_t * tfnorm_t(d). Multi-term leaves (wildcard /
fuzzy expansions) sum over matched expansions. Phrase scores sum the
per-slot contributions of matched docs. Tie-break: (score desc,
doc_id asc) — deterministic because docIDs are (see index/docids.py).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from codeindex_spark.index import encoding
from codeindex_spark.index.segments import IndexReader
from codeindex_spark.query import ast

MAX_EXPANSIONS = 1024  # Lucene BooleanQuery.maxClauseCount parity

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


@dataclass(frozen=True)
class Filters:
    """Metadata predicates (reference: extension/path include-exclude,
    FilesFetcher.cs:22-26 and QueryGenerator field clauses)."""

    repo: str | None = None
    lang: str | None = None
    file_ext: str | None = None
    path_prefix: str | None = None

    def apply(self, docs: DataFrame) -> DataFrame:
        out = docs
        if self.repo is not None:
            out = out.filter(F.col("repo") == self.repo)
        if self.lang is not None:
            out = out.filter(F.col("lang") == self.lang)
        if self.file_ext is not None:
            out = out.filter(F.col("file_ext") == self.file_ext.lower())
        if self.path_prefix is not None:
            out = out.filter(F.col("path").startswith(self.path_prefix))
        return out

    @property
    def empty(self) -> bool:
        return all(
            v is None
            for v in (self.repo, self.lang, self.file_ext, self.path_prefix)
        )


def wildcard_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def literal_prefix(pattern: str) -> str:
    for i, ch in enumerate(pattern):
        if ch in "*?":
            return pattern[:i]
    return pattern


def idf_bm25(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


class SearchEngine:
    def __init__(self, reader: IndexReader):
        self.reader = reader
        self.params = reader.params

    # ---------- leaf expansion ----------

    def _expand(self, field: str, leaf: ast.Node) -> list[tuple[str, int]]:
        """Resolve a leaf to [(term, df)] against the term dictionary."""
        td = self.reader.term_dict.filter(F.col("field") == field)
        if isinstance(leaf, ast.Term):
            rows = td.filter(F.col("term") == leaf.term).select("term", "df").collect()
        elif isinstance(leaf, ast.Wildcard):
            rows = self._expand_pattern(td, leaf.pattern)
        elif isinstance(leaf, ast.Fuzzy):
            q = leaf.term
            k = leaf.max_edits
            rows = (
                td.filter(
                    (F.length("term") >= len(q) - k)
                    & (F.length("term") <= len(q) + k)
                )
                .filter(F.levenshtein(F.col("term"), F.lit(q)) <= k)
                .select("term", "df")
                .orderBy("term")
                .limit(MAX_EXPANSIONS)
                .collect()
            )
        else:
            raise TypeError(leaf)
        return [(r["term"], r["df"]) for r in rows]

    def _expand_pattern(self, td: DataFrame, pattern: str) -> list:
        prefix = literal_prefix(pattern)
        cond = F.lit(True)
        if prefix:
            # range predicate on the sorted dictionary — row-group
            # pruned via parquet min/max stats
            cond = F.col("term").startswith(prefix)
        if pattern != prefix + "*":  # more structure than plain prefix
            cond = cond & F.col("term").rlike(wildcard_to_regex(pattern))
        return (
            td.filter(cond)
            .select("term", "df")
            .orderBy("term")
            .limit(MAX_EXPANSIONS)
            .collect()
        )

    def _expand_slot(self, field: str, slot: str) -> list[tuple[str, int]]:
        if "*" in slot or "?" in slot:
            td = self.reader.term_dict.filter(F.col("field") == field)
            return [(r["term"], r["df"]) for r in self._expand_pattern(td, slot)]
        return self._expand(field, ast.Term(slot, field))

    # ---------- planning ----------

    def _plan_rows(
        self, root: ast.Node
    ) -> tuple[list[dict], dict[ast.Node, int]]:
        """Assign leaf ids; build (field, term, leaf_id, slot, idf)
        mapping rows. Identical leaves share an id (same semantics).

        All exact-term lookups across every leaf and phrase slot run
        as ONE batched dictionary job; only wildcard/fuzzy expansions
        need their own predicate scans.
        """
        leaf_ids: dict[ast.Node, int] = {}
        wants: list[tuple[int, str, int, object]] = []
        exact_terms: dict[str, set[str]] = {}
        for leaf in ast.collect_leaves(root):
            if leaf in leaf_ids:
                continue
            lid = len(leaf_ids)
            leaf_ids[leaf] = lid
            fld = leaf.field
            if isinstance(leaf, ast.Phrase):
                for slot_idx, slot in enumerate(leaf.slots):
                    wants.append((lid, fld, slot_idx, slot))
                    if "*" not in slot and "?" not in slot:
                        exact_terms.setdefault(fld, set()).add(slot)
            elif isinstance(leaf, ast.Term):
                wants.append((lid, fld, -1, leaf.term))
                exact_terms.setdefault(fld, set()).add(leaf.term)
            else:
                wants.append((lid, fld, -1, leaf))

        exact_df: dict[tuple[str, str], int] = {}
        if exact_terms:
            cond = None
            for fld, ts in exact_terms.items():
                c = (F.col("field") == fld) & F.col("term").isin(sorted(ts))
                cond = c if cond is None else (cond | c)
            for r in (
                self.reader.term_dict.filter(cond)
                .select("field", "term", "df")
                .collect()
            ):
                exact_df[(r["field"], r["term"])] = r["df"]

        rows: list[dict] = []
        for lid, fld, slot_idx, spec in wants:
            n_docs, _ = self.reader.field_stats(fld)
            if isinstance(spec, str) and "*" not in spec and "?" not in spec:
                df = exact_df.get((fld, spec))
                expansions = [(spec, df)] if df is not None else []
            elif isinstance(spec, str):  # wildcard phrase slot
                expansions = self._expand_slot(fld, spec)
            else:  # Wildcard / Fuzzy leaf
                expansions = self._expand(fld, spec)
            for term, df in expansions:
                rows.append(
                    {
                        "field": fld,
                        "term": term,
                        "leaf_id": lid,
                        "slot": slot_idx,
                        "idf": idf_bm25(n_docs, df),
                    }
                )
        return rows, leaf_ids

    # ---------- execution ----------

    def _candidates(self, root: ast.Node):
        """Postings of the query's terms with (leaf_id, slot, idf)
        attached, plus the kernel closure. Returns (candidates_df,
        kernel, n_leaf_rows)."""
        spark = self.reader.spark
        rows, leaf_ids = self._plan_rows(root)
        if not rows:
            return None, None, 0
        mapping = spark.createDataFrame(pd.DataFrame(rows))
        fields = sorted({r["field"] for r in rows})
        terms_by_field = {
            f: sorted({r["term"] for r in rows if r["field"] == f})
            for f in fields
        }
        cond = None
        for f, ts in terms_by_field.items():
            c = (F.col("field") == f) & F.col("term").isin(ts)
            cond = c if cond is None else (cond | c)
        candidates = self.reader.postings.filter(cond).join(
            F.broadcast(mapping), ["field", "term"]
        )
        avgdl = {f: self.reader.field_stats(f)[1] for f in fields}
        k1, b, bsz = self.params.k1, self.params.b, self.params.block_size
        kernel = _make_block_kernel(root, leaf_ids, avgdl, k1, b, bsz)
        return candidates, kernel, len(rows)

    def score(self, query: ast.Node | str, case_sensitive: bool = False) -> DataFrame:
        """Evaluate to a (doc_id, score) DataFrame of matching docs."""
        root = (
            ast.parse_query(query, case_sensitive)
            if isinstance(query, str)
            else query
        )
        candidates, kernel, n = self._candidates(root)
        if candidates is None:
            return self.reader.spark.createDataFrame([], SCORE_SCHEMA)
        return candidates.groupBy("block_id").applyInPandas(
            kernel, schema=SCORE_SCHEMA
        )

    def search_wand(
        self,
        query: ast.Node | str,
        k: int = 100,
        case_sensitive: bool = False,
    ) -> DataFrame:
        """Block-max WAND top-k: prune posting blocks by score upper
        bound BEFORE decoding (the Lucene impacts/BlockMaxWAND analog,
        distributed).

        Correctness: for any doc d in block B,
        score(d) <= UB(B) = Σ_leaf-rows idf * block_max_tfnorm, because
        every evaluation mode (term/AND/OR/phrase) sums at most every
        leaf contribution and phrase adjacency only removes docs. So
        dropping blocks with UB(B) < θ (θ = k-th score of a seed set)
        can never evict a true top-k doc.

        Phases (3 small jobs instead of decoding every block):
          1. block metadata agg (no decode) -> per-block UB;
          2. seed: decode only the top-ceil(4k/block) blocks by UB,
             exact-score them, θ = k-th best;
          3. decode blocks with UB >= θ, exact top-k.
        """
        root = (
            ast.parse_query(query, case_sensitive)
            if isinstance(query, str)
            else query
        )
        candidates, kernel, _ = self._candidates(root)
        spark = self.reader.spark
        if candidates is None:
            return spark.createDataFrame([], SCORE_SCHEMA)
        candidates = candidates.cache()
        try:
            bsz = self.params.block_size
            meta = candidates.groupBy("block_id").agg(
                F.sum(F.col("idf") * F.col("block_max_tfnorm")).alias("ub")
            )
            n_seed = max(1, -(-4 * k // bsz))
            seed_ids = [
                r["block_id"]
                for r in meta.orderBy(F.desc("ub")).limit(n_seed).collect()
            ]
            seed_scored = (
                candidates.filter(F.col("block_id").isin(seed_ids))
                .groupBy("block_id")
                .applyInPandas(kernel, schema=SCORE_SCHEMA)
                .orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(k)
                .collect()
            )
            if len(seed_scored) < k:
                # not enough docs to establish θ — fall back to exact
                rows = (
                    candidates.groupBy("block_id")
                    .applyInPandas(kernel, schema=SCORE_SCHEMA)
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .limit(k)
                    .collect()
                )
            else:
                theta = seed_scored[-1]["score"]
                keep = meta.filter(F.col("ub") >= theta).select("block_id")
                rows = (
                    candidates.join(F.broadcast(keep), "block_id", "left_semi")
                    .groupBy("block_id")
                    .applyInPandas(kernel, schema=SCORE_SCHEMA)
                    .orderBy(F.desc("score"), F.asc("doc_id"))
                    .limit(k)
                    .collect()
                )
            # materialized (<= k rows) so the cache can be released
            return spark.createDataFrame(rows, schema=SCORE_SCHEMA)
        finally:
            candidates.unpersist(blocking=False)

    def search(
        self,
        query: ast.Node | str,
        k: int = 100,
        filters: Filters | None = None,
        case_sensitive: bool = False,
        with_docs: bool = False,
    ) -> DataFrame:
        """Top-k BM25 search. Returns (doc_id, score [, doc metadata])
        ordered by (score desc, doc_id asc)."""
        scored = self.score(query, case_sensitive)
        # tombstone-aware readers (incremental MultiReader) expose the
        # live doc set; postings may still contain replaced/deleted docs
        live = getattr(self.reader, "live_doc_ids", lambda: None)()
        if live is not None:
            scored = scored.join(live, "doc_id", "left_semi")
        if filters is not None and not filters.empty:
            allowed = filters.apply(self.reader.docs).select("doc_id")
            scored = scored.join(allowed, "doc_id", "left_semi")
        top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if with_docs:
            meta = self.reader.docs.select(
                "doc_id", "repo", "path", "commit", "lang", "file_name", "file_ext"
            )
            top = top.join(meta, "doc_id").orderBy(
                F.desc("score"), F.asc("doc_id")
            )
        return top

    # ---------- point ops (Q7/Q8/K2) ----------

    def lookup_pk(self, doc_key: str) -> DataFrame:
        """CodePK short-circuit (QueryGenerator.cs:56-59)."""
        return self.reader.docs.filter(F.col("doc_key") == doc_key)

    def hints(self, prefix: str, case_sensitive: bool = False, limit: int = 20) -> DataFrame:
        """Autocomplete: term-or-prefix on the hint words, limit 20
        (CodeIndexSearcher.GetHints, CodeIndexSearcher.cs:105-131)."""
        h = self.reader.hints
        col = "word" if case_sensitive else "word_lower"
        needle = prefix if case_sensitive else prefix.lower()
        return (
            h.filter(F.col(col).startswith(needle))
            .select("word")
            .distinct()
            .orderBy("word")
            .limit(limit)
        )


def _make_block_kernel(root, leaf_ids, avgdl, k1, b, block_size):
    """Build the per-block evaluation kernel (numpy, no per-row Python).

    Each group = one block_id; rows = posting blocks of query terms
    with (leaf_id, slot, idf) attached. Evaluates the boolean/phrase
    tree over block-local doc sets.
    """
    id_of = dict(leaf_ids)  # Node -> leaf_id (frozen dataclasses hash by value)
    phrase_nslots = {
        lid: len(node.slots)
        for node, lid in leaf_ids.items()
        if isinstance(node, ast.Phrase)
    }

    def eval_node(node, leaf_data):
        if isinstance(node, (ast.Term, ast.Wildcard, ast.Fuzzy)):
            return leaf_data.get(id_of[node], (EMPTY_D, EMPTY_S))
        if isinstance(node, ast.Phrase):
            return leaf_data.get(id_of[node], (EMPTY_D, EMPTY_S))
        if isinstance(node, ast.And):
            docs, scores = eval_node(node.children[0], leaf_data)
            for child in node.children[1:]:
                d2, s2 = eval_node(child, leaf_data)
                docs, i1, i2 = np.intersect1d(
                    docs, d2, assume_unique=True, return_indices=True
                )
                scores = scores[i1] + s2[i2]
            return docs, scores
        if isinstance(node, ast.Or):
            alld, alls = [], []
            for child in node.children:
                d, s = eval_node(child, leaf_data)
                alld.append(d)
                alls.append(s)
            cat_d = np.concatenate(alld) if alld else EMPTY_D
            cat_s = np.concatenate(alls) if alls else EMPTY_S
            if cat_d.size == 0:
                return EMPTY_D, EMPTY_S
            docs, inv = np.unique(cat_d, return_inverse=True)
            scores = np.bincount(inv, weights=cat_s)
            return docs, scores
        if isinstance(node, ast.Not):
            dp, sp = eval_node(node.positive, leaf_data)
            dn, _ = eval_node(node.negative, leaf_data)
            keep = ~np.isin(dp, dn, assume_unique=True)
            return dp[keep], sp[keep]
        raise TypeError(node)

    EMPTY_D = np.empty(0, dtype=np.int64)
    EMPTY_S = np.empty(0, dtype=np.float64)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        block_id = int(key[0])
        # decode each posting row once
        decoded = []  # (leaf_id, slot, docs, contrib, pos_counts, pos_flat)
        for r in pdf.itertuples():
            docs = encoding.decode_block_docs(bytes(r.docs_delta), block_id, block_size)
            tfs = encoding.varint_decode(bytes(r.tfs))
            dls = encoding.varint_decode(bytes(r.dls))
            tfnorm = encoding.bm25_tfnorm(tfs, dls, avgdl[r.field], k1, b)
            decoded.append((r.leaf_id, r.slot, r.term, docs, r.idf * tfnorm, r))

        # per simple leaf: union expansions, sum contributions
        leaf_data: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        simple: dict[int, list] = {}
        phrase_rows: dict[int, list] = {}
        for lid, slot, term, docs, contrib, r in decoded:
            if slot < 0:
                simple.setdefault(lid, []).append((docs, contrib))
            else:
                phrase_rows.setdefault(lid, []).append((slot, docs, contrib, r))

        for lid, parts in simple.items():
            cat_d = np.concatenate([p[0] for p in parts])
            cat_s = np.concatenate([p[1] for p in parts])
            docs, inv = np.unique(cat_d, return_inverse=True)
            leaf_data[lid] = (docs, np.bincount(inv, weights=cat_s))

        for lid, parts in phrase_rows.items():
            leaf_data[lid] = _eval_phrase(parts, phrase_nslots[lid])

        docs, scores = eval_node(root, leaf_data)
        if docs.size == 0:
            return pd.DataFrame({"doc_id": EMPTY_D, "score": EMPTY_S})
        return pd.DataFrame({"doc_id": docs, "score": scores})

    return kernel


def _eval_phrase(parts, n_slots):
    """Exact-order adjacency (SpanNear distance 0, in-order —
    QueryGenerator.cs:177-192 semantics) within one block.

    parts: [(slot, docs, contrib, row)] — possibly several expansions
    per slot. n_slots is the TRUE phrase length from the AST (a block
    missing any slot's terms can never match). Returns (docs, scores):
    docs where slots appear at consecutive positions; score = Σ_slot
    (per-doc slot contribution).
    """
    # per slot: (doc,pos) pair set + per-doc score
    slot_pairs: list[np.ndarray] = [None] * n_slots  # type: ignore[list-item]
    slot_scores: list[tuple[np.ndarray, np.ndarray]] = [None] * n_slots  # type: ignore[list-item]
    SHIFT = np.int64(1) << np.int64(32)

    by_slot: dict[int, list] = {}
    for slot, docs, contrib, r in parts:
        by_slot.setdefault(slot, []).append((docs, contrib, r))
    for s in range(n_slots):
        if s not in by_slot:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        pair_chunks, d_chunks, s_chunks = [], [], []
        for docs, contrib, r in by_slot[s]:
            counts, flat = encoding.decode_positions(
                bytes(r.pos_counts), bytes(r.pos_deltas)
            )
            doc_rep = np.repeat(docs, counts)
            pair_chunks.append(doc_rep * SHIFT + flat)
            d_chunks.append(docs)
            s_chunks.append(contrib)
        slot_pairs[s] = np.unique(np.concatenate(pair_chunks))
        cat_d = np.concatenate(d_chunks)
        cat_s = np.concatenate(s_chunks)
        ud, inv = np.unique(cat_d, return_inverse=True)
        slot_scores[s] = (ud, np.bincount(inv, weights=cat_s))

    valid = slot_pairs[0]
    for s in range(1, n_slots):
        valid = np.intersect1d(valid + 1, slot_pairs[s], assume_unique=True)
    if valid.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    matched = np.unique(valid >> np.int64(32))
    # score: sum per-slot contributions for matched docs
    total = np.zeros(matched.size, dtype=np.float64)
    for ud, sc in slot_scores:
        idx = np.searchsorted(ud, matched)
        idx = np.clip(idx, 0, max(ud.size - 1, 0))
        mask = (ud.size > 0) & (ud[idx] == matched)
        total = total + np.where(mask, sc[idx], 0.0)
    return matched, total
