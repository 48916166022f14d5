"""Percolation — reverse search: REGISTER queries once, then match
every incoming document against the registry (the Lucene Monitor /
Luwak operation; Elasticsearch exposes the same thing as percolate
queries). The reference's watcher loop re-runs user searches against
changed files (IndexMaintainer.cs:84-134 rebuilds, then users re-query)
— percolation packages that "which saved searches does this new doc
hit?" step as a single operator, usable batch or streaming.

Design (Monitor's, re-expressed for Spark):

- Queries are parsed ONCE on the driver into the engine-neutral AST
  and shipped in the task closure (registries are tiny next to
  corpora — 10^3..10^5 entries; see the scale note below for more).
- Documents flow through ``mapInPandas``; each Arrow batch becomes an
  in-memory index (the MemoryIndex-per-doc-batch pattern Lucene
  Monitor's batch CandidateMatcher uses) and every surviving
  registered query is evaluated against it. The evaluator is the
  pure-Python ``OracleIndex`` — the same one the rank-identity suite
  pins against the Spark engine — restricted to the fields the
  registry references, so the per-batch cost is one tokenize pass.
- Matching is document-centric and corpus-stat-free: whether a
  term / boolean / phrase / span / wildcard / fuzzy / regexp query
  matches doc d depends only on d's own tokens, so per-batch
  evaluation is EXACT. Scores are corpus-stat-dependent and are NOT
  reported — percolation answers "which (doc, query) pairs match",
  like Monitor's QueryMatch default. Multi-term expansion happens
  against the document's own vocabulary (MemoryIndex semantics), so
  the engine's global MAX_EXPANSIONS dictionary cap does not apply.
- A presearcher term filter (Monitor's TermFilteredPresearcher idea)
  skips queries that cannot match anything in the batch: each query
  publishes a set S of (field, term) pairs such that any matching
  doc must contain AT LEAST ONE member of S; the query is evaluated
  only when S intersects the batch vocabulary. Pattern-only queries
  (wildcard / fuzzy / regexp / range in every conjunct) publish no
  filter and are always evaluated.

Scale shape: documents partition freely — the kernel is a stateless
map, so the same call works unchanged on a Structured Streaming
DataFrame (percolate-on-ingest; see tests). Per batch the work is
one tokenize pass plus |surviving queries| postings-dict probes. At
10^6+ registered queries, shard the registry by presearcher term
into a DataFrame and semi-join batch vocabularies instead of
broadcasting — this kernel is the per-shard unit.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from codeindex_spark.query import ast

__all__ = [
    "QueryRegistry",
    "percolate",
    "percolate_indexed",
    "required_any",
]


def _pattern_slot(s: str) -> bool:
    return "*" in s or "?" in s


def required_any(node: ast.Node) -> frozenset | None:
    """Presearcher filter: a set of (field, term) pairs such that any
    document matching ``node`` contains at least one of them; None
    when no such finite set exists (pattern leaves in every
    conjunct). Soundness is what matters — a superset-matching filter
    only costs evaluations, a wrong one loses matches:

    - AND-like nodes may return ANY child's set (every child must
      match); the smallest is chosen.
    - OR-like nodes must union ALL children's sets; one None child
      poisons the union.
    - NOT / SpanNot filter on the positive / include side only.
    - Bool follows its documented matching set: must+filter anchor if
      present, otherwise at least one should must match.
    """
    if isinstance(node, ast.Term):
        return frozenset({(node.field, node.term)})
    if isinstance(node, (ast.Synonyms, ast.SpanOr)):
        return frozenset((node.field, t) for t in node.terms)
    if isinstance(node, (ast.Wildcard, ast.Fuzzy, ast.Regexp, ast.Range)):
        return None
    if isinstance(node, ast.Phrase):
        best = None
        for s in node.slots:
            if isinstance(s, str) and not _pattern_slot(s):
                cand = frozenset({(node.field, s)})
            elif isinstance(s, tuple):
                cand = frozenset((node.field, t) for t in s)
            else:
                continue
            if best is None or len(cand) < len(best):
                best = cand
        return best
    if isinstance(node, ast.SpanFirst):
        return frozenset(
            (node.field, t) for t in ast.span_member_terms(node.term)
        )
    if isinstance(node, ast.SpanNot):
        return frozenset(
            (node.field, t) for t in ast.span_member_terms(node.include)
        )
    if isinstance(node, ast.ConstantScore):
        return required_any(node.child)
    if isinstance(node, ast.Not):
        return required_any(node.positive)
    if isinstance(node, ast.And):
        best = None
        for c in node.children:
            s = required_any(c)
            if s is not None and (best is None or len(s) < len(best)):
                best = s
        return best
    if isinstance(node, (ast.Or, ast.DisMax)):
        out: set = set()
        for c in node.children:
            s = required_any(c)
            if s is None:
                return None
            out |= s
        return frozenset(out)
    if isinstance(node, ast.Bool):
        anchors = tuple(node.must) + tuple(node.filter)
        if anchors:
            best = None
            for c in anchors:
                s = required_any(c)
                if s is not None and (best is None or len(s) < len(best)):
                    best = s
            return best
        out = set()
        for c in node.should:
            s = required_any(c)
            if s is None:
                return None
            out |= s
        # no positives at all -> Lucene's match-nothing pure-negative
        # BooleanQuery; the empty set correctly never intersects
        return frozenset(out)
    return None


def _node_fields(node: ast.Node, out: set) -> None:
    f = getattr(node, "field", None)
    if f is not None:
        out.add(f)
    for attr in ("children", "must", "should", "must_not", "filter"):
        for c in getattr(node, attr, ()) or ():
            _node_fields(c, out)
    for attr in ("child", "positive", "negative"):
        c = getattr(node, attr, None)
        if c is not None:
            _node_fields(c, out)


class QueryRegistry:
    """Parsed, presearcher-annotated query set. ``queries`` maps a
    query id to a query string (classic-parser syntax) or a
    programmatic AST node; strings parse with ``case_sensitive``
    routing the default field to the cased twin, exactly like
    SearchEngine.score."""

    def __init__(
        self,
        queries: dict[str, ast.Node | str],
        case_sensitive: bool = False,
    ):
        if not queries:
            raise ValueError("empty query registry")
        self.entries: dict[str, tuple[ast.Node, frozenset | None]] = {}
        flds: set = set()
        for qid, q in queries.items():
            node = (
                ast.parse_query(q, case_sensitive) if isinstance(q, str) else q
            )
            self.entries[str(qid)] = (node, required_any(node))
            _node_fields(node, flds)
        self.fields: tuple[str, ...] = tuple(sorted(flds))


def percolate(
    docs: DataFrame,
    registry: QueryRegistry | dict,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
    path_col: str | None = None,
) -> DataFrame:
    """(id_col, query_id) pairs: which registered queries match which
    documents. ``path_col`` feeds the file_name / file_path /
    path_trigram fields when the registry references them; without
    it, those fields see a synthetic per-row path and only
    content-family queries are meaningful. Works on batch AND
    streaming DataFrames (stateless map)."""
    if isinstance(registry, dict):
        registry = QueryRegistry(registry)
    entries = registry.entries
    flds = registry.fields
    needs_path = bool(
        {"file_name", "file_path", "path_trigram"} & set(flds)
    )
    if needs_path and path_col is None:
        raise ValueError(
            "registry references path-derived fields; pass path_col"
        )
    id_type = docs.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField(id_col, id_type, True),
            T.StructField("query_id", T.StringType(), False),
        ]
    )
    cols = [id_col, text_col] + ([path_col] if path_col else [])
    # the per-batch build+eval kernel is the whole cost of this op:
    # fan the doc rows out first or a 1-2-split parquet scan
    # serializes it on as many cores (no-op on streaming inputs and
    # on scans that already have enough splits)
    from codeindex_spark.util import ensure_parallelism

    src = ensure_parallelism(docs.select(*dict.fromkeys(cols)), factor=1)

    def kernel(batches):
        from codeindex_spark.query.oracle import OracleIndex

        for b in batches:
            if not len(b):
                continue
            frame = pd.DataFrame(
                {
                    "repo": "r",
                    "path": (
                        b[path_col].astype(str)
                        if path_col
                        else b[id_col].astype(str) + ".d"
                    ),
                    "commit": "c",
                    "content": b[text_col].fillna("").astype(str),
                    "_orig": b[id_col].values,
                }
            )
            idx = OracleIndex.build(
                frame, num_buckets=1, block_size=128, fields=flds
            )
            orig = dict(zip(idx.docs["doc_id"], idx.docs["_orig"]))
            vocab = {
                (f, t) for f, post in idx.postings.items() for t in post
            }
            out_ids, out_qids = [], []
            for qid, (node, req) in entries.items():
                if req is not None and not (req & vocab):
                    continue
                for d in idx.eval(node):
                    out_ids.append(orig[d])
                    out_qids.append(qid)
            if out_ids:
                yield pd.DataFrame(
                    {id_col: out_ids, "query_id": out_qids}
                )

    return src.mapInPandas(kernel, schema)


def _safe_str(v) -> str:
    """None/NaN-tolerant string coercion for doc text/path cells."""
    if v is None or (isinstance(v, float) and v != v):
        return ""
    return str(v)


# doc-side tokenizers for the query-index join: field -> fn(text, path)
def _field_terms(field: str, text: str, path: str) -> set:
    from codeindex_spark.tokenizer import tokenize, tokenize_lower

    if field == "content":
        return set(tokenize_lower(text))
    if field == "content_cs":
        return set(tokenize(text))
    if field == "content_camel":
        from codeindex_spark.tokenizer import camel_token_stream

        return set(camel_token_stream(text))
    if field == "file_name":
        name = path.rsplit("/", 1)[-1]
        return set(tokenize_lower(name))
    if field == "file_path":
        return set(tokenize_lower(path))
    if field == "path_trigram":
        p = path.lower()
        return {p[i : i + 3] for i in range(max(len(p) - 2, 0))}
    raise ValueError(f"unknown index field: {field!r}")


def percolate_indexed(
    docs: DataFrame,
    queries_df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "content",
    path_col: str | None = None,
    case_sensitive: bool = False,
) -> DataFrame:
    """The SCALE path for percolation: instead of broadcasting the
    registry, build an INDEX OF QUERIES — the full Lucene Monitor /
    Elasticsearch-percolator design. ``queries_df`` is a DataFrame
    (query_id string, query string) of classic-parser query strings
    (the distributed variant is strings-only; programmatic AST nodes
    stay on the broadcast path). Works at 10^6+ registered queries:
    the registry is never collected to the driver or shipped whole to
    any task.

    Plan shape:
    1. Queries parse on executors (mapInPandas); each emits its
       presearcher anchor terms — the required_any set (rows
       (query_id, query, field, term)) — or one NULL-term row when no
       finite filter exists. A query whose anchor set is EMPTY
       (Lucene's match-nothing pure-negative bool) emits nothing and
       is correctly never evaluated.
    2. Docs emit their distinct (field, term) vocabulary for exactly
       the fields the registry references (one tokenize pass).
    3. Candidate (doc, query) pairs = vocabulary ⋈ anchors on
       (field, term) — the inverted-index-of-queries join; NULL-anchor
       queries cross-join in via broadcast (they must always be
       evaluated; keep them rare, as Monitor does).
    4. Candidates reduce to one query LIST per doc (collect_set — the
       doc's text is joined ONCE, never fanned out per candidate),
       then a final Arrow pass builds each doc's single-doc index and
       evaluates just its candidate queries (parse memoized per
       executor).

    Presearcher soundness (tests + the hypothesis sweep) is what
    makes step 3 lossless: a doc that matches a query always contains
    at least one anchor term. Skew note: a stopword-grade anchor term
    produces a hot join key; anchors already pick each query's
    SMALLEST safe set, and at Monitor scale you additionally bias
    anchor selection toward rare terms (df-aware anchor choice is a
    straightforward extension — the join itself is AQE-skew-eligible).
    """
    id_type = docs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type, True),
            T.StructField("query_id", T.StringType(), False),
        ]
    )
    anchor_schema = T.StructType(
        [
            T.StructField("query_id", T.StringType(), False),
            T.StructField("query", T.StringType(), False),
            T.StructField("field", T.StringType(), True),
            T.StructField("term", T.StringType(), True),
        ]
    )
    cs = bool(case_sensitive)

    def parse_kernel(batches):
        for b in batches:
            rows = []
            for qid, qs in zip(b["query_id"], b["query"]):
                node = ast.parse_query(qs, cs)
                req = required_any(node)
                if req is None:
                    rows.append((str(qid), qs, None, None))
                else:
                    for f, t in sorted(req):
                        rows.append((str(qid), qs, f, t))
            if rows:
                yield pd.DataFrame(
                    rows, columns=["query_id", "query", "field", "term"]
                )

    qanchors = queries_df.select("query_id", "query").mapInPandas(
        parse_kernel, anchor_schema
    )
    anchored = qanchors.filter(F.col("term").isNotNull())
    unanchored = qanchors.filter(F.col("term").isNull()).select(
        "query_id", "query"
    ).dropDuplicates(["query_id"])

    # fields the registry references: bounded by the 6 index fields,
    # so this collect is a constant-size driver slice
    fields = sorted(
        r["field"]
        for r in anchored.select("field").distinct().collect()
    )
    # re-parse locally only to detect path-field use by UNanchored
    # queries (bounded: unanchored rows are the pattern-only queries)
    un_rows = unanchored.collect()
    un_fields: set = set()
    for r in un_rows:
        _node_fields(ast.parse_query(r["query"], cs), un_fields)
    needs_path = bool(
        {"file_name", "file_path", "path_trigram"}
        & (set(fields) | un_fields)
    )
    if needs_path and path_col is None:
        raise ValueError(
            "registry references path-derived fields; pass path_col"
        )
    all_fields = tuple(sorted(set(fields) | un_fields))

    cols = [id_col, text_col] + ([path_col] if path_col else [])
    src = docs.select(*dict.fromkeys(cols))
    vocab_schema = T.StructType(
        [
            T.StructField(id_col, id_type, True),
            T.StructField("field", T.StringType(), False),
            T.StructField("term", T.StringType(), False),
        ]
    )
    vfields = tuple(fields)

    def vocab_kernel(batches):
        for b in batches:
            ids, fs, ts = [], [], []
            for i in range(len(b)):
                did = b[id_col].iloc[i]
                text = _safe_str(b[text_col].iloc[i])
                path = _safe_str(b[path_col].iloc[i]) if path_col else ""
                for f in vfields:
                    for t in _field_terms(f, text, path):
                        ids.append(did)
                        fs.append(f)
                        ts.append(t)
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "field": fs, "term": ts}
                )

    cand = (
        src.mapInPandas(vocab_kernel, vocab_schema)
        .join(anchored, ["field", "term"])
        .select(id_col, "query_id", "query")
        .dropDuplicates([id_col, "query_id"])
    )
    if un_rows:
        always = docs.select(id_col).crossJoin(
            F.broadcast(
                docs.sparkSession.createDataFrame(
                    [(r["query_id"], r["query"]) for r in un_rows],
                    "query_id string, query string",
                )
            )
        )
        cand = cand.unionByName(always)
    per_doc = cand.groupBy(id_col).agg(
        F.collect_set(F.struct("query_id", "query")).alias("_cands")
    )
    joined = src.join(per_doc, id_col)
    afields = all_fields

    def eval_kernel(batches):
        import functools

        from codeindex_spark.query.oracle import OracleIndex

        @functools.lru_cache(maxsize=65536)
        def parse(qs: str):
            return ast.parse_query(qs, cs)

        for b in batches:
            out_ids, out_qids = [], []
            for i in range(len(b)):
                did = b[id_col].iloc[i]
                frame = pd.DataFrame(
                    {
                        "repo": ["r"],
                        "path": [
                            _safe_str(b[path_col].iloc[i])
                            if path_col
                            else str(did) + ".d"
                        ],
                        "commit": ["c"],
                        "content": [_safe_str(b[text_col].iloc[i])],
                    }
                )
                idx = OracleIndex.build(
                    frame, num_buckets=1, block_size=128, fields=afields
                )
                for c in b["_cands"].iloc[i]:
                    if idx.eval(parse(c["query"])):
                        out_ids.append(did)
                        out_qids.append(c["query_id"])
            if out_ids:
                yield pd.DataFrame(
                    {id_col: out_ids, "query_id": out_qids}
                )

    return joined.mapInPandas(eval_kernel, out_schema)
