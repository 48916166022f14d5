"""Programmatic Lucene query nodes (no query-string form).

SynonymQuery semantics (lucene/core SynonymQuery.java, public
behavior): the group scores as ONE pseudo-term — member term
frequencies SUM per doc BEFORE BM25 tf-saturation, and the blended
docFreq is the MAX over the members' docFreqs. This is observably
different from an OR over the same terms (which saturates each term
separately and sums scores): engine and pure-Python oracle must agree
to 1e-9, and both must exhibit the blend-vs-OR gap.

SpanFirstQuery semantics (lucene SpanFirstQuery.java + SpanScorer):
match only occurrences at 0-based position < end (span end <= end);
freq = the restricted count, idf = the term's FULL docFreq.
"""

from __future__ import annotations

import pytest

from codeindex_spark.corpus import CorpusSpec, generate_documents, spark_documents
from codeindex_spark.index.build import IndexParams
from codeindex_spark.index.segments import IndexBuilder, IndexReader
from codeindex_spark.query import ast
from codeindex_spark.query.oracle import OracleIndex
from codeindex_spark.query.planner import SearchEngine

SPEC = CorpusSpec(n_docs=120)
PARAMS = IndexParams(num_buckets=16, block_size=32)
K = 50


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synidx"))
    docs = spark_documents(spark, SPEC, partitions=4)
    IndexBuilder(spark, d, PARAMS, n_groups=2).build(docs, resume=False)
    return SearchEngine(IndexReader(spark, d))


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex.build(
        generate_documents(SPEC),
        num_buckets=PARAMS.num_buckets,
        block_size=PARAMS.block_size,
        k1=PARAMS.k1,
        b=PARAMS.b,
    )


def _ranked(engine_df):
    return [(r["doc_id"], r["score"]) for r in engine_df.collect()]


def assert_rank_identical(engine_df, oracle_ranked, k=K):
    got = _ranked(engine_df)
    exp = oracle_ranked[:k]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9), (gd, gs, es)


SYN_CASES = [
    ast.Synonyms(("get", "set")),
    ast.Synonyms(("string", "return")),
    ast.Synonyms(("index", "writer", "document")),
    # one member missing from the dictionary: ignored, df-max over
    # the present ones only
    ast.Synonyms(("get", "zzz_not_a_token_qq")),
]


@pytest.mark.parametrize("node", SYN_CASES, ids=lambda n: "|".join(n.terms))
def test_synonyms_rank_identity(engine, oracle, node):
    assert oracle.search(node, k=K), "fixture must match something"
    assert_rank_identical(engine.search(node, k=K), oracle.search(node, k=K))


def test_synonyms_differ_from_or(engine, oracle):
    """The blend must NOT equal the OR score on docs containing both
    members (per-term saturation vs saturation of the summed tf), and
    engine/oracle must agree on both shapes."""
    syn = ast.Synonyms(("get", "string"))
    orq = ast.Or((ast.Term("get"), ast.Term("string")))
    syn_scores = dict(oracle.search(syn, k=10_000))
    or_scores = dict(oracle.search(orq, k=10_000))
    both = [
        d
        for d in syn_scores
        if d in oracle.eval(ast.Term("get"))
        and d in oracle.eval(ast.Term("string"))
    ]
    assert both, "fixture needs docs containing both members"
    # concave saturation: blend of summed tf <= sum of saturated terms
    # when idfs equal; with df-max blending strict inequality holds on
    # any doc holding both members
    assert all(
        syn_scores[d] != pytest.approx(or_scores[d], rel=1e-9) for d in both
    )
    assert_rank_identical(engine.search(syn, k=K), oracle.search(syn, k=K))
    assert_rank_identical(engine.search(orq, k=K), oracle.search(orq, k=K))


def test_synonyms_inside_bool_tree(engine, oracle):
    q = ast.And((ast.Synonyms(("get", "set")), ast.Term("index")))
    assert oracle.search(q, k=K)
    assert_rank_identical(engine.search(q, k=K), oracle.search(q, k=K))
    q2 = ast.Or((ast.Synonyms(("string", "return")), ast.Term("writer")))
    assert_rank_identical(engine.search(q2, k=K), oracle.search(q2, k=K))


def test_synonyms_boost(engine, oracle):
    plain = ast.Synonyms(("get", "set"))
    boosted = ast.Synonyms(("get", "set"), boost=2.5)
    p = dict(oracle.search(plain, k=10_000))
    b = dict(oracle.search(boosted, k=10_000))
    assert set(p) == set(b)
    for d, s in p.items():
        assert b[d] == pytest.approx(2.5 * s, rel=1e-12)
    assert_rank_identical(engine.search(boosted, k=K), oracle.search(boosted, k=K))


def test_single_member_equals_term(engine, oracle):
    """A one-member group degenerates to the plain term query (same
    df, same tf) — engine and oracle both."""
    syn = ast.Synonyms(("writer",))
    term = ast.Term("writer")
    assert oracle.search(syn, k=K) == oracle.search(term, k=K)
    assert _ranked(engine.search(syn, k=K)) == _ranked(engine.search(term, k=K))


def test_all_members_missing_is_empty(engine, oracle):
    syn = ast.Synonyms(("zz_qq_none", "zz_qq_none2"))
    assert oracle.search(syn, k=K) == []
    assert engine.search(syn, k=K).count() == 0


SPAN_CASES = [
    ast.SpanFirst("get", 5),
    ast.SpanFirst("string", 20),
    ast.SpanFirst("index", 12, boost=1.5),
    ast.And((ast.SpanFirst("get", 15), ast.Term("writer"))),
    ast.Or((ast.SpanFirst("sort", 8), ast.Synonyms(("string", "return")))),
]


@pytest.mark.parametrize("node", SPAN_CASES, ids=lambda n: repr(n)[:40])
def test_span_first_rank_identity(engine, oracle, node):
    assert oracle.search(node, k=K), "fixture must match something"
    assert_rank_identical(engine.search(node, k=K), oracle.search(node, k=K))


def test_span_first_restricts_matches(oracle):
    """Tightening end can only shrink the match set, and a huge end
    degenerates to the plain term query (same docs, same scores —
    idf is the full-df idf in both)."""
    loose = dict(oracle.search(ast.SpanFirst("get", 10**9), k=10_000))
    tight = dict(oracle.search(ast.SpanFirst("get", 4), k=10_000))
    term = dict(oracle.search(ast.Term("get"), k=10_000))
    assert loose == term
    assert set(tight) <= set(loose)
    assert len(tight) < len(loose)
    # a doc whose first 'get' sits past position 4 scores LESS than
    # its unrestricted score; never more
    for d, s in tight.items():
        assert s <= loose[d] + 1e-12


def test_span_first_engine_degenerate_end(engine):
    big = [
        (r["doc_id"], r["score"])
        for r in engine.search(ast.SpanFirst("get", 10**9), k=K).collect()
    ]
    term = [
        (r["doc_id"], r["score"])
        for r in engine.search(ast.Term("get"), k=K).collect()
    ]
    assert big == term


def test_span_first_validation(engine):
    with pytest.raises(ValueError, match="end must be >= 1"):
        engine.search(ast.SpanFirst("get", 0), k=5).collect()
    with pytest.raises(ValueError, match="without positions"):
        engine.search(
            ast.SpanFirst("get", 5, field="content_camel"), k=5
        ).collect()


def test_span_first_wand_topk_sound(engine, oracle):
    """WAND block bound (full-tf contribution) upper-bounds the
    restricted span score, so span-first top-k stays exact."""
    q = ast.Or((ast.SpanFirst("get", 10), ast.Term("index")))
    exp = oracle.search(q, k=10)
    got = _ranked(engine.search_wand(q, k=10))
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9)


def test_expand_synonyms_rewrite(engine, oracle):
    """Query-time synonym expansion: Terms with a mapping entry become
    Synonyms groups (field+boost preserved), everything else is left
    alone; the rewritten tree stays engine/oracle rank-identical."""
    mapping = {"get": ("set",), "string": ("return",)}
    parsed = ast.parse_query("get AND (string OR writ*)")
    rewritten = ast.expand_synonyms(parsed, mapping)
    assert rewritten == ast.And(
        (
            ast.Synonyms(("get", "set")),
            ast.Or((ast.Synonyms(("string", "return")), ast.Wildcard("writ*"))),
        )
    )
    # boost preserved; self-references deduped
    b = ast.expand_synonyms(ast.Term("get", boost=2.0), {"get": ("get", "set")})
    assert b == ast.Synonyms(("get", "set"), boost=2.0)
    assert oracle.search(rewritten, k=K)
    assert_rank_identical(
        engine.search(rewritten, k=K), oracle.search(rewritten, k=K)
    )


DISMAX_CASES = [
    ast.DisMax((ast.Term("get"), ast.Term("string"))),
    ast.DisMax(
        (ast.Term("get"), ast.Term("string"), ast.Term("index")),
        tie_breaker=0.3,
    ),
    ast.And(
        (ast.DisMax((ast.Term("get"), ast.Term("writer")), 0.5),
         ast.Term("index"))
    ),
    ast.DisMax(
        (ast.ConstantScore(ast.Term("get"), 0.5),
         ast.Synonyms(("string", "return"))),
        0.2,
    ),
]


@pytest.mark.parametrize("node", DISMAX_CASES, ids=lambda n: repr(n)[:40])
def test_dismax_rank_identity(engine, oracle, node):
    assert oracle.search(node, k=K), "fixture must match something"
    assert_rank_identical(engine.search(node, k=K), oracle.search(node, k=K))


def test_dismax_tie_semantics(oracle):
    """tie=0 is the pure max of the matching children; tie=1
    degenerates to Or (same docs, same scores)."""
    a, b = ast.Term("get"), ast.Term("string")
    sa, sb = oracle.eval(a), oracle.eval(b)
    dm0 = dict(oracle.search(ast.DisMax((a, b)), k=10_000))
    for d, s in dm0.items():
        assert s == pytest.approx(
            max(sa.get(d, -1e30), sb.get(d, -1e30)), rel=1e-12
        )
    dm1 = oracle.search(ast.DisMax((a, b), 1.0), k=10_000)
    orr = oracle.search(ast.Or((a, b)), k=10_000)
    assert [d for d, _ in dm1] == [d for d, _ in orr]
    for (_, x), (_, y) in zip(dm1, orr):
        assert x == pytest.approx(y, rel=1e-12)


def test_dismax_boost_distributes(oracle):
    """apply_boost on a DisMax pushes into the children (linearity):
    scores scale exactly."""
    node = ast.DisMax((ast.Term("get"), ast.Term("string")), 0.4)
    plain = dict(oracle.search(node, k=10_000))
    boosted = dict(oracle.search(ast.apply_boost(node, 2.0), k=10_000))
    assert set(plain) == set(boosted)
    for d, s in plain.items():
        assert boosted[d] == pytest.approx(2.0 * s, rel=1e-12)


def test_constant_score(engine, oracle):
    node = ast.ConstantScore(ast.Or((ast.Term("get"), ast.Term("string"))), 3.5)
    got = _ranked(engine.search(node, k=K))
    exp = oracle.search(node, k=K)
    assert [d for d, _ in got] == [d for d, _ in exp]
    assert all(s == 3.5 for _, s in got)
    # matching set == the child's matching set
    child_docs = set(oracle.eval(node.child))
    assert set(oracle.eval(node)) == child_docs
    # apply_boost scales the constant, not the child
    assert ast.apply_boost(node, 2.0) == ast.ConstantScore(node.child, 7.0)


def test_constant_score_wand_falls_back_exact(engine, oracle):
    """A constant boost above every BM25 block bound would break WAND
    pruning; search_wand must detect the wrapper and return the exact
    top-k anyway."""
    q = ast.Or((ast.ConstantScore(ast.Term("get"), 50.0), ast.Term("index")))
    exp = oracle.search(q, k=10)
    got = _ranked(engine.search_wand(q, k=10))
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9)


def test_dismax_wand_topk_sound(engine, oracle):
    """DisMax <= sum of children (tie <= 1), so the summed block
    bound stays an upper bound and WAND pruning stays exact."""
    q = ast.DisMax((ast.Term("get"), ast.Term("string")), 0.4)
    exp = oracle.search(q, k=10)
    got = _ranked(engine.search_wand(q, k=10))
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_synonyms_wand_topk_sound(engine, oracle):
    """Block-max WAND must return the exact top-k for a synonym group:
    the per-row UB remains an upper bound because BM25 saturation is
    concave/subadditive (see search_wand docstring)."""
    q = ast.Or((ast.Synonyms(("get", "string")), ast.Term("index")))
    exp = oracle.search(q, k=10)
    got = _ranked(engine.search_wand(q, k=10))
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9)


# ---------------------------------------------------------- SpanOr

SPANOR_CASES = [
    ast.SpanOr(("get", "set")),
    ast.SpanOr(("string", "return")),
    ast.SpanOr(("index", "writer", "document")),
    ast.SpanOr(("get", "zzz_not_a_token_qq")),  # missing member ignored
]


@pytest.mark.parametrize("node", SPANOR_CASES, ids=lambda n: "|".join(n.terms))
def test_spanor_rank_identity(engine, oracle, node):
    assert oracle.search(node, k=K), "fixture must match something"
    assert_rank_identical(engine.search(node, k=K), oracle.search(node, k=K))


def test_spanor_differs_from_synonyms_and_or(oracle):
    """Same member set, three different Lucene scorings: OR (per-term
    saturation, summed), SynonymQuery (summed tf, max-df idf), and
    SpanOr (summed tf, SUMMED per-term idf). All three must disagree
    on docs holding both members — and SpanOr must equal Synonyms
    scaled by idf_sum/idf_maxdf (same tf blend, different idf)."""
    terms = ("get", "string")
    spanor = dict(oracle.search(ast.SpanOr(terms), k=10_000))
    syn = dict(oracle.search(ast.Synonyms(terms), k=10_000))
    orq = dict(oracle.search(ast.Or(tuple(ast.Term(t) for t in terms)), k=10_000))
    both = [
        d for d in spanor
        if d in oracle.eval(ast.Term("get"))
        and d in oracle.eval(ast.Term("string"))
    ]
    assert both
    from codeindex_spark.query.planner import idf_bm25

    n, _ = oracle.stats["content"]
    idf_sum = idf_bm25(n, len(oracle.postings["content"]["get"])) + idf_bm25(
        n, len(oracle.postings["content"]["string"])
    )
    idf_max = idf_bm25(
        n,
        max(
            len(oracle.postings["content"]["get"]),
            len(oracle.postings["content"]["string"]),
        ),
    )
    for d in both:
        assert spanor[d] != pytest.approx(syn[d], rel=1e-9)
        assert spanor[d] != pytest.approx(orq[d], rel=1e-9)
        assert spanor[d] == pytest.approx(
            syn[d] * idf_sum / idf_max, rel=1e-9
        )


def test_spanor_single_member_equals_term(engine, oracle):
    so = ast.SpanOr(("writer",))
    term = ast.Term("writer")
    assert oracle.search(so, k=K) == oracle.search(term, k=K)
    assert _ranked(engine.search(so, k=K)) == _ranked(engine.search(term, k=K))


def test_spanor_all_missing_empty(engine, oracle):
    so = ast.SpanOr(("zz_qq_none", "zz_qq_none2"))
    assert oracle.search(so, k=K) == []
    assert engine.search(so, k=K).count() == 0


def test_spanor_boost_and_composition(engine, oracle):
    plain = ast.SpanOr(("get", "set"))
    boosted = ast.SpanOr(("get", "set"), boost=1.7)
    p = dict(oracle.search(plain, k=10_000))
    b = dict(oracle.search(boosted, k=10_000))
    assert set(p) == set(b)
    for d, s in p.items():
        assert b[d] == pytest.approx(1.7 * s, rel=1e-12)
    tree = ast.And((plain, ast.Term("index")))
    assert oracle.search(tree, k=K)
    assert_rank_identical(engine.search(tree, k=K), oracle.search(tree, k=K))
