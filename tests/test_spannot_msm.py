"""SpanNotQuery + BooleanQuery.minimumNumberShouldMatch.

SpanNotQuery semantics (lucene SpanNotQuery.java, public behavior,
ctor SpanNotQuery(include, exclude, pre, post)): an include occurrence
at position p survives iff no exclude occurrence q satisfies
p - pre <= q <= p + post; freq = the surviving count, idf = the
include term's FULL docFreq (SpanWeight term statistics). Docs where
exclude never occurs keep every occurrence.

minimumNumberShouldMatch (BooleanQuery.Builder, public behavior,
MinShouldMatchSumScorer): a doc matches only if it satisfies every
MUST clause and at least n SHOULD clauses; the score stays the plain
sum of the matching positive clauses. n > len(should) matches nothing.

Engine (block kernel) and pure-Python oracle must rank-agree to 1e-9.
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
    d = str(tmp_path_factory.mktemp("snotidx"))
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


SNOT_CASES = [
    ast.SpanNot("get", "string", pre=2, post=2),
    ast.SpanNot("index", "writer", pre=1, post=3),
    ast.SpanNot("return", "get", pre=0, post=0),
    ast.SpanNot("string", "zzq_not_a_token", pre=5, post=5),  # no exclude
    ast.SpanNot("document", "index", pre=10, post=10),
    ast.SpanNot("writer", "writer", pre=0, post=0),  # self-exclusion: empty
]


def _ids(n):
    return f"{n.include}!{n.exclude}~{n.pre},{n.post}"


@pytest.mark.parametrize("node", SNOT_CASES, ids=_ids)
def test_spannot_rank_identity(engine, oracle, node):
    assert_rank_identical(engine.search(node, k=K), oracle.search(node, k=K))


def test_spannot_fixture_is_meaningful(oracle):
    """The windowed cases must actually exclude something: strictly
    fewer match positions than the plain include term somewhere."""
    plain = {d: s for d, s in oracle.search(ast.Term("get"), k=10_000)}
    node = ast.SpanNot("get", "string", pre=2, post=2)
    restricted = dict(oracle.search(node, k=10_000))
    assert restricted, "restriction must still match some docs"
    assert set(restricted) <= set(plain)
    dropped_or_damped = [
        d for d, s in plain.items()
        if d not in restricted or restricted[d] < s - 1e-12
    ]
    assert dropped_or_damped, "exclusion never fired — weak fixture"


def test_spannot_no_exclude_equals_term(engine, oracle):
    """Exclude term absent from the dictionary: degenerates to the
    plain term query (full tf, full df)."""
    node = ast.SpanNot("string", "zzq_not_a_token", pre=5, post=5)
    term = ast.Term("string")
    assert oracle.search(node, k=K) == oracle.search(term, k=K)
    assert _ranked(engine.search(node, k=K)) == _ranked(engine.search(term, k=K))


def test_spannot_self_exclusion_empty(engine, oracle):
    node = ast.SpanNot("writer", "writer", pre=0, post=0)
    assert oracle.search(node, k=K) == []
    assert engine.search(node, k=K).count() == 0


def test_spannot_boost_and_composition(engine, oracle):
    boosted = ast.SpanNot("get", "string", pre=2, post=2, boost=2.0)
    plainn = ast.SpanNot("get", "string", pre=2, post=2)
    p = dict(oracle.search(plainn, k=10_000))
    b = dict(oracle.search(boosted, k=10_000))
    assert set(p) == set(b)
    for d, s in p.items():
        assert b[d] == pytest.approx(2.0 * s, rel=1e-12)
    tree = ast.And((plainn, ast.Term("index")))
    assert oracle.search(tree, k=K), "composed fixture must match"
    assert_rank_identical(engine.search(tree, k=K), oracle.search(tree, k=K))


# ---------------------------------------------- minimum_should_match

MSM_CASES = [
    ast.Bool(
        must=(ast.Term("get"),),
        should=(ast.Term("string"), ast.Term("index"), ast.Term("writer")),
        min_should_match=2,
    ),
    ast.Bool(
        should=(ast.Term("get"), ast.Term("set"), ast.Term("return")),
        min_should_match=2,
    ),
    ast.Bool(
        should=(ast.Term("get"), ast.Term("string"), ast.Term("writer")),
        min_should_match=3,
    ),
    ast.Bool(
        must=(ast.Term("index"),),
        should=(ast.Term("get"), ast.Term("writer")),
        must_not=(ast.Term("zzq_not_a_token"),),
        min_should_match=1,
    ),
]


@pytest.mark.parametrize("node", MSM_CASES, ids=lambda n: (
    f"m{len(n.must)}s{len(n.should)}n{len(n.must_not)}msm{n.min_should_match}"
))
def test_msm_rank_identity(engine, oracle, node):
    assert oracle.search(node, k=K), "msm fixture must match something"
    assert_rank_identical(engine.search(node, k=K), oracle.search(node, k=K))


def test_msm_actually_filters(oracle):
    """msm=2 must be a strict subset of the default pure-should bool,
    with identical scores on the survivors (filter, not re-score)."""
    should = (ast.Term("get"), ast.Term("set"), ast.Term("return"))
    loose = dict(oracle.search(ast.Bool(should=should), k=10_000))
    tight = dict(
        oracle.search(ast.Bool(should=should, min_should_match=2), k=10_000)
    )
    assert tight and set(tight) < set(loose)
    for d, s in tight.items():
        assert loose[d] == pytest.approx(s, rel=1e-12)


def test_msm_unsatisfiable_matches_nothing(engine, oracle):
    node = ast.Bool(
        should=(ast.Term("get"), ast.Term("set")), min_should_match=3
    )
    assert oracle.search(node, k=K) == []
    assert engine.search(node, k=K).count() == 0


def test_msm_zero_is_default_bool(engine, oracle):
    base = dict(
        must=(ast.Term("get"),),
        should=(ast.Term("string"), ast.Term("index")),
    )
    a = ast.Bool(**base)
    b = ast.Bool(**base, min_should_match=0)
    assert oracle.search(a, k=K) == oracle.search(b, k=K)
    assert _ranked(engine.search(a, k=K)) == _ranked(engine.search(b, k=K))


# ---------------------------------------------------------- explain

def test_explain_breakdown_sums_to_total(engine, oracle):
    """Sum-shaped tree: per-doc leaf contributions sum to the total,
    each contribution equals the leaf's own score, and the total
    equals search()'s score for that doc."""
    q = ast.And((ast.Term("get"), ast.Term("string")))
    rows = engine.explain(q).collect()
    assert rows, "fixture must match something"
    per_doc: dict = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r)
    leaf_get = oracle.eval(ast.Term("get"))
    leaf_str = oracle.eval(ast.Term("string"))
    total = oracle.eval(q)
    assert set(per_doc) == set(total)
    for d, rs in per_doc.items():
        assert {r["leaf"] for r in rs} == {"content:get", "content:string"}
        got_sum = sum(r["contribution"] for r in rs)
        assert got_sum == pytest.approx(total[d], rel=1e-9)
        for r in rs:
            exp = leaf_get if r["leaf"] == "content:get" else leaf_str
            assert r["contribution"] == pytest.approx(exp[d], rel=1e-9)
            assert r["total"] == pytest.approx(total[d], rel=1e-9)


def test_explain_unmatched_leaf_has_no_row(engine, oracle):
    """OR query: docs matching only one branch get one row."""
    q = ast.Or((ast.Term("get"), ast.Term("zzq_not_a_token")))
    rows = engine.explain(q).collect()
    assert rows
    assert {r["leaf"] for r in rows} == {"content:get"}
    tot = oracle.eval(q)
    for r in rows:
        assert r["total"] == pytest.approx(tot[r["doc_id"]], rel=1e-9)


# ---- SpanOr members inside SpanFirst / SpanNot (r5) ----

SNOT_TUPLE_CASES = [
    ast.SpanNot(("get", "return"), "string", pre=2, post=2),
    ast.SpanNot("index", ("writer", "reader"), pre=1, post=1),
    ast.SpanNot(("get", "string"), ("index", "writer"), pre=0, post=3),
    ast.SpanNot(("get", "zzq_not_a_token"), ("string",), pre=1, post=1),
]


def _tids(n):
    i = "|".join(ast.span_member_terms(n.include))
    e = "|".join(ast.span_member_terms(n.exclude))
    return f"{i}!{e}~{n.pre},{n.post}"


@pytest.mark.parametrize("node", SNOT_TUPLE_CASES, ids=_tids)
def test_spannot_spanor_members_rank_identity(engine, oracle, node):
    """Numpy kernel vs pure-Python oracle on SpanNot over member
    unions — two independent implementations of the same public
    semantics (SpanNotQuery(SpanOr, SpanOr, pre, post))."""
    assert_rank_identical(engine.search(node, k=K), oracle.search(node, k=K))


def test_spanfirst_spanor_members(engine, oracle):
    node = ast.SpanFirst(("get", "string"), end=8)
    assert_rank_identical(engine.search(node, k=K), oracle.search(node, k=K))
    # the restriction must bite: fewer docs than the unrestricted
    # union somewhere in the corpus
    unrestricted = dict(oracle.search(ast.SpanOr(("get", "string")), k=10_000))
    restricted = dict(oracle.search(node, k=10_000))
    assert restricted and set(restricted) < set(unrestricted)


def test_spanfirst_single_member_degenerates(engine):
    """A one-member tuple is bit-identical to the plain-string node
    (same rows, same idf, same kernel path)."""
    a = _ranked(engine.search(ast.SpanFirst(("get",), end=6), k=K))
    b = _ranked(engine.search(ast.SpanFirst("get", end=6), k=K))
    assert a == b


def test_spanfirst_unbounded_equals_spanor(engine):
    """end beyond every document degenerates SpanFirst(SpanOr) to
    SpanOr itself: same union freq, same Σ-idf — scores bit-equal."""
    big = _ranked(
        engine.search(ast.SpanFirst(("get", "string"), end=10**6), k=K)
    )
    spanor = _ranked(engine.search(ast.SpanOr(("get", "string")), k=K))
    assert big == spanor


def test_spannot_absent_exclude_members_keep_all(engine):
    """Exclude members missing from the dictionary gate nothing: the
    node degenerates to the include union (== SpanOr scores)."""
    got = _ranked(
        engine.search(
            ast.SpanNot(("get", "string"), ("zzq_not_a_token",), pre=3, post=3),
            k=K,
        )
    )
    ref = _ranked(engine.search(ast.SpanOr(("get", "string")), k=K))
    assert got == ref


def test_span_tuple_composition(engine, oracle):
    """Tuple-member span nodes compose under booleans like any leaf."""
    node = ast.And(
        (
            ast.SpanNot(("get", "return"), "string", pre=1, post=1),
            ast.Term("index"),
        )
    )
    assert_rank_identical(engine.search(node, k=K), oracle.search(node, k=K))


def test_span_tuple_validation(engine):
    with pytest.raises(ValueError, match="at least one"):
        engine.search(ast.SpanFirst((), end=3), k=5).collect()
    with pytest.raises(ValueError, match="at least one"):
        engine.search(ast.SpanNot(("get",), (), pre=0, post=0), k=5).collect()
