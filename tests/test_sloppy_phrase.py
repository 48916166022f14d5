"""Lucene SloppyPhraseScorer semantics for "a b"~N: out-of-order
occurrences match once slop covers the reorder cost (a swap of two
adjacent terms costs 2 — PhraseQuery.setSlop's documented edit
distance), repeated terms need DISTINCT positions, and the
SpanNear(inOrder=true) variant stays available via Phrase.in_order.
Engine and pure-Python oracle are held rank- and score-identical on
every shape.
"""

from __future__ import annotations

import pandas as pd
import pytest

from codeindex_spark.index.build import IndexParams
from codeindex_spark.index.segments import IndexBuilder, IndexReader
from codeindex_spark.query import ast
from codeindex_spark.query.oracle import OracleIndex
from codeindex_spark.query.planner import SearchEngine

PARAMS = IndexParams(num_buckets=4, block_size=8)

ROWS = [
    ("r", "d1", "c", "python", "alpha beta gamma"),   # in-order adjacent
    ("r", "d2", "c", "python", "beta alpha gamma"),   # swapped: cost 2
    ("r", "d3", "c", "python", "alpha pad beta"),     # in-order, gap 1
    ("r", "d4", "c", "python", "beta pad alpha"),     # reversed, span 3
    ("r", "d5", "c", "python", "alpha only here"),    # missing beta
    ("r", "d6", "c", "python", "solo solo"),          # repeat adjacent
    ("r", "d7", "c", "python", "solo pad solo"),      # repeat, gap 1
    ("r", "d8", "c", "python", "solo single"),        # ONE occurrence
]
COLS = ["repo", "path", "commit", "lang", "content"]


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("slop_idx"))
    docs = spark.createDataFrame(pd.DataFrame(ROWS, columns=COLS))
    IndexBuilder(spark, d, PARAMS, n_groups=1).build(docs, resume=False)
    return SearchEngine(IndexReader(spark, d))


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex.build(
        pd.DataFrame(ROWS, columns=COLS),
        num_buckets=PARAMS.num_buckets,
        block_size=PARAMS.block_size,
        k1=PARAMS.k1,
        b=PARAMS.b,
    )


def _paths(engine, node) -> set[str]:
    return {
        r["path"]
        for r in engine.search(node, k=50, with_docs=True).collect()
    }


def _assert_identical(engine, oracle, node):
    got = [
        (r["doc_id"], r["score"])
        for r in engine.search(node, k=50).collect()
    ]
    exp = oracle.search(node, k=50)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert gs == pytest.approx(es, rel=1e-9)


def test_reorder_cost_ladder(engine, oracle):
    """slop 0 → exact; 1 → +gap; 2 → +adjacent swap; 3 → +reversed
    with a gap (span 3). Matches Lucene's 'switching the order of two
    words requires two moves' doc."""
    expected = {
        0: {"d1"},
        1: {"d1", "d3"},
        2: {"d1", "d3", "d2"},
        3: {"d1", "d3", "d2", "d4"},
    }
    for slop, paths in expected.items():
        node = ast.Phrase(("alpha", "beta"), slop=slop)
        assert _paths(engine, node) == paths, slop
        _assert_identical(engine, oracle, node)
    # parser surface reaches the same semantics
    assert _paths(engine, ast.parse_query('"alpha beta"~2')) == expected[2]


def test_in_order_variant(engine, oracle):
    """in_order=True restores the SpanNear(inOrder=true) behavior:
    reordered occurrences never match, whatever the slop."""
    for slop, paths in [(2, {"d1", "d3"}), (5, {"d1", "d3"})]:
        node = ast.Phrase(("alpha", "beta"), slop=slop, in_order=True)
        assert _paths(engine, node) == paths
        _assert_identical(engine, oracle, node)
    # in-order matches are a subset of the Lucene matches at equal slop
    for slop in (0, 1, 2, 3):
        sub = _paths(engine, ast.Phrase(("alpha", "beta"), slop=slop,
                                        in_order=True))
        sup = _paths(engine, ast.Phrase(("alpha", "beta"), slop=slop))
        assert sub <= sup


def test_repeated_term_needs_distinct_positions(engine, oracle):
    """'solo solo' must bind TWO distinct positions: a doc with one
    occurrence never matches (the coverage window alone would lie);
    a gap within slop does."""
    cases = [
        (0, {"d6"}),
        (1, {"d6", "d7"}),
        (4, {"d6", "d7"}),  # d8 stays out at ANY slop
    ]
    for slop, paths in cases:
        node = ast.Phrase(("solo", "solo"), slop=slop)
        assert _paths(engine, node) == paths, slop
        _assert_identical(engine, oracle, node)


def test_wildcard_slot_distinctness(engine, oracle):
    """A wildcard slot whose expansion overlaps a literal slot also
    goes through the distinct-positions check: 'sol* solo' cannot
    double-bind d8's single 'solo'."""
    node = ast.parse_query('"sol* solo"~2')
    assert _paths(engine, node) == {"d6", "d7"}
    _assert_identical(engine, oracle, node)
