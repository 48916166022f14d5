"""Property-based soundness of the percolator's presearcher: for ANY
query tree and ANY document, if the document matches the query then
the query's required_any set is either None (no filter) or intersects
the document's own (field, term) vocabulary — i.e. the prefilter can
only skip queries that truly cannot match. A violation here would
silently LOSE percolation matches, which no example-based test can
sweep exhaustively; pure-Python (single-doc OracleIndex), no Spark."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from codeindex_spark.query import ast
from codeindex_spark.query.oracle import OracleIndex
from codeindex_spark.query.percolate import required_any

TERMS = ["get", "set", "string", "index", "writer", "return", "batch"]

leaf = st.one_of(
    st.sampled_from(TERMS).map(lambda t: ast.Term(t)),
    st.sampled_from(["ge*", "s?t", "str*", "wri*"]).map(
        lambda p: ast.Wildcard(p)
    ),
    st.sampled_from(TERMS).map(lambda t: ast.Fuzzy(t, max_edits=1)),
    st.sampled_from(["(get|set)", "s.*", "ind.x"]).map(
        lambda p: ast.Regexp(p)
    ),
    st.tuples(st.sampled_from(TERMS), st.sampled_from(TERMS)).map(
        lambda ab: ast.Range(*sorted(ab))
    ),
    st.lists(
        st.sampled_from(TERMS), min_size=2, max_size=3, unique=True
    ).map(lambda ts: ast.Phrase(tuple(ts))),
    st.lists(
        st.sampled_from(TERMS), min_size=1, max_size=3, unique=True
    ).map(lambda ts: ast.Synonyms(tuple(ts))),
    st.sampled_from(TERMS).map(lambda t: ast.SpanFirst(t, end=2)),
    st.tuples(st.sampled_from(TERMS), st.sampled_from(TERMS)).map(
        lambda ab: ast.SpanNot(ab[0], ab[1], pre=1, post=1)
    ),
)


def _combine(children):
    kind = children.pop()  # reuse the drawn int as the combinator tag
    kids = tuple(children)
    if kind % 5 == 0 and len(kids) >= 2:
        return ast.And(kids)
    if kind % 5 == 1 and len(kids) >= 2:
        return ast.Or(kids)
    if kind % 5 == 2 and len(kids) >= 2:
        return ast.Not(kids[0], kids[1])
    if kind % 5 == 3 and len(kids) >= 2:
        return ast.Bool(
            must=kids[:1], should=kids[1:], min_should_match=kind % 2
        )
    return ast.ConstantScore(kids[0])


node_strategy = st.recursive(
    leaf,
    lambda inner: st.tuples(
        st.lists(inner, min_size=2, max_size=3),
        st.integers(min_value=0, max_value=4),
    ).map(lambda t: _combine(list(t[0]) + [t[1]])),
    max_leaves=6,
)

doc_strategy = st.lists(
    st.sampled_from(TERMS + ["other", "misc"]), min_size=0, max_size=12
)


@settings(max_examples=300, deadline=None)
@given(node_strategy, doc_strategy)
def test_required_any_never_loses_a_match(node, tokens):
    req = required_any(node)
    if req is None:
        return  # no filter: the query is always evaluated
    idx = OracleIndex.build(
        pd.DataFrame(
            {
                "repo": ["r"],
                "path": ["d.txt"],
                "commit": ["c"],
                "content": [" ".join(tokens)],
            }
        ),
        num_buckets=1,
        block_size=128,
        fields=("content", "content_cs"),
    )
    if not idx.eval(node):
        return  # doc doesn't match: skipping is always safe
    vocab = {("content", t) for t in tokens} | {
        ("content_cs", t) for t in tokens
    }
    assert req & vocab, (
        f"presearcher would skip a MATCHING doc: req={sorted(req)} "
        f"tokens={tokens} node={node}"
    )
