"""Property-based invariants (hypothesis) for the semantic bedrock."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from codeindex_spark.index import encoding
from codeindex_spark.index.docids import assign_doc_ids_pandas
from codeindex_spark.tokenizer import SPACE_CHARS, get_words, tokenize

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_tokens_reconstruct_text_minus_spaces(text):
    """Every char is either space-like (dropped) or lands in exactly
    one token, in order: concatenating tokens == text minus spaces."""
    toks = tokenize(text)
    stripped = "".join(c for c in text if c not in SPACE_CHARS)
    assert "".join(toks) == stripped


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_get_words_subset_of_tokens(text):
    """GetWords output is exactly the non-special tokens within the
    length bounds (hint words fall out of the token stream)."""
    words = set(get_words(text, 1, 199))
    toks = {t for t in tokenize(text) if len(t) <= 199}
    specials = {t for t in toks if len(t) == 1 and ord(t) < 127 and not t.isalnum()}
    assert words <= toks
    # no special-char token ever appears as a word
    from codeindex_spark.tokenizer import SPECIAL_CHARS

    assert not any(w in SPECIAL_CHARS for w in words)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=60), st.randoms(use_true_random=False))
def test_docid_assignment_order_invariant(n, rnd):
    """docIDs are a pure function of the key set — row order never
    matters (the partitioning-invariance the oracle relies on)."""
    rows = [
        {
            "repo": f"r{i % 5}",
            "path": f"p/{i}.py",
            "commit": f"c{i:03d}",
            "lang": "python",
            "content": "x",
        }
        for i in range(n)
    ]
    shuffled = rows[:]
    rnd.shuffle(shuffled)
    a = assign_doc_ids_pandas(pd.DataFrame(rows), 8, 16)
    b = assign_doc_ids_pandas(pd.DataFrame(shuffled), 8, 16)
    ma = dict(zip(a["path"], a["doc_id"]))
    mb = dict(zip(b["path"], b["doc_id"]))
    assert ma == mb


@settings(max_examples=150, deadline=None)
@given(
    st.lists(  # per-doc: (slot offset in block, positions for slot0, slot1)
        st.tuples(
            st.integers(min_value=0, max_value=127),
            st.lists(
                st.integers(min_value=0, max_value=60), min_size=1, max_size=6
            ),
            st.lists(
                st.integers(min_value=0, max_value=60), min_size=1, max_size=6
            ),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=2**31, max_value=2**45),  # block base doc_id
)
def test_eval_phrase_doc_ids_beyond_int32(entries, big_base):
    """Phrase adjacency must be invariant to the global doc_id base:
    packing block-LOCAL offsets keeps doc_id*2^32+pos from overflowing
    int64 at the 10^12-doc target (VERDICT r1 #1 — doc_id >= 2^31
    silently wrapped with the old global-doc_id pack)."""
    from codeindex_spark.query.planner import _eval_phrase

    entries = sorted(entries)

    def build_parts(base):
        docs = np.array([base + e[0] for e in entries], dtype=np.int64)
        parts = []
        for slot in (0, 1):
            plists = [
                np.array(sorted(set(e[1 + slot])), dtype=np.int64)
                for e in entries
            ]
            pc = np.array([p.size for p in plists], dtype=np.int64)
            flat = (
                np.concatenate(plists)
                if plists
                else np.array([], dtype=np.int64)
            )
            contrib = np.full(docs.size, 1.0 + slot, dtype=np.float64)
            parts.append((slot, docs, contrib, pc, flat))
        return parts

    small_d, small_s = _eval_phrase(build_parts(0), 2)
    big_d, big_s = _eval_phrase(build_parts(big_base), 2)
    # identical matches (shifted by the base) and identical scores
    assert (big_d - big_base).tolist() == small_d.tolist()
    assert np.allclose(big_s, small_s)
    # cross-check the small case against a brute-force oracle
    expect = sorted(
        e[0]
        for e in entries
        if any(p + 1 in set(e[2]) for p in set(e[1]))
    )
    assert small_d.tolist() == expect


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="abcde", max_size=8),
    st.text(alphabet="abcde", max_size=8),
)
def test_damerau_three_way_agreement(a, b):
    """Engine kernel (Lowrance-Wagner rolling form), the independent
    oracle implementation, and DuckDB's damerau_levenshtein — the
    function the driver oracle uses — must agree on every input."""
    import duckdb

    from codeindex_spark.query.oracle import _damerau
    from codeindex_spark.query.planner import damerau_distance

    d = duckdb.sql(
        "SELECT damerau_levenshtein(?, ?)", params=[a, b]
    ).fetchone()[0]
    assert damerau_distance(a, b, 99) == _damerau(a, b, 99) == d
    # cap semantics: beyond-cap length gaps short-circuit consistently
    if abs(len(a) - len(b)) > 2:
        assert damerau_distance(a, b, 2) > 2 and _damerau(a, b, 2) > 2


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=127),  # doc slot in block
            st.integers(min_value=1, max_value=50),  # tf
            st.integers(min_value=1, max_value=500),  # dl
            st.lists(st.integers(min_value=0, max_value=499), max_size=8),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=0, max_value=1000),  # block id
)
def test_block_roundtrip_property(entries, block_id):
    entries = sorted(entries)
    doc_ids = np.array([block_id * 128 + e[0] for e in entries], dtype=np.int64)
    tfs = np.array([e[1] for e in entries], dtype=np.int64)
    dls = np.array([e[2] for e in entries], dtype=np.int64)
    plists = [np.array(sorted(set(e[3])), dtype=np.int64) for e in entries]
    blk = encoding.encode_block(doc_ids, tfs, dls, plists, block_id, avgdl=100.0)
    got_docs = encoding.decode_block_docs(blk["docs_delta"], block_id)
    assert got_docs.tolist() == doc_ids.tolist()
    assert encoding.varint_decode(blk["tfs"]).tolist() == tfs.tolist()
    counts, flat = encoding.decode_positions(blk["pos_counts"], blk["pos_deltas"])
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    for i, pl in enumerate(plists):
        assert flat[offs[i] : offs[i] + counts[i]].tolist() == pl.tolist()


@given(
    st.text(
        alphabet=st.sampled_from(
            list("abcdef AND OR NOT()[]{}\"*?~^:\\+-./|0123456789")
        ),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=400, deadline=None)
def test_parser_total_no_crash(q):
    """The parser is TOTAL over arbitrary input: every string either
    parses to a Node or raises QueryParseError — never an IndexError/
    AttributeError/recursion blowup. (Users type anything; the engine
    must answer with a clear syntax error, like Lucene's classic
    parser's ParseException contract.)"""
    from codeindex_spark.query.ast import QueryParseError, parse_query

    try:
        node = parse_query(q)
    except QueryParseError:
        return
    assert node is not None
