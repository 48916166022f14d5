"""Posting-block codec roundtrips (delta+varint, positions, block-max)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from codeindex_spark.index import encoding


def test_varint_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 255, 300, 16383, 16384, 2**32, 2**63], dtype=np.uint64)
    assert np.array_equal(encoding.varint_decode(encoding.varint_encode(vals)), vals)


def test_varint_empty():
    assert encoding.varint_encode(np.array([], dtype=np.uint64)) == b""
    assert encoding.varint_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63), max_size=300))
def test_varint_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(encoding.varint_decode(encoding.varint_encode(arr)), arr)


def test_delta_roundtrip():
    v = np.array([5, 6, 9, 100, 101], dtype=np.uint64)
    d = encoding.delta_encode(v, base=5)
    assert np.array_equal(encoding.delta_decode(d, base=5), v)


def test_positions_roundtrip():
    plists = [
        np.array([0, 3, 7], dtype=np.int64),
        np.array([], dtype=np.int64),
        np.array([2], dtype=np.int64),
        np.array([1, 2, 3, 50], dtype=np.int64),
    ]
    counts_buf, deltas_buf = encoding.encode_positions(plists)
    counts, flat = encoding.decode_positions(counts_buf, deltas_buf)
    assert counts.tolist() == [3, 0, 1, 4]
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    for i, pl in enumerate(plists):
        got = flat[offs[i] : offs[i] + counts[i]]
        assert got.tolist() == pl.tolist()


def test_positions_all_empty():
    counts_buf, deltas_buf = encoding.encode_positions(
        [np.array([], dtype=np.int64)] * 3
    )
    counts, flat = encoding.decode_positions(counts_buf, deltas_buf)
    assert counts.tolist() == [0, 0, 0]
    assert flat.size == 0


def test_encode_block_roundtrip_and_blockmax():
    block_id, bsz = 7, 128
    base = block_id * bsz
    doc_ids = np.array([base + 1, base + 5, base + 100], dtype=np.int64)
    tfs = np.array([3, 1, 10], dtype=np.int64)
    dls = np.array([30, 10, 200], dtype=np.int64)
    plists = [
        np.array([0, 4, 9], dtype=np.int64),
        np.array([2], dtype=np.int64),
        np.array(list(range(10)), dtype=np.int64),
    ]
    avgdl = 50.0
    blk = encoding.encode_block(doc_ids, tfs, dls, plists, block_id, avgdl)
    assert blk["n"] == 3
    got_docs = encoding.decode_block_docs(blk["docs_delta"], block_id)
    assert got_docs.tolist() == doc_ids.tolist()
    assert encoding.varint_decode(blk["tfs"]).tolist() == tfs.tolist()
    assert encoding.varint_decode(blk["dls"]).tolist() == dls.tolist()
    expected_max = encoding.bm25_tfnorm(tfs, dls, avgdl).max()
    assert blk["block_max_tfnorm"] == pytest.approx(expected_max)


def test_encode_block_unsorted_input_sorted_on_encode():
    block_id, bsz = 0, 128
    doc_ids = np.array([9, 2, 5], dtype=np.int64)
    tfs = np.array([1, 2, 3], dtype=np.int64)
    dls = np.array([10, 20, 30], dtype=np.int64)
    plists = [np.array([0]), np.array([0, 1]), np.array([0, 1, 2])]
    blk = encoding.encode_block(doc_ids, tfs, dls, plists, block_id, 10.0)
    assert encoding.decode_block_docs(blk["docs_delta"], block_id).tolist() == [2, 5, 9]
    assert encoding.varint_decode(blk["tfs"]).tolist() == [2, 3, 1]


def test_bm25_tfnorm_monotonic_in_tf():
    dls = np.array([100, 100, 100], dtype=np.int64)
    tfs = np.array([1, 2, 4], dtype=np.int64)
    norm = encoding.bm25_tfnorm(tfs, dls, avgdl=100.0)
    assert norm[0] < norm[1] < norm[2] < 2.2  # bounded by k1+1
