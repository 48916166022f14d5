"""Posting-block codecs — numpy-vectorized LEB128 varint + delta.

The index layout (BASELINE.json north_star) stores posting lists as
fixed-doc-range blocks: block_id = doc_id // BLOCK_SIZE. Within a
block each column is a compressed byte stream:

- ``docs_delta``  — varint(delta(doc_id)) with the first value
  absolute *within the block* (doc_id - block_id*BLOCK_SIZE), so a
  block decodes with no external context.
- ``tfs``         — varint(tf) per doc.
- ``dls``         — varint(doc_len) per doc (denormalized norms, the
  parquet analog of Lucene's per-doc norms docvalues: keeps scoring
  block-local instead of requiring a 10^12-row join at query time).
- ``pos_counts`` / ``pos_deltas`` — positions per doc as two streams:
  counts, then per-doc delta-encoded positions concatenated. Split
  streams keep the decode fully vectorized (reduceat/cumsum, no
  Python loop over entries).

All encode/decode paths are numpy array programs — the only Python
loops are over *blocks*, never over postings entries, satisfying the
"no per-row Python" constraint of BASELINE.json input_hint.

Reference parity note: the reference delegates this entirely to
Lucene.NET's codec (invoked at
/root/reference/src/CodeIndex.IndexBuilder/LucenePoolLight.cs:30); the
block-max metadata mirrors Lucene's BlockTree/impacts, reimplemented
here from the public BM25/WAND literature.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

_U7 = np.uint64(7)
_U7F = np.uint64(0x7F)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, fully vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nb += tmp > 0
        tmp = tmp >> _U7
    total = int(nb.sum())
    idx = np.repeat(np.arange(n), nb)
    starts = np.concatenate(([0], np.cumsum(nb)[:-1]))
    ranks = np.arange(total) - np.repeat(starts, nb)
    shifted = v[idx] >> (ranks.astype(np.uint64) * _U7)
    out = (shifted & _U7F).astype(np.uint8)
    out |= ((ranks < nb[idx] - 1).astype(np.uint8)) << 7
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte stream to uint64, fully vectorized."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lens = ends - starts + 1
    ranks = np.arange(b.size) - np.repeat(starts, lens)
    vals7 = (b & 0x7F).astype(np.uint64) << (ranks.astype(np.uint64) * _U7)
    # chunks occupy disjoint bit ranges, so add == bitwise-or
    return np.add.reduceat(vals7, starts)


def delta_encode(sorted_values: np.ndarray, base: int = 0) -> np.ndarray:
    v = np.ascontiguousarray(sorted_values, dtype=np.uint64)
    if v.size == 0:
        return v
    out = np.empty_like(v)
    out[0] = v[0] - np.uint64(base)
    out[1:] = v[1:] - v[:-1]
    return out


def delta_decode(deltas: np.ndarray, base: int = 0) -> np.ndarray:
    d = np.ascontiguousarray(deltas, dtype=np.uint64)
    if d.size == 0:
        return d
    out = np.cumsum(d, dtype=np.uint64)
    return out + np.uint64(base)


def encode_positions(position_lists: list[np.ndarray]) -> tuple[bytes, bytes]:
    """Encode per-doc position lists as (counts_stream, deltas_stream)."""
    if not position_lists:
        return b"", b""
    counts = np.array([len(p) for p in position_lists], dtype=np.uint64)
    if counts.sum() == 0:
        return varint_encode(counts), b""
    flat = np.concatenate(
        [delta_encode(np.asarray(p, dtype=np.uint64)) for p in position_lists]
    )
    return varint_encode(counts), varint_encode(flat)


def decode_positions(
    counts_buf: bytes, deltas_buf: bytes
) -> tuple[np.ndarray, np.ndarray]:
    """Decode to (counts, flat_positions); slice i spans
    flat[offsets[i]:offsets[i]+counts[i]] with offsets=cumsum-exclusive.
    """
    counts = varint_decode(counts_buf).astype(np.int64)
    flat_d = varint_decode(deltas_buf)
    if flat_d.size == 0:
        return counts, flat_d.astype(np.int64)
    cs = np.cumsum(flat_d, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    nonempty = counts > 0
    bases = np.zeros(counts.size, dtype=np.uint64)
    ne_starts = starts[nonempty]
    bases_ne = np.where(ne_starts > 0, cs[ne_starts - 1], np.uint64(0))
    bases[nonempty] = bases_ne
    flat = cs - np.repeat(bases, counts)
    return counts, flat.astype(np.int64)


def bm25_tfnorm(
    tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float = 1.2, b: float = 0.75
) -> np.ndarray:
    """BM25 term-frequency normalization (idf applied separately —
    idf is per-term constant, so block-max stores max tfnorm and the
    score upper bound is idf * block_max_tfnorm)."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def encode_block(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    position_lists: list[np.ndarray],
    block_id: int,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode one (field, term, block) posting group. ``doc_ids`` must
    be sorted ascending and all within the block's doc range."""
    order = np.argsort(doc_ids, kind="stable")
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)[order]
    tfs = np.asarray(tfs, dtype=np.uint64)[order]
    dls = np.asarray(dls, dtype=np.uint64)[order]
    position_lists = [position_lists[i] for i in order]
    base = block_id * block_size
    pos_counts, pos_deltas = encode_positions(position_lists)
    tfnorm = bm25_tfnorm(tfs, dls, avgdl, k1, b)
    return {
        "n": int(doc_ids.size),
        "docs_delta": varint_encode(delta_encode(doc_ids, base=base)),
        "tfs": varint_encode(tfs),
        "dls": varint_encode(dls),
        "pos_counts": pos_counts,
        "pos_deltas": pos_deltas,
        "block_max_tfnorm": float(tfnorm.max()) if tfnorm.size else 0.0,
    }


def decode_block_docs(
    docs_delta: bytes, block_id: int, block_size: int = BLOCK_SIZE
) -> np.ndarray:
    return delta_decode(
        varint_decode(docs_delta), base=block_id * block_size
    ).astype(np.int64)


def decode_rows_values(buffers: list[bytes], counts: np.ndarray) -> np.ndarray:
    """Decode MANY per-row varint buffers in one pass: concatenates the
    byte streams and runs a single vectorized varint decode. ``counts``
    is the known value count per buffer (the posting row's ``n``)."""
    joined = b"".join(buffers)
    vals = varint_decode(joined)
    assert vals.size == int(np.sum(counts)), "varint stream length mismatch"
    return vals


def decode_rows_docs(
    buffers: list[bytes],
    counts: np.ndarray,
    block_ids: np.ndarray,
    block_size: int = BLOCK_SIZE,
) -> np.ndarray:
    """Batch docID decode across many posting rows: one varint pass +
    one cumsum with per-row base resets (no Python loop over rows)."""
    deltas = decode_rows_values(buffers, counts)
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    cs = np.cumsum(deltas, dtype=np.uint64)
    nonzero = counts > 0
    row_adjust = np.zeros(counts.size, dtype=np.uint64)
    nz_starts = starts[nonzero]
    row_adjust[nonzero] = np.where(nz_starts > 0, cs[nz_starts - 1], np.uint64(0))
    bases = (block_ids.astype(np.int64) * block_size).astype(np.uint64)
    docs = cs - np.repeat(row_adjust, counts) + np.repeat(bases, counts)
    return docs.astype(np.int64)


def _varint_with_offsets(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Varint-encode the whole array once; return (buffer, per-value
    end byte offsets) so callers can slice per-group ranges without
    re-encoding. offsets[i] = end position of value i."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nb = np.ones(v.size, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nb += tmp > 0
        tmp = tmp >> _U7
    ends = np.cumsum(nb)
    return varint_encode(v), ends


def encode_blocks_batch(
    field: np.ndarray,
    term: np.ndarray,
    block_id: np.ndarray,
    doc_id: np.ndarray,
    tf: np.ndarray,
    dl: np.ndarray,
    positions: list,
    avgdl_map: dict[str, float],
    k1: float = 1.2,
    b: float = 0.75,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Vectorized multi-group posting encoder.

    Input rows MUST be sorted by (field, term, block_id, doc_id) —
    the build pipeline's sortWithinPartitions guarantees it. All
    heavy work (deltas, varints, tfnorm, reduceat aggregations) runs
    ONCE over the whole batch; the only Python loop slices per-group
    byte ranges out of the shared buffers (O(groups), trivially cheap).
    This removes the per-group call overhead of grouped-map UDFs —
    the difference between ~3 and ~1000+ files/sec at build time.

    Returns columnar dict ready for a pandas DataFrame in
    POSTING_SCHEMA order.
    """
    n = doc_id.size
    if n == 0:
        return {
            "field": [], "term": [], "block_id": [], "n": [], "cf": [],
            "docs_delta": [], "tfs": [], "dls": [], "pos_counts": [],
            "pos_deltas": [], "block_max_tfnorm": [],
        }
    doc_id = doc_id.astype(np.int64)
    tf64 = tf.astype(np.uint64)
    dl64 = dl.astype(np.uint64)

    # group boundaries (field, term, block_id)
    same = np.empty(n, dtype=bool)
    same[0] = False
    if n > 1:
        same[1:] = (
            (field[1:] == field[:-1])
            & (term[1:] == term[:-1])
            & (block_id[1:] == block_id[:-1])
        )
    g_starts = np.flatnonzero(~same)
    g_ends = np.concatenate((g_starts[1:], [n]))

    # doc deltas with per-group base reset
    prev = np.empty(n, dtype=np.int64)
    prev[0] = 0
    prev[1:] = doc_id[:-1]
    base = (block_id.astype(np.int64) * block_size)
    deltas = np.where(same, doc_id - prev, doc_id - base).astype(np.uint64)

    docs_buf, docs_ends = _varint_with_offsets(deltas)
    tfs_buf, tfs_ends = _varint_with_offsets(tf64)
    dls_buf, dls_ends = _varint_with_offsets(dl64)

    # positions: per-row counts + per-row delta-encoded flat stream
    counts = np.fromiter((len(p) for p in positions), dtype=np.int64, count=n)
    total_pos = int(counts.sum())
    if total_pos:
        flat = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in positions if len(p)]
        ).astype(np.uint64)
        row_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pprev = np.empty(total_pos, dtype=np.uint64)
        pprev[0] = 0
        pprev[1:] = flat[:-1]
        first_of_row = np.zeros(total_pos, dtype=bool)
        first_of_row[row_starts[counts > 0]] = True
        pdeltas = np.where(first_of_row, flat, flat - pprev)
        pos_buf, pos_ends = _varint_with_offsets(pdeltas)
        # per-row end offset in the positions stream
        row_pos_end = np.zeros(n, dtype=np.int64)
        ends_cum = np.cumsum(counts)
        nonzero = counts > 0
        row_pos_end[nonzero] = pos_ends[ends_cum[nonzero] - 1]
        row_pos_end = np.maximum.accumulate(row_pos_end)
    else:
        pos_buf, row_pos_end = b"", np.zeros(n, dtype=np.int64)
    cnt_buf, cnt_ends = _varint_with_offsets(counts.astype(np.uint64))

    # per-field avgdl, then one vectorized tfnorm pass
    avgdl_arr = np.empty(n, dtype=np.float64)
    for f in np.unique(field):
        avgdl_arr[field == f] = avgdl_map.get(str(f), 1.0) or 1.0
    tff = tf64.astype(np.float64)
    dlf = dl64.astype(np.float64)
    tfnorm = tff * (k1 + 1.0) / (tff + k1 * (1.0 - b + b * dlf / avgdl_arr))

    cf = np.add.reduceat(tf64.astype(np.int64), g_starts)
    bmax = np.maximum.reduceat(tfnorm, g_starts)

    mv_docs, mv_tfs, mv_dls = docs_buf, tfs_buf, dls_buf
    mv_cnt, mv_pos = cnt_buf, pos_buf

    def _slices(buf, ends):
        out = []
        for s, e in zip(g_starts, g_ends):
            lo = ends[s - 1] if s > 0 else 0
            out.append(buf[lo : ends[e - 1]])
        return out

    pos_slices = []
    for s, e in zip(g_starts, g_ends):
        lo = row_pos_end[s - 1] if s > 0 else 0
        pos_slices.append(mv_pos[lo : row_pos_end[e - 1]])

    return {
        "field": field[g_starts],
        "term": term[g_starts],
        "block_id": block_id[g_starts].astype(np.int64),
        "n": (g_ends - g_starts).astype(np.int32),
        "cf": cf,
        "docs_delta": _slices(mv_docs, docs_ends),
        "tfs": _slices(mv_tfs, tfs_ends),
        "dls": _slices(mv_dls, dls_ends),
        "pos_counts": _slices(mv_cnt, cnt_ends),
        "pos_deltas": pos_slices,
        "block_max_tfnorm": bmax,
    }
