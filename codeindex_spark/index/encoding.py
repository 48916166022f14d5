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


def _positions_absolute(
    counts: np.ndarray, flat_d: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Rebuild absolute positions from per-entry counts + raw deltas
    (cumsum with per-entry base resets)."""
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


def decode_positions(
    counts_buf: bytes, deltas_buf: bytes
) -> tuple[np.ndarray, np.ndarray]:
    """Decode to (counts, flat_positions); slice i spans
    flat[offsets[i]:offsets[i]+counts[i]] with offsets=cumsum-exclusive.
    """
    counts = varint_decode(counts_buf).astype(np.int64)
    return _positions_absolute(counts, varint_decode(deltas_buf))


def decode_rows_pos_deltas(
    pos_bufs: list[bytes],
    pcounts: np.ndarray,
    row_entry_counts: np.ndarray,
    codec: str = "varint",
) -> np.ndarray:
    """Decode the per-row position-delta buffers to one RAW delta
    array in input order. ``pcounts`` is per-ENTRY position counts
    (already decoded), ``row_entry_counts`` is per-row `n` — needed to
    derive per-row value counts for the forpack path (varint is
    self-delimiting and just concatenates)."""
    if codec == "varint":
        return varint_decode(b"".join(pos_bufs))
    n_arr = np.asarray(row_entry_counts, dtype=np.int64)
    pcounts = np.asarray(pcounts, dtype=np.int64)
    assert (n_arr > 0).all(), "posting rows must have >=1 entry"
    row_starts = np.concatenate(([0], np.cumsum(n_arr)[:-1]))
    row_tot = (
        np.add.reduceat(pcounts, row_starts)
        if pcounts.size
        else np.zeros(len(pos_bufs), dtype=np.int64)
    )
    return forpack_decode_rows(pos_bufs, row_tot)


def decode_positions_rows(
    cnt_bufs: list[bytes],
    pos_bufs: list[bytes],
    row_entry_counts: np.ndarray,
    codec: str = "varint",
) -> tuple[np.ndarray, np.ndarray]:
    """Batch decode many rows' position streams to (per-entry counts,
    flat ABSOLUTE positions) — the multi-row analog of
    decode_positions, codec-dispatched."""
    pcounts = decode_rows_values(cnt_bufs, row_entry_counts, codec).astype(np.int64)
    flat_d = decode_rows_pos_deltas(pos_bufs, pcounts, row_entry_counts, codec)
    return _positions_absolute(pcounts, flat_d)


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


def decode_rows_values(
    buffers: list[bytes], counts: np.ndarray, codec: str = "varint"
) -> np.ndarray:
    """Decode MANY per-row buffers in one vectorized pass. ``counts``
    is the known value count per buffer (the posting row's ``n``).
    varint: concatenate (self-delimiting) + single decode; forpack:
    width-classed batch decode."""
    if codec == "forpack":
        return forpack_decode_rows(buffers, counts)
    joined = b"".join(buffers)
    vals = varint_decode(joined)
    assert vals.size == int(np.sum(counts)), "varint stream length mismatch"
    return vals


def decode_rows_docs(
    buffers: list[bytes],
    counts: np.ndarray,
    block_ids: np.ndarray,
    block_size: int = BLOCK_SIZE,
    codec: str = "varint",
) -> np.ndarray:
    """Batch docID decode across many posting rows: one codec pass +
    one cumsum with per-row base resets (no Python loop over rows)."""
    deltas = decode_rows_values(buffers, counts, codec)
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


# --- FOR (frame-of-reference bit-packing) codec -------------------
#
# Lucene's default block postings format packs each 128-entry block's
# deltas at a fixed bit width (PackedInts / "FOR"); the reference
# inherits it through Lucene.NET (LucenePoolLight.cs:30). This is the
# parquet-segment analog, selectable per index via
# IndexParams.codec="forpack" (default stays "varint"):
#
#   buffer := width:uint8 || packbits_little(values as width-bit LE)
#
# width is the bit width of the buffer's max value (0 => all zeros,
# empty payload), so a buffer decodes with no external context except
# its value count — which every posting row already stores (`n`). For
# dense terms the docID deltas need ~log2(block/n)+1 bits, well under
# varint's 8-bit floor, and decode is a branch-free unpackbits +
# shift-accumulate instead of continuation-bit scanning.

CODEC_VARINT = "varint"
CODEC_FORPACK = "forpack"
CODECS = (CODEC_VARINT, CODEC_FORPACK)


def _bit_widths(values: np.ndarray) -> np.ndarray:
    """Per-element bit width of a uint64 array (0 for value 0)."""
    w = np.zeros(values.size, dtype=np.int64)
    tmp = values.copy()
    while tmp.any():
        w += tmp > 0
        tmp = tmp >> np.uint64(1)
    return w


def forpack_encode(values: np.ndarray) -> bytes:
    """FOR-encode a uint64 array into a self-describing buffer."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    w = int(_bit_widths(np.array([v.max()], dtype=np.uint64))[0])
    if w == 0:
        return b""
    bits = ((v[:, None] >> np.arange(w, dtype=np.uint64)) & np.uint64(1)).astype(
        np.uint8
    )
    return bytes([w]) + np.packbits(bits.ravel(), bitorder="little").tobytes()


def forpack_decode(buf: bytes, n: int) -> np.ndarray:
    """Decode a FOR buffer back to uint64 given its value count."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    w = buf[0] if len(buf) else 0
    if w == 0:
        return np.zeros(n, dtype=np.uint64)
    payload = np.frombuffer(buf, dtype=np.uint8, offset=1)
    return _forpack_decode_class(payload, np.array([n], dtype=np.int64), int(w))


def _ranges(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated [starts[i], starts[i]+lens[i]) index ranges."""
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    rep_starts = np.repeat(starts, lens)
    ends_cum = np.cumsum(lens)
    offs = np.arange(total) - np.repeat(ends_cum - lens, lens)
    return rep_starts + offs


def forpack_encode_groups(
    values: np.ndarray, g_starts: np.ndarray, g_ends: np.ndarray
) -> list[bytes]:
    """FOR-encode contiguous groups of one value stream, one buffer
    per group. Groups must tile ``values`` in order (zero-length
    groups allowed). Vectorized per distinct bit width: the only
    Python loops are the final byte-range slices (O(groups), same
    shape as the varint path's ``_slices``)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    g_starts = np.asarray(g_starts, dtype=np.int64)
    g_ends = np.asarray(g_ends, dtype=np.int64)
    n_groups = g_starts.size
    lens = g_ends - g_starts
    out: list[bytes | None] = [None] * n_groups
    gmax = np.zeros(n_groups, dtype=np.uint64)
    ne = lens > 0
    if ne.any() and v.size:
        gmax[ne] = np.maximum.reduceat(v, g_starts[ne])
    widths = np.zeros(n_groups, dtype=np.int64)
    widths[ne] = _bit_widths(gmax[ne])
    # zero-width groups (empty, or every value 0) need no payload and
    # no header — decode derives width 0 from the empty buffer
    zero_w = widths == 0
    for gi in np.flatnonzero(zero_w):
        out[gi] = b""
    for w in np.unique(widths[~zero_w]):
        sel = np.flatnonzero(widths == w)
        vals = v[_ranges(g_starts[sel], lens[sel])]
        bits = (
            (vals[:, None] >> np.arange(w, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.uint8)
        flat = bits.ravel()
        bit_lens = lens[sel] * w
        pad_lens = -(-bit_lens // 8) * 8  # per-group byte-aligned extents
        pad_ends = np.cumsum(pad_lens)
        pad_starts = pad_ends - pad_lens
        bit_ends = np.cumsum(bit_lens)
        bit_starts = bit_ends - bit_lens
        padded = np.zeros(int(pad_ends[-1]), dtype=np.uint8)
        padded[
            np.repeat(pad_starts - bit_starts, bit_lens)
            + np.arange(int(bit_ends[-1]))
        ] = flat
        packed = np.packbits(padded, bitorder="little")
        hdr = bytes([int(w)])
        byte_starts = pad_starts // 8
        byte_ends = pad_ends // 8
        pb = packed.tobytes()
        for gi, s, e in zip(sel, byte_starts, byte_ends):
            out[gi] = hdr + pb[s:e]
    return out  # type: ignore[return-value]


def _forpack_decode_class(
    payload: np.ndarray, n_sel: np.ndarray, w: int
) -> np.ndarray:
    """Decode one width class from the concatenated per-buffer
    payloads (each buffer byte-aligned, ``n_sel`` values each).

    Fast path (w <= 56): each w-bit field spans at most
    (w+7)//8 + 1 = nb bytes at any bit offset, so the value is an
    nb-byte little-endian gather shifted right by the in-byte offset
    and masked — ~nb vectorized gathers per class instead of w
    bit-gathers + an (n, w) matrix reduction. Overreads past a
    buffer's real payload land in the next buffer's bytes (or the
    zero tail appended here) and are masked away, never observed.

    Wide path (w >= 57, unused by posting streams in practice): the
    field plus shift can exceed 64 accumulated bits, so fall back to
    the exact bit-matrix reduction."""
    total = int(n_sel.sum())
    if total == 0:
        return np.empty(0, dtype=np.uint64)
    pad_bytes = -(-n_sel * w // 8)
    if w >= 57:
        bits = np.unpackbits(payload, bitorder="little")
        bit_lens = n_sel * w
        pad_ends = np.cumsum(pad_bytes) * 8
        pad_starts = pad_ends - pad_bytes * 8
        bit_ends = np.cumsum(bit_lens)
        bit_starts = bit_ends - bit_lens
        flat = bits[
            np.repeat(pad_starts - bit_starts, bit_lens)
            + np.arange(int(bit_ends[-1]))
        ]
        mat = flat.reshape(-1, w).astype(np.uint64)
        return (mat << np.arange(w, dtype=np.uint64)).sum(
            axis=1, dtype=np.uint64
        )
    nb = (w + 7) // 8 + 1
    buf = np.concatenate([payload, np.zeros(nb, dtype=np.uint8)])
    byte_ends = np.cumsum(pad_bytes)
    byte_starts = byte_ends - pad_bytes
    # per-value local index within its buffer, then global bit offset
    i_local = np.arange(total) - np.repeat(
        np.cumsum(n_sel) - n_sel, n_sel
    )
    bitoff = i_local * w
    b0 = np.repeat(byte_starts, n_sel) + (bitoff >> 3)
    shift = (bitoff & 7).astype(np.uint64)
    acc = np.zeros(total, dtype=np.uint64)
    for k in range(nb):
        acc |= buf[b0 + k].astype(np.uint64) << np.uint64(8 * k)
    mask = (np.uint64(1) << np.uint64(w)) - np.uint64(1)
    return (acc >> shift) & mask


def forpack_decode_rows(buffers: list[bytes], counts: np.ndarray) -> np.ndarray:
    """Batch-decode many FOR buffers into one uint64 array in input
    order — ONE mixed-width vectorized pass: per-value widths come
    from repeating each buffer's header, then nb_max byte-gathers
    accumulate every field regardless of its width (narrow fields'
    extra gathered bytes are masked away). No per-width classes, no
    scatter — the concatenated payloads are already in input order.
    Buffers with width >= 57 (never produced by posting streams) fall
    back to the exact per-class path."""
    counts = np.asarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint64)
    widths = np.fromiter(
        (b[0] if len(b) else 0 for b in buffers), dtype=np.int64, count=len(buffers)
    )
    widths = np.where(counts > 0, widths, 0)
    max_w = int(widths.max())
    val_ends = np.cumsum(counts)
    val_starts = val_ends - counts
    if max_w >= 57:
        out = np.zeros(total, dtype=np.uint64)
        for w in np.unique(widths[widths > 0]):
            sel = np.flatnonzero(widths == w)
            payload = np.frombuffer(
                b"".join(buffers[i][1:] for i in sel), dtype=np.uint8
            )
            vals = _forpack_decode_class(payload, counts[sel], int(w))
            out[_ranges(val_starts[sel], counts[sel])] = vals
        return out
    if max_w == 0:
        return np.zeros(total, dtype=np.uint64)
    nb = (max_w + 7) // 8 + 1
    joined = b"".join(b[1:] for b in buffers)
    buf = np.empty(len(joined) + nb, dtype=np.uint8)
    buf[: len(joined)] = np.frombuffer(joined, dtype=np.uint8)
    buf[len(joined):] = 0
    pad_bytes = -(-counts * widths // 8)
    byte_starts = np.cumsum(pad_bytes) - pad_bytes
    w_rep = np.repeat(widths, counts).astype(np.uint64)
    i_local = np.arange(total) - np.repeat(val_starts, counts)
    bitoff = i_local * w_rep.astype(np.int64)
    b0 = np.repeat(byte_starts, counts) + (bitoff >> 3)
    shift = (bitoff & 7).astype(np.uint64)
    acc = buf[b0].astype(np.uint64)
    for k in range(1, nb):
        acc |= buf[b0 + k].astype(np.uint64) << np.uint64(8 * k)
    mask = (np.uint64(1) << w_rep) - np.uint64(1)
    return (acc >> shift) & mask


def encode_stream(values: np.ndarray, codec: str = CODEC_VARINT) -> bytes:
    if codec == CODEC_VARINT:
        return varint_encode(values)
    if codec == CODEC_FORPACK:
        return forpack_encode(values)
    raise ValueError(f"unknown posting codec: {codec!r} (expected one of {CODECS})")


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
    codec: str = "varint",
) -> dict:
    """Vectorized multi-group posting encoder.

    Input rows MUST be sorted by (field, term, block_id, doc_id) —
    the build pipeline's sortWithinPartitions guarantees it. All
    heavy work (deltas, codec packing, tfnorm, reduceat aggregations)
    runs ONCE over the whole batch; the only Python loop slices
    per-group byte ranges out of the shared buffers (O(groups),
    trivially cheap). This removes the per-group call overhead of
    grouped-map UDFs — the difference between ~3 and ~1000+ files/sec
    at build time.

    ``codec`` selects the byte-stream format for every posting column
    ("varint" LEB128 default, "forpack" FOR bit-packing); it is an
    index-wide property pinned in params.json.

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
    else:
        pdeltas = np.empty(0, dtype=np.uint64)

    if codec == "forpack":
        docs_slices = forpack_encode_groups(deltas, g_starts, g_ends)
        tfs_slices = forpack_encode_groups(tf64, g_starts, g_ends)
        dls_slices = forpack_encode_groups(dl64, g_starts, g_ends)
        cnt_slices = forpack_encode_groups(
            counts.astype(np.uint64), g_starts, g_ends
        )
        # group extents in position-VALUE space (rows tile the stream)
        ends_cum = np.cumsum(counts)
        row_val_starts = ends_cum - counts
        pos_g_starts = row_val_starts[g_starts]
        pos_g_ends = ends_cum[g_ends - 1]
        pos_slices = forpack_encode_groups(pdeltas, pos_g_starts, pos_g_ends)
    elif codec == "varint":
        docs_buf, docs_ends = _varint_with_offsets(deltas)
        tfs_buf, tfs_ends = _varint_with_offsets(tf64)
        dls_buf, dls_ends = _varint_with_offsets(dl64)
        if total_pos:
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
    else:
        raise ValueError(
            f"unknown posting codec: {codec!r} (expected one of {CODECS})"
        )

    # per-field avgdl, then one vectorized tfnorm pass
    avgdl_arr = np.empty(n, dtype=np.float64)
    for f in np.unique(field):
        avgdl_arr[field == f] = avgdl_map.get(str(f), 1.0) or 1.0
    tff = tf64.astype(np.float64)
    dlf = dl64.astype(np.float64)
    tfnorm = tff * (k1 + 1.0) / (tff + k1 * (1.0 - b + b * dlf / avgdl_arr))

    cf = np.add.reduceat(tf64.astype(np.int64), g_starts)
    bmax = np.maximum.reduceat(tfnorm, g_starts)

    if codec == "varint":
        mv_docs, mv_tfs, mv_dls = docs_buf, tfs_buf, dls_buf
        mv_cnt, mv_pos = cnt_buf, pos_buf

        def _slices(buf, ends):
            out = []
            for s, e in zip(g_starts, g_ends):
                lo = ends[s - 1] if s > 0 else 0
                out.append(buf[lo : ends[e - 1]])
            return out

        docs_slices = _slices(mv_docs, docs_ends)
        tfs_slices = _slices(mv_tfs, tfs_ends)
        dls_slices = _slices(mv_dls, dls_ends)
        cnt_slices = _slices(mv_cnt, cnt_ends)
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
        "docs_delta": docs_slices,
        "tfs": tfs_slices,
        "dls": dls_slices,
        "pos_counts": cnt_slices,
        "pos_deltas": pos_slices,
        "block_max_tfnorm": bmax,
    }
