"""Distributed index integrity verifier — the CheckIndex analog.

Lucene ships CheckIndex (org.apache.lucene.index.CheckIndex) to
verify a segment's invariants offline — postings in doc order, term
dictionary statistics agreeing with the postings, frequencies
positive, positions consistent with tf. The reference engine inherits
that guarantee through Lucene.NET; an operator runs CheckIndex before
trusting a copied/restored index. This is the parquet-segment analog
for this engine's layout (index/segments.py), and at 100 TB it is the
job you run after a bulk copy, a compaction, or a suspected
bad-node write before serving queries from the index.

Scale shape: ONE mapInPandas pass over the postings does every
per-row check on the executors (vectorized numpy over the decoded
streams — the same batch decoders the query kernels use, so the
verifier exercises the real read path for both codecs); only
per-(field, check) counter rows cross the exchange. The dictionary
cross-check is a plain JVM aggregate of the stored per-row `n`/`cf`
(pinned against the decoded streams by the per-row checks) joined to
the term dictionary — no second decode. Nothing is collected but the
final few-row summary.

Checks emitted (one row per (check, field)):

- ``stream_len``     — docs/tfs/dls byte streams are well-formed for
                       exactly ``n`` values (varint: n terminator
                       bytes; forpack: width header + ceil(n*w/8));
                       position streams are validated through their
                       decode below
- ``docs_sorted``    — docIDs strictly increasing within each row
- ``docs_in_block``  — every docID inside its block's doc range
- ``tf_positive``    — every tf >= 1
- ``cf_agree``       — stored row cf == sum of the row's decoded tfs
- ``block_max``      — stored block_max_tfnorm == true max tfnorm of
                       the row (bit-exact: recomputed with the same
                       float ops the build used); an UNDER-stated max
                       breaks WAND soundness, an over-stated one only
                       costs pruning
- ``tf_pos_agree``   — per-entry position count == tf (positional
                       rows only)
- ``pos_sorted``     — positions strictly increasing per entry
- ``dict_df``        — term_dict.df == sum of row n per (field, term)
- ``dict_cf``        — term_dict.cf == sum of row cf per (field, term)
- ``dict_terms``     — postings terms ⊆ dictionary terms and vice
                       versa (orphan/missing term count)
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codeindex_spark.index.encoding import (
    bm25_tfnorm,
    decode_positions_rows,
    decode_rows_docs,
    decode_rows_values,
)

__all__ = ["check_postings", "check_index", "CHECK_SCHEMA_DDL"]

CHECK_SCHEMA_DDL = (
    "check string, field string, n_checked long, n_violations long"
)

_ROW_CHECKS = (
    "stream_len",
    "docs_sorted",
    "docs_in_block",
    "tf_positive",
    "cf_agree",
    "block_max",
    "tf_pos_agree",
    "pos_sorted",
)


def _varint_value_counts(bufs: list, lens: np.ndarray) -> np.ndarray:
    """Values per buffer = terminator bytes (high bit clear) per
    buffer, one vectorized pass over the concatenation."""
    out = np.zeros(len(bufs), dtype=np.int64)
    nz = lens > 0
    if not nz.any():
        return out
    joined = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    ends = joined < 0x80
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    out[nz] = np.add.reduceat(ends, starts[nz])
    # reduceat with duplicate start offsets (empty rows) would copy a
    # neighbour's sum; the nz mask above excludes them entirely
    return out


def _forpack_len_ok(
    bufs: list, lens: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Per-buffer: len == 1 + ceil(count * width / 8) with the width
    read from the header byte."""
    ok = np.zeros(len(bufs), dtype=bool)
    for i, b in enumerate(bufs):  # header peek only — O(rows), no decode
        if lens[i] == 0:
            # width-0 spelling: empty values OR every value zero
            # (forpack_encode_groups writes no header either way)
            ok[i] = True
            continue
        w = b[0]
        ok[i] = 1 <= w <= 64 and lens[i] == 1 + -(
            -int(counts[i]) * w // 8
        )
    return ok


def _entry_starts(counts: np.ndarray) -> np.ndarray:
    return np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)


def _check_kernel(
    avgdl_map: dict,
    k1: float,
    b: float,
    bsz: int,
    codec: str,
    positionless: frozenset,
):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        agg: dict[tuple[str, str], list[int]] = {}

        def bump(check: str, field: str, n_checked: int, n_bad: int):
            cell = agg.setdefault((check, field), [0, 0])
            cell[0] += int(n_checked)
            cell[1] += int(n_bad)

        for pdf in batches:
            if len(pdf) == 0:
                continue
            for field, g in pdf.groupby("field", sort=False):
                avgdl = avgdl_map.get(field)
                n = g["n"].to_numpy(dtype=np.int64)
                block_id = g["block_id"].to_numpy(dtype=np.int64)
                rows = len(g)

                # stream_len: every per-row buffer holds exactly n
                # values (docs/tfs/dls; positions below)
                bad_len = np.zeros(rows, dtype=bool)
                for col in ("docs_delta", "tfs", "dls"):
                    bufs = list(g[col])
                    lens = np.fromiter(
                        (len(x) for x in bufs), dtype=np.int64, count=rows
                    )
                    if codec == "varint":
                        bad_len |= _varint_value_counts(bufs, lens) != n
                    else:
                        bad_len |= ~_forpack_len_ok(bufs, lens, n)
                bump("stream_len", field, rows, int(bad_len.sum()))
                if bad_len.any():
                    # decoding a malformed stream would throw inside
                    # the batch decoders; report and skip the rest of
                    # this field group (CheckIndex likewise stops at
                    # the first corruption of a segment)
                    for ck in _ROW_CHECKS[1:]:
                        bump(ck, field, 0, 0)
                    continue

                starts = _entry_starts(n)
                docs = decode_rows_docs(
                    list(g["docs_delta"]), n, block_id, bsz, codec
                )
                tfs = decode_rows_values(list(g["tfs"]), n, codec).astype(
                    np.int64
                )
                dls = decode_rows_values(list(g["dls"]), n, codec).astype(
                    np.int64
                )

                # docs strictly increasing within each row: deltas of
                # the flat array must be >= 1 except at row starts
                d = np.diff(docs, prepend=np.int64(0))
                inner = np.ones(docs.size, dtype=bool)
                inner[starts] = False
                bad = np.zeros(rows, dtype=bool)
                np.logical_or.at(
                    bad,
                    np.repeat(np.arange(rows), n),
                    inner & (d < 1),
                )
                bump("docs_sorted", field, rows, int(bad.sum()))

                lo = np.repeat(block_id * bsz, n)
                in_blk = (docs >= lo) & (docs < lo + bsz)
                bump(
                    "docs_in_block", field, docs.size,
                    int((~in_blk).sum()),
                )

                bump("tf_positive", field, tfs.size, int((tfs < 1).sum()))

                cf = g["cf"].to_numpy(dtype=np.int64)
                row_tf_sum = np.add.reduceat(tfs, starts)
                bump("cf_agree", field, rows, int((row_tf_sum != cf).sum()))

                if avgdl is not None:
                    tfn = bm25_tfnorm(tfs, dls, avgdl, k1, b)
                    row_max = np.maximum.reduceat(tfn, starts)
                    stored = g["block_max_tfnorm"].to_numpy(
                        dtype=np.float64
                    )
                    bump(
                        "block_max", field, rows,
                        int((row_max != stored).sum()),
                    )
                else:  # pragma: no cover — stats row always exists
                    bump("block_max", field, 0, 0)

                # per-entry position counts must match the field's
                # contract: == tf on positional fields, == 0 on
                # positionless ones (params.positionless — build
                # stores zero-count position streams there)
                pcounts, flat_pos = decode_positions_rows(
                    list(g["pos_counts"]),
                    list(g["pos_deltas"]),
                    n,
                    codec,
                )
                want = (
                    np.zeros_like(tfs)
                    if field in positionless
                    else tfs
                )
                bump(
                    "tf_pos_agree", field, pcounts.size,
                    int((pcounts != want).sum()),
                )
                if flat_pos.size:
                    estarts = _entry_starts(pcounts)
                    # zero-count entries repeat an offset; clamp so
                    # the mask index stays in range and dedupes
                    estarts = np.minimum(estarts, flat_pos.size - 1)
                    pd_ = np.diff(flat_pos, prepend=np.int64(0))
                    pinner = np.ones(flat_pos.size, dtype=bool)
                    pinner[estarts] = False
                    bump(
                        "pos_sorted", field, flat_pos.size,
                        int((pinner & (pd_ < 1)).sum()),
                    )
                else:
                    bump("pos_sorted", field, rows, 0)
        if agg:
            yield pd.DataFrame(
                {
                    "check": [k[0] for k in agg],
                    "field": [k[1] for k in agg],
                    "n_checked": [v[0] for v in agg.values()],
                    "n_violations": [v[1] for v in agg.values()],
                }
            )

    return kernel


def check_postings(
    postings: DataFrame,
    params,
    avgdl_map: dict[str, float],
) -> DataFrame:
    """Per-row posting checks over an arbitrary postings DataFrame
    (exposed separately so tests can feed corrupted frames). Returns
    (check, field, n_checked, n_violations) summed across partitions.
    """
    part = postings.mapInPandas(
        _check_kernel(
            dict(avgdl_map),
            params.k1,
            params.b,
            params.block_size,
            params.codec,
            frozenset(params.positionless),
        ),
        schema=CHECK_SCHEMA_DDL,
    )
    return part.groupBy("check", "field").agg(
        F.sum("n_checked").alias("n_checked"),
        F.sum("n_violations").alias("n_violations"),
    )


def check_index(reader) -> DataFrame:
    """Full-index verification: the per-row posting checks plus the
    dictionary cross-checks. Every row with n_violations == 0 means
    the invariant holds everywhere; any nonzero row names the broken
    invariant and the field it broke in."""
    avgdl_map = {
        str(r["field"]): float(r["avgdl"])
        for _, r in reader.stats.iterrows()
    }
    rows = check_postings(reader.postings, reader.params, avgdl_map)

    # dictionary cross-checks: stored n/cf are pinned to the decoded
    # streams by stream_len/cf_agree, so a JVM aggregate suffices
    pagg = reader.postings.groupBy("field", "term").agg(
        F.sum("n").alias("p_df"), F.sum("cf").alias("p_cf")
    )
    joined = pagg.join(
        reader.term_dict.select("field", "term", "df", "cf"),
        ["field", "term"],
        "full_outer",
    )
    dict_rows = joined.groupBy("field").agg(
        F.count("*").alias("n_terms"),
        F.sum(
            (
                F.col("df").isNull()
                | F.col("p_df").isNull()
                | (F.col("df") != F.col("p_df"))
            ).cast("long")
        ).alias("bad_df"),
        F.sum(
            (
                F.col("cf").isNull()
                | F.col("p_cf").isNull()
                | (F.col("cf") != F.col("p_cf"))
            ).cast("long")
        ).alias("bad_cf"),
        F.sum(
            (F.col("df").isNull() | F.col("p_df").isNull()).cast("long")
        ).alias("orphans"),
    )
    dict_checks = dict_rows.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("dict_df").alias("check"),
                    F.col("field"),
                    F.col("n_terms").alias("n_checked"),
                    F.col("bad_df").alias("n_violations"),
                ),
                F.struct(
                    F.lit("dict_cf").alias("check"),
                    F.col("field"),
                    F.col("n_terms").alias("n_checked"),
                    F.col("bad_cf").alias("n_violations"),
                ),
                F.struct(
                    F.lit("dict_terms").alias("check"),
                    F.col("field"),
                    F.col("n_terms").alias("n_checked"),
                    F.col("orphans").alias("n_violations"),
                ),
            )
        ).alias("s")
    ).select("s.*")
    return rows.unionByName(dict_checks)
