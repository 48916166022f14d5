"""FOR bit-packing posting codec (IndexParams.codec="forpack").

The varint codec is the pinned default; forpack is the Lucene
block-postings analog (PackedInts / FOR — the reference inherits it
via Lucene.NET, LucenePoolLight.cs:30). Every property here is a
cross-codec identity: same postings in, byte streams differ, decoded
arrays and search results (docIDs AND BM25 scores) must be equal.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from codeindex_spark.index import encoding as E
from codeindex_spark.index.build import IndexParams


# ---------- pure-numpy codec properties ----------


@given(
    st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300)
)
@settings(max_examples=150, deadline=None)
def test_forpack_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    out = E.forpack_decode(E.forpack_encode(v), v.size)
    assert np.array_equal(out, v)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=400),
    st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=40),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_forpack_groups_match_single(values, rawcuts, rnd):
    """Grouped encode == per-group single encode; batch decode == input.
    Group boundaries include empty groups."""
    v = np.array(values, dtype=np.uint64)
    cuts = np.sort(np.array([c % (v.size + 1) for c in rawcuts], dtype=np.int64))
    starts = np.concatenate(([0], cuts))
    ends = np.concatenate((cuts, [v.size]))
    bufs = E.forpack_encode_groups(v, starts, ends)
    for b, s, e in zip(bufs, starts, ends):
        assert b == E.forpack_encode(v[s:e])
    dec = E.forpack_decode_rows(bufs, ends - starts)
    assert np.array_equal(dec, v)


def test_zero_width_buffers_are_empty():
    assert E.forpack_encode(np.zeros(7, dtype=np.uint64)) == b""
    assert E.forpack_encode(np.array([], dtype=np.uint64)) == b""
    assert np.array_equal(
        E.forpack_decode(b"", 7), np.zeros(7, dtype=np.uint64)
    )


def _synth_posting_rows(seed: int, n_terms: int = 6):
    rng = np.random.RandomState(seed)
    rows = []
    for f in ["content", "path_trigram"]:
        for ti in range(n_terms):
            for blk in [0, 2]:
                k = rng.randint(1, 50)
                docs = np.sort(
                    rng.choice(np.arange(blk * 128, blk * 128 + 128), k, False)
                )
                for d in docs:
                    tf = int(rng.randint(1, 7))
                    pos = (
                        np.sort(rng.choice(np.arange(0, 800), tf, False))
                        if f == "content"
                        else np.array([], dtype=np.int64)
                    )
                    rows.append(
                        (f, f"t{ti:02d}", blk, int(d), tf,
                         int(rng.randint(4, 300)), pos)
                    )
    return rows


@pytest.mark.parametrize("seed", [3, 19])
def test_encode_blocks_batch_cross_codec(seed):
    rows = _synth_posting_rows(seed)
    field = np.array([r[0] for r in rows], dtype=object)
    term = np.array([r[1] for r in rows], dtype=object)
    blk = np.array([r[2] for r in rows], dtype=np.int64)
    doc = np.array([r[3] for r in rows], dtype=np.int64)
    tf = np.array([r[4] for r in rows], dtype=np.int64)
    dl = np.array([r[5] for r in rows], dtype=np.int64)
    pos = [r[6] for r in rows]
    avgdl = {"content": 80.0, "path_trigram": 12.0}
    a = E.encode_blocks_batch(field, term, blk, doc, tf, dl, pos, avgdl)
    b = E.encode_blocks_batch(
        field, term, blk, doc, tf, dl, pos, avgdl, codec="forpack"
    )
    na = np.asarray(a["n"], dtype=np.int64)
    assert list(a["n"]) == list(b["n"]) and list(a["cf"]) == list(b["cf"])
    assert np.allclose(a["block_max_tfnorm"], b["block_max_tfnorm"])
    for col in ["docs_delta", "tfs", "dls", "pos_counts"]:
        va = E.decode_rows_values(list(a[col]), na, "varint")
        vb = E.decode_rows_values(list(b[col]), na, "forpack")
        assert np.array_equal(va, vb), col
    da = E.decode_rows_docs(
        list(a["docs_delta"]), na, np.asarray(a["block_id"]), 128, "varint"
    )
    db = E.decode_rows_docs(
        list(b["docs_delta"]), na, np.asarray(b["block_id"]), 128, "forpack"
    )
    assert np.array_equal(da, db)
    pca, fa = E.decode_positions_rows(
        list(a["pos_counts"]), list(a["pos_deltas"]), na, "varint"
    )
    pcb, fb = E.decode_positions_rows(
        list(b["pos_counts"]), list(b["pos_deltas"]), na, "forpack"
    )
    assert np.array_equal(pca, pcb) and np.array_equal(fa, fb)
    ra = E.decode_rows_pos_deltas(list(a["pos_deltas"]), pca, na, "varint")
    rb = E.decode_rows_pos_deltas(list(b["pos_deltas"]), pcb, na, "forpack")
    assert np.array_equal(ra, rb)
    # the point of FOR: dense doc deltas pack under varint's 1-byte floor
    bytes_a = sum(len(bytes(x)) for x in a["docs_delta"])
    bytes_b = sum(len(bytes(x)) for x in b["docs_delta"])
    assert bytes_b < bytes_a


def test_unknown_codec_rejected():
    with pytest.raises(ValueError, match="unknown posting codec"):
        IndexParams(num_buckets=8, codec="zstd")
    with pytest.raises(ValueError, match="unknown posting codec"):
        E.encode_blocks_batch(
            np.array(["f"], dtype=object),
            np.array(["t"], dtype=object),
            np.zeros(1, np.int64),
            np.zeros(1, np.int64),
            np.ones(1, np.int64),
            np.ones(1, np.int64),
            [np.array([0])],
            {"f": 1.0},
            codec="zstd",
        )


# ---------- Spark integration: full index + incremental ----------

QUERY_BATTERY = [
    "documents",
    "field AND flush",
    '"field file flush"',
    "doc*",
    "documants~1",
    "commit OR (field AND NOT flush)",
    '"file flush writer"~2',
    "get size return",
]


@pytest.fixture(scope="module")
def codec_engines(spark, tmp_path_factory):
    from codeindex_spark.corpus import CorpusSpec, spark_documents
    from codeindex_spark.index.segments import IndexBuilder, IndexReader
    from codeindex_spark.query.planner import SearchEngine

    docs = spark_documents(spark, CorpusSpec(n_docs=250, seed=5))
    out = {}
    for codec in ("varint", "forpack"):
        d = str(tmp_path_factory.mktemp(f"codec_{codec}"))
        p = IndexParams(num_buckets=8, codec=codec)
        IndexBuilder(spark, d, p, n_groups=1).build(docs, resume=False)
        out[codec] = (SearchEngine(IndexReader(spark, d)), d)
    return out


def test_search_rank_and_score_identity(codec_engines):
    nonzero = 0
    for q in QUERY_BATTERY:
        a = codec_engines["varint"][0].search(q, k=30).collect()
        b = codec_engines["forpack"][0].search(q, k=30).collect()
        assert [(r.doc_id, round(r.score, 9)) for r in a] == [
            (r.doc_id, round(r.score, 9)) for r in b
        ], q
        nonzero += len(a) > 0
    assert nonzero >= 6  # the battery must actually exercise postings


def test_codec_pinned_in_params_and_resume(spark, codec_engines):
    from codeindex_spark.index.segments import IndexBuilder

    _, d = codec_engines["forpack"]
    stored = json.load(open(os.path.join(d, "params.json")))
    assert stored["codec"] == "forpack"
    # resuming with mismatched codec must refuse (docID/byte layout pin)
    with pytest.raises(ValueError, match="params changed"):
        IndexBuilder(
            spark, d, IndexParams(num_buckets=8, codec="varint"), n_groups=1
        ).plan(None)


def test_legacy_params_without_codec_resume(spark, codec_engines):
    """params.json written before the codec field existed (no 'codec'
    key) must still resume as varint — from_dict normalization."""
    from codeindex_spark.index.segments import IndexBuilder

    _, d = codec_engines["varint"]
    pfile = os.path.join(d, "params.json")
    stored = json.load(open(pfile))
    stored.pop("codec")
    json.dump(stored, open(pfile, "w"))
    b = IndexBuilder(spark, d, IndexParams(num_buckets=8), n_groups=1)
    b.plan(None)  # no raise
    json.dump({**stored, "codec": "varint"}, open(pfile, "w"))


def test_incremental_forpack(spark, tmp_path):
    """apply_snapshot + compact on a forpack index: delta segments and
    compaction inherit the codec; a default-params reopen adopts it."""
    import pandas as pd

    from codeindex_spark.corpus import CorpusSpec, generate_documents
    from codeindex_spark.query.planner import SearchEngine
    from codeindex_spark.streaming.maintain import IncrementalIndex

    v1 = generate_documents(CorpusSpec(n_docs=60, seed=9))
    v2 = pd.concat(
        [
            v1.iloc[1:],  # drop one doc
            pd.DataFrame(
                [
                    {
                        "repo": "r0",
                        "path": "src/new/added_999.py",
                        "commit": "c" * 13,
                        "lang": "python",
                        "content": "freshforpackterm appears exactly here",
                    }
                ]
            ),
        ],
        ignore_index=True,
    )
    root = str(tmp_path / "fp_inc")
    params = IndexParams(num_buckets=8, block_size=32, codec="forpack")
    inc = IncrementalIndex(spark, root, params, n_groups=1)
    inc.build_base(spark.createDataFrame(v1))
    inc.apply_snapshot(spark.createDataFrame(v2))
    seg_params = json.load(
        open(os.path.join(root, "deltas", "d0001", "params.json"))
    )
    assert seg_params["codec"] == "forpack"
    eng = SearchEngine(inc.reader())
    assert eng.search("freshforpackterm", k=5).count() == 1
    # reopen with DEFAULT params: codec adopted from the base segment
    reopened = IncrementalIndex(
        spark, root, IndexParams(num_buckets=8, block_size=32), n_groups=1
    )
    assert reopened.params.codec == "forpack"
    # compact keeps the codec and the results
    inc.compact()
    eng2 = SearchEngine(inc.reader())
    assert eng2.search("freshforpackterm", k=5).count() == 1
    compacted = inc.segments()
    assert len(compacted) == 1
    cp = json.load(open(os.path.join(compacted[0]["dir"], "params.json")))
    assert cp["codec"] == "forpack"
