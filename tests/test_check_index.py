"""Index integrity verifier (index/check.py — the CheckIndex analog):
a freshly built index passes every check under both codecs, and each
class of corruption is detected by exactly the check that names it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from codeindex_spark.corpus import CorpusSpec, spark_documents
from codeindex_spark.index.build import IndexParams
from codeindex_spark.index.check import check_index, check_postings
from codeindex_spark.index.encoding import varint_decode, varint_encode
from codeindex_spark.index.segments import IndexBuilder, IndexReader

SPEC = CorpusSpec(n_docs=120)


def _build(spark, tmp_path_factory, codec):
    d = str(tmp_path_factory.mktemp(f"chk_{codec}"))
    params = IndexParams(num_buckets=8, block_size=32, codec=codec)
    docs = spark_documents(spark, SPEC, partitions=4)
    IndexBuilder(spark, d, params, n_groups=2).build(docs, resume=False)
    return IndexReader(spark, d)


@pytest.fixture(scope="module", params=["varint", "forpack"])
def reader(request, spark, tmp_path_factory):
    return _build(spark, tmp_path_factory, request.param)


def test_fresh_index_is_clean(reader):
    rows = check_index(reader).collect()
    by_check = {}
    for r in rows:
        by_check.setdefault(r["check"], [0, 0])
        by_check[r["check"]][0] += r["n_checked"]
        by_check[r["check"]][1] += r["n_violations"]
    # every check ran over real work and found nothing
    for ck in (
        "stream_len",
        "docs_sorted",
        "docs_in_block",
        "tf_positive",
        "cf_agree",
        "block_max",
        "tf_pos_agree",
        "pos_sorted",
        "dict_df",
        "dict_cf",
        "dict_terms",
    ):
        n_checked, n_bad = by_check[ck]
        assert n_bad == 0, (ck, n_bad)
        assert n_checked > 0, ck


def _avgdl_map(reader):
    return {
        str(r["field"]): float(r["avgdl"])
        for _, r in reader.stats.iterrows()
    }


def _mutated(spark, reader, mutate):
    """Collect the (small) postings, apply ``mutate`` to the pandas
    frame, rebuild a DataFrame with the original schema."""
    pdf = reader.postings.toPandas()
    pdf = mutate(pdf)
    return spark.createDataFrame(pdf, schema=reader.postings.schema)


def _violations(spark, reader, mutate):
    df = _mutated(spark, reader, mutate)
    rows = check_postings(df, reader.params, _avgdl_map(reader)).collect()
    return {
        (r["check"]): sum(
            x["n_violations"] for x in rows if x["check"] == r["check"]
        )
        for r in rows
    }


@pytest.fixture(scope="module")
def vreader(spark, tmp_path_factory):
    # corruption surgery below rewrites varint streams directly
    return _build(spark, tmp_path_factory, "varint")


def _pick(pdf, min_n=2):
    idx = pdf.index[pdf["n"] >= min_n]
    assert len(idx), "need a multi-entry posting row"
    return idx[0]


def test_detects_unsorted_docs(spark, vreader):
    def mutate(pdf):
        i = _pick(pdf)
        deltas = varint_decode(pdf.at[i, "docs_delta"])
        deltas[1] = 0  # duplicate docID — breaks strict order
        pdf.at[i, "docs_delta"] = varint_encode(deltas)
        return pdf

    v = _violations(spark, vreader, mutate)
    assert v["docs_sorted"] == 1
    assert v["stream_len"] == 0  # same value count — only order broke


def test_detects_doc_outside_block(spark, vreader):
    def mutate(pdf):
        i = _pick(pdf)
        deltas = varint_decode(pdf.at[i, "docs_delta"])
        deltas[-1] += vreader.params.block_size  # escapes the block
        pdf.at[i, "docs_delta"] = varint_encode(deltas)
        return pdf

    assert _violations(spark, vreader, mutate)["docs_in_block"] >= 1


def test_detects_cf_and_tf_corruption(spark, vreader):
    def mutate(pdf):
        i = _pick(pdf)
        pdf.at[i, "cf"] = int(pdf.at[i, "cf"]) + 1
        j = pdf.index[(pdf["n"] >= 1) & (pdf.index != i)][0]
        tfs = varint_decode(pdf.at[j, "tfs"])
        tfs[0] = 0  # tf must be >= 1
        pdf.at[j, "tfs"] = varint_encode(tfs)
        return pdf

    v = _violations(spark, vreader, mutate)
    assert v["cf_agree"] >= 1
    assert v["tf_positive"] >= 1


def test_detects_blockmax_corruption(spark, vreader):
    def mutate(pdf):
        i = _pick(pdf, min_n=1)
        # an UNDER-stated block max silently breaks WAND soundness —
        # exactly the corruption the verifier must catch
        pdf.at[i, "block_max_tfnorm"] = 0.0
        return pdf

    assert _violations(spark, vreader, mutate)["block_max"] == 1


def test_detects_truncated_stream(spark, vreader):
    def mutate(pdf):
        i = _pick(pdf)
        pdf.at[i, "tfs"] = pdf.at[i, "tfs"][:-1]  # drop a terminator
        return pdf

    assert _violations(spark, vreader, mutate)["stream_len"] == 1


def test_detects_position_corruption(spark, vreader):
    def mutate(pdf):
        # positional row: pos_counts non-empty
        idx = pdf.index[
            (pdf["n"] >= 1) & (pdf["pos_counts"].map(len) > 0)
        ]
        i = idx[0]
        counts = varint_decode(pdf.at[i, "pos_counts"])
        tfs = varint_decode(pdf.at[i, "tfs"])
        assert (counts == tfs).all()
        counts[0] += 1  # position count no longer matches tf
        deltas = varint_decode(pdf.at[i, "pos_deltas"])
        deltas = np.concatenate([deltas[:1], [np.uint64(0)], deltas[1:]])
        pdf.at[i, "pos_counts"] = varint_encode(counts)
        pdf.at[i, "pos_deltas"] = varint_encode(deltas)  # 0-delta dup
        return pdf

    v = _violations(spark, vreader, mutate)
    assert v["tf_pos_agree"] >= 1
    assert v["pos_sorted"] >= 1


def test_dict_cross_check_detects_drift(spark, vreader, tmp_path):
    # write a tampered dictionary next to the real index and point a
    # fresh reader at it: one term's df drifts, one term vanishes
    import shutil

    d = str(tmp_path / "drift")
    shutil.copytree(vreader.paths.root, d)
    r2 = IndexReader(spark, d)
    td = r2.term_dict.toPandas()
    td.loc[td.index[0], "df"] = int(td.loc[td.index[0], "df"]) + 5
    victim = td.index[1]
    td = td.drop(index=victim)
    spark.createDataFrame(td, schema=r2.term_dict.schema).write.mode(
        "overwrite"
    ).parquet(r2.paths.term_dict)
    rows = check_index(IndexReader(spark, d)).collect()
    v = {}
    for r in rows:
        v[r["check"]] = v.get(r["check"], 0) + r["n_violations"]
    assert v["dict_df"] >= 2  # drifted + missing both mismatch
    assert v["dict_terms"] >= 1  # the dropped term is an orphan
    # posting rows themselves are untouched
    assert v["docs_sorted"] == 0 and v["block_max"] == 0
