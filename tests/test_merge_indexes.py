"""Cross-index merge (index/merge.py — the IndexWriter.addIndexes
analog): two independently built shard indexes merged into one must
be rank- AND score-identical to the index built over the concatenated
corpus in one job, pass the full CheckIndex verifier, and refuse
incompatible sources.
"""

from __future__ import annotations

import pandas as pd
import pytest

from codeindex_spark.corpus import CorpusSpec, generate_documents
from codeindex_spark.index.build import IndexParams
from codeindex_spark.index.check import check_index
from codeindex_spark.index.merge import merge_indexes
from codeindex_spark.index.segments import IndexBuilder, IndexReader
from codeindex_spark.query import ast
from codeindex_spark.query.planner import SearchEngine

SPEC = CorpusSpec(n_docs=140)
PARAMS = IndexParams(num_buckets=8, block_size=32)

QUERIES = [
    "get",
    "index AND writer",
    "stri*",
    '"fast sort"',
    "sort OR merge NOT spark",
]


def _build(spark, d, pdf):
    IndexBuilder(spark, d, PARAMS, n_groups=1).build(
        spark.createDataFrame(pdf), resume=False
    )
    return IndexReader(spark, d)


@pytest.fixture(scope="module")
def merged_and_whole(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("merge")
    docs = generate_documents(SPEC)
    # shards deliberately unequal so the docID spans differ
    a, b = docs.iloc[:55], docs.iloc[55:]
    _build(spark, str(base / "a"), a)
    _build(spark, str(base / "b"), b)
    whole = _build(spark, str(base / "whole"), docs)
    merged = merge_indexes(
        spark, [str(base / "a"), str(base / "b")], str(base / "m")
    )
    return merged, whole


def _by_path(engine, q, k=10_000):
    """All matches as ((repo, path), score), ordered tie-insensitively:
    internal docIDs legitimately differ after a merge (Lucene
    addIndexes likewise renumbers), so equal-score ties are ordered
    by path instead of docID. k covers every match so tie groups are
    never truncated differently."""
    rows = engine.search(q, k=k, with_docs=True).collect()
    return sorted(
        (((r["repo"], r["path"]), r["score"]) for r in rows),
        key=lambda x: (-x[1], x[0]),
    )


def test_merged_matches_single_build(spark, merged_and_whole):
    merged, whole = merged_and_whole
    em, ew = SearchEngine(merged), SearchEngine(whole)
    nonempty = 0
    for q in QUERIES:
        gm, gw = _by_path(em, q), _by_path(ew, q)
        assert [p for p, _ in gm] == [p for p, _ in gw], q
        for (_, sm), (_, sw) in zip(gm, gw):
            assert sm == pytest.approx(sw, rel=1e-12), q
        nonempty += int(len(gm) > 0)
    assert nonempty >= 4
    # total-hit counts agree too (dictionary df merged correctly)
    assert em.count(ast.Term("get")) == ew.count(ast.Term("get"))


def test_merged_passes_check_index(merged_and_whole):
    merged, _ = merged_and_whole
    bad = [
        r
        for r in check_index(merged).collect()
        if r["n_violations"] != 0
    ]
    assert bad == []


def test_merged_doc_spans_disjoint(merged_and_whole):
    merged, _ = merged_and_whole
    import pyspark.sql.functions as F

    # every doc exactly once, shard spans block-aligned and disjoint
    n = merged.docs.count()
    assert n == SPEC.n_docs
    assert merged.docs.select("doc_id").distinct().count() == n
    spans = (
        merged.docs.groupBy("group")
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .orderBy("group")
        .collect()
    )
    assert spans[1]["lo"] % PARAMS.block_size == 0
    assert spans[0]["hi"] < spans[1]["lo"]


def test_merge_validation(spark, tmp_path_factory, merged_and_whole):
    base = tmp_path_factory.mktemp("merge_bad")
    docs = generate_documents(CorpusSpec(n_docs=20))
    d1 = str(base / "x")
    IndexBuilder(
        spark, d1, IndexParams(num_buckets=4, block_size=64), n_groups=1
    ).build(spark.createDataFrame(docs), resume=False)
    merged, _ = merged_and_whole
    with pytest.raises(ValueError, match="block_size"):
        merge_indexes(
            spark, [d1, merged.paths.root], str(base / "out")
        )
    with pytest.raises(ValueError, match="at least two"):
        merge_indexes(spark, [d1], str(base / "out2"))
