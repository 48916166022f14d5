"""Physical-plan regression tests: the scale properties PLANS.md
documents must hold in the executed plans, not just prose — a
refactor that silently drops parquet pushdown or partition pruning
passes every value-correctness test while becoming a corpus scan at
100 TB. These assertions are the safety net."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codeindex_spark.corpus import CorpusSpec, spark_documents
from codeindex_spark.index.build import IndexParams
from codeindex_spark.index.segments import IndexBuilder, IndexReader
from codeindex_spark.query import ast
from codeindex_spark.query.planner import SearchEngine

PARAMS = IndexParams(num_buckets=16, block_size=32)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("planidx"))
    docs = spark_documents(spark, CorpusSpec(n_docs=100), partitions=4)
    IndexBuilder(spark, d, PARAMS, n_groups=1).build(docs, resume=False)
    return SearchEngine(IndexReader(spark, d))


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_term_query_pushes_field_and_term_to_scan(engine):
    plan = _plan(engine.score(ast.Term("get", "content")))
    # field is a partition dir: must prune, not filter post-scan
    assert "field#" in plan and "content" in plan
    assert "PartitionFilters" in plan
    # term must reach the parquet reader (row-group min/max pruning)
    assert "PushedFilters" in plan
    assert "term" in plan.split("PushedFilters", 1)[1][:200]


def test_boolean_query_single_posting_scan(engine):
    plan = _plan(engine.score(ast.parse_query("get AND string")))
    # both terms share ONE postings scan (In(term, [...])), not one
    # scan per leaf
    n_posting_scans = plan.count("postings")
    assert n_posting_scans >= 1
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "get" in pushed and "string" in pushed


def test_dictionary_lookup_is_filtered_scan(engine):
    td = engine.reader.term_dict.filter(
        (F.col("field") == "content") & (F.col("term") == "get")
    )
    plan = _plan(td)
    assert "PushedFilters" in plan


def test_metadata_filter_is_catalyst_predicate(engine):
    from codeindex_spark.query.planner import Filters

    allowed = Filters(lang="python").apply(engine.reader.docs)
    plan = _plan(allowed.select("doc_id"))
    # lang filter reaches the docs scan; doc_id+lang is all it reads
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1][:200]
    assert "lang" in pushed
    read = plan.split("ReadSchema", 1)[1][:200]
    assert "content" not in read  # column pruning: no content bytes


def test_suggest_pushes_field_and_length_window(engine):
    plan = _plan(engine.suggest("stirng", k=5))
    # field partition-pruned; length window + levenshtein evaluated
    # on the pruned slice, never a full dictionary pass elsewhere
    assert "PartitionFilters" in plan
    assert "levenshtein" in plan
    # top-k is a TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_facets_single_group_shuffle(engine):
    plan = _plan(engine.facet_counts("get"))
    # ONE aggregate pair over the unpivoted rows: partial+final =
    # exactly 2 HashAggregate operators for the facet count itself
    # (the score side has its own); and no Cartesian anywhere
    assert "CartesianProduct" not in plan
    assert plan.count("Expand") <= 1  # unpivot lowers to one Expand


def test_mixture_exact_shuffles_on_group_only(spark):
    from codeindex_spark.ops.mixing import mixture_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "zh", "t") for i in range(40)],
        "doc_id long, lang string, text string",
    )
    plan = _plan(mixture_sample(docs, {"en": 0.5, "zh": 0.5}))
    # the window rank partitions by the group column
    assert "hashpartitioning(lang" in plan


def test_mixture_approx_is_shuffle_free(spark):
    from codeindex_spark.ops.mixing import mixture_sample

    docs = spark.createDataFrame(
        [(i, "en" if i % 2 else "zh", "t") for i in range(40)],
        "doc_id long, lang string, text string",
    )
    plan = _plan(mixture_sample(docs, {"en": 0.5, "zh": 0.5}, exact=False))
    assert "Exchange" not in plan  # pure map-side filter


def test_assign_shards_is_map_side(spark):
    from codeindex_spark.ops.mixing import assign_shards

    docs = spark.createDataFrame(
        [(i, "t") for i in range(10)], "doc_id long, text string"
    )
    assert "Exchange" not in _plan(assign_shards(docs, 8))


def test_suggest_ngram_index_prunes_dictionary(engine):
    """With the bigram sidecar built, suggest() candidates come from
    the typo's grams (In-filter pushed to the sidecar scan); the
    vocabulary-wide term_dict never appears in the plan."""
    engine.build_suggest_index()
    try:
        plan = _plan(engine.suggest("stirng", k=5))
        assert "suggest_ngrams" in plan
        assert "gram" in plan.split("PushedFilters", 1)[1][:300]
        assert "term_dict" not in plan
        assert "TakeOrderedAndProject" in plan
    finally:
        engine._suggest_idx = None
