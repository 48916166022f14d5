"""Source resolution: parquet paths, catalog tables, Iceberg options."""

from __future__ import annotations

import pytest

from codeindex_spark.corpus import CorpusSpec, spark_documents
from codeindex_spark.sources import (
    REQUIRED_COLUMNS,
    load_documents,
    snapshot_changes,
    validate_corpus,
)


def test_parquet_path(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark_documents(spark, CorpusSpec(n_docs=50, n_repos=4)).write.parquet(p)
    df = load_documents(spark, p)
    assert set(REQUIRED_COLUMNS) <= set(df.columns)
    assert df.count() == 50


def test_catalog_table_identifier(spark, tmp_path):
    spark_documents(spark, CorpusSpec(n_docs=30, n_repos=4)).createOrReplaceTempView(
        "corpus_view"
    )
    df = load_documents(spark, "corpus_view")  # no '/', reads via catalog
    assert df.count() == 30


def test_validate_rejects_missing_columns(spark):
    bad = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="missing required columns"):
        validate_corpus(bad)


def test_iceberg_options_fail_clearly_without_runtime(spark, tmp_path):
    # no iceberg-spark-runtime jar in this container: the snapshot
    # paths must raise the informative RuntimeError, not a raw
    # classpath stack trace
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        load_documents(spark, "db.tbl", fmt="iceberg", snapshot_id=123)
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        snapshot_changes(spark, "db.tbl", start_snapshot_id=1)
