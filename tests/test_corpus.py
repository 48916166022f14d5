"""Corpus generator determinism + the sha256 ingest invariant
(BASELINE.json input_hint: per-row content sha256 equality vs the
synthesized source)."""

from __future__ import annotations

import pandas as pd

from codeindex_spark.corpus import (
    CorpusSpec,
    content_sha256,
    generate_documents,
    generate_documents_range,
)


def test_schema_shape():
    df = generate_documents(CorpusSpec(n_docs=50))
    assert list(df.columns) == ["repo", "path", "commit", "lang", "content"]
    assert len(df) == 50
    assert df["repo"].str.match(r"repo\d{3}").all()
    assert df["path"].str.match(r"src/\w+/\w+\.\w+").all()
    assert df["commit"].str.match(r"c[0-9a-f]{12}").all()


def test_determinism_and_range_equivalence():
    spec = CorpusSpec(n_docs=100)
    full = generate_documents(spec)
    again = generate_documents(spec)
    pd.testing.assert_frame_equal(full, again)
    # disjoint ranges concatenate to the same frame (distributed gen
    # at any parallelism produces identical bytes)
    parts = pd.concat(
        [
            generate_documents_range(spec, 0, 30),
            generate_documents_range(spec, 30, 77),
            generate_documents_range(spec, 77, 100),
        ],
        ignore_index=True,
    )
    pd.testing.assert_frame_equal(full, parts)


def test_duplicate_cluster():
    spec = CorpusSpec(n_docs=100, dup_every=23)
    df = generate_documents(spec)
    c0 = df.loc[0, "content"]
    for i in (23, 46, 69, 92):
        assert df.loc[i, "content"] == c0
    # non-multiples are not in the cluster
    assert df.loc[1, "content"] != c0


def test_keys_unique():
    df = generate_documents(CorpusSpec(n_docs=200))
    assert not df.duplicated(subset=["repo", "path", "commit"]).any()


def test_sha256_ingest_invariant_spark(spark):
    """F.sha2(content, 256) on the Spark-generated frame equals the
    pure-Python sha256 of the same synthesized rows."""
    from pyspark.sql import functions as F

    from codeindex_spark.corpus import spark_documents

    spec = CorpusSpec(n_docs=64)
    sdf = spark_documents(spark, spec, partitions=4)
    got = {
        (r["repo"], r["path"]): r["sha"]
        for r in sdf.withColumn("sha", F.sha2(F.col("content"), 256))
        .select("repo", "path", "sha")
        .collect()
    }
    ref = generate_documents(spec)
    assert len(got) == len(ref)
    for _, row in ref.iterrows():
        assert got[(row["repo"], row["path"])] == content_sha256(row["content"])
