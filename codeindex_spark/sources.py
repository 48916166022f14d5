"""Input-source resolution — the "Iceberg table of source-code
repositories" boundary (BASELINE.json input_hint / north_rule).

The engine consumes any DataFrame with columns
(repo, path, commit, lang, content); this module maps a user-facing
source spec onto that DataFrame:

- a filesystem/objstore path        -> parquet scan
- a catalog table identifier        -> spark.read.table (Iceberg,
  Delta, Hive — whatever the session catalog serves; Iceberg gives
  partition pruning on repo/lang plus snapshot isolation for free)
- an Iceberg snapshot pin / diff    -> read options understood by the
  iceberg-spark-runtime DataSource

No Iceberg jar ships with this repo (and none exists in the test
container); everything here degrades to a clear error message rather
than a classpath stack trace. The reference's equivalent surface is
the filesystem walk (CodeIndex.Files/FilesFetcher.cs:11-27) — at
10^12-file scale the "directory" is a table, and incremental
maintenance consumes snapshot diffs instead of FS events
(SURVEY.md §2.9 ST1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

REQUIRED_COLUMNS = ("repo", "path", "commit", "lang", "content")


def _looks_like_path(source: str) -> bool:
    return (
        "/" in source
        or source.endswith(".parquet")
        or "://" in source
    )


def validate_corpus(df: DataFrame) -> DataFrame:
    missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(
            f"corpus is missing required columns {missing}; expected "
            f"at least {REQUIRED_COLUMNS} (BASELINE.json input_hint)"
        )
    return df


def load_documents(
    spark: SparkSession,
    source: str,
    fmt: str | None = None,
    snapshot_id: int | None = None,
    as_of_timestamp: int | None = None,
) -> DataFrame:
    """Resolve a source spec to the documents DataFrame.

    fmt: None (infer), "parquet", or "table" / "iceberg" (both read
    through the session catalog). snapshot_id / as_of_timestamp pin
    an Iceberg snapshot (time travel) and require the Iceberg
    runtime on the cluster classpath.
    """
    if fmt is None:
        fmt = "parquet" if _looks_like_path(source) else "table"
    if fmt == "parquet":
        return validate_corpus(spark.read.parquet(source))
    if fmt in ("table", "iceberg"):
        if snapshot_id is not None or as_of_timestamp is not None:
            reader = spark.read.format("iceberg")
            if snapshot_id is not None:
                reader = reader.option("snapshot-id", str(snapshot_id))
            if as_of_timestamp is not None:
                reader = reader.option(
                    "as-of-timestamp", str(as_of_timestamp)
                )
            try:
                return validate_corpus(reader.load(source))
            except Exception as e:  # noqa: BLE001 — classpath-dependent
                raise RuntimeError(
                    "snapshot-pinned reads need the iceberg-spark-runtime "
                    "jar on the cluster classpath (--packages "
                    "org.apache.iceberg:iceberg-spark-runtime-...)"
                ) from e
        return validate_corpus(spark.read.table(source))
    raise ValueError(f"unknown source format {fmt!r}")


def snapshot_changes(
    spark: SparkSession,
    table: str,
    start_snapshot_id: int,
    end_snapshot_id: int | None = None,
) -> DataFrame:
    """Incremental corpus delta between two Iceberg snapshots — the
    10^12-scale replacement for FS change events (the reference's
    FilesWatcherHelper): rows appended after start_snapshot_id feed
    IncrementalIndex.apply_changes as Created/Changed upserts.

    Uses the Iceberg incremental-read options; requires the Iceberg
    runtime jar (clear error without it)."""
    reader = (
        spark.read.format("iceberg")
        .option("start-snapshot-id", str(start_snapshot_id))
    )
    if end_snapshot_id is not None:
        reader = reader.option("end-snapshot-id", str(end_snapshot_id))
    try:
        return reader.load(table)
    except Exception as e:  # noqa: BLE001 — classpath-dependent
        raise RuntimeError(
            "incremental snapshot reads need the iceberg-spark-runtime "
            "jar on the cluster classpath"
        ) from e
