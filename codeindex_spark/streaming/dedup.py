"""Streaming exact dedup as a custom stateful operator.

A training-data ingest stream must drop re-crawled/re-uploaded
duplicates ONLINE — batch dedup over an unbounded stream is a
re-shuffle of everything seen so far on every trigger. The
streaming shape is keyed state per content hash:
``applyInPandasWithState`` over ``groupBy(text_hash)`` keeps one
tiny state row (first_doc_id, n_seen) per distinct hash and emits
only the FIRST document carrying each hash; later arrivals bump a
counter and vanish. State is O(distinct hashes) — 16 bytes of md5
key + two longs — and an optional processing-time TTL bounds it
for streams where re-crawls cluster in time.

Within a micro-batch the winner is the min doc_id (deterministic
under input reordering); across micro-batches the state decides —
the first batch to commit a hash owns it.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text_hash", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_doc_id", T.LongType(), True),
        T.StructField("n_seen", T.LongType(), True),
    ]
)


def streaming_exact_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_seconds: float | None = None,
) -> DataFrame:
    """Streaming (doc_id, text) -> first-seen docs only, keyed by
    md5(text). ``state_ttl_seconds`` expires idle hash state after a
    processing-time quiet period (re-admitting a duplicate that
    arrives later than the TTL — the standard bounded-state
    trade-off); None keeps state for the stream's lifetime."""
    ttl_ms = (
        int(state_ttl_seconds * 1000) if state_ttl_seconds is not None else None
    )

    def dedup(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        text_hash = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        first = None
        n_new = 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_new += len(pdf)
            row = pdf.loc[pdf[id_col].idxmin()]
            if first is None or row[id_col] < first[id_col]:
                first = row
        if state.exists:
            first_doc_id, n_seen = state.get
            state.update((first_doc_id, n_seen + n_new))
        elif first is not None:
            state.update((int(first[id_col]), n_new))
            yield pd.DataFrame(
                [
                    {
                        "doc_id": int(first[id_col]),
                        "text_hash": text_hash,
                        "text": first[text_col],
                    }
                ]
            )
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        return
        yield  # pragma: no cover — make this a generator on all paths

    # md5(NULL) is NULL — all null-text rows would collapse into one
    # "duplicate" group and the emitted row would violate the
    # non-nullable text_hash field. Hash nulls as empty text instead
    # (they dedup against genuinely empty docs, deterministically).
    hashed = docs.select(
        F.col(id_col).alias(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("text_hash"),
        F.col(text_col).alias(text_col),
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        dedup,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


# --------------------------------------------- dedup registry stream
#
# streaming_exact_dedup above answers "is this doc new?" at arrival
# time — the answer necessarily depends on arrival order (the first
# batch to commit a hash owns it), so its output is pinned by pytest,
# not by a SQL oracle. The REGISTRY stream answers the order-free
# question a curation pipeline asks at the END of ingest: for every
# distinct content hash, which doc is the canonical keeper and how
# many copies arrived? State per hash is (min doc_id so far, count),
# both order-insensitive merges, so the final snapshot is BIT-equal
# to running the batch exact_duplicates op over the same rows — that
# equality is the driver oracle (st_dedup_registry reuses dd_exact's
# SQL verbatim).
#
# Scale shape: hashes are sharded over n_buckets state keys (every
# copy of a hash lands in one bucket), so state parallelizes across
# executors and is O(distinct hashes) * ~24 bytes per shard — the
# irreducible cost of EXACT streaming dedup. Each trigger emits only
# the hashes TOUCHED by that micro-batch (delta rows tagged with a
# monotone seq), so sink volume tracks input volume, not state size;
# consumers keep the max-seq row per hash.

REGISTRY_OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("text_hash", T.StringType(), False),
        T.StructField("keep_doc_id", T.LongType(), False),
        T.StructField("n_docs", T.LongType(), False),
    ]
)

_REGISTRY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hashes", T.ArrayType(T.StringType()), True),
        T.StructField("keep_ids", T.ArrayType(T.LongType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def streaming_dedup_registry(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
) -> DataFrame:
    """Stateful (text_hash -> min doc_id, count) registry over a
    streaming (doc_id, text) DataFrame, hash-bucketed into
    ``n_buckets`` state groups. Emits per trigger only the hashes the
    micro-batch touched, with their updated totals and a monotone
    ``seq``; the max-seq row per hash is the final registry."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")

    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        bucket = int(key[0])
        if state.hasTimedOut:  # pragma: no cover — no timeout configured
            state.remove()
            return
        if state.exists:
            hs, ids, cnts, seq = state.get
            keep = pd.Series(ids, index=list(hs), dtype="int64")
            n = pd.Series(cnts, index=list(hs), dtype="int64")
        else:
            keep = pd.Series(dtype="int64")
            n = pd.Series(dtype="int64")
            seq = 0
        batches = [pdf for pdf in pdfs if len(pdf)]
        touched = pd.Index([], dtype=object)
        if batches:
            batch = pd.concat(batches, ignore_index=True)
            g = batch.groupby("text_hash")[id_col].agg(["min", "size"])
            touched = g.index
            all_idx = keep.index.union(g.index)
            # min/count merges are order-insensitive — the final
            # registry cannot depend on micro-batch arrival order
            keep = pd.Series(
                np.fmin(
                    keep.reindex(all_idx).to_numpy(dtype="float64"),
                    g["min"].reindex(all_idx).to_numpy(dtype="float64"),
                ),
                index=all_idx,
            ).astype("int64")
            n = (
                n.reindex(all_idx, fill_value=0)
                + g["size"].reindex(all_idx, fill_value=0)
            ).astype("int64")
        seq += 1
        state.update(
            (
                keep.index.to_list(),
                keep.to_list(),
                n.to_list(),
                int(seq),
            )
        )
        yield pd.DataFrame(
            {
                "bucket": bucket,
                "seq": int(seq),
                "text_hash": touched.to_list(),
                "keep_doc_id": keep.reindex(touched).to_list(),
                "n_docs": n.reindex(touched).to_list(),
            }
        )

    hashed = docs.select(
        F.col(id_col).alias(id_col),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("text_hash"),
    ).withColumn(
        "bucket",
        F.pmod(F.xxhash64("text_hash"), F.lit(n_buckets)).cast("int"),
    )
    return hashed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=REGISTRY_OUT_SCHEMA,
        stateStructType=_REGISTRY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_registry(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 8,
    query_name: str = "dedup_registry",
) -> DataFrame:
    """File-source stream of (doc_id, text) JSON -> bucketed stateful
    dedup registry -> append memory sink (availableNow, one file per
    trigger so cross-micro-batch merges are exercised). Returns the
    final registry: (text_hash, n_docs, keep_doc_id), bit-equal to
    batch ops.dedup.exact_duplicates over the same rows whatever
    order the files were processed in."""
    from pyspark.sql import Window

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(docs_dir)
    )
    out = streaming_dedup_registry(stream, n_buckets=n_buckets)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    hist = spark.table(query_name)
    # max-seq row per hash via a window (a hash lives in exactly one
    # bucket, so seq is monotone per hash); avoids the memory-table
    # self-join conflict the KMV stream works around with a collect
    rn = F.row_number().over(
        Window.partitionBy("text_hash").orderBy(F.col("seq").desc())
    )
    return (
        hist.withColumn("_rn", rn)
        .filter(F.col("_rn") == 1)
        .select("text_hash", "n_docs", "keep_doc_id")
    )


def stream_deduped_docs(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    query_name: str = "deduped_docs",
):
    """File-source stream of (doc_id, text) JSON -> stateful exact
    dedup -> append memory sink (availableNow drain; one file per
    trigger so cross-micro-batch state is actually exercised)."""
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(docs_dir)
    )
    out = streaming_exact_dedup(stream)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
