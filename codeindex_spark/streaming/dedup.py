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
