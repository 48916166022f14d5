"""Per-path debounce as a custom stateful streaming operator.

The reference's watcher holds FS events in a pending queue and only
processes a path once it has been quiet for the fetch interval
(/root/reference/src/CodeIndex.MaintainIndex/IndexMaintainer.cs:84-134
— events younger than the quiet period are skipped and retried).
Structured Streaming expresses that timer as ``applyInPandasWithState``
with an event-time timeout: the state keeps the LATEST event per path,
every new event pushes the timeout forward to ``ts + gap``, and the
stored event is emitted only when the stream watermark passes that
deadline — i.e. after ``gap`` of event-time silence on the path.

This is the canonical custom-stateful-operator shape (brief:
``applyInPandasWithState`` for operators Spark lacks): state size is
one tiny row per active path, emission is append-mode, and the
watermark bounds state lifetime.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from codeindex_spark.streaming.maintain import EVENT_SCHEMA

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("old_path", T.StringType(), True),
        T.StructField("change_type", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ]
)


def debounced_latest_events(
    events: DataFrame,
    gap_seconds: float = 5.0,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming (path, old_path, change_type, ts) -> the latest event
    per path, emitted once the path has been quiet for ``gap_seconds``
    of event time. Late data beyond ``watermark`` is dropped by the
    engine before it reaches the state kernel."""
    gap_ms = int(gap_seconds * 1000)

    def debounce(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        path = key[0]
        if state.hasTimedOut:
            old_path, change_type, ts_ms = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "path": path,
                        "old_path": old_path,
                        "change_type": change_type,
                        "ts": pd.Timestamp(ts_ms, unit="ms"),
                    }
                ]
            )
            return
        latest: dict[str, Any] | None = None
        if state.exists:
            old_path, change_type, ts_ms = state.get
            latest = {
                "old_path": old_path,
                "change_type": change_type,
                "ts_ms": ts_ms,
            }
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            row = pdf.sort_values("ts").iloc[-1]
            ts_ms = int(pd.Timestamp(row["ts"]).value // 10**6)
            if latest is None or ts_ms > latest["ts_ms"]:
                latest = {
                    "old_path": (
                        row["old_path"] if pd.notna(row["old_path"]) else None
                    ),
                    "change_type": row["change_type"],
                    "ts_ms": ts_ms,
                }
        if latest is not None:
            state.update(
                (latest["old_path"], latest["change_type"], latest["ts_ms"])
            )
            state.setTimeoutTimestamp(latest["ts_ms"] + gap_ms)
        return
        yield  # pragma: no cover — make this a generator on all paths

    src = events.withWatermark("ts", watermark)
    return src.groupBy("path").applyInPandasWithState(
        debounce,
        outputStructType=EVENT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_debounced_events(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    gap_seconds: float = 5.0,
    query_name: str = "debounced_events",
):
    """File-source stream of change events -> per-path debounce ->
    append memory sink (availableNow drain, the testable stand-in for
    a continuous watcher stream)."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )
    out = debounced_latest_events(stream, gap_seconds)
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
