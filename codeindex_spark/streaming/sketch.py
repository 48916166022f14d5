"""Streaming heavy-hitter candidate generation (stateful Misra-Gries).

An ingest stream cannot re-shuffle everything seen so far on every
trigger to find frequent n-grams. The streaming shape: hash every
gram to one of ``n_buckets`` buckets (ALL occurrences of a gram land
in the same bucket), and keep a Misra-Gries summary with ``k``
counters as keyed state per bucket via ``applyInPandasWithState``.

Guarantees (same batch-decrement analysis as ops/sketch.py):
- est(g) <= true_count(g) always (only decrements);
- true_count(g) - est(g) <= n_bucket/(k+1): each decrement event
  subtracts the (k+1)-th largest value m from >= k+1 counters that
  all hold >= m, so cumulative decrement <= n_bucket/(k+1);
- hence every gram with GLOBAL count > n_bucket/(k+1) (a fortiori
  > N/(k+1)) is in its bucket's candidate set — the union across
  buckets is a SUPERSET of the true heavy hitters at any threshold
  above N/(k+1). State: n_buckets * k counters, bounded for the
  stream's lifetime.

Exact recovery stays a batch concern: re-count the streamed
candidate set over the stored corpus (ops.sketch pass 2) whenever an
exact answer is needed — the stream keeps the candidate set current
so that recount never scans for unknown keys.

Each trigger emits the bucket's current snapshot tagged with a
monotonically increasing ``seq``; downstream consumers keep the
max-seq row set per bucket (append sinks accumulate history).
"""

from __future__ import annotations

import math
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from codeindex_spark.ops.sketch import MAX_COUNTERS, gram_stream

__all__ = ["streaming_heavy_hitter_candidates", "stream_heavy_hitters"]

HH_OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("gram", T.StringType(), False),
        T.StructField("est", T.LongType(), False),
        T.StructField("n_bucket", T.LongType(), False),
    ]
)

_HH_STATE_SCHEMA = T.StructType(
    [
        T.StructField("grams", T.ArrayType(T.StringType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
        T.StructField("n_seen", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def streaming_heavy_hitter_candidates(
    grams: DataFrame, k: int, n_buckets: int = 32
) -> DataFrame:
    """Stateful MG over a (streaming) one-column ``gram`` DataFrame.
    Emits each bucket's candidate snapshot per trigger."""
    if k < 1 or k > MAX_COUNTERS:
        raise ValueError(f"k must be in [1, {MAX_COUNTERS}]")

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
            g0, c0, n_seen, seq = state.get
            cnt = pd.Series(
                np.asarray(c0, dtype="int64"), index=list(g0), dtype="int64"
            )
        else:
            cnt, n_seen, seq = pd.Series(dtype="int64"), 0, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n_seen += len(pdf)
            vc = pdf["gram"].value_counts()
            cnt = vc if cnt.empty else cnt.add(vc, fill_value=0)
            if len(cnt) > k:
                vals = cnt.to_numpy()
                m = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
                cnt = cnt[vals > m] - m
        seq += 1
        cnt = cnt.astype("int64")
        state.update(
            (cnt.index.to_list(), cnt.to_list(), int(n_seen), int(seq))
        )
        yield pd.DataFrame(
            {
                "bucket": bucket,
                "seq": int(seq),
                "gram": cnt.index.to_list(),
                "est": cnt.to_list(),
                "n_bucket": int(n_seen),
            }
        )

    bucketed = grams.withColumn(
        "bucket", F.pmod(F.xxhash64("gram"), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=HH_OUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


DOC_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)


def stream_heavy_hitters(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    phi: float,
    n: int = 1,
    n_buckets: int = 32,
    query_name: str = "hh_candidates",
) -> DataFrame:
    """File-source stream of (doc_id, text) JSON -> gram stream ->
    bucketed stateful MG -> append memory sink (availableNow drain;
    one file per trigger so cross-micro-batch state is exercised).
    Returns the FINAL snapshot: per bucket, only the max-seq rows."""
    if not (0.0 < phi <= 1.0):
        raise ValueError("phi must be in (0, 1]")
    k = math.ceil(1.0 / phi) + 1
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(docs_dir)
    )
    out = streaming_heavy_hitter_candidates(
        gram_stream(stream, n=n), k=k, n_buckets=n_buckets
    )
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
    # materialize the per-bucket max seq (<= n_buckets rows): joining
    # the memory table against an aggregate of ITSELF trips Spark's
    # conflicting-attribute check on the MemoryPlan leaf
    finals = spark.createDataFrame(
        hist.groupBy("bucket").agg(F.max("seq").alias("seq")).collect(),
        schema="bucket int, seq long",
    )
    return hist.join(F.broadcast(finals), ["bucket", "seq"])


# ------------------------------------------------------ streaming KMV

KMV_OUT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("h", T.StringType(), False),
    ]
)

_KMV_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hs", T.ArrayType(T.StringType()), True),
        T.StructField("seq", T.LongType(), True),
    ]
)


def streaming_kmv_state(
    hashes: DataFrame, k: int, n_buckets: int = 8
) -> DataFrame:
    """Stateful bottom-k over a (streaming) one-column ``_h``
    DataFrame of 13-hex-char hashes (ops/sketch.py kmv_distinct's
    hash shape). Hash-bucketed like the MG stream: all copies of a
    hash land in one bucket, each bucket keeps ITS k smallest
    distinct hashes as keyed state (bounded for the stream's
    lifetime at n_buckets * k strings).

    KMV composes exactly: the global bottom-k is contained in the
    union of per-bucket bottom-k's (each globally-smallest hash is
    among the smallest of its own bucket), so a batch-side merge —
    bottom-k of the union — reproduces the single-pass sketch
    BIT-EXACTLY. Each trigger emits the bucket's current snapshot
    tagged with a monotone ``seq``; consumers keep max-seq rows."""
    if k < 2:
        raise ValueError("k must be >= 2")

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
            hs0, seq = state.get
            cur = np.asarray(hs0, dtype=object)
        else:
            cur, seq = np.empty(0, dtype=object), 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            merged = np.unique(
                np.concatenate([cur, pdf["_h"].to_numpy(dtype=object)])
            )
            cur = merged[:k]
        seq += 1
        state.update((cur.tolist(), int(seq)))
        yield pd.DataFrame(
            {"bucket": bucket, "seq": int(seq), "h": cur.tolist()}
        )

    bucketed = hashes.withColumn(
        "bucket", F.pmod(F.xxhash64("_h"), F.lit(n_buckets)).cast("int")
    )
    return bucketed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_kmv_distinct(
    spark: SparkSession,
    docs_dir: str,
    checkpoint_dir: str,
    col: str = "text",
    k: int = 256,
    n_buckets: int = 8,
    query_name: str = "kmv_stream",
) -> DataFrame:
    """File-source stream of (doc_id, text) JSON -> md5 hashes ->
    bucketed stateful bottom-k -> append memory sink (availableNow,
    one file per trigger). Returns a ONE-ROW (n_min, est_distinct)
    DataFrame computed from the final snapshots with the same
    estimator as ops/sketch.py kmv_distinct — bit-identical to
    running the batch op over the same rows, which is the test."""
    from codeindex_spark.ops.sketch import _KMV_HEX, _KMV_SCALE

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(docs_dir)
    )
    hashes = stream.filter(F.col(col).isNotNull()).select(
        F.substring(F.md5(F.col(col).cast("string")), 1, _KMV_HEX).alias(
            "_h"
        )
    )
    out = streaming_kmv_state(hashes, k=k, n_buckets=n_buckets)
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
    finals = spark.createDataFrame(
        hist.groupBy("bucket").agg(F.max("seq").alias("seq")).collect(),
        schema="bucket int, seq long",
    )
    kept = hist.join(F.broadcast(finals), ["bucket", "seq"])
    hs = F.slice(F.array_sort(F.collect_set("h")), 1, k)
    agg = kept.agg(hs.alias("_hs"))
    n = F.size("_hs")
    kth = F.conv(F.element_at("_hs", k), 16, 10).cast("double") / F.lit(
        _KMV_SCALE
    )
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / kth
    )
    return agg.select(
        n.cast("long").alias("n_min"), est.alias("est_distinct")
    )
