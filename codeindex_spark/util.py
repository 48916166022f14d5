"""Shared plan-shape helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, factor: int = 2) -> DataFrame:
    """Guarantee enough input splits for Python-kernel / explode-heavy
    stages.

    Small-corpus scans collapse into one or two tasks under the
    128 MB maxPartitionBytes packing, serializing the Arrow kernels
    and wide JVM expressions behind them; a round-robin repartition
    (cheap relative to those stages) restores parallelism. At cluster
    scale the natural split count already exceeds the target and this
    is a no-op.
    """
    if df.isStreaming:
        # .rdd raises on streaming plans; micro-batch parallelism is
        # the source's concern (maxFilesPerTrigger etc.), not ours
        return df
    target = df.sparkSession.sparkContext.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
