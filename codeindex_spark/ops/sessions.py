"""Gap-based sessionization over event tables — the batch analog of
the streaming debounce/window operators (streaming/windows.py handles
the live micro-batch side; this answers the same question over the
full history).

A session is a maximal run of one user's events where consecutive
inter-event gaps stay within ``gap_seconds`` — the classic web/
product-analytics definition (and Spark's own
``session_window`` semantics, re-expressed with lag + running sum so
the session INDEX is stable and the oracle can replay it in ANSI
SQL).

Scale shape: one window partitioned by user ordered by (ts, id) —
partition size bounded by events-per-user (the hottest user is the
skew bound, not the corpus); stats are a map-side-combinable groupBy
on (user, session_idx). Timestamps compare in integer microseconds
(``unix_micros``) so two engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SparkWindow

__all__ = ["sessionize", "session_stats"]


def _micros(events: DataFrame, ts_col: str):
    """Integer epoch microseconds. Parquet event times arrive as
    TIMESTAMP_NTZ (no zone), which unix_micros rejects — cast to
    TIMESTAMP first. The session zone is pinned to UTC
    (session.py), so the cast is numerically the identity and
    matches DuckDB's epoch_us over the same naive values."""
    col = F.col(ts_col)
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        col = col.cast("timestamp")
    return F.unix_micros(col)


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Events + ``session_idx`` (1-based per user): a new session
    starts at the user's first event and whenever the gap since their
    previous event exceeds ``gap_seconds``. Ties on the timestamp
    break by ``id_col`` so the ordering — and therefore the session
    assignment — is deterministic."""
    if gap_seconds <= 0:
        raise ValueError("gap_seconds must be positive")
    w = SparkWindow.partitionBy(user_col).orderBy(ts_col, id_col)
    us = _micros(events, ts_col)
    prev = F.lag(us).over(w)
    gap_us = int(gap_seconds * 1_000_000)
    new_s = F.when(
        prev.isNull() | ((us - prev) > gap_us), 1
    ).otherwise(0)
    wcum = w.rowsBetween(SparkWindow.unboundedPreceding, 0)
    return events.withColumn("_new", new_s).withColumn(
        "session_idx", F.sum("_new").over(wcum)
    ).drop("_new")


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: float = 1800.0,
    value_col: str | None = "value",
    type_col: str | None = "event_type",
) -> DataFrame:
    """Per-session rollup: (user, session_idx, n_events, start_us,
    end_us, duration_secs[, n_types][, sum_value]). Micros are
    integers on both engines; the value sum rounds to 4 dp (the
    rel_* oracle convention for double aggregation)."""
    s = sessionize(events, user_col, ts_col, id_col, gap_seconds)
    us = _micros(events, ts_col)
    aggs = [
        F.count("*").alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
    ]
    if type_col:
        aggs.append(F.countDistinct(type_col).alias("n_types"))
    if value_col:
        aggs.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    out = s.groupBy(
        F.col(user_col), F.col("session_idx")
    ).agg(*aggs)
    return out.withColumn(
        "duration_secs",
        F.round(
            (F.col("end_us") - F.col("start_us")).cast("double")
            / 1_000_000.0,
            6,
        ),
    )
