"""Time-series as-of join — point-in-time enrichment over event
tables (pandas ``merge_asof`` / kdb ``aj`` / DuckDB ``ASOF JOIN``
semantics, re-expressed as one shuffle + one window pass).

For each left row, find the single right row with the same key whose
timestamp is the nearest at-or-before (``backward``) or at-or-after
(``forward``) the left timestamp, optionally within a tolerance.
Classic uses in a training-data pipeline: stamping each document with
the crawl-state/robots snapshot in force when it was fetched, joining
labels to the feature snapshot that was live at label time, or
trades-to-quotes style telemetry enrichment.

Scale shape — this is the part a naive range join gets wrong: a
``l.key = r.key AND r.ts <= l.ts`` join explodes to O(|l|·|r|) per
key before the per-row max is taken. Instead both sides are unioned
and scanned once under a window partitioned by the key and ordered by
(ts, side, id): a single exchange of |l|+|r| rows, never a pairwise
product, and the per-key partition (the skew bound) is the hottest
key's own row count. ``last(payload, ignorenulls=True)`` carries the
most recent right payload forward onto each left row — the same
sorted-merge plan a purpose-built kdb/QuestDB as-of operator runs,
declared with stock Spark operators so AQE still handles skewed keys.

Determinism: timestamps compare in integer microseconds
(``unix_micros``); ties on the timestamp break by the id column
(right rows at the same usable timestamp: the SMALLEST id wins, in
both directions), so results are stable under any partitioning and
replayable in ANSI SQL (the oracle uses an independent
LATERAL-top-1 formulation, not this union trick).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SparkWindow

__all__ = ["asof_join"]


def _micros(df: DataFrame, ts_col: str):
    """Integer epoch microseconds; TIMESTAMP_NTZ needs the cast (the
    session zone is pinned to UTC so it is numerically the identity —
    see ops/sessions.py)."""
    col = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        col = col.cast("timestamp")
    return F.unix_micros(col)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_id: str = "event_id",
    right_id: str = "event_id",
    right_cols: Sequence[str] = (),
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left rows + the matched right row's (ts, id, right_cols),
    suffixed; unmatched rows keep NULLs in the suffixed columns.

    ``direction='backward'``: nearest right ts <= left ts.
    ``direction='forward'``:  nearest right ts >= left ts.
    ``tolerance_seconds``: discard matches farther than this.

    Adds ``{left_ts}_us`` (left timestamp in integer micros) and, for
    matched rows, ``{right_ts}{suffix}_us`` and ``asof_lag_us``
    (non-negative distance in micros).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    on = list(on)
    if not on:
        raise ValueError("need at least one equality key")
    right_cols = [c for c in right_cols if c not in (right_ts, right_id)]

    lts = f"{left_ts}_us"
    payload = F.struct(
        _micros(right, right_ts).alias("_ts_us"),
        F.col(right_id).cast("long").alias("_id"),
        *[F.col(c) for c in right_cols],
    )
    rt = right.select(
        *[F.col(c) for c in on],
        _micros(right, right_ts).alias(lts),
        F.col(right_id).cast("long").alias("_ord_id"),
        F.lit(0).alias("_side"),
        payload.alias("_r"),
    )
    keep = [c for c in left.columns]
    lt = left.select(
        *keep,
        _micros(left, left_ts).alias(lts),
        F.col(left_id).cast("long").alias("_ord_id"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rt.schema["_r"].dataType).alias("_r"),
    )
    extra = [c for c in keep if c not in on]
    rt = rt.select(
        *on,
        lts,
        "_ord_id",
        "_side",
        "_r",
        *[F.lit(None).cast(dict(lt.dtypes)[c]).alias(c) for c in extra],
    )
    u = lt.select(*on, lts, "_ord_id", "_side", "_r", *extra).unionByName(rt)

    # Scan order: time toward the left row, right rows (side 0) first
    # at equal usable timestamps, smallest right id the LAST right row
    # seen among exact-timestamp ties so last() picks it.
    if direction == "backward":
        order = [F.col(lts).asc(), F.col("_side").asc(), F.col("_ord_id").desc()]
    else:
        order = [F.col(lts).desc(), F.col("_side").asc(), F.col("_ord_id").desc()]
    w = (
        SparkWindow.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(SparkWindow.unboundedPreceding, SparkWindow.currentRow)
    )
    matched = u.withColumn("_m", F.last("_r", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )

    if direction == "backward":
        lag = F.col(lts) - F.col("_m._ts_us")
    else:
        lag = F.col("_m._ts_us") - F.col(lts)
    cond = F.col("_m").isNotNull()
    if tolerance_seconds is not None:
        if tolerance_seconds < 0:
            raise ValueError("tolerance_seconds must be non-negative")
        cond = cond & (lag <= int(tolerance_seconds * 1_000_000))
    m = F.when(cond, F.col("_m"))

    out = matched.select(
        *keep,
        F.col(lts),
        m["_ts_us"].alias(f"{right_ts}{suffix}_us"),
        m["_id"].alias(f"{right_id}{suffix}"),
        *[m[c].alias(f"{c}{suffix}") for c in right_cols],
        F.when(cond, lag).alias("asof_lag_us"),
    )
    return out
