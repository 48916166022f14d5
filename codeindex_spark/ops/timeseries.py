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

__all__ = ["asof_join", "interval_join"]


def _micros(df: DataFrame, ts_col: str):
    """Integer epoch microseconds; TIMESTAMP_NTZ needs the cast (the
    session zone is pinned to UTC so it is numerically the identity —
    see ops/sessions.py). Integer columns pass through as already-
    micros (lets callers hand in derived interval endpoints)."""
    dt = dict(df.dtypes).get(ts_col)
    col = F.col(ts_col)
    if dt in ("bigint", "int", "smallint", "tinyint"):
        return col.cast("long")
    if dt == "timestamp_ntz":
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


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    bucket_seconds: float = 3600.0,
    long_row_buckets: int = 256,
    suffix: str = "_r",
) -> DataFrame:
    """Inner join on the equality keys plus CLOSED-interval overlap
    (``l.start <= r.end AND r.start <= l.end``); timestamps compare
    in integer microseconds. Output: every left column, every right
    column (key/colliding names suffixed), plus ``overlap_us``.

    Scale shape — the naive spelling is a key-equality join with an
    inequality residual, which Spark executes as a per-key CARTESIAN
    product filtered afterwards: O(|l_k|·|r_k|) per key, the classic
    range-join blowup. Instead both sides are exploded onto a fixed
    time grid (every ``bucket_seconds``-wide bucket the interval
    touches) and joined on (keys, bucket) — a plain equi-shuffle, so
    only temporally-near rows ever meet, and AQE can split residual
    hot (key, bucket) cells. A pair overlapping several shared
    buckets would match in each; it is emitted EXACTLY once, with no
    dedup shuffle, by keeping only the canonical bucket — the one
    containing max(l.start, r.start), i.e. where the overlap begins
    (the same emit-once trick as spatial grid joins).

    Pathological LONG intervals (> ``long_row_buckets`` grid cells —
    a row spanning years on an hourly grid) would explode the grid,
    so they are split off and joined on the keys alone (inequality
    residual): correct for any length, and cheap exactly because such
    rows are rare by construction — the per-key product is (#long
    rows on one side) × (that key's rows on the other). long×short
    and long×long pairs route through the residual joins; short×short
    stays on the grid; no pair is produced twice.

    Pick ``bucket_seconds`` near the typical interval length: the
    explode factor is ceil(len/bucket)+1 per row, the per-bucket
    fan-in is the number of concurrent intervals. Rows with
    start > end are dropped (an inverted interval overlaps nothing
    under closed semantics).
    """
    on = list(on)
    if not on:
        raise ValueError("need at least one equality key")
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")
    if long_row_buckets < 1:
        raise ValueError("long_row_buckets must be >= 1")
    w_us = int(bucket_seconds * 1_000_000)

    lt = (
        left.withColumn("_ls", _micros(left, left_start))
        .withColumn("_le", _micros(left, left_end))
        .filter(F.col("_ls") <= F.col("_le"))
        .withColumn("_b0", F.floor(F.col("_ls") / w_us))
        .withColumn("_b1", F.floor(F.col("_le") / w_us))
    )
    rkeep = [c for c in right.columns]
    taken = set(left.columns) | {"overlap_us"}
    rmap = {
        c: (c if (c not in taken and c not in on) else f"{c}{suffix}")
        for c in rkeep
    }
    rt = (
        right.withColumn("_rs", _micros(right, right_start))
        .withColumn("_re", _micros(right, right_end))
        .filter(F.col("_rs") <= F.col("_re"))
        .withColumn("_b0", F.floor(F.col("_rs") / w_us))
        .withColumn("_b1", F.floor(F.col("_re") / w_us))
        .select(
            *[F.col(k).alias(f"_k{i}") for i, k in enumerate(on)],
            "_rs",
            "_re",
            "_b0",
            "_b1",
            *[F.col(c).alias(rmap[c]) for c in rkeep if c not in on],
        )
    )
    is_long = F.col("_b1") - F.col("_b0") >= long_row_buckets
    l_short, l_long = lt.filter(~is_long), lt.filter(is_long)
    r_short, r_long = rt.filter(~is_long), rt.filter(is_long)

    keycond = F.lit(True)
    for i, k in enumerate(on):
        keycond = keycond & F.col(k).eqNullSafe(F.col(f"_k{i}"))
    overlap = (F.col("_ls") <= F.col("_re")) & (
        F.col("_rs") <= F.col("_le")
    )

    def _emit(j: DataFrame) -> DataFrame:
        return j.select(
            *left.columns,
            *[rmap[c] for c in rkeep if c not in on],
            (
                F.least(F.col("_le"), F.col("_re"))
                - F.greatest(F.col("_ls"), F.col("_rs"))
            ).alias("overlap_us"),
        )

    # short x short: grid equi-join, canonical-bucket emit-once
    ge = l_short.withColumn(
        "_bkt", F.explode(F.sequence(F.col("_b0"), F.col("_b1")))
    ).drop("_b0", "_b1")
    gr = r_short.withColumn(
        "_bktr", F.explode(F.sequence(F.col("_b0"), F.col("_b1")))
    ).drop("_b0", "_b1")
    grid = _emit(
        ge.join(gr, keycond & (F.col("_bkt") == F.col("_bktr")))
        .filter(overlap)
        .filter(
            F.floor(F.greatest(F.col("_ls"), F.col("_rs")) / w_us)
            == F.col("_bkt")
        )
    )
    # rare long rows: key-only joins with the inequality as residual
    drop = ["_b0", "_b1"]
    lo1 = _emit(
        l_long.drop(*drop).join(rt.drop(*drop), keycond).filter(overlap)
    )
    lo2 = _emit(
        l_short.drop(*drop)
        .join(r_long.drop(*drop), keycond)
        .filter(overlap)
    )
    return grid.unionByName(lo1).unionByName(lo2)
