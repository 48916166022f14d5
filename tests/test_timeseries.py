"""asof_join: hand-built expectations, tie-breaks, tolerance,
direction, and partitioning invariance."""

from __future__ import annotations

import datetime as dt

import pytest

from codeindex_spark.ops.timeseries import asof_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


def _frames(spark):
    # left: user 1 at t=10, 20; user 2 at t=5; user 3 at t=10 (no right)
    left = spark.createDataFrame(
        [
            (101, _ts(10), 1, 1.0),
            (102, _ts(20), 1, 2.0),
            (103, _ts(5), 2, 3.0),
            (104, _ts(10), 3, 4.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    # right: user 1 at t=4, 10 (two rows: ids 206 > 205), 15; user 2 at t=9
    right = spark.createDataFrame(
        [
            (201, _ts(4), 1, 10.0),
            (205, _ts(10), 1, 50.0),
            (206, _ts(10), 1, 60.0),
            (202, _ts(15), 1, 20.0),
            (203, _ts(9), 2, 30.0),
        ],
        "event_id long, ts timestamp, user_id long, value double",
    )
    return left, right


def _rows(df):
    out = {}
    for r in df.collect():
        out[r["event_id"]] = (r["event_id_r"], r["asof_lag_us"])
    return out


def test_backward_matches_and_ties(spark):
    left, right = _frames(spark)
    j = asof_join(left, right, on=["user_id"], right_cols=["value"])
    got = _rows(j)
    # 101 (t=10): right rows at t<=10 are 201, 205, 206; nearest ts=10,
    # tie 205 vs 206 -> smallest id 205
    assert got[101] == (205, 0)
    # 102 (t=20): nearest <= is t=15 -> 202, lag 5s
    assert got[102] == (202, 5_000_000)
    # 103 (t=5, user 2): only right is t=9 > 5 -> no match
    assert got[103] == (None, None)
    # 104 (user 3): no right rows at all
    assert got[104] == (None, None)
    # matched payload column came through
    vals = {r["event_id"]: r["value_r"] for r in j.collect()}
    assert vals[101] == 50.0 and vals[102] == 20.0 and vals[103] is None


def test_forward_matches_and_ties(spark):
    left, right = _frames(spark)
    j = asof_join(left, right, on=["user_id"], direction="forward")
    got = _rows(j)
    # 101 (t=10): rows at t>=10 are 205/206 (t=10) and 202 (t=15);
    # nearest ts=10, smallest id 205
    assert got[101] == (205, 0)
    # 102 (t=20): nothing at t>=20
    assert got[102] == (None, None)
    # 103 (t=5, user 2): t=9 ahead -> 203, lag 4s
    assert got[103] == (203, 4_000_000)


def test_tolerance(spark):
    left, right = _frames(spark)
    j = asof_join(
        left, right, on=["user_id"], tolerance_seconds=4.0
    )
    got = _rows(j)
    assert got[101] == (205, 0)  # lag 0 <= 4s
    assert got[102] == (None, None)  # lag 5s > 4s dropped


def test_partitioning_invariance(spark):
    left, right = _frames(spark)
    base = sorted(
        asof_join(left, right, on=["user_id"], right_cols=["value"]).collect()
    )
    shuffled = sorted(
        asof_join(
            left.repartition(7), right.repartition(5), on=["user_id"],
            right_cols=["value"],
        ).collect()
    )
    assert base == shuffled


def test_validation(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        asof_join(left, right, on=[])
    with pytest.raises(ValueError):
        asof_join(left, right, on=["user_id"], direction="sideways")
    with pytest.raises(ValueError):
        asof_join(left, right, on=["user_id"], tolerance_seconds=-1.0)


# --- interval_join ---

from codeindex_spark.ops.timeseries import interval_join  # noqa: E402


def _ij_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u", 0, 100),
            (2, "u", 150, 250),
            (3, "v", 0, 50),
            (4, "u", 5_000_000, 5_000_001),
            (5, "u", 10, 5),  # inverted -> dropped
        ],
        "lid int, user string, s long, e long",
    )
    right = spark.createDataFrame(
        [
            (10, "u", 90, 160),
            (11, "u", 300, 400),
            (12, "v", 50, 60),
            (13, "w", 0, 10**12),
        ],
        "rid int, user string, s long, e long",
    )
    return left, right


def _ij_pairs(df):
    return sorted(
        (r["lid"], r["rid"], r["overlap_us"]) for r in df.collect()
    )


def test_interval_join_overlaps_and_emit_once(spark):
    left, right = _ij_frames(spark)
    # 100us buckets: pair (1,10) shares buckets 0 and 1 -> must emit once
    out = interval_join(
        left, right, ["user"], "s", "e", "s", "e", bucket_seconds=1e-4
    )
    assert _ij_pairs(out) == [(1, 10, 10), (2, 10, 10), (3, 12, 0)]


def test_interval_join_bucket_width_invariance(spark):
    left, right = _ij_frames(spark)
    outs = [
        _ij_pairs(
            interval_join(
                left, right, ["user"], "s", "e", "s", "e",
                bucket_seconds=w,
            )
        )
        for w in (3e-5, 1e-3, 3600.0)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_interval_join_matches_brute_force(spark):
    import random

    random.seed(3)
    lrows, rrows = [], []
    for i in range(120):
        k = random.choice("abc")
        s = random.randrange(0, 10_000)
        lrows.append((i, k, s, s + random.randrange(0, 800)))
    for j in range(120):
        k = random.choice("abc")
        s = random.randrange(0, 10_000)
        rrows.append((j, k, s, s + random.randrange(0, 800)))
    left = spark.createDataFrame(lrows, "lid int, user string, s long, e long")
    right = spark.createDataFrame(rrows, "rid int, user string, s long, e long")
    want = sorted(
        (li, rj, min(le, re2) - max(ls, rs))
        for (li, lk, ls, le) in lrows
        for (rj, rk, rs, re2) in rrows
        if lk == rk and ls <= re2 and rs <= le
    )
    out = interval_join(
        left, right, ["user"], "s", "e", "s", "e", bucket_seconds=5e-4
    )
    assert _ij_pairs(out) == want


def test_interval_join_validation(spark):
    left, right = _ij_frames(spark)
    import pytest as _pt

    with _pt.raises(ValueError):
        interval_join(left, right, [], "s", "e", "s", "e")
    with _pt.raises(ValueError):
        interval_join(left, right, ["user"], "s", "e", "s", "e",
                      bucket_seconds=0)
