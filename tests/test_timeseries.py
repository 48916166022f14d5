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
