"""Gap-based sessionization: hand-built event streams with known
session boundaries, tie-breaks, and rollup arithmetic."""

from __future__ import annotations

from datetime import datetime

import pytest

from codeindex_spark.ops.sessions import session_stats, sessionize


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


def ts(minute, second=0):
    return datetime(2024, 1, 1, minute // 60, minute % 60, second)


def test_sessionize_gap_boundaries(spark):
    rows = [
        # user 1: events at 0, 10, 45, 50 min with a 30-min gap ->
        # sessions {0,10}, {45,50}; the 35-min gap splits
        (1, ts(0), 1, "view", 1.0),
        (2, ts(10), 1, "click", 2.0),
        (3, ts(45), 1, "view", 3.0),
        (4, ts(50), 1, "error", 4.0),
        # user 2: single event
        (5, ts(7), 2, "view", 5.0),
    ]
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(_events(spark, rows), gap_seconds=1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}
    # a gap of EXACTLY gap_seconds stays in-session (strict >)
    rows2 = [(1, ts(0), 1, "a", 0.0), (2, ts(30), 1, "b", 0.0)]
    got2 = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(_events(spark, rows2), gap_seconds=1800).collect()
    }
    assert got2 == {1: 1, 2: 1}


def test_sessionize_tie_break_and_validation(spark):
    # same timestamp: event_id orders deterministically, same session
    rows = [(2, ts(0), 1, "b", 0.0), (1, ts(0), 1, "a", 0.0)]
    got = {
        r["event_id"]: r["session_idx"]
        for r in sessionize(_events(spark, rows)).collect()
    }
    assert got == {1: 1, 2: 1}
    with pytest.raises(ValueError):
        sessionize(_events(spark, rows), gap_seconds=0)


def test_session_stats_rollup(spark):
    rows = [
        (1, ts(0), 1, "view", 1.25),
        (2, ts(10), 1, "click", 2.50),
        (3, ts(45), 1, "view", 4.00),
    ]
    got = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(
            _events(spark, rows), gap_seconds=1800
        ).collect()
    }
    s1 = got[(1, 1)]
    assert s1["n_events"] == 2
    assert s1["duration_secs"] == pytest.approx(600.0)
    assert s1["sum_value"] == pytest.approx(3.75)
    assert s1["n_types"] == 2
    s2 = got[(1, 2)]
    assert (s2["n_events"], s2["duration_secs"]) == (1, 0.0)


def test_sessionize_invariants_random(spark):
    """Independent re-check on seeded random events: every event
    appears exactly once; per user the session index starts at 1 and
    increments exactly when the inter-event gap exceeds the
    threshold."""
    import random
    from datetime import timedelta

    rng = random.Random(11)
    base = datetime(2024, 1, 1)
    rows = [
        (
            i,
            base + timedelta(seconds=rng.randint(0, 86_400)),
            rng.randint(1, 5),
            "t",
            1.0,
        )
        for i in range(300)
    ]
    out = sessionize(_events(spark, rows), gap_seconds=600).collect()
    assert sorted(r["event_id"] for r in out) == list(range(300))
    by_user: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    for rs in by_user.values():
        assert rs[0]["session_idx"] == 1
        for a, b in zip(rs, rs[1:]):
            gap = (b["ts"] - a["ts"]).total_seconds()
            want = a["session_idx"] + (1 if gap > 600 else 0)
            assert b["session_idx"] == want, (a, b)
