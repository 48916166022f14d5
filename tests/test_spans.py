"""Exact substring span dedup (Lee et al. 2022 semantics over
fixed-width windows): hand-computed coverage on tiny corpora,
within-doc repetition, threshold behavior, and the invariant that an
exact duplicate doc scrubs to empty."""

from __future__ import annotations

import pytest

from codeindex_spark.ops.spans import (
    duplicate_span_stats,
    remove_duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_span_found_and_scrubbed(spark):
    docs = _docs(
        spark,
        [(1, "a b c d e f"), (2, "x a b c d y")],
    )
    stats = {r["doc_id"]: r for r in duplicate_span_stats(docs, window=4).collect()}
    # 'a b c d' occurs in both; canonical is (doc 1, start 1)
    assert (stats[1]["n_windows"], stats[1]["n_dup_windows"]) == (3, 0)
    assert stats[1]["dup_token_fraction"] == 0.0
    assert (stats[2]["n_windows"], stats[2]["n_dup_windows"]) == (3, 1)
    assert stats[2]["dup_token_fraction"] == pytest.approx(4 / 6, abs=1e-6)
    cleaned = {
        r["doc_id"]: r for r in remove_duplicate_spans(docs, window=4).collect()
    }
    assert cleaned[1]["text"] == "a b c d e f"
    assert cleaned[2]["text"] == "x y"
    assert (cleaned[2]["n_tokens"], cleaned[2]["n_kept_tokens"]) == (6, 2)


def test_within_doc_repetition_collapses(spark):
    docs = _docs(spark, [(1, "a b a b a b a b")])
    cleaned = remove_duplicate_spans(docs, window=2).collect()[0]
    # every repeat of the alternating bigram beyond the canonical
    # first occurrences is covered; only the leading 'a b' survives
    assert cleaned["text"] == "a b"
    assert cleaned["n_kept_tokens"] == 2
    stats = duplicate_span_stats(docs, window=2).collect()[0]
    assert stats["n_windows"] == 7
    assert stats["n_dup_windows"] == 5
    assert stats["dup_token_fraction"] == pytest.approx(6 / 8, abs=1e-6)


def test_exact_duplicate_doc_scrubs_to_empty(spark):
    text = "one two three four five six seven eight"
    docs = _docs(spark, [(5, text), (9, text)])
    cleaned = {
        r["doc_id"]: r for r in remove_duplicate_spans(docs, window=4).collect()
    }
    # doc 5 (min id) is canonical everywhere; doc 9 scrubs to empty
    # but is still RETURNED — dropping is the caller's policy
    assert cleaned[5]["text"] == text
    assert cleaned[9]["text"] == ""
    assert cleaned[9]["n_kept_tokens"] == 0


def test_short_docs_and_threshold(spark):
    docs = _docs(spark, [(1, "a b c"), (2, "a b c")])
    # both docs are shorter than the window: no windows, untouched
    stats = {r["doc_id"]: r for r in duplicate_span_stats(docs, window=4).collect()}
    assert all(
        (s["n_windows"], s["n_dup_windows"], s["dup_token_fraction"])
        == (0, 0, 0.0)
        for s in stats.values()
    )
    cleaned = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(docs, window=4).collect()
    }
    assert cleaned == {1: "a b c", 2: "a b c"}
    with pytest.raises(ValueError):
        duplicate_span_stats(docs, window=1)


def test_repeat_longer_than_window_fully_covered(spark):
    # a 6-token repeat with window=3: union of its duplicated
    # 3-windows covers the whole repeat in the non-canonical doc
    rep = "r1 r2 r3 r4 r5 r6"
    docs = _docs(spark, [(1, f"{rep} tail1"), (2, f"head1 {rep}")])
    cleaned = {
        r["doc_id"]: r for r in remove_duplicate_spans(docs, window=3).collect()
    }
    assert cleaned[1]["text"] == f"{rep} tail1"
    assert cleaned[2]["text"] == "head1"
    assert cleaned[2]["n_kept_tokens"] == 1


def test_lag_coverage_matches_naive_explode(spark):
    """The lag-based successor-gap coverage (each covered position
    emitted once) must equal the naive explode-every-window-position
    + distinct set on randomized repetitive corpora."""
    import random

    from pyspark.sql import functions as F

    from codeindex_spark.ops.spans import _covered, _noncanonical, _windows

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    rows = []
    for d in range(40):
        n = rng.randint(3, 30)
        rows.append((d, " ".join(rng.choice(vocab) for _ in range(n))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for window in (2, 3, 5):
        _, wins = _windows(docs, "doc_id", "text", window)
        nc = _noncanonical(wins)
        fast = {
            (r["doc_id"], r["_p"])
            for r in _covered(nc, window).collect()
        }
        naive = {
            (r["doc_id"], r["_p"])
            for r in nc.select(
                "doc_id",
                F.explode(
                    F.sequence(F.col("_s"), F.col("_s") + window - 1)
                ).alias("_p"),
            )
            .distinct()
            .collect()
        }
        assert fast == naive, f"window={window}"


def test_partition_scoped_span_dedup(spark):
    """partition_col scopes the dedup: the same span in two different
    partitions both survive; within one partition the non-canonical
    copy still scrubs."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, lang="en", text="a b c d x1"),
            Row(doc_id=2, lang="en", text="a b c d y1"),
            Row(doc_id=3, lang="de", text="a b c d z1"),
        ]
    )
    cleaned = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(
            docs, window=4, partition_col="lang"
        ).collect()
    }
    assert cleaned[1] == "a b c d x1"   # canonical in en
    assert cleaned[2] == "y1"           # scrubbed within en
    assert cleaned[3] == "a b c d z1"   # de scope: survives intact
    stats = {
        r["doc_id"]: r["n_dup_windows"]
        for r in duplicate_span_stats(
            docs, window=4, partition_col="lang"
        ).collect()
    }
    assert stats == {1: 0, 2: 1, 3: 0}


def test_partition_scope_null_group_still_dedups(spark):
    """A NULL partition key is a real scope: duplicates inside it must
    still collapse (null-safe canon join), and they must not dedup
    against a named scope."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, lang=None, text="a b c d x1"),
            Row(doc_id=2, lang=None, text="a b c d y1"),
            Row(doc_id=3, lang="en", text="a b c d z1"),
        ]
    )
    cleaned = {
        r["doc_id"]: r["text"]
        for r in remove_duplicate_spans(
            docs, window=4, partition_col="lang"
        ).collect()
    }
    assert cleaned[1] == "a b c d x1"   # canonical inside NULL scope
    assert cleaned[2] == "y1"           # scrubbed inside NULL scope
    assert cleaned[3] == "a b c d z1"   # en scope untouched


def test_span_stats_releases_disk_cache(spark):
    """duplicate_span_stats persists its non-canonical window set
    DISK_ONLY internally; repeated calls must not accumulate session-
    lifetime disk caches (the r3 leak: the returned plan held the
    persisted reference forever). The small per-doc aggregates are
    localCheckpointed (MEMORY_AND_DISK, cleaner-managed) — the pin is
    that no DISK_ONLY (useDisk & !useMemory) cache survives."""
    def disk_only_ids():
        ids = set()
        for rid, jrdd in spark.sparkContext._jsc.getPersistentRDDs().items():
            sl = jrdd.rdd().getStorageLevel()
            if sl.useDisk() and not sl.useMemory():
                ids.add(rid)
        return ids

    before = disk_only_ids()
    docs = _docs(spark, [(1, "a b c d e f"), (2, "x a b c d y")])
    for _ in range(2):
        duplicate_span_stats(docs, window=4).collect()
    assert disk_only_ids() - before == set()
