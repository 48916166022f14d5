"""Streaming heavy-hitter candidates: the bucketed stateful
Misra-Gries stream must (a) underestimate counts by at most
n_bucket/(k+1), (b) keep a candidate superset of every batch heavy
hitter at the matching threshold, and (c) support exact recovery —
a batch re-count of the streamed candidates equals ops.sketch's
exact batch answer.
"""

from __future__ import annotations

import json
import math
import os
import time
from collections import Counter

import numpy as np
import pytest

from codeindex_spark.ops.sketch import heavy_hitters
from codeindex_spark.streaming.sketch import stream_heavy_hitters

PHI = 0.02
K = math.ceil(1.0 / PHI) + 1  # 51
N_BUCKETS = 8


def _zipf_batches(n_batches=4, docs_per_batch=150, doc_len=40, vocab=800):
    rng = np.random.default_rng(11)
    out, did = [], 0
    for _ in range(n_batches):
        rows = []
        for _ in range(docs_per_batch):
            words = [f"w{r % vocab}" for r in rng.zipf(1.25, size=doc_len)]
            rows.append((did, " ".join(words)))
            did += 1
        out.append(rows)
    return out


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("hhstream")
    docs_dir = tmp / "docs"
    docs_dir.mkdir()
    batches = _zipf_batches()
    base = time.time() - 100
    for i, rows in enumerate(batches):
        p = docs_dir / f"b{i}.json"
        with open(p, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(p, (base + 10 * i, base + 10 * i))
    snap = stream_heavy_hitters(
        spark,
        str(docs_dir),
        str(tmp / "ckpt"),
        phi=PHI,
        n=1,
        n_buckets=N_BUCKETS,
        query_name="hh_test",
    ).collect()
    flat = [r for rows in batches for r in rows]
    true = Counter(w for _, t in flat for w in t.split())
    return snap, flat, true


def test_estimates_bounded(streamed):
    snap, _, true = streamed
    per_bucket_n = {}
    for r in snap:
        per_bucket_n[r["bucket"]] = r["n_bucket"]
        assert r["est"] <= true[r["gram"]], (r["gram"], r["est"])
        assert true[r["gram"]] - r["est"] <= r["n_bucket"] / (K + 1)
    # every gram hashed somewhere: bucket totals sum to the corpus
    assert sum(per_bucket_n.values()) == sum(true.values())


def test_candidates_cover_batch_heavy_hitters(streamed, spark):
    snap, flat, true = streamed
    n = sum(true.values())
    threshold = max(1, math.ceil(PHI * n))
    exact_hh = {g for g, c in true.items() if c >= threshold}
    assert exact_hh, "fixture must have heavy hitters"
    candidates = {r["gram"] for r in snap}
    assert exact_hh <= candidates
    # exact recovery: re-count candidates over the stored corpus and
    # keep >= threshold — equals the batch operator's exact answer
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame(flat, columns=["doc_id", "text"])
    ).repartition(4)
    batch = {
        r["gram"]: r["freq"] for r in heavy_hitters(df, PHI, n=1).collect()
    }
    recovered = {g: true[g] for g in candidates if true[g] >= threshold}
    assert recovered == batch


def test_snapshot_is_final_state_only(streamed):
    snap, _, _ = streamed
    # one seq per bucket in the returned snapshot (history filtered)
    by_bucket = {}
    for r in snap:
        by_bucket.setdefault(r["bucket"], set()).add(r["seq"])
    assert all(len(s) == 1 for s in by_bucket.values())
    # state bound: at most k counters per bucket
    cnt = Counter(r["bucket"] for r in snap)
    assert all(c <= K for c in cnt.values())


# ------------------------------------------------------ streaming KMV

def test_streaming_kmv_equals_batch(spark, tmp_path_factory):
    """The streamed bucketed bottom-k, merged at the end, must equal
    the batch kmv_distinct over the same rows BIT-EXACTLY (the sketch
    is deterministic: md5, no RNG — so this is equality, not an
    error-bound check). Docs arrive one file per trigger so state
    genuinely crosses micro-batches."""
    import json as _json

    from codeindex_spark.ops.sketch import kmv_distinct
    from codeindex_spark.streaming.sketch import stream_kmv_distinct

    tmp = tmp_path_factory.mktemp("kmvstream")
    docs_dir = tmp / "docs"
    docs_dir.mkdir()
    batches = _zipf_batches(n_batches=3, docs_per_batch=120)
    base = time.time() - 100
    for i, rows in enumerate(batches):
        p = docs_dir / f"b{i}.json"
        with open(p, "w") as f:
            for doc_id, text in rows:
                f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.utime(p, (base + 10 * i, base + 10 * i))
    got = stream_kmv_distinct(
        spark,
        str(docs_dir),
        str(tmp / "ckpt"),
        col="text",
        k=64,
        n_buckets=4,
        query_name="kmv_test",
    ).collect()[0]
    flat = [r for rows in batches for r in rows]
    batch_df = spark.createDataFrame(flat, "doc_id long, text string")
    exp = kmv_distinct(batch_df, "text", k=64).collect()[0]
    assert got["n_min"] == exp["n_min"]
    assert got["est_distinct"] == exp["est_distinct"]  # bit-exact
    # and the estimator is sane: ~360 distinct zipf docs, k=64
    n_true = len({t for _, t in flat})
    assert abs(got["est_distinct"] - n_true) / n_true < 0.5
