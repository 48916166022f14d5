"""cluster_assign / cluster_profile / cluster_balanced_sample —
pinned against independent numpy/hashlib replays (determinism under
repartition IS the contract: assignment similarities are per-row
reductions, sampling is md5-ranked)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from codeindex_spark.ops.cluster import (
    cluster_assign,
    cluster_balanced_sample,
    cluster_profile,
)
from codeindex_spark.ops.similarity import ivf_train_centroids

N, DIM, K = 120, 16, 5


def _vec(i: int) -> list[float]:
    return np.random.default_rng(9000 + i).standard_normal(DIM).tolist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in range(N)], ["vec_id", "embedding"]
    )


@pytest.fixture(scope="module")
def cents(emb):
    return ivf_train_centroids(emb, dim=DIM, n_centroids=K, sample=64)


def _replay_assign(cents):
    mat = np.stack([np.asarray(_vec(i), dtype=np.float64) for i in range(N)])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = np.stack([(mat * c).sum(axis=1) for c in cents], axis=1)
    best = sims.argmax(axis=1)
    return {
        i: (int(best[i]), float(sims[i, best[i]])) for i in range(N)
    }


def test_assign_matches_replay_bit_exact(emb, cents):
    got = {
        r["vec_id"]: (r["cluster"], r["cent_sim"])
        for r in cluster_assign(emb, cents).collect()
    }
    exp = _replay_assign(cents)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0]
        assert got[i][1] == exp[i][1]  # exact, not approx: the contract


def test_assign_partition_invariant(emb, cents):
    a = sorted(cluster_assign(emb.repartition(1), cents).collect())
    b = sorted(cluster_assign(emb.repartition(7), cents).collect())
    assert a == b


def test_assign_chunking_invariant(emb, cents):
    """Centroid chunk size is a memory knob, never a result knob."""
    a = sorted(cluster_assign(emb, cents, chunk=2).collect())
    b = sorted(cluster_assign(emb, cents, chunk=64).collect())
    assert a == b


def test_profile(emb, cents):
    exp = _replay_assign(cents)
    rows = cluster_profile(cluster_assign(emb, cents)).collect()
    for r in rows:
        sims = [s for (c, s) in exp.values() if c == r["cluster"]]
        assert r["n"] == len(sims)
        assert r["min_sim"] == min(sims)
        assert r["max_sim"] == max(sims)
        assert r["mean_sim"] == pytest.approx(sum(sims) / len(sims))
    assert sum(r["n"] for r in rows) == N


def test_balanced_sample_replay_and_cap(emb, cents):
    assigned = cluster_assign(emb, cents)
    out = cluster_balanced_sample(assigned, 4, seed="s").collect()
    # per-cluster cap
    per = {}
    for r in out:
        per.setdefault(r["cluster"], []).append(r["vec_id"])
    assert all(len(v) <= 4 for v in per.values())
    # hashlib replay: lowest md5("s:id") (id tie-break) per cluster
    exp_assign = _replay_assign(cents)
    exp = {}
    for i, (c, _) in exp_assign.items():
        exp.setdefault(c, []).append(i)
    for c, ids in exp.items():
        ranked = sorted(
            ids, key=lambda i: (hashlib.md5(f"s:{i}".encode()).hexdigest(), i)
        )[:4]
        assert sorted(per[c]) == sorted(ranked)
    # repartition does not change the sample
    out2 = cluster_balanced_sample(
        cluster_assign(emb.repartition(5), cents), 4, seed="s"
    ).collect()
    assert sorted((r["vec_id"], r["cluster"]) for r in out) == sorted(
        (r["vec_id"], r["cluster"]) for r in out2
    )


def test_balanced_sample_validation(emb, cents):
    with pytest.raises(ValueError):
        cluster_balanced_sample(cluster_assign(emb, cents), 0)
