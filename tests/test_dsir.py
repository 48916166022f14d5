"""DSIR importance resampling: bit-exact pure-Python cross-check of
the hashed-n-gram log weights, Gumbel-top-k determinism, and the
selection-shift property the op exists for (target-like docs win)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from codeindex_spark.ops.dsir import dsir_log_weights, dsir_resample

RAW = [
    (0, "the cat sat on the mat"),
    (1, "def main return values"),
    (2, "the dog ran home"),
    (3, "import os path join"),
    (4, ""),
]
TARGET = [
    (100, "def parse return result"),
    (101, "import sys path split"),
    (102, "def run return code"),
]
B = 64


def _buckets(text: str, n: int, num_buckets: int) -> list[int]:
    toks = [t for t in text.lower().strip().split() if t]
    out = []
    for k in range(1, n + 1):
        for i in range(len(toks) - k + 1):
            g = " ".join(toks[i : i + k])
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
            out.append(h % num_buckets)
    return out


def _py_log_weights(raw, target, n=2, num_buckets=B, smoothing=1.0):
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    for _, t in raw:
        for b in _buckets(t, n, num_buckets):
            cr[b] = cr.get(b, 0) + 1
    for _, t in target:
        for b in _buckets(t, n, num_buckets):
            ct[b] = ct.get(b, 0) + 1
    tot_r = sum(cr.values()) + smoothing * num_buckets
    tot_t = sum(ct.values()) + smoothing * num_buckets
    out = {}
    for i, t in raw:
        bs = _buckets(t, n, num_buckets)
        if not bs:
            continue
        w = sum(
            math.log((ct.get(b, 0) + smoothing) / tot_t)
            - math.log((cr.get(b, 0) + smoothing) / tot_r)
            for b in bs
        )
        out[i] = (len(bs), w)
    return out


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, target


def test_log_weights_match_python(spark, frames):
    raw, target = frames
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in dsir_log_weights(raw, target, num_buckets=B).collect()
    }
    want = _py_log_weights(RAW, TARGET)
    assert set(got) == set(want)  # empty doc 4 excluded
    for i in want:
        assert got[i][0] == want[i][0]
        assert got[i][1] == pytest.approx(want[i][1], rel=1e-9)


def test_code_like_docs_score_higher(spark, frames):
    raw, target = frames
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(raw, target, num_buckets=B).collect()
    }
    # target corpus is code-flavored: both code docs beat both prose docs
    assert min(w[1], w[3]) > max(w[0], w[2])


def test_unigram_only(spark, frames):
    raw, target = frames
    got = {
        r["doc_id"]: r["n_grams"]
        for r in dsir_log_weights(raw, target, n=1, num_buckets=B).collect()
    }
    assert got[0] == 6 and got[2] == 4  # token counts, no bigrams


def test_resample_deterministic_and_shifted(spark, frames):
    raw, target = frames
    w = dsir_log_weights(raw, target, num_buckets=B).cache()
    a = sorted(r["doc_id"] for r in dsir_resample(w, 2).collect())
    b = sorted(r["doc_id"] for r in dsir_resample(w, 2).collect())
    assert a == b  # md5-derived Gumbel: no RNG, rerun-identical
    # temperature -> 0 is deterministic top-k by weight = the code docs
    cold = sorted(
        r["doc_id"]
        for r in dsir_resample(w, 2, temperature=1e-9).collect()
    )
    assert cold == [1, 3]
    # k >= n rows returns everything scored
    assert len(dsir_resample(w, 100).collect()) == 4
    w.unpersist()


def test_resample_seed_changes_draws(spark, frames):
    raw, target = frames
    # equal weights => selection is purely the seeded Gumbel draw
    w = raw.filter("text != ''").select(
        "doc_id", F.lit(0.0).alias("log_weight")
    )
    picks = {
        seed: tuple(
            sorted(
                r["doc_id"]
                for r in dsir_resample(w, 2, seed=seed).collect()
            )
        )
        for seed in ("a", "b", "c", "d", "e")
    }
    assert len(set(picks.values())) > 1  # seeds actually move the draw


def test_validation():
    with pytest.raises(ValueError):
        dsir_resample(None, 0)
    with pytest.raises(ValueError):
        dsir_resample(None, 1, temperature=0.0)
    with pytest.raises(ValueError):
        dsir_log_weights(None, None, n=0)
    with pytest.raises(ValueError):
        dsir_log_weights(None, None, num_buckets=0)
