"""heavy_hitters: per-partition Misra-Gries candidates + exact
recovery must equal the brute-force answer exactly — including on a
skewed corpus whose vocabulary is far larger than the counter budget
(forcing many decrement events) and at the exact threshold boundary.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from codeindex_spark.ops.sketch import gram_stream, heavy_hitters


def _zipf_corpus(n_docs=400, doc_len=60, vocab=2500, seed=7):
    rng = np.random.default_rng(seed)
    # zipf-ish ranks: a few very hot tokens, a long tail
    ranks = rng.zipf(1.3, size=n_docs * doc_len) % vocab
    words = np.array([f"w{r}" for r in ranks]).reshape(n_docs, doc_len)
    return pd.DataFrame(
        {
            "doc_id": range(n_docs),
            "text": [" ".join(row) for row in words],
        }
    )


def _brute(pdf: pd.DataFrame, phi: float, n: int) -> dict[str, int]:
    cnt: Counter = Counter()
    for text in pdf["text"]:
        toks = text.split()
        for i in range(len(toks) - n + 1):
            cnt[" ".join(toks[i : i + n])] += 1
    total = sum(cnt.values())
    t = max(1, math.ceil(phi * total))
    return {g: c for g, c in cnt.items() if c >= t}


@pytest.mark.parametrize("n,phi", [(1, 0.01), (1, 0.002), (2, 0.001)])
def test_heavy_hitters_exact(spark, n, phi):
    pdf = _zipf_corpus()
    df = spark.createDataFrame(pdf).repartition(8)
    exp = _brute(pdf, phi, n)
    k = math.ceil(1.0 / phi) + 1
    # the point of the test: vocabulary >> counter budget for the
    # unigram cases, so MG must actually evict
    got = {
        r["gram"]: r["freq"]
        for r in heavy_hitters(df, phi, n=n).collect()
    }
    assert got == exp
    assert exp, "fixture must have heavy hitters"
    if n == 1:
        vocab = len({w for t in pdf["text"] for w in t.split()})
        assert vocab > k, "fixture must force MG evictions"


def test_threshold_boundary_inclusive(spark):
    # 10 'a' grams of 100 total, phi = 0.1 -> threshold = 10 exactly:
    # 'a' must be INCLUDED (>=), 'b' at 9 must not
    words = ["a"] * 10 + ["b"] * 9 + [f"t{i}" for i in range(81)]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(words)), "text": words})
    ).repartition(4)
    got = {r["gram"]: r["freq"] for r in heavy_hitters(df, 0.1).collect()}
    assert got == {"a": 10}


def test_small_corpus_no_eviction_is_exact(spark):
    # N < k: MG never evicts, so even singletons survive and the
    # threshold-1 edge is exact
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["x y x", "z x"]})
    )
    got = {r["gram"]: r["freq"] for r in heavy_hitters(df, 0.5).collect()}
    assert got == {"x": 3}
    got1 = {r["gram"]: r["freq"] for r in heavy_hitters(df, 0.2).collect()}
    assert got1 == {"x": 3, "y": 1, "z": 1}


def test_bigram_stream_intra_doc_only(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b", "c d"]})
    )
    grams = sorted(r["gram"] for r in gram_stream(df, n=2).collect())
    assert grams == ["a b", "c d"]  # never "b c" across the doc gap


def test_empty_and_validation(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert heavy_hitters(empty, 0.1).count() == 0
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0], "text": ["a"]}))
    with pytest.raises(ValueError, match="phi"):
        heavy_hitters(df, 0.0)
    with pytest.raises(ValueError, match="CountSketch"):
        heavy_hitters(df, 1e-9)
    with pytest.raises(ValueError, match="n must be"):
        gram_stream(df, n=0)


# ----------------------------------------------------------- KMV

import hashlib

from codeindex_spark.ops.sketch import kmv_distinct


def _kmv_replay(values, k):
    hs = sorted({hashlib.md5(str(v).encode()).hexdigest()[:13] for v in values})
    if len(hs) < k:
        return len(hs), float(len(hs))
    h_k = int(hs[k - 1], 16) / float(1 << 52)
    return k, (k - 1) / h_k


def test_kmv_matches_pure_python_replay(spark):
    """Bit-exact vs an independent hashlib replay — the sketch is
    deterministic (md5, no RNG), so equality is exact, not approx."""
    vals = [i % 400 for i in range(5000)]  # heavy duplication
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    row = kmv_distinct(df, "v", k=64).collect()[0]
    n_min, est = _kmv_replay(vals, 64)
    assert row["n_min"] == n_min
    assert row["est_distinct"] == pytest.approx(est, rel=1e-12)


def test_kmv_exact_below_k(spark):
    df = spark.createDataFrame([(i % 10, str(i % 7)) for i in range(100)],
                               "v long, g string")
    rows = {r["g"]: r for r in kmv_distinct(df, "v", k=256, group_col="g").collect()}
    for g, r in rows.items():
        exact = len({i % 10 for i in range(100) if str(i % 7) == g})
        assert r["n_min"] == exact and r["est_distinct"] == float(exact)


def test_kmv_error_bound_and_grouping(spark):
    """~1/sqrt(k) relative error on a 5000-distinct column, per group."""
    rows = [(f"u{i}", "a" if i % 2 == 0 else "b") for i in range(5000)]
    df = spark.createDataFrame(rows, "v string, g string")
    got = {r["g"]: r for r in kmv_distinct(df, "v", k=256, group_col="g").collect()}
    for g in ("a", "b"):
        assert got[g]["n_min"] == 256
        assert abs(got[g]["est_distinct"] - 2500) / 2500 < 0.25
        # exact replay equality too
        exp = _kmv_replay([v for v, gg in rows if gg == g], 256)[1]
        assert got[g]["est_distinct"] == pytest.approx(exp, rel=1e-12)


def test_kmv_partition_invariance(spark):
    rows = [(f"x{i % 777}",) for i in range(3000)]
    df = spark.createDataFrame(rows, "v string")
    a = kmv_distinct(df.repartition(2), "v", k=128).collect()[0]
    b = kmv_distinct(df.repartition(17), "v", k=128).collect()[0]
    assert (a["n_min"], a["est_distinct"]) == (b["n_min"], b["est_distinct"])


def test_kmv_validation(spark):
    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError):
        kmv_distinct(df, "v", k=1)
