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
