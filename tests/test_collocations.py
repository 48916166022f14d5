"""pmi_bigrams and token_entropy: hand-computed expectations."""

from __future__ import annotations

import math

import pytest

from codeindex_spark.ops.analysis import pmi_bigrams, token_entropy


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b c"),
            (2, "a b x"),
            (3, ""),
        ],
        "doc_id long, text string",
    )


def _pmi(c12, c1, c2, n1, n2):
    return round(
        math.log(
            float(c12) * float(n1) * float(n1)
            / (float(n2) * float(c1) * float(c2))
        ),
        6,
    )


def test_pmi_hand_computed(spark):
    got = {
        (r["w1"], r["w2"]): (r["c12"], r["c1"], r["c2"], r["pmi"], r["rank"])
    for r in pmi_bigrams(_docs(spark), min_count=1, top_k=10).collect()}
    # unigrams: a=3 b=3 c=1 x=1 -> N1=8; bigrams: ab=3 ba=1 bc=1 bx=1 -> N2=6
    assert set(got) == {("a", "b"), ("b", "a"), ("b", "c"), ("b", "x")}
    assert got[("a", "b")][:3] == (3, 3, 3)
    assert got[("a", "b")][3] == _pmi(3, 3, 3, 8, 6)
    assert got[("b", "c")][3] == _pmi(1, 3, 1, 8, 6)
    # bc and bx tie on pmi -> (w1, w2) tie-break orders bc before bx
    pmis = {k: v[3] for k, v in got.items()}
    assert pmis[("b", "c")] == pmis[("b", "x")]
    ranks = {k: v[4] for k, v in got.items()}
    assert ranks[("b", "c")] < ranks[("b", "x")]
    # ranks are 1..4 and descend with pmi
    assert sorted(ranks.values()) == [1, 2, 3, 4]


def test_pmi_min_count_and_top_k(spark):
    rows = pmi_bigrams(_docs(spark), min_count=2, top_k=10).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]
    rows = pmi_bigrams(_docs(spark), min_count=1, top_k=2).collect()
    assert len(rows) == 2 and [r["rank"] for r in rows] == [1, 2]
    with pytest.raises(ValueError):
        pmi_bigrams(_docs(spark), min_count=0)
    with pytest.raises(ValueError):
        pmi_bigrams(_docs(spark), top_k=0)


def test_token_entropy_hand_computed(spark):
    got = {r["doc_id"]: r for r in token_entropy(_docs(spark)).collect()}
    # d1: [a,b,a,b,c] n=5 types=3, H = ln5 - (2ln2 + 2ln2 + 0)/5
    assert got[1]["n_tokens"] == 5 and got[1]["n_types"] == 3
    assert got[1]["ttr"] == round(3.0 / 5.0, 6)
    assert got[1]["entropy"] == round(
        math.log(5.0) - (2.0 * math.log(2.0) + 2.0 * math.log(2.0)) / 5.0, 6
    )
    # d2: all distinct -> ttr 1, H = ln(3)
    assert got[2]["ttr"] == 1.0
    assert got[2]["entropy"] == round(math.log(3.0), 6)
    # d3: empty text stays a row with zeros, not NULLs
    assert (got[3]["n_tokens"], got[3]["n_types"]) == (0, 0)
    assert (got[3]["ttr"], got[3]["entropy"]) == (0.0, 0.0)


def test_partition_invariance(spark):
    docs = _docs(spark)
    a = sorted(pmi_bigrams(docs, min_count=1, top_k=10).collect())
    b = sorted(
        pmi_bigrams(docs.repartition(7), min_count=1, top_k=10).collect()
    )
    assert a == b
    c = sorted(token_entropy(docs).collect())
    d = sorted(token_entropy(docs.repartition(5)).collect())
    assert c == d
