"""Mixture sampling + shard assignment: plan arithmetic by hand,
membership replayed with Python hashlib, determinism under
repartition."""

from __future__ import annotations

import hashlib

import pytest

from codeindex_spark.ops.mixing import (
    assign_shards,
    mixture_plan,
    mixture_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(60):
        rows.append((i, "en" if i < 30 else ("zh" if i < 50 else "de"), f"doc {i}"))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def _h(seed, i):
    return hashlib.md5(f"{seed}:{i}".encode()).hexdigest()


def test_plan_scarcest_group_binds(docs):
    # en:30 zh:20 de:10 — props (.5,.3,.2): de binds at 10/.2=50
    plan = mixture_plan(docs, {"en": 0.5, "zh": 0.3, "de": 0.2})
    assert plan["en"]["take"] == 25
    assert plan["zh"]["take"] == 15
    assert plan["de"]["take"] == 10
    assert plan["en"]["available"] == 30


def test_plan_budget_and_normalization(docs):
    plan = mixture_plan(docs, {"en": 2.0, "zh": 2.0}, budget=20)
    assert plan["en"]["take"] == 10 and plan["zh"]["take"] == 10
    assert plan["en"]["prop"] == pytest.approx(0.5)
    with pytest.raises(ValueError):
        mixture_plan(docs, {"xx": 1.0})
    with pytest.raises(ValueError):
        mixture_plan(docs, {"en": 0.0})


def test_exact_sample_counts_and_membership(docs):
    props = {"en": 0.5, "zh": 0.3, "de": 0.2}
    plan = mixture_plan(docs, props)
    out = mixture_sample(docs, props).collect()
    got = {}
    for r in out:
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    assert {g: len(v) for g, v in got.items()} == {
        g: row["take"] for g, row in plan.items()
    }
    # membership = lowest md5('mix:'||id) per group (hashlib replay)
    ids = {"en": range(0, 30), "zh": range(30, 50), "de": range(50, 60)}
    for g, rng in ids.items():
        want = set(
            sorted(rng, key=lambda i: (_h("mix", i), i))[: plan[g]["take"]]
        )
        assert got[g] == want, g


def test_exact_sample_partition_invariant(docs):
    props = {"en": 0.6, "de": 0.4}
    a = sorted(r["doc_id"] for r in mixture_sample(docs, props).collect())
    b = sorted(
        r["doc_id"]
        for r in mixture_sample(docs.repartition(13), props).collect()
    )
    assert a == b


def test_approx_sample_is_threshold_subset(docs):
    props = {"en": 0.5, "zh": 0.5}
    out = mixture_sample(docs, props, exact=False).collect()
    langs = {r["lang"] for r in out}
    assert langs <= {"en", "zh"}
    # deterministic
    again = mixture_sample(docs, props, exact=False).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"] for r in again
    )


def test_assign_shards(docs):
    out = assign_shards(docs, 4).collect()
    assert len(out) == 60
    for r in out:
        expect = int(_h("shard", r["doc_id"])[:8], 16) % 4
        assert r["shard"] == expect
    sizes = {}
    for r in out:
        sizes[r["shard"]] = sizes.get(r["shard"], 0) + 1
    assert set(sizes) <= {0, 1, 2, 3} and len(sizes) >= 3  # spread out
    with pytest.raises(ValueError):
        assign_shards(docs, 0)
