"""nb_train / nb_score / nb_filter — pinned against an independent
pure-Python (hashlib + dict-counting) replay of the NB log-odds
identity, plus partition invariance and validation errors."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from codeindex_spark.ops.classify import nb_filter, nb_score, nb_train

B, A = 64, 1.0

ROWS = [
    # (doc_id, text, is_target) — two visibly different vocabularies
    (0, "good clean prose with words", True),
    (1, "clean prose reads well with good words", True),
    (2, "prose good clean well words reads", True),
    (3, "spam junk buy now click here", False),
    (4, "junk spam click buy buy now", False),
    (5, "now here click junk spam buy", False),
    (6, "good prose with junk inside", True),
    (7, "", False),  # empty doc: n_grams 0, score == prior
    (8, "zebra quux unseen tokens only", True),  # mostly novel grams
]


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _grams(text: str) -> list[int]:
    t = [w for w in text.lower().strip().split() if w]
    out = []
    for i in range(len(t)):
        for k in (1, 2):
            if i + k <= len(t):
                out.append(_bucket(" ".join(t[i : i + k])))
    return out


def _replay(rows):
    cp: dict[int, int] = {}
    cn: dict[int, int] = {}
    n_pos = sum(1 for r in rows if r[2])
    n_neg = len(rows) - n_pos
    for _, text, pos in rows:
        for b in _grams(text):
            (cp if pos else cn)[b] = (cp if pos else cn).get(b, 0) + 1
    buckets = set(cp) | set(cn)
    lr = {
        b: math.log((cp.get(b, 0) + A) / (cn.get(b, 0) + A)) for b in buckets
    }
    tp, tn = sum(cp.values()), sum(cn.values())
    c = math.log((tn + A * B) / (tp + A * B))
    prior = math.log(n_pos / n_neg)
    scores = {}
    for doc_id, text, _ in rows:
        gs = _grams(text)
        scores[doc_id] = (
            len(gs),
            prior + len(gs) * c + sum(lr.get(b, 0.0) for b in gs),
        )
    return lr, prior, c, scores


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "text", "is_target"])


@pytest.fixture(scope="module")
def model(docs):
    return nb_train(docs, "is_target", num_buckets=B, alpha=A)


def test_weights_match_replay(model):
    lr, prior, c, _ = _replay(ROWS)
    got = {r["bucket"]: r["lr"] for r in model.weights.collect()}
    assert got.keys() == lr.keys()
    for b in lr:
        assert got[b] == pytest.approx(lr[b], abs=1e-12)
    assert model.log_prior == pytest.approx(prior, abs=1e-12)
    assert model.gram_const == pytest.approx(c, abs=1e-12)


def test_scores_match_replay(docs, model):
    _, _, _, exp = _replay(ROWS)
    got = {
        r["doc_id"]: (r["n_grams"], r["nb_logodds"])
        for r in nb_score(docs, model).collect()
    }
    assert got.keys() == exp.keys()
    for d, (ng, sc) in exp.items():
        assert got[d][0] == ng
        assert got[d][1] == pytest.approx(sc, abs=1e-9)
    # empty doc scores exactly the prior
    assert got[7] == (0, pytest.approx(model.log_prior, abs=0))


def test_partition_invariance(docs, model):
    a = nb_score(docs, model)
    b = nb_score(docs.repartition(7, "text"), model)
    ra = {r["doc_id"]: round(r["nb_logodds"], 6) for r in a.collect()}
    rb = {r["doc_id"]: round(r["nb_logodds"], 6) for r in b.collect()}
    assert ra == rb


def test_filter_threshold(docs, model):
    kept = {r["doc_id"] for r in nb_filter(docs, model, 0.0).collect()}
    scored = {
        r["doc_id"]: r["nb_logodds"] for r in nb_score(docs, model).collect()
    }
    assert kept == {d for d, s in scored.items() if s >= 0.0}
    # the two vocabularies separate: clean docs kept, spam dropped
    assert {0, 1, 2} <= kept and not ({3, 4, 5} & kept)


def test_train_validation(spark, docs):
    one_class = spark.createDataFrame(
        [(0, "a b", True), (1, "c d", True)], ["doc_id", "text", "is_target"]
    )
    with pytest.raises(ValueError, match="both classes"):
        nb_train(one_class, "is_target")
    with pytest.raises(ValueError, match="alpha"):
        nb_train(docs, "is_target", alpha=0.0)
