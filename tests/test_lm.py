"""Stupid-backoff LM train/score: hand-computed probabilities on a
tiny corpus, backoff/OOV paths, min_count pruning, and the ranking
property the quality filter relies on."""

from __future__ import annotations

import math

import pytest

from codeindex_spark.ops.lm import lm_score, lm_train

ALPHA = 0.4

# unigrams: the:3 cat:2 sat:2 ran:1 dog:1  -> total=9, V=5
CORPUS = ["the cat sat", "the cat ran", "the dog sat"]


@pytest.fixture(scope="module")
def tiny_docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def model(spark, tiny_docs):
    return lm_train(tiny_docs, n=3).cache()


def _model_dict(model):
    return {(r["order"], r["gram"]): r["p"] for r in model.collect()}


def test_train_probabilities(model):
    m = _model_dict(model)
    # add-one unigrams over total=9, V=5
    assert m[(1, "the")] == pytest.approx((3 + 1) / 14)
    assert m[(1, "cat")] == pytest.approx((2 + 1) / 14)
    assert m[(1, "ran")] == pytest.approx((1 + 1) / 14)
    # OOV floor
    assert m[(0, "")] == pytest.approx(1 / 14)
    # conditionals: count(gram)/count(context)
    assert m[(2, "the cat")] == pytest.approx(2 / 3)
    assert m[(2, "the dog")] == pytest.approx(1 / 3)
    assert m[(2, "dog sat")] == pytest.approx(1 / 1)
    assert m[(3, "the cat sat")] == pytest.approx(1 / 2)
    assert m[(3, "the dog sat")] == pytest.approx(1 / 1)
    # no spurious orders
    assert max(o for o, _ in m) == 3


def _score_one(spark, model, text, **kw):
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    rows = lm_score(docs, model, n=3, **kw).collect()
    assert len(rows) == 1
    return rows[0]


def test_score_fully_seen_doc(spark, model):
    # i=1 'the': avail=1 -> p1 = 4/14 (no penalty)
    # i=2 'the cat': avail=2 -> p2 = 2/3
    # i=3 'the cat sat': avail=3 -> p3 = 1/2
    r = _score_one(spark, model, "the cat sat")
    want = (math.log10(4 / 14) + math.log10(2 / 3) + math.log10(0.5)) / 3
    assert r["n_tokens"] == 3
    assert r["avg_log10_p"] == pytest.approx(want, abs=1e-12)


def test_score_backoff_two_levels(spark, model):
    # 'the dog ran': i=3 has avail=3 but neither trigram 'the dog ran'
    # nor bigram 'dog ran' was seen -> p1(ran) * alpha^2
    r = _score_one(spark, model, "the dog ran")
    want = (
        math.log10(4 / 14)
        + math.log10(1 / 3)
        + math.log10((2 / 14) * ALPHA**2)
    ) / 3
    assert r["avg_log10_p"] == pytest.approx(want, abs=1e-12)


def test_score_oov_floor(spark, model):
    # unseen unigram -> floor 1/14, avail=1 so no alpha penalty
    r = _score_one(spark, model, "zebra")
    assert r["avg_log10_p"] == pytest.approx(math.log10(1 / 14), abs=1e-12)
    # OOV mid-doc: avail for position 2 is 2 -> floor * alpha^1
    r2 = _score_one(spark, model, "the zebra")
    want = (math.log10(4 / 14) + math.log10((1 / 14) * ALPHA)) / 2
    assert r2["avg_log10_p"] == pytest.approx(want, abs=1e-12)


def test_min_count_prunes_higher_orders_only(spark, tiny_docs):
    m = lm_train(tiny_docs, n=3, min_count=2)
    d = _model_dict(m)
    # every trigram has count 1 -> all pruned; 'the cat' (count 2) stays
    assert not [g for (o, g) in d if o == 3]
    assert (2, "the cat") in d
    assert (2, "dog sat") not in d
    # unigrams are never pruned (they are the floor)
    assert (1, "ran") in d
    # scoring backs off through the pruned orders:
    # 'the cat sat' i=3: trigram pruned, bigram 'cat sat' pruned ->
    # p1(sat) * alpha^2
    r = _score_one(spark, m, "the cat sat")
    want = (
        math.log10(4 / 14)
        + math.log10(2 / 3)
        + math.log10((3 / 14) * ALPHA**2)
    ) / 3
    assert r["avg_log10_p"] == pytest.approx(want, abs=1e-12)


def test_tokenize_whitespace_and_empty(spark, model):
    r = _score_one(spark, model, "  the   cat\tsat ".replace("\t", " "))
    assert r["n_tokens"] == 3
    # empty/whitespace-only docs are dropped, not scored as zero
    docs = spark.createDataFrame(
        [(0, "the cat"), (1, "   ")], "doc_id long, text string"
    )
    out = lm_score(docs, model, n=3)
    assert [row["doc_id"] for row in out.collect()] == [0]


def test_ranking_property_corpus_like_beats_gibberish(spark, tiny_docs):
    m = lm_train(tiny_docs, n=3)
    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, "sat the ran dog cat"), (2, "qq zz xx")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["avg_log10_p"] for r in lm_score(docs, m, n=3).collect()
    }
    assert got[0] > got[1] > got[2]


def test_broadcast_model_same_scores(spark, tiny_docs, model):
    plain = {
        r["doc_id"]: r["avg_log10_p"]
        for r in lm_score(tiny_docs, model, n=3).collect()
    }
    bcast = {
        r["doc_id"]: r["avg_log10_p"]
        for r in lm_score(
            tiny_docs, model, n=3, broadcast_model=True
        ).collect()
    }
    assert plain == pytest.approx(bcast)


def test_bigram_only_model(spark, tiny_docs):
    m = lm_train(tiny_docs, n=2)
    # default n derives the trained order (2) from the model
    docs = spark.createDataFrame(
        [(0, "the cat")], "doc_id long, text string"
    )
    r = lm_score(docs, m).collect()[0]
    want = (math.log10(4 / 14) + math.log10(2 / 3)) / 2
    assert r["avg_log10_p"] == pytest.approx(want, abs=1e-12)
    with pytest.raises(ValueError):
        lm_train(tiny_docs, n=0)


def test_score_order_derives_from_model(spark, tiny_docs):
    """The default n derives the model's max order: scoring a bigram
    model at n=3 charges every full-context position a spurious
    alpha backoff (p3 is always null), so the default must be 2."""
    m = lm_train(tiny_docs, n=2)
    docs = spark.createDataFrame(
        [(0, "the cat sat")], "doc_id long, text string"
    )
    derived = lm_score(docs, m).collect()[0]["avg_log10_p"]
    explicit = lm_score(docs, m, n=2).collect()[0]["avg_log10_p"]
    assert derived == pytest.approx(explicit, abs=1e-12)
    # position 3 is a seen bigram ('cat sat'): no backoff penalty
    want = (
        math.log10(4 / 14) + math.log10(2 / 3) + math.log10(1 / 2)
    ) / 3
    assert derived == pytest.approx(want, abs=1e-12)


def test_score_buckets_exact_terciles(spark):
    from codeindex_spark.ops.analysis import score_buckets

    scored = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 7)], "doc_id long, v double"
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets(scored, "v", exact=True).collect()
    }
    # type-7 terciles of 1..6: q(1/3)=2.667, q(2/3)=4.333
    assert got == {1: "tail", 2: "tail", 3: "middle", 4: "middle",
                   5: "head", 6: "head"}
    # approx path: thresholds are order statistics (no type-7
    # interpolation) so exact boundaries can differ at tiny n, but
    # the labeling must stay monotone in the score
    rows = sorted(
        score_buckets(scored, "v", exact=False).collect(),
        key=lambda r: r["v"],
    )
    rank = {"tail": 0, "middle": 1, "head": 2}
    seq = [rank[r["bucket"]] for r in rows]
    assert seq == sorted(seq) and seq[0] == 0 and seq[-1] == 2


def test_score_buckets_partitioned_and_validation(spark):
    from codeindex_spark.ops.analysis import score_buckets

    scored = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0),
         (4, "b", 100.0), (5, "b", 200.0), (6, "b", 300.0)],
        "doc_id long, grp string, v double",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets(
            scored, "v", partition_col="grp", exact=True
        ).collect()
    }
    # thresholds are PER GROUP: 100.0 is group b's tail even though
    # it dwarfs every group-a value
    assert got[1] == got[4] == "tail"
    assert got[2] == got[5] == "middle"
    assert got[3] == got[6] == "head"
    with pytest.raises(ValueError):
        score_buckets(scored, "v", cuts=(0.5,), labels=("a", "b", "c"))
    with pytest.raises(ValueError):
        score_buckets(scored, "v", cuts=(0.7, 0.3))


def test_score_buckets_null_handling(spark):
    """NULL partition keys keep their rows (null-safe threshold
    join); NULL scores get a NULL bucket, never the top label."""
    from codeindex_spark.ops.analysis import score_buckets

    scored = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0),
         (4, None, 1.0), (5, None, 2.0), (6, None, 3.0)],
        "doc_id long, grp string, v double",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets(
            scored, "v", partition_col="grp", exact=True
        ).collect()
    }
    # all six rows survive, NULL group bucketed against its own terciles
    assert len(got) == 6
    assert got[4] == "tail" and got[5] == "middle" and got[6] == "head"
    nulls = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, None)],
        "doc_id long, v double",
    )
    got2 = {
        r["doc_id"]: r["bucket"]
        for r in score_buckets(nulls, "v", exact=True).collect()
    }
    assert got2[4] is None and got2[3] == "head"


def test_perplexity_buckets_ranking(spark, tiny_docs):
    from codeindex_spark.ops.lm import perplexity_buckets

    m = lm_train(tiny_docs, n=3)
    docs = spark.createDataFrame(
        [(0, "the cat sat"), (1, "sat the ran dog cat"), (2, "qq zz xx")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(docs, m, exact=True).collect()
    }
    # most corpus-like -> head, gibberish -> tail (CCNet orientation)
    assert got == {0: "head", 1: "middle", 2: "tail"}
