"""MoreLikeThis: engine result vs a from-scratch Python replay of the
Lucene MLT recipe (tf·idf term selection over the stored source doc,
then summed-BM25 OR query) on the same corpus."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from codeindex_spark.corpus import CorpusSpec, generate_documents, spark_documents
from codeindex_spark.index.build import IndexParams
from codeindex_spark.index.segments import IndexBuilder, IndexReader
from codeindex_spark.query import ast
from codeindex_spark.query.oracle import OracleIndex
from codeindex_spark.query.planner import SearchEngine
from codeindex_spark.tokenizer import tokenize_lower

SPEC = CorpusSpec(n_docs=120)
PARAMS = IndexParams(num_buckets=16, block_size=32)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mltidx"))
    docs = spark_documents(spark, SPEC, partitions=4)
    IndexBuilder(spark, d, PARAMS, n_groups=2).build(docs, resume=False)
    return SearchEngine(IndexReader(spark, d))


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex.build(
        generate_documents(SPEC),
        num_buckets=PARAMS.num_buckets,
        block_size=PARAMS.block_size,
        k1=PARAMS.k1,
        b=PARAMS.b,
    )


def _py_mlt_terms(
    corpus, src_path, max_query_terms=25, min_term_freq=2, min_doc_freq=5
):
    """Replay of the term-selection stage, straight from the corpus."""
    docs_tokens = {r.path: tokenize_lower(r.content) for r in corpus.itertuples()}
    n_docs = len(docs_tokens)
    df = Counter()
    for toks in docs_tokens.values():
        df.update(set(toks))
    tf = Counter(docs_tokens[src_path])
    ranked = []
    for term, f in tf.items():
        if f < min_term_freq or df[term] < min_doc_freq:
            continue
        idf = math.log(1.0 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
        ranked.append((f * idf, term))
    ranked.sort(key=lambda p: (-p[0], p[1]))
    return [t for _, t in ranked[:max_query_terms]]


def _src(engine, corpus, i=7):
    row = corpus.iloc[i]
    key = (
        engine.reader.docs.filter(F.col("path") == row["path"])
        .select("doc_key", "doc_id")
        .collect()[0]
    )
    return row, key["doc_key"], key["doc_id"]


def test_mlt_matches_python_replay(engine, oracle):
    corpus = generate_documents(SPEC)
    row, doc_key, src_engine_id = _src(engine, corpus)
    chosen = _py_mlt_terms(corpus, row["path"])
    assert chosen, "fixture doc must yield MLT terms"
    # oracle: summed-BM25 OR over the same terms, source excluded
    node = ast.Or(tuple(ast.Term(t, "content") for t in chosen))
    exp = {
        d: s for d, s in oracle.eval(node).items() if d != src_engine_id
    }
    exp_rank = sorted(exp.items(), key=lambda p: (-p[1], p[0]))[:10]
    got = [
        (r["doc_id"], r["score"])
        for r in engine.more_like_this(doc_key, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp_rank]
    for (gd, gs), (ed, es) in zip(got, exp_rank):
        assert gs == pytest.approx(es, rel=1e-9), (gd, gs, es)
    assert src_engine_id not in [d for d, _ in got]


def test_mlt_term_knobs(engine):
    corpus = generate_documents(SPEC)
    row, doc_key, _ = _src(engine, corpus)
    # crank the floors until nothing survives -> empty result
    none = engine.more_like_this(
        doc_key, k=5, min_term_freq=10_000
    ).collect()
    assert none == []
    # max_query_terms=1 still returns similar docs
    one = engine.more_like_this(doc_key, k=5, max_query_terms=1).collect()
    assert 0 < len(one) <= 5


def test_mlt_unknown_doc_key(engine):
    assert engine.more_like_this("no-such-key", k=5).collect() == []


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_facet_counts_match_python(engine):
    corpus = generate_documents(SPEC)
    from collections import Counter

    want = Counter()
    for r in corpus.itertuples():
        if "get" in tokenize_lower(r.content):
            want[("repo", r.repo)] += 1
            want[("lang", r.lang)] += 1
    got = {
        (r["facet"], r["value"]): r["n_docs"]
        for r in engine.facet_counts("get").collect()
    }
    assert got == dict(want)
    # output ordered (facet, value)
    rows = [(r["facet"], r["value"]) for r in engine.facet_counts("get").collect()]
    assert rows == sorted(rows)


def test_suggest_matches_python(engine):
    corpus = generate_documents(SPEC)
    from collections import Counter

    df = Counter()
    for r in corpus.itertuples():
        df.update(set(tokenize_lower(r.content)))
    q = "stirng"
    cand = [
        (t, n, _lev(t, q)) for t, n in df.items() if _lev(t, q) <= 2
    ]
    cand.sort(key=lambda p: (p[2], -p[1], p[0]))
    got = [
        (r["term"], r["df"], r["distance"])
        for r in engine.suggest(q, k=5).collect()
    ]
    assert got == cand[:5]
    # the corpus's planted typo 'strng' sits at distance 1, the real
    # word 'string' at 2 — ranking is by distance first
    assert [t for t, _, _ in got[:2]] == ["strng", "string"]


def test_suggest_no_candidates(engine):
    assert engine.suggest("zzzzzzzzzzzz", k=5).collect() == []


def test_mlt_token_parse_cap(engine):
    corpus = generate_documents(SPEC)
    row, doc_key, _ = _src(engine, corpus)
    # capped parse = term selection over the doc PREFIX only: a cap of
    # 1 leaves a single token with tf=1, below min_term_freq=2 ->
    # provably empty regardless of corpus content
    assert (
        engine.more_like_this(doc_key, k=5, max_num_tokens_parsed=1).collect()
        == []
    )
    # a generous cap changes nothing for this short doc
    full = [
        r["doc_id"] for r in engine.more_like_this(doc_key, k=5).collect()
    ]
    wide = [
        r["doc_id"]
        for r in engine.more_like_this(
            doc_key, k=5, max_num_tokens_parsed=10**6
        ).collect()
    ]
    assert full == wide


def test_facet_top_values(engine):
    full = engine.facet_counts("get").collect()
    top1 = engine.facet_counts("get", top_values=1).collect()
    by_facet = {}
    for r in top1:
        by_facet.setdefault(r["facet"], []).append(r)
    assert all(len(v) == 1 for v in by_facet.values())
    # the survivor is the max-count value (ties: value asc)
    for facet, rows in by_facet.items():
        cand = [r for r in full if r["facet"] == facet]
        best = sorted(cand, key=lambda r: (-r["n_docs"], r["value"]))[0]
        assert rows[0]["value"] == best["value"]


def test_suggest_ngram_index_identical(engine):
    """The bigram candidate index is a LOSSLESS prefilter (a term
    within d edits shares >= |S_t| - 2d of the typo's distinct
    bigrams): output identical to the dictionary sweep for typos,
    short terms (threshold can't prune -> fallback), and absent
    terms."""
    queries = ["stirng", "strng", "ab", "zzzzzzzzzzzz", "getx"]
    base = {
        q: [tuple(r) for r in engine.suggest(q, k=5).collect()]
        for q in queries
    }
    engine.build_suggest_index()
    try:
        for q in queries:
            got = [tuple(r) for r in engine.suggest(q, k=5).collect()]
            assert got == base[q], q
    finally:
        # keep other tests on the fallback path regardless of order
        engine._suggest_idx = None


def test_mlt_text_equals_mlt_doc_on_same_content(engine):
    """more_like_text(stored content) must reproduce
    more_like_this(doc_key) exactly once the source doc (which only
    the doc variant excludes) is dropped: same tokens -> same tf ->
    same chosen terms -> same scored stream."""
    row = (
        engine.reader.docs.select("doc_id", "doc_key", "content")
        .orderBy("doc_id")
        .collect()[3]
    )
    by_doc = [
        (r["doc_id"], r["score"])
        for r in engine.more_like_this(row["doc_key"], k=10).collect()
    ]
    by_text = [
        (r["doc_id"], r["score"])
        for r in engine.more_like_text(row["content"], k=11).collect()
        if r["doc_id"] != row["doc_id"]
    ][:10]
    assert by_doc == by_text and by_doc


def test_mlt_text_empty_and_rare(engine):
    assert engine.more_like_text("").count() == 0
    # every token below min_term_freq=2 -> no candidate terms
    assert engine.more_like_text("unique words only once").count() == 0
