"""Percolation (reverse search — the Lucene Monitor operation):
match sets must equal the REAL engine's match sets per query, the
presearcher must never lose a match, and the same call must work
unchanged over Structured Streaming micro-batches."""

from __future__ import annotations

import pytest

from codeindex_spark.corpus import CorpusSpec, spark_documents
from codeindex_spark.index.build import IndexParams
from codeindex_spark.index.segments import IndexBuilder, IndexReader
from codeindex_spark.query import ast
from codeindex_spark.query.percolate import (
    QueryRegistry,
    percolate,
    required_any,
)
from codeindex_spark.query.planner import SearchEngine

SPEC = CorpusSpec(n_docs=120)
PARAMS = IndexParams(num_buckets=8, block_size=32)

REGISTRY = {
    "term": "get",
    "band": "index AND writer",
    "bornot": "string OR return NOT get",
    "phrase": ast.parse_phrase_query("add documents"),
    "wild": "stri*",
    "fuzzy": "strng~2",
    "regexp": "/st.*/",
    "msm": ast.Bool(
        should=(ast.Term("string"), ast.Term("return"), ast.Term("get")),
        min_should_match=2,
    ),
    "spanfirst": ast.SpanFirst("public", end=3),
    "fname": "filename:indexbuilder",
    "nomatch": "zzzznotaterm",
}


@pytest.fixture(scope="module")
def corpus(spark):
    return spark_documents(spark, SPEC, partitions=4).cache()


@pytest.fixture(scope="module")
def engine(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pcidx"))
    IndexBuilder(spark, d, PARAMS, n_groups=2).build(corpus, resume=False)
    return SearchEngine(IndexReader(spark, d))


def _engine_match_paths(engine, query):
    scored = engine.score(
        ast.parse_query(query) if isinstance(query, str) else query
    )
    paths = scored.join(
        engine.reader.docs.select("doc_id", "path"), "doc_id"
    ).select("path")
    return {r["path"] for r in paths.collect()}


@pytest.fixture(scope="module")
def perc_pairs(corpus):
    out = percolate(
        corpus,
        REGISTRY,
        id_col="path",
        text_col="content",
        path_col="path",
    ).collect()
    pairs: dict[str, set] = {}
    for r in out:
        pairs.setdefault(r["query_id"], set()).add(r["path"])
    return pairs


@pytest.mark.parametrize("qid", sorted(REGISTRY))
def test_percolate_equals_engine_match_set(engine, perc_pairs, qid):
    exp = _engine_match_paths(engine, REGISTRY[qid])
    got = perc_pairs.get(qid, set())
    assert got == exp, (
        f"{qid}: {len(got)} percolated vs {len(exp)} engine matches; "
        f"only-perc={sorted(got - exp)[:3]} only-eng={sorted(exp - got)[:3]}"
    )


def test_some_queries_actually_match(perc_pairs):
    # guard against a vacuous suite: the fixture corpus must exercise
    # most registered shapes
    non_empty = [q for q, s in perc_pairs.items() if s]
    assert len(non_empty) >= 8, non_empty
    assert "nomatch" not in perc_pairs


def test_presearcher_required_any():
    n = ast.parse_query("index AND writer")
    s = required_any(n)
    assert s is not None and len(s) == 1  # smallest child anchor
    assert required_any(ast.parse_query("stri*")) is None
    # OR with a pattern arm cannot be term-filtered
    assert required_any(ast.parse_query("get OR stri*")) is None
    assert required_any(ast.parse_query("get OR put")) == frozenset(
        {("content", "get"), ("content", "put")}
    )
    # NOT filters on the positive side only
    assert required_any(ast.parse_query("get NOT stri*")) == frozenset(
        {("content", "get")}
    )
    # AND of patterns anchored by one plain term
    assert required_any(ast.parse_query("stri* AND get")) == frozenset(
        {("content", "get")}
    )
    # phrase: smallest plain slot
    assert required_any(ast.parse_phrase_query("add documents")) in (
        frozenset({("content", "add")}),
        frozenset({("content", "documents")}),
    )
    # pure-negative Bool: empty set never intersects (match-nothing)
    assert (
        required_any(ast.Bool(must_not=(ast.Term("x"),))) == frozenset()
    )


def test_registry_field_collection_and_path_guard(corpus):
    reg = QueryRegistry({"f": "filename:indexbuilder"})
    assert "file_name" in reg.fields
    with pytest.raises(ValueError, match="path_col"):
        percolate(corpus, reg, id_col="path", text_col="content")


def test_percolate_streaming_equals_batch(spark, corpus, tmp_path):
    src = str(tmp_path / "stream_src")
    corpus.write.parquet(src)
    sub = {k: REGISTRY[k] for k in ("term", "band", "phrase", "wild")}
    stream = (
        spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = percolate(
        stream, sub, id_col="path", text_col="content", path_col="path"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("perc_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["path"], r["query_id"])
        for r in spark.sql("select * from perc_stream").collect()
    }
    exp = {
        (r["path"], r["query_id"])
        for r in percolate(
            corpus, sub, id_col="path", text_col="content", path_col="path"
        ).collect()
    }
    assert got == exp and got


def test_percolate_case_sensitive_registry(engine, corpus):
    """A case_sensitive registry routes to the content_cs twin field
    — match sets must equal the engine's case-sensitive search, and
    differ from the lowercase route where casing matters."""
    reg = QueryRegistry({"cs": "LucenePool"}, case_sensitive=True)
    got = {
        r["path"]
        for r in percolate(
            corpus, reg, id_col="path", text_col="content", path_col="path"
        ).collect()
    }
    exp_node = ast.parse_query("LucenePool", case_sensitive=True)
    exp = _engine_match_paths(engine, exp_node)
    assert got == exp and got
    # lowercase query against the cased field matches nothing here
    reg2 = QueryRegistry({"cs": "lucenepool"}, case_sensitive=True)
    assert (
        percolate(
            corpus, reg2, id_col="path", text_col="content", path_col="path"
        ).count()
        == 0
    )


def test_percolate_indexed_equals_broadcast(spark, corpus):
    """The query-index scale path must produce exactly the broadcast
    path's (doc, query) pairs — anchored queries via the vocabulary
    join, pattern-only queries via the always-evaluate union."""
    from codeindex_spark.query.percolate import percolate_indexed

    string_registry = {
        k: v for k, v in REGISTRY.items() if isinstance(v, str)
    }
    qdf = spark.createDataFrame(
        list(string_registry.items()), "query_id string, query string"
    )
    got = {
        (r["path"], r["query_id"])
        for r in percolate_indexed(
            corpus, qdf, id_col="path", text_col="content",
            path_col="path",
        ).collect()
    }
    exp = {
        (r["path"], r["query_id"])
        for r in percolate(
            corpus, string_registry, id_col="path", text_col="content",
            path_col="path",
        ).collect()
    }
    assert got == exp and got
    # the registry includes pattern-only (wild/fuzzy/regexp) and
    # anchored shapes — both routes must be exercised
    qids = {q for _, q in got}
    assert "wild" in qids and "band" in qids


def test_percolate_indexed_match_nothing_query(spark, corpus):
    from codeindex_spark.query.percolate import percolate_indexed

    qdf = spark.createDataFrame(
        [("t", "get"), ("none", "zzzznotaterm")],
        "query_id string, query string",
    )
    got = percolate_indexed(
        corpus, qdf, id_col="path", text_col="content", path_col="path"
    )
    qids = {r["query_id"] for r in got.collect()}
    assert qids == {"t"}


def test_percolate_indexed_null_text(spark):
    """Null/NaN text cells must be treated as empty docs, not crash
    the vocabulary or evaluate kernels."""
    from codeindex_spark.query.percolate import percolate_indexed

    docs = spark.createDataFrame(
        [(1, "get string get"), (2, None), (3, "other words")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [("t", "get")], "query_id string, query string"
    )
    got = {
        (r["doc_id"], r["query_id"])
        for r in percolate_indexed(
            docs, qdf, id_col="doc_id", text_col="text"
        ).collect()
    }
    assert got == {(1, "t")}
