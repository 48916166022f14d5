"""Collapsed (grouped) search, field-sorted search, and top-terms —
the Lucene grouping / Sort / HighFreqTerms surfaces — pinned against
brute-force pandas oracles over the same scored stream and against
the pure-Python OracleIndex term stats."""

from __future__ import annotations

import pandas as pd
import pytest

from codeindex_spark.corpus import (
    CorpusSpec,
    generate_documents,
    spark_documents,
)
from codeindex_spark.index.build import IndexParams
from codeindex_spark.index.segments import IndexBuilder, IndexReader
from codeindex_spark.query.oracle import OracleIndex
from codeindex_spark.query.planner import Filters, SearchEngine

SPEC = CorpusSpec(n_docs=150)
PARAMS = IndexParams(num_buckets=16, block_size=32)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("csidx"))
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


def _scored_with_meta(engine, query, fields):
    scored = engine.score(query).toPandas()
    meta = engine.reader.docs.select("doc_id", *fields).toPandas()
    return scored.merge(meta, on="doc_id")


def _brute_collapse(df, group, tie, per_group, k):
    df = df.sort_values(
        ["score", tie], ascending=[False, True], kind="mergesort"
    )
    best = df.groupby(group, sort=False).head(per_group)
    return best.sort_values(
        ["score", tie], ascending=[False, True], kind="mergesort"
    ).head(k)


@pytest.mark.parametrize("per_group", [1, 2, 3])
def test_collapse_matches_bruteforce(engine, per_group):
    q = "string OR return"
    got = engine.search_collapse(
        q, "lang", k=25, per_group=per_group
    ).toPandas()
    exp = _brute_collapse(
        _scored_with_meta(engine, q, ["lang", "path"]),
        "lang",
        "path",
        per_group,
        25,
    )
    assert list(got["path"]) == list(exp["path"])
    for g, e in zip(got["score"], exp["score"]):
        assert g == pytest.approx(e, rel=1e-12)
    # the collapse invariant itself
    assert got.groupby("lang").size().max() <= per_group


def test_collapse_group_by_repo_tie_by_path(engine):
    q = "index AND writer"
    got = engine.search_collapse(q, "repo", k=10, per_group=1).toPandas()
    exp = _brute_collapse(
        _scored_with_meta(engine, q, ["repo", "path"]),
        "repo",
        "path",
        1,
        10,
    )
    assert list(got["path"]) == list(exp["path"])
    assert got["repo"].is_unique


def test_collapse_respects_filters(engine):
    q = "string OR return"
    flt = Filters(lang="csharp")
    got = engine.search_collapse(
        q, "repo", k=20, per_group=2, filters=flt
    ).toPandas()
    df = _scored_with_meta(engine, q, ["repo", "path", "lang"])
    exp = _brute_collapse(
        df[df["lang"] == "csharp"], "repo", "path", 2, 20
    )
    assert list(got["path"]) == list(exp["path"])


def test_collapse_k_caps_output(engine):
    got = engine.search_collapse("string", "lang", k=3, per_group=5)
    assert got.count() == 3


def test_search_sorted_matches_bruteforce(engine):
    q = "index AND writer"
    sort = [("lang", "asc"), ("path", "desc")]
    got = engine.search_sorted(q, sort, k=20).toPandas()
    df = _scored_with_meta(engine, q, ["lang", "path"])
    exp = df.sort_values(
        ["lang", "path", "doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
    ).head(20)
    assert list(got["doc_id"]) == list(exp["doc_id"])
    for g, e in zip(got["score"], exp["score"]):
        assert g == pytest.approx(e, rel=1e-12)


def test_search_sorted_score_field_equals_search(engine):
    """sort=[("score","desc")] reproduces the default relevance
    ranking exactly (same implicit docID tie-break as search())."""
    q = "string OR return"
    got = [
        (r["doc_id"], r["score"])
        for r in engine.search_sorted(q, [("score", "desc")], k=30).collect()
    ]
    exp = [
        (r["doc_id"], r["score"]) for r in engine.search(q, k=30).collect()
    ]
    assert got == exp


def test_search_sorted_without_score(engine):
    got = engine.search_sorted(
        "string", [("path", "asc")], k=5, with_score=False
    )
    assert "score" not in got.columns
    assert got.count() == 5


def test_top_terms_matches_oracle(engine, oracle):
    got = [
        (r["term"], r["df"], r["cf"])
        for r in engine.top_terms("content", n=30).collect()
    ]
    post = oracle.postings["content"]
    exp = sorted(
        (
            (t, len(docs), sum(len(p) for p in docs.values()))
            for t, docs in post.items()
        ),
        key=lambda r: (-r[1], r[0]),
    )[:30]
    assert got == exp


def test_top_terms_field_scoped(engine, oracle):
    """file_name field stats differ from content — directory pruning
    must scope the slice to the requested field."""
    got = [
        (r["term"], r["df"]) for r in engine.top_terms("file_name", n=10).collect()
    ]
    post = oracle.postings["file_name"]
    exp = sorted(
        ((t, len(docs)) for t, docs in post.items()),
        key=lambda r: (-r[1], r[0]),
    )[:10]
    assert got == exp


@pytest.mark.parametrize("mode", ["max", "total", "avg", "min"])
def test_join_to_parent_matches_bruteforce(engine, mode):
    q = "string OR return"
    got = engine.join_to_parent(q, "repo", score_mode=mode, k=50).toPandas()
    df = _scored_with_meta(engine, q, ["repo"])
    agg = {"max": "max", "total": "sum", "avg": "mean", "min": "min"}[mode]
    exp = (
        df.groupby("repo")
        .agg(score=("score", agg), n_children=("doc_id", "size"))
        .reset_index()
        .sort_values(["score", "repo"], ascending=[False, True])
    )
    assert list(got["repo"]) == list(exp["repo"])
    for g, e in zip(got["score"], exp["score"]):
        assert g == pytest.approx(e, rel=1e-9)
    assert list(got["n_children"]) == list(exp["n_children"])


def test_join_to_parent_none_mode_and_validation(engine):
    got = engine.join_to_parent(
        "string", "lang", score_mode="none", k=10
    ).toPandas()
    assert (got["score"] == 0.0).all()
    # none-mode order degenerates to parent asc (all scores equal)
    assert list(got["lang"]) == sorted(got["lang"])
    with pytest.raises(ValueError, match="score_mode"):
        engine.join_to_parent("string", "lang", score_mode="bogus")


@pytest.mark.parametrize("mode", ["max", "total", "avg", "min"])
def test_join_from_query_matches_bruteforce(engine, mode):
    """JoinUtil.createJoinQuery semantics: docs whose repo carries an
    aggregated from-query score — including docs that do NOT match
    the from-query themselves."""
    q = "index AND writer"
    got = engine.join_from_query(q, "repo", score_mode=mode, k=500).toPandas()
    df = _scored_with_meta(engine, q, ["repo"])
    agg = {"max": "max", "total": "sum", "avg": "mean", "min": "min"}[mode]
    vals = df.groupby("repo")["score"].agg(agg)
    meta = engine.reader.docs.select("doc_id", "repo", "path").toPandas()
    exp = meta[meta["repo"].isin(vals.index)].copy()
    exp["score"] = exp["repo"].map(vals)
    exp = exp.sort_values(
        ["score", "path"], ascending=[False, True], kind="mergesort"
    ).head(500)
    assert list(got["path"]) == list(exp["path"])
    for g, e in zip(got["score"], exp["score"]):
        assert g == pytest.approx(e, rel=1e-9)
    # the to-side includes non-matching docs of joined repos
    assert len(got) > df["doc_id"].nunique() or len(got) == len(exp)


def test_join_from_query_cross_field(engine):
    """from_field != to_field with DIFFERENT column names: the
    from-side collects lang values, the to-side matches them against
    a distinct lang2 column (same value domain, different name) —
    exercising genuine fromField/toField name resolution."""
    import pyspark.sql.functions as F

    base = engine.reader.docs

    class _Lang2Reader:
        def __init__(self, inner):
            self._inner = inner

        def __getattr__(self, name):
            return getattr(self._inner, name)

        @property
        def docs(self):
            return base.withColumn("lang2", F.col("lang"))

    eng2 = SearchEngine(_Lang2Reader(engine.reader))
    q = "index AND writer"
    got = eng2.join_from_query(
        q, "lang", to_field="lang2", score_mode="total", k=1000
    ).toPandas()
    assert "lang2" in got.columns and "lang" not in got.columns
    df = _scored_with_meta(engine, q, ["lang"])
    vals = df.groupby("lang")["score"].sum()
    meta = engine.reader.docs.select("doc_id", "lang").toPandas()
    assert set(got["doc_id"]) == set(
        meta[meta["lang"].isin(vals.index)]["doc_id"]
    )
    for _, r in got.iterrows():
        assert r["score"] == pytest.approx(vals[r["lang2"]], rel=1e-9)


def test_join_from_query_filters_restrict_to_side(engine):
    """Filters narrow BOTH sides: the from-query match set and the
    returned docs (py files in repos containing a py match)."""
    q = "string OR return"
    flt = Filters(lang="csharp")
    got = engine.join_from_query(
        q, "repo", score_mode="max", k=5000, filters=flt
    ).toPandas()
    df = _scored_with_meta(engine, q, ["repo", "lang"])
    matched = df[df["lang"] == "csharp"]
    vals = matched.groupby("repo")["score"].max()
    meta = engine.reader.docs.select("doc_id", "repo", "lang").toPandas()
    exp = meta[meta["repo"].isin(vals.index) & (meta["lang"] == "csharp")]
    assert set(got["doc_id"]) == set(exp["doc_id"])


def test_join_from_query_none_mode_and_validation(engine):
    got = engine.join_from_query(
        "string", "lang", score_mode="none", k=20
    ).toPandas()
    assert (got["score"] == 0.0).all()
    # none-mode order degenerates to tie-field asc
    assert list(got["path"]) == sorted(got["path"])
    with pytest.raises(ValueError, match="score_mode"):
        engine.join_from_query("string", "lang", score_mode="bogus")


def test_index_stats_matches_oracle(engine, oracle):
    rows = {
        r["field"]: r
        for r in engine.index_stats(["content", "file_name"]).collect()
    }
    assert set(rows) == {"content", "file_name"}
    for fld, r in rows.items():
        n_docs, avgdl = oracle.stats[fld]
        post = oracle.postings[fld]
        assert r["n_docs"] == n_docs
        assert r["avgdl"] == pytest.approx(avgdl, rel=1e-12)
        assert r["n_terms"] == len(post)
        assert r["sum_df"] == sum(len(d) for d in post.values())
        assert r["sum_cf"] == sum(
            len(p) for d in post.values() for p in d.values()
        )
