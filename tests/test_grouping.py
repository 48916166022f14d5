"""Two-pass grouped search (Lucene grouping module TopGroups) and
hierarchical facet drill-down (taxonomy facets / DrillDownQuery) —
pinned against brute-force pandas oracles over the same scored
stream."""

from __future__ import annotations

import pandas as pd
import pytest

from codeindex_spark.corpus import CorpusSpec, spark_documents
from codeindex_spark.index.build import IndexParams
from codeindex_spark.index.segments import IndexBuilder, IndexReader
from codeindex_spark.query.planner import Filters, SearchEngine

SPEC = CorpusSpec(n_docs=150)
PARAMS = IndexParams(num_buckets=16, block_size=32)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("grpidx"))
    docs = spark_documents(spark, SPEC, partitions=4)
    IndexBuilder(spark, d, PARAMS, n_groups=2).build(docs, resume=False)
    return SearchEngine(IndexReader(spark, d))


def _scored_with_meta(engine, query, fields):
    scored = engine.score(query).toPandas()
    meta = engine.reader.docs.select("doc_id", *fields).toPandas()
    return scored.merge(meta, on="doc_id")


def _brute_groups(df, group, tie, n_groups, per_group):
    heads = (
        df.groupby(group)
        .agg(group_hits=("doc_id", "size"), group_score=("score", "max"))
        .reset_index()
        .sort_values(
            ["group_score", group], ascending=[False, True], kind="mergesort"
        )
        .head(n_groups)
    )
    heads["group_rank"] = range(1, len(heads) + 1)
    sel = df.merge(heads, on=group)
    sel = sel.sort_values(
        ["score", tie], ascending=[False, True], kind="mergesort"
    )
    sel["doc_rank"] = sel.groupby(group, sort=False).cumcount() + 1
    sel = sel[sel["doc_rank"] <= per_group]
    return sel.sort_values(["group_rank", "doc_rank"], kind="mergesort")


@pytest.mark.parametrize("n_groups,per_group", [(3, 2), (5, 1), (2, 4)])
def test_search_groups_matches_bruteforce(engine, n_groups, per_group):
    q = "string OR return"
    got = engine.search_groups(
        q, "lang", n_groups=n_groups, per_group=per_group
    ).toPandas()
    exp = _brute_groups(
        _scored_with_meta(engine, q, ["lang", "path"]),
        "lang",
        "path",
        n_groups,
        per_group,
    )
    assert list(got["path"]) == list(exp["path"])
    assert list(got["group_rank"]) == list(exp["group_rank"])
    assert list(got["doc_rank"]) == list(exp["doc_rank"])
    assert list(got["group_hits"]) == list(exp["group_hits"])
    for g, e in zip(got["group_score"], exp["group_score"]):
        assert g == pytest.approx(e, rel=1e-12)
    for g, e in zip(got["score"], exp["score"]):
        assert g == pytest.approx(e, rel=1e-12)


def test_search_groups_group_invariants(engine):
    got = engine.search_groups(
        "index OR writer", "repo", n_groups=4, per_group=2
    ).toPandas()
    # at most n_groups groups, per_group docs each; ranks contiguous
    assert got["repo"].nunique() <= 4
    assert got.groupby("repo").size().max() <= 2
    assert set(got["group_rank"]) == set(
        range(1, got["repo"].nunique() + 1)
    )
    # the group's best kept doc carries the group_score
    best = got[got["doc_rank"] == 1]
    for _, r in best.iterrows():
        assert r["score"] == pytest.approx(r["group_score"], rel=1e-12)
    # group order: best score desc, repo asc
    heads = best.sort_values("group_rank")
    scores = list(heads["group_score"])
    assert scores == sorted(scores, reverse=True)


def test_search_groups_respects_filters(engine):
    q = "string OR return"
    got = engine.search_groups(
        q, "repo", n_groups=10, per_group=1, filters=Filters(lang="csharp")
    ).toPandas()
    df = _scored_with_meta(engine, q, ["repo", "path", "lang"])
    exp = _brute_groups(
        df[df["lang"] == "csharp"], "repo", "path", 10, 1
    )
    assert list(got["path"]) == list(exp["path"])


def test_search_groups_total_hits_is_full_group_count(engine):
    """group_hits counts ALL the group's matches, not just the kept
    per_group docs (TopGroups.totalGroupedHitCount semantics)."""
    q = "string"
    got = engine.search_groups(q, "lang", n_groups=2, per_group=1).toPandas()
    df = _scored_with_meta(engine, q, ["lang"])
    full = df.groupby("lang").size()
    for _, r in got.iterrows():
        assert r["group_hits"] == full[r["lang"]]


def _brute_path_children(df, under, top=None):
    parts = df["path"].str.split("/")
    prefix = [p for p in under.split("/") if p] if under else []
    d = len(prefix)
    keep = parts.apply(
        lambda ps: len(ps) > d and list(ps[:d]) == prefix
    )
    child = parts[keep].apply(lambda ps: ps[d])
    out = (
        child.value_counts()
        .rename_axis("child")
        .reset_index(name="n_docs")
        .sort_values(["n_docs", "child"], ascending=[False, True])
    )
    return out.head(top) if top is not None else out


def test_facet_path_counts_top_level(engine):
    q = "string OR return"
    got = engine.facet_path_counts(q).toPandas()
    exp = _brute_path_children(_scored_with_meta(engine, q, ["path"]), "")
    assert list(got["child"]) == list(exp["child"])
    assert list(got["n_docs"]) == list(exp["n_docs"])
    # corpus paths are src/<pkg>/<file> — the only top-level child
    assert list(got["child"]) == ["src"]


def test_facet_path_counts_drilldown(engine):
    q = "string OR return"
    got = engine.facet_path_counts(q, under="src").toPandas()
    exp = _brute_path_children(_scored_with_meta(engine, q, ["path"]), "src")
    assert list(got["child"]) == list(exp["child"])
    assert list(got["n_docs"]) == list(exp["n_docs"])
    # drill one deeper into the biggest package: children are leaves,
    # each counted once
    pkg = got["child"].iloc[0]
    leaves = engine.facet_path_counts(q, under=f"src/{pkg}").toPandas()
    expl = _brute_path_children(
        _scored_with_meta(engine, q, ["path"]), f"src/{pkg}"
    )
    assert list(leaves["child"]) == list(expl["child"])
    assert (leaves["n_docs"] == 1).all()
    assert len(leaves) == got.set_index("child").loc[pkg, "n_docs"]


def test_facet_path_counts_top_values_and_filters(engine):
    q = "string OR return"
    got = engine.facet_path_counts(q, under="src", top_values=3).toPandas()
    exp = _brute_path_children(
        _scored_with_meta(engine, q, ["path"]), "src", top=3
    )
    assert list(got["child"]) == list(exp["child"])
    assert len(got) <= 3
    flt = engine.facet_path_counts(
        q, under="src", filters=Filters(lang="csharp")
    ).toPandas()
    df = _scored_with_meta(engine, q, ["path", "lang"])
    expf = _brute_path_children(df[df["lang"] == "csharp"], "src")
    assert list(flt["child"]) == list(expf["child"])
    assert list(flt["n_docs"]) == list(expf["n_docs"])


def test_search_groups_null_group_excluded(spark, tmp_path_factory):
    """A NULL group value must not claim a top-n_groups slot (the
    pass-2 equi-join could never retrieve its docs, leaving a rank
    gap) — null-group docs are excluded, ranks stay contiguous."""
    d = str(tmp_path_factory.mktemp("nullgrp"))
    docs = spark_documents(spark, CorpusSpec(n_docs=60), partitions=2)
    IndexBuilder(spark, d, PARAMS, n_groups=1).build(docs, resume=False)
    reader = IndexReader(spark, d)
    # null out one lang value in the stored docs projection (docs is
    # a read-only property — wrap the reader)
    import pyspark.sql.functions as F

    nulled = reader.docs.withColumn(
        "lang",
        F.when(F.col("lang") == "python", F.lit(None)).otherwise(
            F.col("lang")
        ),
    )

    class _NulledReader:
        def __init__(self, inner, docs_df):
            self._inner, self._docs = inner, docs_df

        def __getattr__(self, name):
            return getattr(self._inner, name)

        @property
        def docs(self):
            return self._docs

    eng = SearchEngine(_NulledReader(reader, nulled))
    got = eng.search_groups(
        "string OR return", "lang", n_groups=10, per_group=2
    ).toPandas()
    assert got["lang"].notna().all()
    assert "python" not in set(got["lang"])
    n = got["lang"].nunique()
    assert sorted(set(got["group_rank"])) == list(range(1, n + 1))


def test_facet_path_counts_no_child_at_depth(engine):
    """A prefix that IS a full path has no children — empty, not an
    error; an unknown prefix is empty too."""
    df = _scored_with_meta(engine, "string", ["path"])
    full = df["path"].iloc[0]
    assert engine.facet_path_counts("string", under=full).count() == 0
    assert engine.facet_path_counts("string", under="nosuch").count() == 0
