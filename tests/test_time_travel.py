"""Snapshot time travel over the incremental index: reader(as_of=k)
reproduces the exact query results the engine returned right after
the k-th apply — scores included — after later applies land."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from codeindex_spark.corpus import CorpusSpec, generate_documents
from codeindex_spark.index.build import IndexParams
from codeindex_spark.query.planner import SearchEngine
from codeindex_spark.streaming.maintain import IncrementalIndex

PARAMS = IndexParams(num_buckets=8, block_size=32)
QUERY = "def"  # common token present across the synthetic corpus


def _results(eng, query):
    return sorted(
        (r["doc_id"], round(r["score"], 9))
        for r in eng.search(query, k=50).collect()
    )


@pytest.fixture(scope="module")
def tt(spark, tmp_path_factory):
    v1 = generate_documents(CorpusSpec(n_docs=30))
    root = str(tmp_path_factory.mktemp("ttidx"))
    inc = IncrementalIndex(spark, root, PARAMS, n_groups=1)
    inc.build_base(spark.createDataFrame(v1))
    snap0 = {
        "q": _results(SearchEngine(inc.reader()), QUERY),
        "live": inc.live_docs().count(),
    }

    # apply 1: replace doc 2 (new commit) + add a brand-new doc
    v2 = v1.copy()
    v2.loc[2, "content"] = "replacement snapshotterm content here"
    v2.loc[2, "commit"] = "cnewcommit0tt"
    v2 = pd.concat(
        [
            v2,
            pd.DataFrame(
                [
                    {
                        "repo": "repo997",
                        "path": "src/new/Travel_997.py",
                        "commit": "ctravel000001",
                        "lang": "python",
                        "content": "snapshotterm appears again here",
                    }
                ]
            ),
        ],
        ignore_index=True,
    )
    inc.apply_snapshot(spark.createDataFrame(v2))
    eng1 = SearchEngine(inc.reader())
    snap1 = {
        "q": _results(eng1, QUERY),
        "new": _results(eng1, "snapshotterm"),
        "live": inc.live_docs().count(),
    }

    # apply 2: delete one original path
    v3 = v2.drop(index=5).reset_index(drop=True)
    inc.apply_snapshot(spark.createDataFrame(v3))
    return inc, snap0, snap1


def test_epoch_records(tt):
    inc, _s0, _s1 = tt
    assert inc.n_applies() == 2
    segs = inc.segments()
    assert [s["epoch"] for s in segs] == [0, 1]
    tomb = inc.spark.read.parquet(inc._tomb_dir)
    assert set(r["epoch"] for r in tomb.select("epoch").collect()) == {1, 2}


def test_as_of_zero_is_base(tt, spark):
    inc, snap0, _ = tt
    eng = SearchEngine(inc.reader(as_of=0))
    assert _results(eng, QUERY) == snap0["q"]
    assert inc.live_docs(as_of=0).count() == snap0["live"]
    # the later-added term does not exist at epoch 0
    assert eng.search("snapshotterm", k=10).count() == 0


def test_as_of_one_reproduces_pre_delete_state(tt):
    inc, _snap0, snap1 = tt
    eng = SearchEngine(inc.reader(as_of=1))
    assert _results(eng, QUERY) == snap1["q"]
    assert _results(eng, "snapshotterm") == snap1["new"]
    assert inc.live_docs(as_of=1).count() == snap1["live"]


def test_as_of_latest_equals_default(tt):
    inc, _s0, _s1 = tt
    latest = _results(SearchEngine(inc.reader()), QUERY)
    assert _results(SearchEngine(inc.reader(as_of=2)), QUERY) == latest
    # beyond-latest epochs clamp to everything (prefix filter)
    assert _results(SearchEngine(inc.reader(as_of=99)), QUERY) == latest


def test_as_of_validation(tt):
    inc, _s0, _s1 = tt
    with pytest.raises(ValueError):
        inc.live_docs(as_of=-1)


def test_live_doc_counts_per_epoch(tt):
    inc, snap0, snap1 = tt
    n0 = inc.live_docs(as_of=0).count()
    n1 = inc.live_docs(as_of=1).count()
    n2 = inc.live_docs(as_of=2).count()
    assert (n0, n1) == (snap0["live"], snap1["live"])
    assert n1 == n0 + 1  # replacement stays 1:1, one brand-new doc
    assert n2 == n1 - 1  # one delete


def test_count_respects_tombstones(tt):
    """engine.count must route a lone Term through the match stream
    (not the dictionary df) when the reader carries tombstones: the
    stacked reader's summed df counts replaced/deleted versions, so
    the short circuit would overcount. Pin count == search row count
    at every epoch."""
    inc, _s0, _s1 = tt
    from codeindex_spark.query.ast import Term

    for epoch in (0, 1, 2):
        eng = SearchEngine(inc.reader(as_of=epoch))
        n = eng.count(Term(QUERY))
        assert n == eng.search(QUERY, k=10_000).count()
