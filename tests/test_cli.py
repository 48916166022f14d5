"""CLI surface (spark-submit deployment analog): build, search,
grep (substring/regex/lines), hints, stats driven through main()."""

from __future__ import annotations

import json

import pytest

from codeindex_spark.cli import main
from codeindex_spark.corpus import CorpusSpec, spark_documents


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cliidx")
    docs_pq = str(root / "docs")
    spark_documents(spark, CorpusSpec(n_docs=60), partitions=2).write.parquet(
        docs_pq
    )
    index = str(root / "index")
    rc = main(
        [
            "build",
            "--input", docs_pq,
            "--index", index,
            "--num-buckets", "16",
            "--groups", "1",
            "--with-content-trigram",
            "--no-resume",
        ]
    )
    assert rc == 0
    return index


def _lines(capsys):
    return [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.startswith("{")
    ]


def test_cli_search(idx, capsys):
    assert main(["search", "--index", idx, "--query", "get AND string", "-k", "5"]) == 0
    rows = _lines(capsys)
    assert rows and all({"doc_id", "score", "repo", "path"} <= set(r) for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_cli_grep_modes(idx, capsys):
    assert main(["grep", "--index", idx, "--pattern", "ng str", "--limit", "3"]) == 0
    assert len(_lines(capsys)) == 3
    assert main(
        ["grep", "--index", idx, "--pattern", "get [a-z]+ string",
         "--regex", "--limit", "2"]
    ) == 0
    assert len(_lines(capsys)) == 2
    assert main(
        ["grep", "--index", idx, "--pattern", "ng str", "--lines", "--limit", "4"]
    ) == 0
    rows = _lines(capsys)
    assert len(rows) == 4 and all({"path", "line", "text"} <= set(r) for r in rows)
    assert all("ng str" in r["text"].lower() for r in rows)


def test_cli_grep_counts(idx, capsys):
    assert main(
        ["grep", "--index", idx, "--pattern", "string", "--counts",
         "--limit", "5"]
    ) == 0
    rows = _lines(capsys)
    assert rows and all("n_matches" in r for r in rows)
    counts = [r["n_matches"] for r in rows]
    assert counts == sorted(counts, reverse=True) and counts[0] >= 1


def test_path_substring_filters(idx, spark):
    from codeindex_spark.index.segments import IndexReader
    from codeindex_spark.query.planner import Filters, SearchEngine

    eng = SearchEngine(IndexReader(spark, idx))
    allr = eng.search_path_substring("src/")
    py = eng.search_path_substring("src/", filters=Filters(file_ext="py"))
    assert 0 < py.count() < allr.count()
    assert all(r["path"].endswith(".py") for r in py.collect())


def test_cli_grep_refusal(idx):
    with pytest.raises(ValueError, match="required literal"):
        main(
            ["grep", "--index", idx, "--pattern", "a|b", "--regex",
             "--no-scan-fallback"]
        )
    with pytest.raises(ValueError, match="required literal"):
        main(
            ["grep", "--index", idx, "--pattern", "a|b", "--regex",
             "--lines", "--no-scan-fallback"]
        )


def test_cli_hints_and_stats(idx, capsys):
    assert main(["hints", "--index", idx, "--prefix", "stri"]) == 0
    words = capsys.readouterr().out.split()
    assert words and all(w.startswith("stri") for w in words)
    assert main(["stats", "--index", idx]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["n_docs"] == 60
    assert "content_trigram" in out["fields"]
    assert out["fields"]["content"]["n_terms"] > 0
    assert out["bytes"]["postings"] > 0


def test_cli_dedup(spark, tmp_path, capsys):
    import json as _json

    from codeindex_spark.cli import main

    a = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [(0, a), (1, a), (2, a + " eta"), (5, "totally different words here")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs_pq")
    docs.write.parquet(src)
    out = str(tmp_path / "verdict_pq")
    rc = main(["dedup", "--input", src, "--out", out])
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # {0,1,2} merge (exact 0/1 + near 2), 5 alone -> 2 keepers
    assert summary["n_docs"] == 4
    assert summary["n_keep"] == 2 and summary["n_components"] == 2
    rows = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert rows[0]["keep"] and rows[5]["keep"]
    assert not rows[1]["keep"] and not rows[2]["keep"]


def test_cli_mlt(idx, capsys):
    # resolve a real path from the index, then rank its neighbours
    from codeindex_spark.corpus import CorpusSpec, generate_documents

    path = generate_documents(CorpusSpec(n_docs=60)).iloc[7]["path"]
    assert main(["mlt", "--index", idx, "--path", path, "-k", "5"]) == 0
    rows = _lines(capsys)
    assert 0 < len(rows) <= 5
    assert all({"doc_id", "score", "repo", "path"} <= set(r) for r in rows)
    assert all(r["path"] != path for r in rows)  # source excluded
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # unknown key exits non-zero with a JSON error
    assert main(["mlt", "--index", idx, "--path", "nope.txt"]) == 1
    assert "error" in _lines(capsys)[0]


def test_cli_select(spark, tmp_path, capsys):
    import json as _json

    raw = spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "def main return values"),
            (2, "the dog ran home"),
            (3, "import os path join"),
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "def parse return result"), (101, "import sys path split")],
        "doc_id long, text string",
    )
    src, tgt = str(tmp_path / "raw_pq"), str(tmp_path / "tgt_pq")
    raw.write.parquet(src)
    target.write.parquet(tgt)
    out = str(tmp_path / "sel_pq")
    rc = main(
        ["select", "--input", src, "--target", tgt, "-k", "2",
         "--buckets", "64", "--temperature", "1e-9", "--out", out]
    )
    assert rc == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_selected"] == 2
    assert summary["min_log_weight"] <= summary["max_log_weight"]
    # cold temperature = deterministic top-2 by weight = the code docs
    picked = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert picked == [1, 3]


def test_cli_search_collapse_and_sort(idx, capsys):
    assert main(
        ["search", "--index", idx, "--query", "get OR string",
         "--collapse", "lang", "--per-group", "2", "-k", "8"]
    ) == 0
    rows = _lines(capsys)
    assert rows and all({"doc_id", "score", "lang", "path"} <= set(r) for r in rows)
    langs = {}
    for r in rows:
        langs[r["lang"]] = langs.get(r["lang"], 0) + 1
    assert max(langs.values()) <= 2
    assert main(
        ["search", "--index", idx, "--query", "get AND string",
         "--sort-by", "lang,path:desc", "-k", "6"]
    ) == 0
    rows = _lines(capsys)
    assert rows
    keys = [(r["lang"], tuple(-ord(c) for c in r["path"])) for r in rows]
    assert keys == sorted(keys)


def test_cli_topterms(idx, capsys):
    assert main(["topterms", "--index", idx, "-n", "7"]) == 0
    rows = _lines(capsys)
    assert len(rows) == 7
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)


def test_cli_percolate(spark, tmp_path, capsys):
    docs_pq = str(tmp_path / "pdocs")
    spark_documents(spark, CorpusSpec(n_docs=40), partitions=2).write.parquet(
        docs_pq
    )
    qf = tmp_path / "queries.json"
    qf.write_text(json.dumps({"g": "get", "gs": "get AND string"}))
    assert main(
        ["percolate", "--input", docs_pq, "--queries", str(qf),
         "--id-col", "path", "--text-col", "content"]
    ) == 0
    rows = _lines(capsys)
    assert rows and {r["query_id"] for r in rows} <= {"g", "gs"}
    # AND matches are a subset of the single-term matches
    g = {r["path"] for r in rows if r["query_id"] == "g"}
    gs = {r["path"] for r in rows if r["query_id"] == "gs"}
    assert gs <= g and g
