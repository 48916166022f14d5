"""Content substring + regex search via the opt-in content_trigram
field (Cox trigram-index / Zoekt design, public). Results must be
EXACTLY the brute-force contains()/rlike() answer — the trigram
intersection is a prefilter, never a semantics change — and provably
absent needles must short-circuit without a corpus scan.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from codeindex_spark.corpus import CorpusSpec, generate_documents, spark_documents
from codeindex_spark.index.build import (
    CONTENT_TRIGRAM_FIELDS,
    IndexParams,
)
from codeindex_spark.index.segments import IndexBuilder, IndexReader
from codeindex_spark.query.planner import SearchEngine, required_literals

SPEC = CorpusSpec(n_docs=120)
PARAMS = IndexParams(
    num_buckets=16, block_size=32, fields=CONTENT_TRIGRAM_FIELDS
)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("trigram_idx"))
    docs = spark_documents(spark, SPEC, partitions=4)
    IndexBuilder(spark, d, PARAMS, n_groups=2).build(docs, resume=False)
    return SearchEngine(IndexReader(spark, d))


@pytest.fixture(scope="module")
def pdocs():
    return generate_documents(SPEC)


def _expected_substring(pdocs, needle: str) -> set[str]:
    return {
        r["path"]
        for r in pdocs.to_dict("records")
        if needle.lower() in r["content"].lower()
    }


def _got_paths(df) -> set[str]:
    return {r["path"] for r in df.select("path").collect()}


# needles: single word, cross-word substring (space inside), mid-word
# fragment, a 3-char minimum, and one absent from every doc
NEEDLES = ["string", "ng str", "tringi", "resultsand"]


@pytest.mark.parametrize("needle", NEEDLES)
def test_content_substring_matches_bruteforce(engine, pdocs, needle):
    exp = _expected_substring(pdocs, needle)
    got = _got_paths(engine.search_content_substring(needle))
    assert got == exp
    assert exp, f"fixture needle {needle!r} matched nothing — dead test"


def test_content_substring_absent_short_circuits(engine, pdocs):
    # 'zzxqj' trigrams aren't in the dictionary: the cached lookup
    # proves absence; result is empty and no candidate AND runs
    out = engine.search_content_substring("zzxqjq")
    assert out.count() == 0
    assert _expected_substring(pdocs, "zzxqjq") == set()


def test_content_substring_case_insensitive(engine, pdocs):
    got = _got_paths(engine.search_content_substring("STRING"))
    assert got == _expected_substring(pdocs, "string")


def test_content_substring_case_sensitive(engine, pdocs):
    # fixture content is mixed-case ("LucenePool...") — the cased
    # verify must drop docs that only match case-insensitively
    got = _got_paths(
        engine.search_content_substring("LucenePool", case_sensitive=True)
    )
    exp = {
        r["path"]
        for r in pdocs.to_dict("records")
        if "LucenePool" in r["content"]
    }
    assert got == exp and exp
    insens = _got_paths(engine.search_content_substring("lucenepool"))
    assert got <= insens


def test_regex_scan_fallback_on_non_trigram_index(spark, tmp_path):
    # index WITHOUT content_trigram: scan_fallback=True must degrade
    # to a full scan even when the pattern has extractable literals
    # (previously it raised only for the more selective patterns)
    import pandas as pd

    docs = pd.DataFrame(
        [
            {"repo": "r", "path": "a.py", "commit": "c", "lang": "x",
             "content": "merge sort here"},
            {"repo": "r", "path": "b.py", "commit": "c", "lang": "x",
             "content": "nothing else"},
        ]
    )
    d = str(tmp_path / "noctri2")
    IndexBuilder(
        spark, d, IndexParams(num_buckets=16, block_size=32), n_groups=1
    ).build(spark.createDataFrame(docs), resume=False)
    eng = SearchEngine(IndexReader(spark, d))
    got = {r["path"] for r in eng.search_content_regex("merge sort").collect()}
    assert got == {"a.py"}
    with pytest.raises(ValueError, match="content_trigram"):
        eng.search_content_regex("merge sort", scan_fallback=False)


def test_path_substring_still_exact(engine, pdocs):
    got = _got_paths(engine.search_path_substring("src/io/i"))
    exp = {
        r["path"]
        for r in pdocs.to_dict("records")
        if "src/io/i" in r["path"].lower()
    }
    assert got == exp and exp


def test_content_regex_matches_bruteforce(engine, pdocs):
    import re

    pattern = r"get [a-z]+ string"
    exp = {
        r["path"]
        for r in pdocs.to_dict("records")
        if re.search(pattern, r["content"])
    }
    got = _got_paths(engine.search_content_regex(pattern))
    assert got == exp
    assert exp, "fixture regex matched nothing — dead test"


def test_content_regex_absent_literal_short_circuits(engine):
    assert engine.search_content_regex(r"zzxqjq[0-9]+").count() == 0


def test_content_regex_no_literal_fallback_and_refusal(engine, pdocs):
    import re

    # top-level alternation: no required literal -> full-scan fallback
    pattern = r"string|builder"
    exp = {
        r["path"]
        for r in pdocs.to_dict("records")
        if re.search(pattern, r["content"])
    }
    got = _got_paths(engine.search_content_regex(pattern))
    assert got == exp
    with pytest.raises(ValueError, match="required literal"):
        engine.search_content_regex(pattern, scan_fallback=False)


def test_substring_with_counts(engine, pdocs):
    rows = engine.search_content_substring(
        "string", with_counts=True
    ).collect()
    got = {r["path"]: r["n_matches"] for r in rows}
    exp = {
        r["path"]: r["content"].lower().count("string")
        for r in pdocs.to_dict("records")
        if "string" in r["content"].lower()
    }
    assert got == exp
    # ordered by n_matches desc, doc_id asc
    pairs = [(r["n_matches"], r["doc_id"]) for r in rows]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_substring_and_regex_with_filters(engine, pdocs):
    from codeindex_spark.query.planner import Filters

    flt = Filters(file_ext="py")
    got = _got_paths(engine.search_content_substring("string", filters=flt))
    exp = {
        r["path"]
        for r in pdocs.to_dict("records")
        if "string" in r["content"].lower() and r["path"].endswith(".py")
    }
    assert got == exp and exp
    got_rx = _got_paths(
        engine.search_content_regex(r"get [a-z]+ string", filters=flt)
    )
    import re

    exp_rx = {
        r["path"]
        for r in pdocs.to_dict("records")
        if re.search(r"get [a-z]+ string", r["content"])
        and r["path"].endswith(".py")
    }
    assert got_rx == exp_rx


def test_substring_plan_pushes_candidates_to_scan(engine):
    # selective needle: candidates are driver-collected (bounded) and
    # pushed as doc_id IN (...) into the docs parquet scan — the
    # verify step must NOT be a semi-join forcing a full corpus scan
    plan = engine.search_content_substring(
        "tringi"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert "doc_id" in plan


def test_substring_requires_opt_in_field(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("noctri"))
    docs = spark_documents(spark, CorpusSpec(n_docs=20), partitions=2)
    IndexBuilder(
        spark, d, IndexParams(num_buckets=16, block_size=32), n_groups=1
    ).build(docs, resume=False)
    eng = SearchEngine(IndexReader(spark, d))
    with pytest.raises(ValueError, match="content_trigram"):
        eng.search_content_substring("abc")


def test_substring_search_through_incremental_updates(spark, tmp_path):
    """Trigram substring search over a stacked (base + delta +
    tombstones) MultiReader: the content_trigram field must flow
    through delta builds, and verification runs on live docs only —
    deleted/replaced content must not match, added content must."""
    import pandas as pd

    from codeindex_spark.streaming.maintain import IncrementalIndex

    def rows(items):
        return pd.DataFrame(
            [
                {
                    "repo": "r0",
                    "path": p,
                    "commit": c,
                    "lang": "x",
                    "content": t,
                }
                for p, c, t in items
            ]
        )

    v1 = rows(
        [
            ("a.py", "c1", "alpha betagamma delta"),
            ("b.py", "c1", "zzuniquesub lives here"),
            ("c.py", "c1", "doomed dropme content"),
        ]
    )
    v2 = rows(
        [
            ("a.py", "c2", "alpha replaced entirely"),  # update
            ("b.py", "c1", "zzuniquesub lives here"),  # unchanged
            ("d.py", "c2", "fresh qqnewsub arrival"),  # add; c.py deleted
        ]
    )
    inc = IncrementalIndex(spark, str(tmp_path / "triinc"), PARAMS, n_groups=1)
    inc.build_base(spark.createDataFrame(v1))
    inc.apply_snapshot(spark.createDataFrame(v2))
    eng = SearchEngine(inc.reader())

    def paths(needle):
        return {
            r["path"]
            for r in eng.search_content_substring(needle).collect()
        }

    assert paths("zzuniquesub") == {"b.py"}
    assert paths("qqnewsub") == {"d.py"}  # delta-indexed trigram
    assert paths("dropme") == set()  # deleted doc can't match
    assert paths("betagamma") == set()  # replaced content can't match
    assert paths("agam") == set()  # mid-word fragment of old content
    assert paths("replaced ent") == {"a.py"}  # new version matches


def test_substring_many_matches_per_needle_bruteforce(engine, pdocs):
    needles = {
        "hot": "string",
        "cross": "ng str",
        "mid": "tringi",
        "absent": "zzxqjq",  # provably absent: dropped, no scan
        "tiny": "ls",  # < 1 trigram: scan-verify path
    }
    rows = engine.search_content_substring_many(needles).collect()
    got: dict[str, set] = {}
    for r in rows:
        got.setdefault(r["needle"], set()).add(r["path"])
    recs = pdocs.to_dict("records")
    for name, s in needles.items():
        exp = {r["path"] for r in recs if s in r["content"].lower()}
        assert got.get(name, set()) == exp, name
    assert "absent" not in got
    # batch == N single searches
    for name, s in needles.items():
        if name == "absent":
            continue
        single = _got_paths(engine.search_content_substring(s))
        assert got.get(name, set()) == single, name


def test_grep_matched_lines(spark, tmp_path):
    import pandas as pd

    from codeindex_spark.query.present import grep_matched_lines

    docs = pd.DataFrame(
        [
            {
                "repo": "r",
                "path": "m.py",
                "commit": "c",
                "lang": "x",
                "content": "first needleline here\nno match\n  needleline again  \ncross nee",
            },
            {
                "repo": "r",
                "path": "n.py",
                "commit": "c",
                "lang": "x",
                # needle spans the line break: doc matches as a
                # substring but NO single line contains it
                "content": "ends with needle\nline starts",
            },
        ]
    )
    d = str(tmp_path / "grepidx")
    IndexBuilder(spark, d, PARAMS, n_groups=1).build(
        spark.createDataFrame(docs), resume=False
    )
    eng = SearchEngine(IndexReader(spark, d))
    rows = grep_matched_lines(eng, "needleline").collect()
    assert [(r["path"], r["line_number"], r["line_text"]) for r in rows] == [
        ("m.py", 1, "first needleline here"),
        ("m.py", 3, "needleline again"),
    ]
    # cross-line substring: the DOC matches (trigram pruning must use
    # only newline-free segment grams — a \n-bearing gram is never
    # indexed and would wrongly prove absence)...
    cross = eng.search_content_substring("needle\nline")
    assert {r["path"] for r in cross.collect()} == {"n.py"}
    # ...but zero single LINES contain it (grep semantics)
    assert grep_matched_lines(eng, "needle\nline").count() == 0
    # regex mode
    rx = grep_matched_lines(eng, r"needleline (here|again)", regex=True)
    assert rx.count() == 2
    # ANCHORED regex: the match sits on line 3, not at content start —
    # the doc-level prefilter must use (?m) or this silently drops it
    anchored = grep_matched_lines(
        eng, r"^\s*needleline again", regex=True
    ).collect()
    assert [(r["line_number"], r["line_text"]) for r in anchored] == [
        (3, "needleline again")
    ]
    # per-doc cap is structural
    assert (
        grep_matched_lines(eng, "needleline", max_lines_per_doc=1).count()
        == 1
    )


# ---------------- required_literals (pure) ----------------


@pytest.mark.parametrize(
    "pattern,expected",
    [
        ("merge sort", ["merge sort"]),
        ("ab?c", ["a", "c"]),
        ("ab+c", ["ab", "c"]),
        ("ab*c", ["a", "c"]),
        # a{2} conservatively drops 'a' (could be {0,..}) — sound, not
        # complete; the quantifier body never leaks as a literal
        ("a{2}b", ["b"]),
        ("a{2,5}bcd", ["bcd"]),
        ("merge (sort|join)ed? pipeline", ["merge ", "e", " pipeline"]),
        ("a|b", []),  # top-level alternation: nothing required
        ("foo.bar", ["foo", "bar"]),
        (r"foo\dbar", ["foo", "bar"]),
        ("[abc]xyz", ["xyz"]),
        (r"^start end$", ["start end"]),
        ("(group)(only)", []),
        # \{3} matches literal "{3}", so "3" is genuinely required
        (r"cls [a-z]\{3}", ["cls ", "3"]),
        # Java nested character class: the whole class is one unit —
        # a first-]-stops scan would leak "]xyz" as a bogus literal
        (r"[a-z&&[^bc]]xyz", ["xyz"]),
        # malformed patterns extract nothing (rlike reports the real
        # syntax error; guessing literals risks a false absence proof)
        ("(a[bc", []),
        ("(abc", []),
        ("[abc", []),
        (r"(a[\\", []),
        # multi-char escape bodies decode to their literal char — the
        # body must never leak as a bogus required literal (\x41bc
        # matches "Abc", not "41bc")
        (r"\x41bc", ["Abc"]),
        (r"\x{41}bc", ["Abc"]),
        (r"Abc", ["Abc"]),
        (r"\0101bc", ["Abc"]),
        (r"\x41+bc", ["A", "bc"]),
        (r"\x41*bc", ["bc"]),
        (r"\cAbc", ["\x01bc"]),
        (r"foo\x4", []),  # malformed hex: Java needs exactly 2 digits
        (r"foo\x4gbar", []),
        (r"\08bc", []),  # \0 needs >=1 octal digit in Java
        (r"\N{LATIN SMALL LETTER A}bc", []),
        ("foo\\", []),  # trailing backslash: malformed
        # \Q...\E quoted regions: contents literal; a quantifier after
        # \E binds only to the LAST quoted char
        (r"\Qa.c\E", ["a.c"]),
        (r"\Qa.c\Edef", ["a.cdef"]),
        (r"\Qx\E*", []),
        (r"\Qab\E*c", ["a", "c"]),
        (r"\Qab\E+c", ["ab", "c"]),
        (r"\Qab\E{2}c", ["a", "c"]),
        (r"x\Qa|b\E", ["xa|b"]),
    ],
)
def test_required_literals(pattern, expected):
    assert required_literals(pattern) == expected


# soundness property: every extracted literal is a substring of EVERY
# string the pattern matches (the extractor may under-extract, never
# over-extract — over-extraction would drop valid search results)
_atom = st.one_of(
    st.text(alphabet="abcxyz 01", min_size=1, max_size=4),
    # \x61/b escapes mean the same char in Java and Python re, so
    # from_regex exercises the decode path; multi-char bodies must
    # never leak digits into the extracted literals
    st.sampled_from(
        [".", r"\d", r"\w", "[abc]", "[a-z]", r"\x61", r"\x7a", r"b"]
    ),
)
_piece = st.builds(
    lambda a, q: a + q, _atom, st.sampled_from(["", "?", "*", "+", "{2}", "{1,3}"])
)
_pattern = st.one_of(
    st.lists(_piece, min_size=1, max_size=5).map("".join),
    st.builds(
        lambda l, r: f"{l}({r})", st.lists(_piece, min_size=1, max_size=3).map("".join),
        st.lists(_piece, min_size=1, max_size=2).map("".join),
    ),
    st.builds(lambda l, r: f"{l}|{r}", _atom, _atom),
)


@settings(max_examples=300, deadline=None)
@given(st.data())
def test_required_literals_sound(data):
    pattern = data.draw(_pattern)
    lits = required_literals(pattern)
    if not lits:
        return
    try:
        s = data.draw(st.from_regex(pattern, fullmatch=True))
    except re.error:
        return
    for lit in lits:
        assert lit in s, (pattern, lit, s)


def test_filter_by_ids_broadcast_path(engine, spark):
    """Above ISIN_PUSHDOWN_CAP the candidate ids must ship as a
    broadcast semi-join + between(min,max) range predicate, with
    results identical to the literal-In path."""
    from pyspark.sql import functions as F

    docs = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    ids = sorted({(i * 7) % 997 for i in range(300)})
    assert len(ids) > engine.ISIN_PUSHDOWN_CAP
    out = engine._filter_by_ids(docs, ids)
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == ids
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # range predicate reaches the scan side for row-group pruning
    assert str(min(ids)) in plan and str(max(ids)) in plan
    # small lists still take the literal-In path (no join at all)
    small = engine._filter_by_ids(docs, ids[:50])
    assert sorted(r["doc_id"] for r in small.collect()) == ids[:50]
    assert "Join" not in small._jdf.queryExecution().executedPlan().toString()


def test_regex_many_matches_per_pattern(engine, pdocs):
    """Batch regex == per-pattern singles; scan-fallback and
    provably-absent patterns route correctly."""
    pats = {
        "p1": r"Lucene[A-Za-z]*Pool",
        "p2": r"index [a-z]+ searcher",
        "absent": r"zzqqxx[0-9]+yy",
        "nolit": r"[0-9]{4}",  # no required literal -> scan branch
    }
    out = engine.search_content_regex_many(pats, case_sensitive=False)
    got = {}
    for r in out.collect():
        got.setdefault(r["pattern"], set()).add(r["path"])
    for name, pat in pats.items():
        single = {
            r["path"]
            for r in engine.search_content_regex(
                pat, case_sensitive=False
            ).collect()
        }
        assert got.get(name, set()) == single, name
    assert "absent" not in got
    with pytest.raises(ValueError, match="nolit"):
        engine.search_content_regex_many(pats, scan_fallback=False)


def test_regex_many_scan_fallback_without_trigram_field(
    spark, tmp_path_factory
):
    """Batch regex on an index WITHOUT content_trigram mirrors the
    single-pattern contract: scan_fallback=True degrades every
    pattern to a scan branch; False raises naming them."""
    d = str(tmp_path_factory.mktemp("noctri_many"))
    docs = spark_documents(spark, CorpusSpec(n_docs=20), partitions=2)
    IndexBuilder(
        spark, d, IndexParams(num_buckets=16, block_size=32), n_groups=1
    ).build(docs, resume=False)
    eng = SearchEngine(IndexReader(spark, d))
    pats = {"p": r"get[a-z]*"}
    out = {
        r["path"]
        for r in eng.search_content_regex_many(
            pats, case_sensitive=False
        ).collect()
    }
    single = {
        r["path"]
        for r in eng.search_content_regex(
            r"get[a-z]*", case_sensitive=False
        ).collect()
    }
    assert out == single and out
    with pytest.raises(ValueError, match="content_trigram"):
        eng.search_content_regex_many(pats, scan_fallback=False)
