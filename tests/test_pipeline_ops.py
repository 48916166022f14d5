"""scrub_text / chunk_documents / sample_by_hash — pipeline ops must
match pure-Python expectations exactly (they are deterministic by
design; that determinism is the feature)."""

from __future__ import annotations

import hashlib
import re

import pytest

from codeindex_spark.ops.pipeline import (
    chunk_documents,
    hash_threshold,
    sample_by_hash,
    scrub_text,
)


@pytest.fixture(scope="module")
def scrub_df(spark):
    rows = [
        (1, "plain text no entities here"),
        (2, "visit https://example.com/a?b=c#d now"),
        (3, "mail me at first.last+tag@sub.example.org thanks"),
        (4, "server at 10.0.0.1 and 192.168.255.254 up"),
        # email-shaped string inside a URL counts once, as the URL
        (5, "see http://user@host.example.com/path ok"),
        (6, "mixed http://x.io/y a@b.co 1.2.3.4 end"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_scrub_counts_and_redaction(scrub_df):
    out = {r["doc_id"]: r for r in scrub_text(scrub_df).collect()}
    assert out[1]["text_clean"] == "plain text no entities here"
    assert (out[1]["n_urls"], out[1]["n_emails"], out[1]["n_ips"]) == (0, 0, 0)
    assert out[2]["text_clean"] == "visit <URL> now"
    assert out[2]["n_urls"] == 1
    assert out[3]["text_clean"] == "mail me at <EMAIL> thanks"
    assert out[3]["n_emails"] == 1
    assert out[4]["text_clean"] == "server at <IP> and <IP> up"
    assert out[4]["n_ips"] == 2
    assert out[5]["text_clean"] == "see <URL> ok"
    assert (out[5]["n_urls"], out[5]["n_emails"]) == (1, 0)
    assert out[6]["text_clean"] == "mixed <URL> <EMAIL> <IP> end"
    assert (out[6]["n_urls"], out[6]["n_emails"], out[6]["n_ips"]) == (1, 1, 1)


def _py_chunks(text, c, s):
    toks = [w for w in re.split(" +", text.strip()) if w]
    return [
        (i, len(toks[st : st + c]), " ".join(toks[st : st + c]))
        for i, st in enumerate(range(0, max(len(toks), 1), s))
        if st < len(toks)
    ]


@pytest.mark.parametrize("c,s", [(4, 3), (4, 4), (3, 1), (10, 5)])
def test_chunking_matches_python(spark, c, s):
    texts = [
        "a b c d e f g h i j",
        "one two three",
        "x",
        "exactly four word toks",
        "",
        "   padded   spacing   text   here   now   ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(df, chunk_tokens=c, stride=s).collect()
    }
    exp = {}
    for i, t in enumerate(texts):
        for cid, n, ct in _py_chunks(t, c, s):
            exp[(i, cid)] = (n, ct)
    assert got == exp


def test_chunk_overlap_property(spark):
    # stride < chunk: consecutive chunks share chunk-stride tokens
    df = spark.createDataFrame([(0, " ".join(f"t{i}" for i in range(20)))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, chunk_tokens=8, stride=5).collect(),
        key=lambda r: r["chunk_id"],
    )
    for a, b in zip(rows, rows[1:]):
        ta, tb = a["chunk_text"].split(), b["chunk_text"].split()
        assert ta[5:] == tb[: len(ta) - 5]


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_sample_matches_python_and_nests(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])

    def py_sample(rate, seed):
        thr = hash_threshold(rate)
        return {
            i
            for i in range(2000)
            if hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8] < thr
        }
    s25 = {r["doc_id"] for r in sample_by_hash(df, 0.25, seed="42").collect()}
    s50 = {r["doc_id"] for r in sample_by_hash(df, 0.50, seed="42").collect()}
    assert s25 == py_sample(0.25, "42")
    assert s50 == py_sample(0.50, "42")
    assert s25 <= s50  # nested samples: same seed, larger rate
    assert 0.18 < len(s25) / 2000 < 0.32
    other = {r["doc_id"] for r in sample_by_hash(df, 0.25, seed="7").collect()}
    assert other != s25  # independent across seeds
    full = sample_by_hash(df, 1.0, seed="42").count()
    assert full == 2000 and sample_by_hash(df, 0.0).count() == 0


def test_hash_threshold_saturates_near_one():
    # largest double below 1.0 rounds up to 2^32: must saturate at
    # 'ffffffff', not wrap to '00000000' (sample-nothing for ~100%)
    assert hash_threshold(0.9999999999999999) == "ffffffff"
    assert hash_threshold(1.0) == "g"
    assert hash_threshold(0.25) == "40000000"
    assert hash_threshold(0.0) == "00000000"


def test_pack_chunks(spark):
    from codeindex_spark.ops.pipeline import pack_chunks

    # bucket 0: docs 0 and 2 (mod 2), bucket 1: doc 1
    chunks = spark.createDataFrame(
        [
            (0, 0, 60), (0, 1, 60), (2, 0, 60), (2, 1, 60),
            (1, 0, 100), (1, 1, 100),
        ],
        "doc_id long, chunk_id long, n_chunk_tokens long",
    )
    rows = {
        (r["doc_id"], r["chunk_id"]): r
        for r in pack_chunks(chunks, budget_tokens=128, num_buckets=2).collect()
    }
    # bucket 0 stream: 60,60,60,60 -> before 0,60,120,180
    assert rows[(0, 0)]["pack_id"] == 0 and rows[(0, 0)]["pack_offset"] == 0
    assert rows[(0, 1)]["pack_id"] == 0 and rows[(0, 1)]["pack_offset"] == 60
    # third chunk starts at 120 < 128: same pack (overflow-then-truncate)
    assert rows[(2, 0)]["pack_id"] == 0 and rows[(2, 0)]["pack_offset"] == 120
    assert rows[(2, 1)]["pack_id"] == 1 and rows[(2, 1)]["pack_offset"] == 52
    # bucket 1 independent: before 0,100
    assert rows[(1, 0)]["pack_id"] == 0
    assert rows[(1, 1)]["pack_id"] == 0 and rows[(1, 1)]["pack_offset"] == 100
    assert rows[(1, 0)]["bucket"] == 1
    with pytest.raises(ValueError):
        pack_chunks(chunks, budget_tokens=0)


def test_sample_by_hash_stratified(spark):
    from pyspark.sql import functions as F

    from codeindex_spark.ops.pipeline import (
        sample_by_hash,
        sample_by_hash_stratified,
    )

    df = spark.createDataFrame(
        [(i, "en" if i % 3 == 0 else ("de" if i % 3 == 1 else "fr"))
         for i in range(600)],
        "doc_id long, lang string",
    )
    out = sample_by_hash_stratified(
        df, {"en": 0.5, "de": 0.1}, key_col="lang", seed="s", default_rate=0.0
    )
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], set()).add(r["doc_id"])
    # default_rate 0 drops unlisted strata entirely
    assert "fr" not in by_lang
    # per-stratum == plain sample_by_hash at that rate on the stratum
    for lang, rate in (("en", 0.5), ("de", 0.1)):
        exp = {
            r["doc_id"]
            for r in sample_by_hash(
                df.filter(F.col("lang") == lang), rate, seed="s"
            ).collect()
        }
        assert by_lang.get(lang, set()) == exp
    # nesting: raising a stratum's rate only adds rows of that stratum
    bigger = sample_by_hash_stratified(
        df, {"en": 0.8, "de": 0.1}, key_col="lang", seed="s"
    )
    big_ids = {r["doc_id"] for r in bigger.collect()}
    assert {r["doc_id"] for r in rows} <= big_ids
    with pytest.raises(ValueError):
        sample_by_hash_stratified(df, {"en": 1.5}, key_col="lang")


def test_paragraph_dedup_first_wins(spark):
    from codeindex_spark.ops.pipeline import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "unique one\nshared boiler\nunique two"),
            (2, "shared boiler\nother text"),
            (3, "shared boiler"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in paragraph_dedup(docs).collect()
    }
    # doc 1 (lowest id) keeps the shared paragraph, order preserved
    assert got[1]["text"] == "unique one\nshared boiler\nunique two"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 3)
    # doc 2 loses it, keeps the rest
    assert got[2]["text"] == "other text"
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (2, 1)
    # doc 3 was only boilerplate -> dropped entirely
    assert 3 not in got


def test_paragraph_dedup_metachar_separator(spark):
    """sep is a LITERAL: a regex metacharacter separator ('|') must
    split on the pipe, not on the empty-alternation regex (which
    splits every character boundary)."""
    from codeindex_spark.ops.pipeline import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "alpha|beta|alpha"), (2, "beta|gamma")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r for r in paragraph_dedup(docs, sep="|").collect()
    }
    # first occurrence wins corpus-wide (doc 1 idx 0), so doc 1's
    # repeated 'alpha' at idx 2 dedups away too — and the pipes
    # survive reassembly because split treated them as literals
    assert got[1]["text"] == "alpha|beta"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 2)
    assert got[2]["text"] == "gamma"
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (2, 1)


def test_paragraph_dedup_normalization_and_empties(spark):
    from codeindex_spark.ops.pipeline import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "Hello   World\n\nx"),
            (2, "hello world\ny"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    # case/whitespace variants hash together; empty paragraph (the
    # double separator) neither counts nor survives
    assert got[1]["text"] == "Hello   World\nx"
    assert got[1]["n_paras"] == 2
    assert got[2]["text"] == "y"
    # normalize=False keeps the variants distinct
    raw = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(docs, normalize=False).collect()
    }
    assert raw[2] == "hello world\ny"


def test_paragraph_dedup_within_doc_and_drop_empty_false(spark):
    from codeindex_spark.ops.pipeline import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "a\nb\na"), (2, "a")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in paragraph_dedup(docs, drop_empty=False).collect()
    }
    # duplicate inside one doc: only the first position survives
    assert got[1]["text"] == "a\nb"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (3, 2)
    # fully-deduped doc kept with its true paragraph count
    assert got[2]["text"] == ""
    assert (got[2]["n_paras"], got[2]["n_kept"]) == (1, 0)


def test_paragraph_dedup_partition_scoped(spark):
    from codeindex_spark.ops.pipeline import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "en", "same para"),
            (2, "fr", "same para"),
            (3, "en", "same para"),
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in paragraph_dedup(docs, partition_col="lang").collect()
    }
    # scoped: the en copy and the fr copy both survive; the second
    # en copy does not
    assert set(got) == {1, 2}


def test_paragraph_dedup_null_partition_key(spark):
    """Docs whose partition key is NULL are a real shard (missing
    lang-id is common at corpus scale): they must dedup against each
    other and SURVIVE — a null-unsafe winner join silently dropped
    the whole NULL shard."""
    from codeindex_spark.ops.pipeline import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, None, "same para\nonly in one"),
            (2, None, "same para"),
            (3, "en", "same para"),
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        r["doc_id"]: r
        for r in paragraph_dedup(docs, partition_col="lang").collect()
    }
    # NULL shard: doc 1 wins 'same para', doc 2 fully dedups away;
    # the en copy survives independently
    assert set(got) == {1, 3}
    assert got[1]["text"] == "same para\nonly in one"
    assert (got[1]["n_paras"], got[1]["n_kept"]) == (2, 2)
    assert got[3]["text"] == "same para"
    # drop_empty=False: the deduped NULL-shard doc comes back empty,
    # not missing
    kept_all = {
        r["doc_id"]: r
        for r in paragraph_dedup(
            docs, partition_col="lang", drop_empty=False
        ).collect()
    }
    assert kept_all[2]["text"] == ""
    assert (kept_all[2]["n_paras"], kept_all[2]["n_kept"]) == (1, 0)


def test_normalize_text(spark):
    """NFC composes combining sequences; the explicit strip list
    removes zero-widths / soft hyphens / controls (except tab and
    newline); n_stripped audits removals post-normalization."""
    from codeindex_spark.ops.pipeline import normalize_text

    rows = [
        (1, "café x"),              # e + combining acute -> é
        (2, "a​b­c"),           # zero-width space + soft hyphen
        (3, "keep\tthis\nline\rnot\x07"),  # \t \n kept, \r \a stripped
        (4, "café"),                 # already composed
        (5, ""),
    ]
    got = {
        r["doc_id"]: r
        for r in normalize_text(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert got[1]["text_norm"] == "café x"
    assert got[1]["n_stripped"] == 0
    assert got[2]["text_norm"] == "abc" and got[2]["n_stripped"] == 2
    assert got[3]["text_norm"] == "keep\tthis\nlinenot"
    assert got[3]["n_stripped"] == 2
    # NFC idempotence: composed input unchanged
    assert got[4]["text_norm"] == "café"
    assert got[5]["text_norm"] == "" and got[5]["n_stripped"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        normalize_text(
            spark.createDataFrame(rows, "doc_id long, text string"),
            form="NFX",
        )


def test_normalize_text_custom_id(spark):
    """id_col keeps its own name AND type (string para_id)."""
    from codeindex_spark.ops.pipeline import normalize_text

    df = spark.createDataFrame(
        [("p1", "café"), ("p2", "x​y")],
        "para_id string, body string",
    )
    got = {
        r["para_id"]: (r["text_norm"], r["n_stripped"])
        for r in normalize_text(df, id_col="para_id", text_col="body").collect()
    }
    assert got == {"p1": ("café", 0), "p2": ("xy", 1)}


def test_line_frequency_filter_removes_all_occurrences(spark):
    """Unlike paragraph_dedup's first-wins, an over-threshold line is
    removed from EVERY doc, including the first."""
    from codeindex_spark.ops.pipeline import line_frequency_filter

    docs = spark.createDataFrame(
        [
            (1, "unique one\nshared boiler\nunique two"),
            (2, "shared boiler\nother text"),
            (3, "shared boiler"),
            (4, "appears twice ok\nbody four"),
            (5, "appears twice ok\nbody five"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in line_frequency_filter(docs, max_occurrences=2).collect()
    }
    # 'shared boiler' occurs 3x > 2 -> gone everywhere
    assert got[1]["text"] == "unique one\nunique two"
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (3, 2)
    assert got[2]["text"] == "other text"
    assert 3 not in got  # all-boilerplate doc dropped
    # 'appears twice ok' occurs 2x == threshold -> kept
    assert got[4]["text"] == "appears twice ok\nbody four"
    assert got[5]["n_kept"] == 2


def test_line_frequency_filter_normalize_and_drop_empty_false(spark):
    from codeindex_spark.ops.pipeline import line_frequency_filter

    docs = spark.createDataFrame(
        [
            (1, "Cookie  Banner \nreal content"),
            (2, "cookie banner\nmore text"),
            (3, "COOKIE BANNER"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in line_frequency_filter(
            docs, max_occurrences=1, drop_empty=False
        ).collect()
    }
    # case/whitespace variants normalize to one hot line, removed
    assert got[1]["text"] == "real content"
    assert got[2]["text"] == "more text"
    assert got[3]["text"] == "" and got[3]["n_kept"] == 0
    assert len(got) == 3
