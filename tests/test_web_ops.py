"""URL canonicalization / URL dedup / domain blocklist ops — every
normalization rule pinned against hand-written expectations (the
rules are a documented contract; any engine must be able to replay
them, so they must be exactly what the docstring says)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from codeindex_spark.ops.web import (
    domain_blocklist_filter,
    domain_stats,
    domain_suffixes,
    normalize_urls,
    url_dedup_keep,
)


@pytest.fixture(scope="module")
def url_df(spark):
    rows = [
        # rule 3+4: case + www
        (1, "HTTPS://WWW.Example.COM/Path/One"),
        # rule 5: default port dropped, non-default kept
        (2, "https://example.com:443/a"),
        (3, "http://example.com:80/a"),
        (4, "http://example.com:8080/a"),
        # rule 6: tracking params dropped, survivors sorted
        (5, "https://example.com/a?utm_source=x&id=2&b=1&utm_medium=y"),
        (6, "https://example.com/a?b=1&id=2&gclid=abc"),
        # rule 6 edge: valueless tracking param, empty query dropped
        (7, "https://example.com/a?fbclid"),
        (8, "https://example.com/a?"),
        # rule 7: trailing slashes, empty path
        (9, "https://example.com/a/b///"),
        (10, "https://example.com"),
        (11, "https://example.com/"),
        # rule 1: fragment stripped
        (12, "https://example.com/a#frag?not=query"),
        # rule 2: non-http(s) and garbage -> NULL
        (13, "ftp://example.com/a"),
        (14, "not a url"),
        (15, None),
        # path/query case preserved; utm prefix must match whole name
        (16, "https://example.com/CaseKept?Butm_x=1"),
        # subdomain host (www only stripped as the FIRST label)
        (17, "https://a.www.example.com/x"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "url"])


def test_normalize_rules(url_df):
    out = {
        r["doc_id"]: (r["url_norm"], r["domain"])
        for r in normalize_urls(url_df).collect()
    }
    assert out[1] == ("https://example.com/Path/One", "example.com")
    assert out[2] == ("https://example.com/a", "example.com")
    assert out[3] == ("http://example.com/a", "example.com")
    assert out[4] == ("http://example.com:8080/a", "example.com")
    assert out[5] == ("https://example.com/a?b=1&id=2", "example.com")
    assert out[6] == ("https://example.com/a?b=1&id=2", "example.com")
    assert out[7] == ("https://example.com/a", "example.com")
    assert out[8] == ("https://example.com/a", "example.com")
    assert out[9] == ("https://example.com/a/b", "example.com")
    assert out[10] == ("https://example.com/", "example.com")
    assert out[11] == ("https://example.com/", "example.com")
    assert out[12] == ("https://example.com/a", "example.com")
    assert out[13] == (None, None)
    assert out[14] == (None, None)
    assert out[15] == (None, None)
    assert out[16] == (
        "https://example.com/CaseKept?Butm_x=1",
        "example.com",
    )
    assert out[17] == ("https://a.www.example.com/x", "a.www.example.com")


def test_url_dedup_first_occurrence_wins(url_df):
    out = {
        r["doc_id"]: r["url_kept"]
        for r in url_dedup_keep(normalize_urls(url_df)).collect()
    }
    # 5 and 6 normalize identically -> min id 5 kept; 2, 7, 8 and 12
    # all collapse onto "https://example.com/a" -> min id 2 kept
    assert out[5] and not out[6]
    assert out[2] and not out[7] and not out[8] and not out[12]
    # 10 and 11 collapse -> 10 kept
    assert out[10] and not out[11]
    # NULL url_norm rows are always kept
    assert out[13] and out[14] and out[15]
    # uniques kept
    assert out[1] and out[4] and out[9]


def test_domain_suffixes(spark):
    df = spark.createDataFrame(
        [("a.b.example.com",), ("com",)], ["domain"]
    ).select(domain_suffixes().alias("s"))
    got = [r["s"] for r in df.collect()]
    assert got[0] == ["a.b.example.com", "b.example.com", "example.com", "com"]
    assert got[1] == ["com"]


def test_domain_blocklist_subdomain_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "example.com"),
            (2, "ads.example.com"),
            (3, "example.com.evil.org"),  # NOT a subdomain of example.com
            (4, "fine.net"),
            (5, None),
        ],
        ["doc_id", "domain"],
    )
    bl = spark.createDataFrame([("example.com",)], ["blocked_domain"])
    kept = sorted(
        r["doc_id"] for r in domain_blocklist_filter(df, bl).collect()
    )
    assert kept == [3, 4, 5]


def test_domain_stats(spark):
    df = spark.createDataFrame(
        [
            (1, "a.com", 10),
            (2, "a.com", 5),
            (3, "b.com", 7),
            (4, None, 3),
        ],
        ["doc_id", "domain", "n_chars"],
    )
    out = {
        r["domain"]: (r["n_docs"], r["n_chars"])
        for r in domain_stats(df, chars_col="n_chars").collect()
    }
    assert out == {"a.com": (2, 15), "b.com": (1, 7)}


def test_normalize_is_idempotent(url_df):
    """Normalizing an already-normal URL is a no-op — the fixed-point
    property callers rely on when URLs arrive pre-cleaned."""
    once = normalize_urls(url_df).filter(F.col("url_norm").isNotNull())
    again = normalize_urls(
        once.select(F.col("doc_id"), F.col("url_norm").alias("url"))
    )
    diffs = again.filter(F.col("url") != F.col("url_norm")).collect()
    assert diffs == []


def test_extract_html_text_rules(spark):
    """HTML extraction contract, rule by rule: element drops (incl.
    case-insensitive close tags and attributes), comments, block vs
    inline tags, entity decode order (&amp; LAST so double-escapes
    survive), whitespace collapse, and the raw-length signal."""
    from codeindex_spark.ops.web import extract_html_text

    rows = [
        (1, "<p>hello</p><p>world</p>"),
        (2, "<SCRIPT a=b>var x = '<p>not text</p>';</SCRIPT>ok"),
        (3, "<style>.c{color:red}</style>visible"),
        (4, "a<!-- hidden <b>bold</b> -->b"),
        (5, "x<span>inline</span>y"),
        (6, "&amp;amp; &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;!"),
        (7, "  lots   of\t spaces <br> and <BR/> breaks  "),
        (8, "<div class='x'>block</div><h2>head</h2>tail"),
        (9, "<noscript><img src=x></noscript>seen"),
        (10, "plain text, no markup"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, html string")
    got = {
        r["doc_id"]: (r["text_extracted"], r["n_html_chars"])
        for r in extract_html_text(df).collect()
    }
    assert got[1][0] == "hello\nworld"
    assert got[2][0] == "ok"
    assert got[3][0] == "visible"
    assert got[4][0] == "a b"
    assert got[5][0] == "x inline y"
    # &amp;amp; -> &amp; (NOT &): ampersand decodes last
    assert got[6][0] == "&amp; <tag> \"q\" 's' !"
    assert got[7][0] == "lots of spaces\nand\nbreaks"
    assert got[8][0] == "block\nhead\ntail"
    assert got[9][0] == "seen"
    assert got[10] == ("plain text, no markup", len(rows[9][1]))


def test_extract_links_rules(spark):
    """Link extraction contract: quoted/single-quoted/bare hrefs,
    no-href anchors skipped, uppercase tags, inner-tag + entity
    anchor cleaning, 1-based link_idx, kind classification, no-link
    docs emit nothing, non-html columns pass through."""
    from codeindex_spark.ops.web import extract_links

    rows = [
        (1, "x", '<a href="https://a.b/c?d=1#f">Go <b>now</b></a>'),
        (2, "y", "<A HREF='mailto:u@v.w'>mail</A><a href=/rel/p>r</a>"),
        (3, "z", '<a name=x>skip</a><a href="#top">  top &amp; up </a>'),
        (4, "w", "<a href=//cdn.net/l.js>cdn</a>"
                 '<a href="javascript:void(0)">js</a>'),
        (5, "q", "<p>no links at all</p>"),
        (6, "e", '<a href="x">open but never closed'),
    ]
    df = spark.createDataFrame(rows, "doc_id int, tag string, html string")
    got = sorted(
        (
            (r["doc_id"], r["link_idx"], r["href"], r["anchor_text"],
             r["link_kind"], r["tag"])
            for r in extract_links(df).collect()
        )
    )
    assert got == [
        (1, 1, "https://a.b/c?d=1#f", "Go now", "absolute", "x"),
        (2, 1, "mailto:u@v.w", "mail", "special", "y"),
        (2, 2, "/rel/p", "r", "relative", "y"),
        (3, 1, "#top", 'top & up', "fragment", "z"),
        (4, 1, "//cdn.net/l.js", "cdn", "protocol_relative", "w"),
        (4, 2, "javascript:void(0)", "js", "special", "w"),
    ]


def test_anchor_stats_topk_and_totals(spark):
    """anchor_stats contract: per-target top-k anchors ranked by
    count DESC then anchor ASC (deterministic), n_anchor per
    (target, anchor), n_links = all links to the target, n_docs =
    distinct sources; targets with fewer than k distinct anchors
    emit fewer rows; k<1 rejected."""
    from codeindex_spark.ops.web import anchor_stats

    rows = [
        # target A: "go" x3 from docs 1,1,2; "click" x2 from 2,3;
        # "zzz" x1 from 3 -> k=2 keeps go(3), click(2)
        (1, "A", "go"), (1, "A", "go"), (2, "A", "go"),
        (2, "A", "click"), (3, "A", "click"), (3, "A", "zzz"),
        # target B: tie on count -> anchor ASC breaks it
        (1, "B", "beta"), (2, "B", "alpha"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, href string, anchor_text string")
    got = sorted(
        (r["href"], r["rank"], r["anchor_text"], r["n_anchor"],
         r["n_links"], r["n_docs"])
        for r in anchor_stats(df, k=2).collect()
    )
    assert got == [
        ("A", 1, "go", 3, 6, 3),
        ("A", 2, "click", 2, 6, 3),
        ("B", 1, "alpha", 1, 2, 2),
        ("B", 2, "beta", 1, 2, 2),
    ]
    with pytest.raises(ValueError):
        anchor_stats(df, k=0)


def test_link_graph_edges(spark):
    """link_graph contract: absolute links only, dst domain follows
    the normalize_urls rules (case/www/port), self-loops and NULL
    endpoints dropped, parallel links collapse to one edge."""
    from codeindex_spark.ops.web import extract_links, link_graph

    rows = [
        # two parallel absolute links to the same (normalized) domain
        (1, "s1.com", '<a href="https://WWW.T1.com:443/a">x</a>'
                      '<a href="https://t1.com/b">y</a>'
                      '<a href="/rel">r</a><a href="#f">f</a>'),
        # self-loop after normalization -> dropped
        (2, "t2.com", '<a href="http://www.T2.COM/x">self</a>'
                      '<a href="https://t3.com/">out</a>'),
        # NULL src -> dropped; ftp scheme -> NULL dst -> dropped
        (3, None, '<a href="https://t1.com/c">z</a>'),
        (4, "s4.com", '<a href="ftp://t9.com/f">bad</a>'),
    ]
    df = spark.createDataFrame(rows, "doc_id int, domain string, html string")
    edges = sorted(
        (r["src"], r["dst"])
        for r in link_graph(extract_links(df)).collect()
    )
    assert edges == [("s1.com", "t1.com"), ("t2.com", "t3.com")]
