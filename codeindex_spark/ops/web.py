"""Web-corpus URL operators: canonicalization, URL-level dedup,
domain blocklists, per-domain stats.

Public designs: RefinedWeb (Penedo et al. 2023, arXiv:2306.01116)
deduplicates by URL before content dedup (§3.1) and discards
documents whose domain hits a blocklist; CCNet (Wenzek et al. 2020)
and C4 (Raffel et al. 2020) likewise key web documents by their
(normalized) URL. The reference engine indexes filesystem paths, not
URLs (CodeIndex.MaintainIndex walks directories), so this module is
part of the repo's beyond-reference training-data surface.

Normalization rules (documented so any engine can replay them):

1. strip the fragment (first ``#`` to end);
2. scheme must be http/https (else url_norm and domain are NULL);
3. lowercase scheme and host; path and query keep their case;
4. drop a leading ``www.`` label from the host;
5. drop the default port (``:80`` for http, ``:443`` for https);
   non-default ports are kept;
6. drop tracking query parameters (``utm_*``, gclid, fbclid,
   msclkid, mc_eid, igshid, ref, ref_src — the public
   ad/analytics-click set), sort the survivors lexicographically as
   whole ``k=v`` strings and rejoin with ``&``; an emptied query
   drops its ``?``;
7. collapse trailing ``/`` runs on the path; an empty path becomes
   ``/``.

Everything is pure JVM column algebra (regexp + array lambdas) —
zero Python UDFs. Shuffles: exactly one map-side-combinable groupBy
in url_dedup_keep / domain_stats; domain_blocklist_filter is a
broadcast semi-join over a bounded (≤ max_labels per row) suffix
explode, then an anti-join of the (small) blocked id set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# whole-parameter match: name (optionally valueless) at the start of
# a `k=v` atom. RE2-safe (no lookaround) so DuckDB oracles can replay
# the same pattern with regexp_matches.
TRACKING_PARAM_RE = (
    "^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=|$)"
)

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATHQ_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)"


def normalize_urls(
    df: DataFrame,
    url_col: str = "url",
    norm_col: str = "url_norm",
    domain_col: str = "domain",
    tracking_param_re: str = TRACKING_PARAM_RE,
) -> DataFrame:
    """Add ``norm_col`` (canonical URL) and ``domain_col`` (host after
    lowercasing and www-stripping) per the module-level rules.

    Pure projection: zero shuffles, zero UDFs — at 100 TB this fuses
    into the scan stage and costs one pass of string kernels.
    NULL / non-http(s) / host-less URLs yield NULL in both outputs.
    """
    url = F.col(url_col)
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    authority = F.regexp_extract(no_frag, _AUTHORITY_RE, 1)
    host = F.regexp_replace(
        F.lower(F.regexp_replace(authority, ":[0-9]+$", "")), "^www\\.", ""
    )
    port = F.regexp_extract(authority, ":([0-9]+)$", 1)
    port_norm = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    pathq = F.regexp_extract(no_frag, _PATHQ_RE, 1)
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    path_trim = F.regexp_replace(path, "/+$", "")
    path_norm = F.when(path_trim == "", F.lit("/")).otherwise(path_trim)
    query = F.regexp_extract(pathq, "\\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(tracking_param_re),
    )
    qs = F.array_join(F.array_sort(params), "&")
    q_norm = F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs))

    valid = scheme.isin("http", "https") & (host != "")
    return df.withColumn(
        norm_col,
        F.when(
            valid, F.concat(scheme, F.lit("://"), host, port_norm, path_norm, q_norm)
        ),
    ).withColumn(domain_col, F.when(valid, host))


def url_dedup_keep(
    df: DataFrame,
    norm_col: str = "url_norm",
    id_col: str = "doc_id",
    kept_col: str = "url_kept",
) -> DataFrame:
    """First-occurrence-wins URL dedup (RefinedWeb §3.1): per
    normalized URL the row with the smallest ``id_col`` is kept.
    Rows with a NULL normalized URL cannot be grouped and are kept.

    One shuffle keyed on the normalized URL; ``min`` is map-side
    combinable, so a URL crawled a million times collapses to one
    row per map task before the exchange — duplicate floods never
    concentrate on a reducer.
    """
    winners = (
        df.filter(F.col(norm_col).isNotNull())
        .groupBy(norm_col)
        .agg(F.min(id_col).alias("_url_keep_id"))
    )
    return (
        df.join(winners, norm_col, "left")
        .withColumn(
            kept_col,
            F.col(norm_col).isNull()
            | (F.col(id_col) == F.col("_url_keep_id")),
        )
        .drop("_url_keep_id")
    )


def domain_suffixes(domain_col: str = "domain", max_labels: int = 10):
    """Column of the dot-suffix chain of a host, most-specific first:
    ``a.b.example.com`` → [a.b.example.com, b.example.com,
    example.com, com], capped at ``max_labels`` labels so the explode
    in domain_blocklist_filter is structurally bounded."""
    parts = F.slice(F.split(F.col(domain_col), "\\."), 1, max_labels)
    return F.transform(
        F.sequence(F.lit(1), F.size(parts)),
        lambda i: F.array_join(
            F.slice(parts, i, F.size(parts) - i + 1), "."
        ),
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    blocked_col: str = "blocked_domain",
    max_labels: int = 10,
) -> DataFrame:
    """Drop rows whose domain equals a blocklist entry OR is a
    subdomain of one (RefinedWeb-style URL filtering: blocking
    ``example.com`` also blocks ``ads.example.com``). NULL domains
    are kept — filtering unparsed rows is the caller's decision.

    Scale shape: the suffix explode is ≤ max_labels rows per input
    row and feeds straight into a broadcast semi-join (blocklists
    are small — NSFW/adult lists run 1-5 M rows, well under the
    broadcast ceiling), so blocked ids are found without a shuffle;
    the final anti-join shuffles only on ``id_col``, and AQE turns
    it into a broadcast anti-join when the blocked set is small.
    """
    blocked_ids = (
        df.filter(F.col(domain_col).isNotNull())
        .select(
            id_col,
            F.explode(domain_suffixes(domain_col, max_labels)).alias("_sfx"),
        )
        .join(
            F.broadcast(blocklist.select(F.col(blocked_col).alias("_sfx"))),
            "_sfx",
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    return df.join(blocked_ids, id_col, "left_anti")


def domain_stats(
    df: DataFrame,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    chars_col: str | None = None,
) -> DataFrame:
    """(domain, n_docs[, n_chars]) — per-domain corpus volume, the
    curation dashboard behind blocklist decisions. One map-side-
    combinable groupBy; hot domains (a crawl is zipfian over hosts)
    partial-aggregate before the exchange."""
    aggs = [F.count(id_col).alias("n_docs")]
    if chars_col is not None:
        aggs.append(F.sum(chars_col).alias("n_chars"))
    return df.filter(F.col(domain_col).isNotNull()).groupBy(
        F.col(domain_col).alias("domain")
    ).agg(*aggs)


# HTML text extraction — every web-corpus pipeline's step 1 (CCNet /
# C4 / RefinedWeb all start from extracted WET-style text). The rule
# set is documented so any engine replays it; the patterns keep to
# the Java-regex/RE2 common subset ((?is) flags, non-greedy blocks,
# no lookaround) so the DuckDB oracle runs the SAME expressions.
# alternation instead of a backreferenced close tag: RE2 (the DuckDB
# oracle's engine) has no backreferences
_HTML_DROP_BLOCK_RE = "(?is)" + "|".join(
    f"<{t}\\b[^>]*>.*?</{t}\\s*>"
    for t in ("script", "style", "noscript", "template")
)
_HTML_COMMENT_RE = "(?s)<!--.*?-->"
_HTML_BLOCK_TAG_RE = (
    "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody|"
    "blockquote|section|article|header|footer|pre|hr|form)\\b[^>]*>"
)
_HTML_ANY_TAG_RE = "(?s)<[^>]*>"

_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: so "&amp;lt;" decodes to "&lt;" not "<"
)


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    text_col: str = "text_extracted",
) -> DataFrame:
    """HTML -> visible text, the documented rule set:

    1. drop ``<script>/<style>/<noscript>/<template>`` ELEMENTS
       (non-greedy, case-insensitive, matching close tag) and HTML
       comments — their content is never visible text;
    2. block-level tags (p/div/br/li/h1-6/table rows...) become a
       newline (paragraph structure survives for the downstream
       paragraph ops), every other tag becomes a space;
    3. decode the six ubiquitous entities (&amp; &lt; &gt; &quot;
       &#39; &nbsp;), ampersand LAST so double-escapes stay escaped;
    4. collapse horizontal-whitespace runs to one space, collapse
       newline runs (with surrounding spaces) to one ``\\n``, trim.

    Adds ``text_col`` plus ``n_html_chars`` (raw length, the usual
    extraction-ratio quality signal denominator). Pure JVM
    regexp_replace chain — zero Python, zero shuffle, fully
    pushdown-transparent; at 100 TB this is a map-only pass whose
    cost is the parquet scan itself."""
    c = F.col(html_col)
    out = F.regexp_replace(c, _HTML_DROP_BLOCK_RE, " ")
    out = F.regexp_replace(out, _HTML_COMMENT_RE, " ")
    out = F.regexp_replace(out, _HTML_BLOCK_TAG_RE, "\n")
    out = F.regexp_replace(out, _HTML_ANY_TAG_RE, " ")
    for ent, rep in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(rep))
    out = F.regexp_replace(out, "[ \\t\\x0B\\f\\r]+", " ")
    out = F.regexp_replace(out, " ?\\n[ \\n]*", "\n")
    # anchor-strip: plain trim() drops only spaces, but block tags at
    # the document edges leave boundary newlines too
    out = F.regexp_replace(out, "^[\\n ]+|[\\n ]+$", "")
    return df.withColumn(text_col, out).withColumn(
        "n_html_chars", F.length(c).cast("long")
    )


# Anchor/link extraction — the web-graph source step: every link
# graph (and pagerank over it, ops/graph.py) starts from (page ->
# href, anchor text) rows pulled out of raw HTML. Quoted (double or
# single) and bare attribute values per the HTML spec; an <a> with
# no href (a named anchor) is not a link and emits nothing. RE2-safe
# (alternation, no backreferences/lookaround) so the DuckDB oracle
# replays the SAME pattern.
_HTML_ANCHOR_RE = (
    "(?is)<a\\b[^>]*\\bhref\\s*=\\s*"
    "(\"[^\"]*\"|'[^']*'|[^\\s>]+)[^>]*>(.*?)</a\\s*>"
)
# first match wins; the unanchored-scheme check is LAST so
# "mailto:" never classifies as relative
_LINK_KIND_SPECIAL_RE = "^(?i)(javascript|mailto|tel|data):"
_LINK_KIND_ABSOLUTE_RE = "^[A-Za-z][A-Za-z0-9+.-]*://"


def extract_links(
    df: DataFrame,
    html_col: str = "html",
) -> DataFrame:
    """HTML -> one row per ``<a href=...>...</a>`` link, the web-graph
    source table (crawl frontier building, anchor-text corpora, link
    graphs for :func:`codeindex_spark.ops.graph.pagerank`).

    Output: every input column except ``html_col``, plus

    - ``link_idx``   1-based position of the link in the document;
    - ``href``       the attribute value, surrounding quotes stripped
      and trimmed — NOT resolved against a base URL (resolution needs
      the page URL; compose with :func:`normalize_urls` for absolute
      links);
    - ``anchor_text`` the visible text: inner tags become spaces, the
      six ubiquitous entities decode (``&amp;`` last), whitespace
      collapses to single spaces, trimmed;
    - ``link_kind``  ``special`` (javascript/mailto/tel/data) |
      ``absolute`` (has a scheme) | ``protocol_relative`` (``//..``) |
      ``fragment`` (``#..``) | ``relative``.

    Documents with no links emit no rows (inner explode — a link
    table, not a per-doc annotation). Pure JVM: two regexp passes
    plus posexplode, zero Python, zero shuffle; at 100 TB this is a
    map-only pass bounded by the HTML scan. An ``<a>`` whose close
    tag never comes is skipped (the non-greedy body needs ``</a>``)."""
    from codeindex_spark.util import ensure_parallelism

    c = F.col(html_col)
    pat = F.lit(_HTML_ANCHOR_RE)
    keep = [col for col in df.columns if col != html_col]
    # the two anchor-regex passes are the whole cost: fan doc rows out
    # first so a 1-2-split parquet scan doesn't serialize them (no-op
    # once the scan has enough splits)
    df = ensure_parallelism(df, factor=1)
    out = df.select(
        *keep,
        F.regexp_extract_all(c, pat, F.lit(1)).alias("_hrefs"),
        F.regexp_extract_all(c, pat, F.lit(2)).alias("_anchors"),
    ).select(
        *keep,
        F.posexplode("_hrefs").alias("_i", "_href_raw"),
        F.col("_anchors"),
    )
    href = F.trim(
        F.regexp_replace(F.col("_href_raw"), "^[\"']|[\"']$", "")
    )
    anchor = F.regexp_replace(
        F.col("_anchors")[F.col("_i")], "(?s)<[^>]*>", " "
    )
    for ent, rep in _HTML_ENTITIES:
        anchor = F.replace(anchor, F.lit(ent), F.lit(rep))
    anchor = F.trim(
        F.regexp_replace(anchor, "[ \\t\\n\\r\\x0B\\f]+", " ")
    )
    kind = (
        F.when(href.rlike(_LINK_KIND_SPECIAL_RE), "special")
        .when(href.rlike(_LINK_KIND_ABSOLUTE_RE), "absolute")
        .when(href.startswith("//"), "protocol_relative")
        .when(href.startswith("#"), "fragment")
        .otherwise("relative")
    )
    return out.select(
        *keep,
        (F.col("_i") + 1).cast("long").alias("link_idx"),
        href.alias("href"),
        anchor.alias("anchor_text"),
        kind.alias("link_kind"),
    )


def anchor_stats(
    links: DataFrame,
    target_col: str = "href",
    anchor_col: str = "anchor_text",
    source_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Per-link-target anchor-text rollup: for every distinct value
    of ``target_col`` report the top-``k`` anchor texts pointing at
    it plus the target's totals — the classic inbound-anchor signal
    (Brin & Page 1998 §2.2: anchor text describes the TARGET page;
    every web ranker since aggregates it per target). Consumes the
    output of :func:`extract_links`.

    Output: one row per (target, anchor rank ≤ k) —
    ``target_col``, ``rank`` (1-based; count DESC then anchor ASC,
    fully deterministic), ``anchor_col``, ``n_anchor`` (links with
    this exact anchor), ``n_links`` (all links to the target),
    ``n_docs`` (distinct ``source_col`` values linking to it).

    Scale shape: two shuffles keyed on the target. The per-anchor
    count is map-side combinable, so a million identical "click
    here" links collapse per map task before the exchange; the
    row_number window runs AFTER that pre-aggregation, so a hot
    target costs its number of DISTINCT anchors, never its raw
    inbound-link count. All JVM column algebra, zero Python."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    per_anchor = links.groupBy(target_col, anchor_col).agg(
        F.count(F.lit(1)).alias("n_anchor")
    )
    w = Window.partitionBy(target_col).orderBy(
        F.desc("n_anchor"), F.asc(anchor_col)
    )
    top = (
        per_anchor.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
    totals = links.groupBy(target_col).agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct(source_col).alias("n_docs"),
    )
    return top.join(totals, target_col).select(
        target_col, "rank", anchor_col, "n_anchor", "n_links", "n_docs"
    )


def link_graph(
    links: DataFrame,
    src_col: str = "domain",
    href_col: str = "href",
    kind_col: str = "link_kind",
) -> DataFrame:
    """Distinct (src, dst) domain-level edge list from an
    :func:`extract_links` table — the web-graph construction step
    that feeds :func:`codeindex_spark.ops.graph.pagerank` /
    :func:`~codeindex_spark.ops.graph.hits` (domain authority,
    crawl prioritization).

    Only ``link_kind == 'absolute'`` rows contribute (relative /
    fragment links stay within ``src_col``'s own domain and would
    only add self-loops; protocol-relative links lack the scheme
    :func:`normalize_urls` validates). The destination domain comes
    from the same normalization rules as :func:`normalize_urls`
    (lowercase host, ``www.`` strip, port strip), so the two sides
    of the graph agree on domain spelling. NULL endpoints and
    self-loops are dropped.

    Scale shape: map-only projection + one ``distinct`` shuffle
    (map-side combinable — a page linking its sister domain 10k
    times collapses to one edge per map task). Output is the edge
    table; pagerank's own shuffles are keyed on it downstream."""
    e = links.filter(F.col(kind_col) == "absolute")
    e = normalize_urls(
        e, url_col=href_col, norm_col="_lg_norm", domain_col="_lg_dst"
    )
    return (
        e.filter(
            F.col("_lg_dst").isNotNull()
            & F.col(src_col).isNotNull()
            & (F.col("_lg_dst") != F.col(src_col))
        )
        .select(F.col(src_col).alias("src"), F.col("_lg_dst").alias("dst"))
        .distinct()
    )
