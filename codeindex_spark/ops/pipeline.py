"""Training-data pipeline operators: scrubbing, chunking, sampling.

The ops a large-scale LLM data pipeline runs between raw corpus and
training shards, each expressed as pure JVM expressions (whole-stage
codegen; no Python in the hot path) and each reproducible in any
engine for oracle checks:

- scrub_text        — URL / email / IPv4 redaction with per-doc
                      counts. Patterns are chosen to evaluate
                      identically under Java regex (Spark) and RE2
                      (DuckDB): no backrefs, no lookaround.
- chunk_documents   — token-window chunking with stride (overlap),
                      the preprocessing step for embedding / training
                      windows. One posexplode of chunk starts per doc;
                      chunk count scales with doc length, so the
                      explode is bounded per row and the result
                      parallelizes by (doc, chunk) downstream.
- pack_chunks       — sequence packing: chunks -> fixed-token-budget
                      training bins via a bucketed window cumsum
                      (deterministic quantized packing; no global
                      order, no single reducer).
- paragraph_dedup   — CCNet corpus-level paragraph dedup: keep the
                      first occurrence of every (normalized)
                      paragraph corpus-wide, reassemble docs from the
                      survivors. Map-side-combinable min per hash —
                      no hot-paragraph window sort.
- sample_by_hash    — deterministic reproducible sampling by content-
                      independent key hash: md5(seed:doc_id) compared
                      lexicographically against a hex threshold.
                      Unlike df.sample(), re-runs and engines agree
                      row-for-row, and the sample is stable under
                      repartition — the property a 100-TB pipeline
                      needs for resumable sharding.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from codeindex_spark.ops._text import ws_tokens

# ordered: URLs first (an email-shaped string inside a URL must count
# as the URL), then emails, then bare IPv4
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, text_clean, n_urls, n_emails, n_ips): redact URLs,
    emails, and IPv4 addresses to fixed placeholder tokens, counting
    each. Counts are taken on the PRE-redaction text of each stage so
    an email inside a URL counts once, as a URL."""
    from codeindex_spark.util import ensure_parallelism

    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, URL_RE, "<URL>")
    t2 = F.regexp_replace(t1, EMAIL_RE, "<EMAIL>")
    t3 = F.regexp_replace(t2, IPV4_RE, "<IP>")
    # 6 corpus-wide regex passes fused into one projection — fan the
    # rows out first so a 1-2-split scan doesn't serialize them
    df = ensure_parallelism(df, factor=1)
    return df.select(
        F.col(id_col).alias("doc_id"),
        t3.alias("text_clean"),
        F.regexp_count(t0, F.lit(URL_RE)).alias("n_urls"),
        F.regexp_count(t1, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t2, F.lit(IPV4_RE)).alias("n_ips"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int = 96,
) -> DataFrame:
    """Token-window chunks: (doc_id, chunk_id, n_chunk_tokens,
    chunk_text). Whitespace tokens; chunk i spans tokens
    [i*stride, i*stride + chunk_tokens); starts step by stride while
    start < n_tokens, so the last chunk may be short and overlap =
    chunk_tokens - stride. Empty docs produce no chunks."""
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    from codeindex_spark.util import ensure_parallelism

    df = ensure_parallelism(df, factor=1)  # explode-heavy: never run on 1-2 splits
    toks = ws_tokens(text_col, lower=False)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    out = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        n.alias("_n"),
        F.posexplode(starts).alias("chunk_id", "start"),
    ).filter((F.col("start") < F.col("_n")) & (F.col("_n") > 0))
    chunk = F.slice(F.col("_toks"), F.col("start") + 1, chunk_tokens)
    return out.select(
        "doc_id",
        "chunk_id",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def pack_chunks(
    chunks: DataFrame,
    budget_tokens: int = 2048,
    num_buckets: int | None = None,
    doc_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tok_col: str = "n_chunk_tokens",
) -> DataFrame:
    """Sequence packing: assign token chunks to fixed-budget training
    bins — (doc_id, chunk_id, bucket, pack_id, pack_offset) where
    pack_offset is the token start of the chunk inside its pack.

    Contiguous quantized packing: within a deterministic bucket
    (doc_id % num_buckets), chunks are laid out in (doc_id,
    chunk_id) order and pack_id = floor(tokens_before / budget) —
    the boundary chunk may overflow its pack by at most one chunk
    length (standard overflow-then-truncate packing). Fully
    deterministic and engine-reproducible, unlike greedy first-fit
    whose running reset is inherently sequential state.

    Scale shape: the window runs per bucket — num_buckets bounds
    task count, the per-bucket sort is the only per-row cost, and
    buckets are independent (no global order, no single reducer).
    When the caller does not pass num_buckets it scales with the
    cluster (4x defaultParallelism, floor 64) so a fixed small
    default never caps parallelism or balloons per-bucket sort size
    on a large cluster. Pass it explicitly for reproducible bucket
    assignment across differently-sized clusters.
    """
    if num_buckets is None:
        num_buckets = max(
            64, 4 * chunks.sparkSession.sparkContext.defaultParallelism
        )
    if budget_tokens <= 0 or num_buckets <= 0:
        raise ValueError("budget_tokens and num_buckets must be positive")
    from pyspark.sql import Window

    # pmod, not %: negative doc ids (e.g. xxhash64 keys) must still
    # land in [0, num_buckets)
    bucket = F.pmod(F.col(doc_col), F.lit(num_buckets)).cast("int")
    w = (
        Window.partitionBy("bucket")
        .orderBy(doc_col, chunk_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = chunks.select(
        doc_col, chunk_col, F.col(tok_col), bucket.alias("bucket")
    ).withColumn(
        "_before", F.coalesce(F.sum(tok_col).over(w), F.lit(0))
    )
    # `div` is exact integral division — a float floor() would lose
    # integer precision once a bucket's cumulative tokens pass 2^53
    return out.select(
        doc_col,
        chunk_col,
        "bucket",
        F.expr(f"_before div {int(budget_tokens)}").cast("long").alias(
            "pack_id"
        ),
        (F.col("_before") % budget_tokens).cast("long").alias("pack_offset"),
    )


def sample_by_hash_stratified(
    df: DataFrame,
    rates: "dict[str, float]",
    key_col: str,
    seed: str = "0",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling — the domain-mixing
    primitive: each key_col value gets its own rate (e.g. lang or
    source weights), rows of unlisted keys default to default_rate.
    Same md5-threshold machinery as sample_by_hash, so the sample is
    reproducible row-for-row across runs, engines, and repartitions,
    and nested across rates per stratum (raising one stratum's rate
    only ADDS rows of that stratum)."""
    for k, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for {k!r} must be in [0,1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0,1], got {default_rate}")
    thr = None
    for k in sorted(rates):
        cond = F.col(key_col) == k
        lit = F.lit(hash_threshold(rates[k]))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    if thr is None:
        thr = F.lit(hash_threshold(default_rate))
    else:
        thr = thr.otherwise(F.lit(hash_threshold(default_rate)))
    return df.filter(sample_key(seed, F.col(id_col)) < thr)


def hash_threshold(rate: float) -> str:
    """8-hex-digit threshold: keep when the first 8 md5 hex chars are
    lexicographically below it (lowercase hex order == numeric order).
    Engine-portable — any md5 produces the same string."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    if rate == 1.0:
        return "g"  # 'g' > 'f' in hex order: keeps every row
    # min() not &-mask: the largest double below 1.0 rounds UP to
    # exactly 2^32, and a mask would wrap it to 0 (sample nothing
    # for a ~100% rate) instead of saturating
    return format(min(int(rate * 0x100000000), 0xFFFFFFFF), "08x")


def sample_key(seed: str, id_col: Column) -> Column:
    return F.substring(
        F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string"))), 1, 8
    )


def sample_by_hash(
    df: DataFrame,
    rate: float,
    seed: str = "0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic ~rate sample keyed on md5(seed:id): stable under
    re-runs, repartition, and engine choice (df.sample() is none of
    these). Different seeds give independent samples; the same seed
    gives a superset/subset relation across rates (nested samples —
    a bigger rate keeps every row a smaller rate kept), which is what
    makes held-out splits at 100 TB reproducible."""
    return df.filter(sample_key(seed, F.col(id_col)) < hash_threshold(rate))


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    partition_col: str | None = None,
    normalize: bool = True,
    drop_empty: bool = True,
) -> DataFrame:
    """CCNet-style corpus-level paragraph deduplication (Wenzek et
    al. 2020, "CCNet: Extracting High Quality Monolingual Datasets
    from Web Crawl Data"): split every doc on ``sep``, hash each
    paragraph (normalized: lowercased, whitespace-collapsed), keep
    only the FIRST occurrence corpus-wide — the (doc, position)
    minimum — and reassemble each doc from its surviving paragraphs
    in original order. Boilerplate (headers, nav bars, cookie
    banners) collapses to its first occurrence; fully-boilerplate
    docs disappear (``drop_empty``).

    Returns (id_col, text, n_paras, n_kept).

    ``partition_col`` scopes the dedup (CCNet dedups within language
    shards): the hash key becomes (partition, hash), so identical
    paragraphs in different partitions both survive.

    Scale shape: one posexplode, then groupBy(hash).min(struct) —
    map-side combinable, so a paragraph duplicated a million times
    (THE hot case: empty lines, cookie banners) reduces to one row
    per partition before the exchange, never a million-row window
    partition sort. The winner set joins back on (hash, doc, idx) —
    the hot hash carries ONE row on the agg side, m on the probe
    side, emitting 1. Reassembly is a per-doc groupBy with an
    array_sort, bounded by paragraphs-per-doc."""
    keys = [partition_col] if partition_col else []
    para = F.col("_para")
    norm = (
        F.lower(F.trim(F.regexp_replace(para, r"\s+", " ")))
        if normalize
        else para
    )
    exploded = df.select(
        F.col(id_col),
        *keys,
        # split's pattern arg is a Java regex; the separator is a
        # LITERAL (the docstring contract, and array_join below uses
        # it literally) — escape it so '|', '.', '+' seps don't
        # explode every character boundary
        F.posexplode(
            F.split(F.col(text_col), F.lit(re.escape(sep)))
        ).alias("_idx", "_para"),
    ).withColumn("_h", F.md5(norm))
    # empty/whitespace-only paragraphs are separators, not content:
    # dropped up front so they neither dedup against each other nor
    # survive reassembly
    exploded = exploded.filter(F.trim(para) != "")
    first = exploded.groupBy(*keys, "_h").agg(
        F.min(F.struct(F.col(id_col).alias("d"), F.col("_idx").alias("i"))
              ).alias("_w")
    )
    if keys:
        # NULL partition keys must still match their own group — a
        # null-unsafe equi-join would orphan every paragraph in the
        # NULL shard (docs come back empty / silently dropped). Same
        # eqNullSafe handling as spans._noncanonical.
        k = keys[0]
        fw = first.select(
            F.col(k).alias("_g"), F.col("_h").alias("_ch"), "_w"
        )
        kept = exploded.join(
            fw,
            exploded[k].eqNullSafe(fw["_g"]) & (F.col("_h") == F.col("_ch")),
        ).drop("_g", "_ch")
    else:
        kept = exploded.join(first, "_h")
    kept = kept.where(
        (F.col("_w.d") == F.col(id_col)) & (F.col("_w.i") == F.col("_idx"))
    )
    per_doc_n = exploded.groupBy(id_col).agg(
        F.count("*").alias("n_paras")
    )
    kept_agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_para"))),
                lambda s: s["_para"],
            ),
            sep,
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    if drop_empty:
        return per_doc_n.join(kept_agg, id_col).select(
            id_col, "text", "n_paras", "n_kept"
        )
    return (
        df.select(id_col)
        .join(per_doc_n, id_col, "left")
        .join(kept_agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


def line_frequency_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    max_occurrences: int = 1,
    normalize: bool = True,
    drop_empty: bool = True,
) -> DataFrame:
    """RefinedWeb-style repeated-line removal (Penedo et al. 2023
    §G.2, after MassiveText/Gopher): a line whose normalized form
    occurs MORE than ``max_occurrences`` times corpus-wide is removed
    from EVERY document — boilerplate (nav bars, cookie banners,
    license headers) disappears entirely, unlike
    :func:`paragraph_dedup` where the first occurrence survives.
    Returns (id_col, text, n_lines, n_kept); docs whose every line is
    boilerplate are dropped (``drop_empty``).

    Scale shape: one posexplode, then groupBy(hash).count — map-side
    combinable, so the million-copy hot line reduces to one count row
    per map partition before the exchange. Only OVER-threshold hashes
    survive the filter, so the removal table holds just the
    boilerplate vocabulary (tiny vs the corpus); the left_anti join
    against it broadcasts under AQE when it fits, and a hot hash
    carries ONE row on the build side regardless of its corpus
    frequency. Reassembly is one per-doc groupBy bounded by
    lines-per-doc."""
    para = F.col("_line")
    norm = (
        F.lower(F.trim(F.regexp_replace(para, r"\s+", " ")))
        if normalize
        else para
    )
    exploded = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), F.lit(re.escape(sep)))
        ).alias("_idx", "_line"),
    ).withColumn("_h", F.md5(norm))
    exploded = exploded.filter(F.trim(para) != "")
    hot = (
        exploded.groupBy("_h")
        .count()
        .filter(F.col("count") > max_occurrences)
        .select("_h")
    )
    kept = exploded.join(hot, "_h", "left_anti")
    per_doc_n = exploded.groupBy(id_col).agg(F.count("*").alias("n_lines"))
    kept_agg = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_idx", "_line"))),
                lambda s: s["_line"],
            ),
            sep,
        ).alias("text"),
        F.count("*").alias("n_kept"),
    )
    if drop_empty:
        return per_doc_n.join(kept_agg, id_col).select(
            id_col, "text", "n_lines", "n_kept"
        )
    return (
        df.select(id_col)
        .join(per_doc_n, id_col, "left")
        .join(kept_agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("text", F.lit("")).alias("text"),
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


# invisible / control codepoints stripped by normalize_text — an
# EXPLICIT list (not Unicode category tables) so any engine can
# reproduce it with a plain character-class regex: C0 controls minus
# \t \n, DEL, C1 block, soft hyphen, zero-widths + joiners, BOM
STRIP_CODEPOINTS = frozenset(
    [*range(0x00, 0x09), 0x0B, 0x0C, 0x0D, *range(0x0E, 0x20), 0x7F]
    + [*range(0x80, 0xA0)]
    + [0xAD, 0x200B, 0x200C, 0x200D, 0xFEFF]
)
_STRIP_TABLE = {cp: None for cp in STRIP_CODEPOINTS}


def normalize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    form: str = "NFC",
) -> DataFrame:
    """(doc_id, text_norm, n_stripped): Unicode-normalize (NFC by
    default — combining sequences compose, so 'e'+U+0301 and 'é'
    dedup/tokenize identically) and strip the STRIP_CODEPOINTS
    invisibles (zero-widths, soft hyphens, C0/C1 controls except tab
    and newline) that break exact dedup and token counting.
    ``n_stripped`` counts removed codepoints — the audit column.

    Arrow-batched kernel (stdlib unicodedata; normalization is not
    expressible in Spark SQL built-ins); zero shuffles."""
    import unicodedata

    from pyspark.sql import types as T

    from codeindex_spark.util import ensure_parallelism

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    # the id column keeps ITS OWN name and type (a string para_id is
    # as valid an id as a long doc_id; renaming it would break the
    # caller's downstream joins)
    schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("text_norm", T.StringType(), False),
            T.StructField("n_stripped", T.LongType(), False),
        ]
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            outs, counts = [], []
            for s in pdf[text_col].fillna(""):
                norm = unicodedata.normalize(form, s)
                stripped = norm.translate(_STRIP_TABLE)
                outs.append(stripped)
                counts.append(len(norm) - len(stripped))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "text_norm": outs,
                    "n_stripped": counts,
                }
            )

    return ensure_parallelism(df.select(id_col, text_col)).mapInPandas(
        kernel, schema=schema
    )
