"""Exact substring (span-level) deduplication.

Doc-level dedup (exact/minhash/simhash in ops/dedup.py) misses the
dominant contamination mode in web/code corpora: a license header,
nav bar, or boilerplate function duplicated VERBATIM inside otherwise
distinct documents. The ExactSubstr method (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better", ACL)
removes every repeated span above a token threshold, keeping one
canonical occurrence. The paper builds a corpus-wide suffix array —
inherently single-machine. This module re-expresses the semantics
Spark-first as fixed-width token windows:

* every ``window``-token window of every doc is hashed (the hash is
  built INSIDE the token array via transform+slice, so the exploded
  rows carry only (doc, pos, hash) — the token array itself is never
  duplicated per position);
* a window is *duplicated* when its gram occurs anywhere else in the
  corpus; the corpus-wide FIRST occurrence (min (doc, start)) is
  canonical and survives;
* a repeated region longer than ``window`` is exactly the union of
  its duplicated windows, so removing covered tokens reproduces the
  suffix-array behavior for every repeat of length >= window
  (repeats shorter than ``window`` are kept — same threshold
  semantics as the paper's 50-token cutoff).

Scale shape: the window pass is one posexplode producing O(total
tokens) compact rows; the dup-group agg is a map-side-combinable
count+min keyed on the gram hash (a boilerplate gram repeated a
million times reduces to one row per partition before the
exchange); coverage/removal are per-(doc, position) joins — never a
corpus-wide sort, never an uncapped self-join. Per-row hashing work
is O(window), the price of collision-safe md5 over a rolling hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as SparkWindow
from pyspark.storagelevel import StorageLevel

from codeindex_spark.ops._text import ws_tokens

__all__ = ["duplicate_span_stats", "remove_duplicate_spans"]


def _windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int,
    partition_col: str | None = None,
):
    """(base, wins): base = (doc_id, _t tokens, _n) for every doc;
    wins = (doc_id, _s 1-based window start, _h gram md5) for every
    doc with >= window tokens. With ``partition_col`` both carry the
    scope column ``_g`` and the dedup key becomes (_g, _h)."""
    if window < 2:
        raise ValueError("window must be >= 2 tokens")
    from codeindex_spark.ops._text import gram_array
    from codeindex_spark.util import ensure_parallelism

    keys = [F.col(partition_col).alias("_g")] if partition_col else []
    knames = ["_g"] if partition_col else []
    # fan out doc-level rows BEFORE the gram explode: the scan of a
    # few-row-group parquet packs into 1-2 splits, which would
    # serialize the O(tokens · window) md5-window pass behind it
    base = ensure_parallelism(
        df.select(
            F.col(id_col).alias("doc_id"),
            *keys,
            ws_tokens(text_col, lower=False).alias("_t"),
        ),
        factor=1,
    ).withColumn("_n", F.size("_t"))
    grams = F.transform(
        F.sequence(F.lit(1), F.col("_n") - window + 1),
        lambda s: F.md5(F.array_join(F.slice("_t", s, window), " ")),
    )
    wins = (
        base.filter(F.col("_n") >= window)
        .select("doc_id", *knames, F.posexplode(grams).alias("_i", "_h"))
        .select("doc_id", *knames, (F.col("_i") + 1).alias("_s"), "_h")
    )
    return base, wins


def _noncanonical(wins: DataFrame, scoped: bool = False) -> DataFrame:
    """Duplicated windows MINUS the canonical first occurrence:
    (doc_id, _s). Canonical = corpus-wide min (doc_id, start) per
    gram — per (scope, gram) when ``scoped`` — so the survivor is
    deterministic under any partitioning.

    ONE window pass over the gram partition (count + min-struct with
    unbounded frames) replaces the r5 groupBy + self-join: that shape
    executed the whole tokenize+md5-window ``wins`` subtree TWICE
    (once under the canon aggregate, once as the probe side) and paid
    a second exchange for the join. Window partitioning groups NULL
    scope keys like any other value, so the scoped variant needs no
    null-safe join special case. Skew note: a corpus-wide mega-hot
    gram sorts on one reducer here where the old agg pre-combined
    map-side — but the old probe side of the self-join shuffled the
    same hot key to the same reducer anyway, so the worst-case
    reducer load is unchanged while every gram pays one pass instead
    of two."""
    gk = ["_g", "_h"] if scoped else ["_h"]
    w = SparkWindow.partitionBy(*gk)
    return (
        wins.select(
            "doc_id",
            "_s",
            F.count("*").over(w).alias("_c"),
            F.min(
                F.struct(F.col("doc_id").alias("d"), F.col("_s").alias("s"))
            ).over(w).alias("_w"),
        )
        .where(
            (F.col("_c") > 1)
            & ~(
                (F.col("_w.d") == F.col("doc_id"))
                & (F.col("_w.s") == F.col("_s"))
            )
        )
        .select("doc_id", "_s")
    )


def _covered(nc: DataFrame, window: int) -> DataFrame:
    """Unique (doc_id, _p) token positions lying inside any
    non-canonical duplicated window. A heavily duplicated region has
    overlapping windows at nearly every start, so the naive
    explode-then-distinct shape shuffles O(nc x window) rows (x50 at
    the paper's threshold) just to throw the overlaps away. Instead,
    a per-doc lag over sorted starts gives each window only its NEW
    positions — [max(s, prev_s + window), s + window) — so the
    explode emits every covered position exactly once and no distinct
    pass is needed. The lag shuffle partitions by doc, bounded by
    windows-per-doc <= doc length. Starts are unique per (doc, s), so
    the sequence is never empty (prev < s always)."""
    wspec = SparkWindow.partitionBy("doc_id").orderBy("_s")
    prev_end = F.lag("_s").over(wspec) + window
    return nc.select(
        "doc_id",
        "_s",
        F.greatest(F.col("_s"), F.coalesce(prev_end, F.col("_s"))).alias("_lo"),
    ).select(
        "doc_id",
        F.explode(F.sequence(F.col("_lo"), F.col("_s") + window - 1)).alias(
            "_p"
        ),
    )


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    partition_col: str | None = None,
) -> DataFrame:
    """Per-doc duplicated-span accounting: (doc_id, n_tokens,
    n_windows, n_dup_windows, dup_token_fraction). ``n_dup_windows``
    counts this doc's windows slated for removal (duplicated AND not
    the corpus-wide canonical occurrence); ``dup_token_fraction`` is
    the fraction of the doc's tokens covered by at least one such
    window — the quantity you threshold to drop boilerplate-heavy
    docs outright instead of scrubbing them. ``partition_col`` scopes
    the dedup (CCNet-style per-language shards): identical spans in
    different partitions both survive."""
    base, wins = _windows(df, id_col, text_col, window, partition_col)
    # nc feeds two aggregations (window counts + coverage); persist
    # so the corpus-wide window pass runs once, DISK_ONLY because at
    # corpus scale even the duplicated-window subset dwarfs memory
    # (same discipline as the jaccard shingle cache, dedup.py)
    nc = _noncanonical(wins, scoped=partition_col is not None).persist(
        StorageLevel.DISK_ONLY
    )
    # the two per-doc aggregates are small (one row per doc with any
    # dup); eager-localCheckpoint them so nc can be released NOW —
    # otherwise every call leaks one disk cache for the session
    # lifetime (the returned plan would keep the reference alive)
    ndup = nc.groupBy("doc_id").agg(
        F.count("*").alias("_ndup")
    ).localCheckpoint(eager=True)
    ncov = _covered(nc, window).groupBy("doc_id").agg(
        F.count("*").alias("_covered")
    ).localCheckpoint(eager=True)
    nc.unpersist()
    zero = F.lit(0).cast("long")
    return (
        base.join(ndup, "doc_id", "left")
        .join(ncov, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_n").cast("long").alias("n_tokens"),
            F.greatest(F.col("_n") - window + 1, F.lit(0))
            .cast("long")
            .alias("n_windows"),
            F.coalesce(F.col("_ndup"), zero).alias("n_dup_windows"),
            F.when(F.col("_n") > 0, F.round(
                F.coalesce(F.col("_covered"), zero)
                / F.col("_n").cast("double"),
                6,
            )).otherwise(F.lit(0.0)).alias("dup_token_fraction"),
        )
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    partition_col: str | None = None,
) -> DataFrame:
    """Scrubbed corpus: every token covered by a non-canonical
    duplicated window is dropped; survivors rejoin in original order.
    Returns (doc_id, text, n_tokens, n_kept_tokens) for EVERY input
    doc — a fully-boilerplate doc comes back with text='' and
    n_kept_tokens=0 so the caller decides whether to drop it.

    The removal join is per-(doc, position) — exploded token rows
    left-anti joined against the covered set — which stays linear in
    corpus size (no per-doc array_contains scan that would go
    quadratic on long heavily-covered docs). ``partition_col`` scopes
    the dedup like duplicate_span_stats."""
    base, wins = _windows(df, id_col, text_col, window, partition_col)
    cov = _covered(
        _noncanonical(wins, scoped=partition_col is not None), window
    )
    pos = base.select(
        "doc_id", F.posexplode("_t").alias("_i", "_tok")
    ).select("doc_id", (F.col("_i") + 1).alias("_p"), "_tok")
    kept = pos.join(cov, ["doc_id", "_p"], "left_anti")
    kept_agg = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_p", "_tok"))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("_text"),
        F.count("*").alias("_nk"),
    )
    return base.join(kept_agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("_text"), F.lit("")).alias("text"),
        F.col("_n").cast("long").alias("n_tokens"),
        F.coalesce(F.col("_nk"), F.lit(0).cast("long")).alias("n_kept_tokens"),
    )
