"""DSIR-style data selection: hashed n-gram importance resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" — beyond-reference op; the reference engine has no
training-data surface).

The published recipe: featurize every document as a bag of hashed
n-grams (unigrams + bigrams into ``num_buckets`` buckets), fit two
bag-of-words models — one on the TARGET distribution (the
high-quality corpus you want more of) and one on the RAW pool — and
weight each raw document by its log importance ratio

    log w(x) = sum_{g in grams(x)} [ log p_target(b(g)) - log p_raw(b(g)) ]

then resample with Gumbel-top-k noise so the selection approximates
sampling from the target distribution instead of deterministically
taking the most target-like (and least diverse) documents.

Scale shape: both models are ONE scan + one groupBy over a
``num_buckets``-bounded key (map-side combinable; the shuffle is at
most B rows per partition). The per-bucket log-ratio table is <= B
rows and BROADCASTS, so scoring is a shuffle-free map-side join; the
only scoring exchange is the final per-doc sum. Hashing is
md5-derived (not xxhash) so any engine reproduces the buckets
bit-identically for oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codeindex_spark.ops._text import ws_tokens

__all__ = ["dsir_log_weights", "dsir_resample"]

_tokens = ws_tokens


def _bucket_rows(
    df: DataFrame, text_col: str, n: int, num_buckets: int, extra=()
) -> DataFrame:
    """(*extra, bucket) — one row per order-1..n gram occurrence.

    Gram arrays are built per ROW with the collapse-safe zip_with
    chain (ops/_text.gram_arrays: lambdas touch only lambda
    variables, so projection collapse cannot inline the tokenizer
    into a per-element body — Spark does not CSE through lambda
    functions) and a SINGLE explode emits bare (*extra, gram) rows.
    The r5 shape exploded a position column first, so every exploded
    row carried the doc's full token array through the Generate —
    O(tokens^2) bytes per doc; this shape is O(tokens · n). The
    ensure_parallelism fan-out runs BEFORE the explode (doc-level
    rows, ~1/tokens-per-doc the volume) and doubles as the exchange
    that materializes the token array once per row. bucket =
    first-8-hex of md5(gram) mod B, portable across engines."""
    from codeindex_spark.ops._text import gram_arrays
    from codeindex_spark.util import ensure_parallelism

    toks = ensure_parallelism(
        df.select(*extra, _tokens(text_col).alias("_t")), factor=1
    ).filter(F.size("_t") > 0)
    garrs = gram_arrays(F.col("_t"), n)
    all_grams = garrs[0] if n == 1 else F.concat(*garrs)
    grams = toks.select(*extra, F.explode(all_grams).alias("_g"))
    return grams.select(
        *extra,
        F.pmod(
            F.conv(F.substring(F.md5(F.col("_g")), 1, 8), 16, 10).cast(
                "long"
            ),
            F.lit(num_buckets),
        ).alias("bucket"),
    )


def _bucket_counts(
    df: DataFrame, text_col: str, n: int, num_buckets: int
) -> DataFrame:
    return (
        _bucket_rows(df, text_col, n, num_buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_buckets: int = 10_000,
    smoothing: float = 1.0,
) -> DataFrame:
    """(id_col, n_grams, log_weight) for every raw doc with at least
    one token. Bucket probabilities are add-``smoothing`` estimates
    over exactly ``num_buckets`` cells, so unseen buckets get the
    floor instead of -inf; ``log_weight`` is the summed natural-log
    ratio — higher = more target-like."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if num_buckets < 1:
        raise ValueError("num_buckets must be >= 1")
    cr = _bucket_counts(raw, text_col, n, num_buckets)
    ct = _bucket_counts(target, text_col, n, num_buckets)
    joined = (
        cr.withColumnRenamed("cnt", "cnt_raw")
        .join(
            ct.withColumnRenamed("cnt", "cnt_target"),
            "bucket",
            "full_outer",
        )
        .select(
            "bucket",
            F.coalesce("cnt_raw", F.lit(0)).alias("cnt_raw"),
            F.coalesce("cnt_target", F.lit(0)).alias("cnt_target"),
        )
        # <= num_buckets rows, consumed TWICE (the tot aggregate and
        # the ratio table): without materialization the lazy plan
        # duplicates the whole two-corpus gram subtree — the scoring
        # action re-ran the model-side gram passes twice (plan
        # audited: both FullOuter subtrees appeared 2x)
        .localCheckpoint(eager=False)
    )
    tot = joined.agg(
        F.sum("cnt_raw").cast("double").alias("tot_raw"),
        F.sum("cnt_target").cast("double").alias("tot_target"),
    )
    s = float(smoothing)
    denom_r = F.col("tot_raw") + s * num_buckets
    denom_t = F.col("tot_target") + s * num_buckets
    ratios = joined.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("cnt_target") + s) / denom_t)
            - F.log((F.col("cnt_raw") + s) / denom_r)
        ).alias("log_ratio"),
    )
    scored = _bucket_rows(
        raw, text_col, n, num_buckets, extra=(F.col(id_col),)
    )
    return (
        scored.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("log_ratio").alias("log_weight"),
        )
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: str = "dsir",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel-top-k resampling over (id_col, log_weight): keep the k
    docs with the largest ``log_weight / temperature + Gumbel(0,1)``
    key — equivalent to sampling k docs WITHOUT replacement with
    probability proportional to exp(log_weight / temperature), but
    deterministic and engine-reproducible: the Gumbel draw derives
    from md5(seed:id), never from an RNG. temperature -> 0 approaches
    deterministic top-k; 1.0 is the paper's sampled selection.

    Scale shape: a global top-k (TakeOrderedAndProject — per-partition
    heaps, driver merge of k rows), never a full sort."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(4294967296.0)
    gumbel = -F.log(-F.log(u))
    key = F.col("log_weight") / float(temperature) + gumbel
    return (
        weights.withColumn("_key", key)
        .orderBy(F.desc("_key"), F.asc(id_col))
        .limit(k)
        .drop("_key")
    )
