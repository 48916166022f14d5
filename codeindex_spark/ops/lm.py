"""Stupid-backoff n-gram language-model scoring — the CCNet-style
perplexity quality filter for LLM training corpora (beyond-reference
op; the reference engine has no LM surface).

Why stupid backoff (Brants et al. 2007, "Large Language Models in
Machine Translation"): at web scale the LM itself is a distributed
table, and stupid backoff is the published scheme designed exactly
for that setting — no discounting pass over the full count table,
each order's score is a pure ratio of counts, so training is one
groupBy per order and scoring is a handful of hash joins. Quality
filtering only needs a *ranking* signal, which is the regime where
stupid backoff matches smoothed Kneser-Ney.

Scoring (alpha = 0.4, the published constant):

    S(w_i | ctx) = count(ngram)/count(ctx)           highest order seen
                 | alpha * S(w_i | shorter ctx)       backoff
    S(w_i)       = (count(w_i) + 1) / (total + V)     add-one unigram
    S(OOV)       = 1 / (total + V)                    unigram floor

Per-doc output is the mean log10 score per token — a perplexity
proxy: lower (more negative) = less like the training corpus.

Scale shape: training is ONE corpus scan (every order's grams explode
from the same token array) + one groupBy; conditional probabilities
join order-k counts to their order-(k-1) context counts at train
time, so scoring never recomputes contexts. The scored join is keyed
on gram strings — hot grams (stop words) are exactly the AQE
skew-join case, and a min_count-pruned model is usually small enough
to broadcast (``broadcast_model=True``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codeindex_spark.ops._text import ws_tokens

__all__ = ["lm_train", "lm_score", "perplexity_buckets"]

_OOV_ORDER = 0  # model row holding the unigram floor probability

_tokens = ws_tokens


def _order_gram_structs(tok_col: str, i_col: str, n: int):
    """Array of (order, gram) structs for one token position: the
    k-gram ENDING nowhere — STARTING at position ``i_col`` — for each
    order k whose window fits (null gram otherwise, filtered by the
    caller). Built from plain column expressions, deliberately not
    nested higher-order-function lambdas: nesting ``F.transform``
    inside ``F.transform`` miscaptures the lambda variables (observed
    on Spark 4.1: grams mis-tagged and positions collapsed)."""
    t, i = F.col(tok_col), F.col(i_col)
    return F.array(
        *[
            F.struct(
                F.lit(k).alias("order"),
                F.when(
                    i + (k - 1) <= F.size(t),
                    F.array_join(F.slice(t, i, k), " "),
                ).alias("gram"),
            )
            for k in range(1, n + 1)
        ]
    )


def lm_train(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Train the model: one corpus scan explodes every order's grams
    (tagged structs flattened into a single explode), one groupBy
    counts them, then each order k >= 2 joins its counts to the
    order-(k-1) context counts to become a conditional probability.
    Returns (order, gram, p):

    - order k >= 2: p = count(gram) / count(context)
    - order 1:      p = (count + 1) / (total + V)   (add-one)
    - order 0:      the single OOV floor row, p = 1 / (total + V)

    ``min_count`` prunes orders >= 2 below the threshold (their
    positions back off) — the knob that keeps the model broadcastable;
    unigrams are never pruned (they are the floor)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    from codeindex_spark.util import ensure_parallelism

    toks = ensure_parallelism(
        docs.select(_tokens(text_col).alias("t")), factor=1
    ).filter(F.size("t") > 0)
    pos = toks.select(
        "t", F.explode(F.sequence(F.lit(1), F.size("t"))).alias("i")
    )
    counts = (
        pos.select(F.explode(_order_gram_structs("t", "i", n)).alias("og"))
        .filter(F.col("og.gram").isNotNull())
        .select("og.order", "og.gram")
        .groupBy("order", "gram")
        .agg(F.count("*").alias("cnt"))
        # materialize ONCE: every model branch (unigram probs, the
        # total/V scalar, each order's conditional join and its
        # context side, the OOV floor) reads the count table — without
        # this the lazy plan re-scans the full corpus per branch
        # (observed: 6 parquet scans at n=3). The count table is
        # model-sized, not corpus-sized.
        .localCheckpoint(eager=True)
    )
    uni = counts.filter(F.col("order") == 1)
    # single-row aggregate, broadcast-joined everywhere it is needed
    scal = uni.agg(
        F.sum("cnt").cast("double").alias("total"),
        F.count("*").cast("double").alias("v"),
    )
    p1 = uni.crossJoin(F.broadcast(scal)).select(
        F.lit(1).alias("order"),
        "gram",
        ((F.col("cnt") + 1.0) / (F.col("total") + F.col("v"))).alias("p"),
    )
    oov = scal.select(
        F.lit(_OOV_ORDER).alias("order"),
        F.lit("").alias("gram"),
        (F.lit(1.0) / (F.col("total") + F.col("v"))).alias("p"),
    )
    parts = [oov, p1]
    for k in range(2, n + 1):
        ck = counts.filter(
            (F.col("order") == k) & (F.col("cnt") >= min_count)
        ).select("gram", "cnt")
        ctx = counts.filter(F.col("order") == k - 1).select(
            F.col("gram").alias("ctx"), F.col("cnt").alias("ctx_cnt")
        )
        # context = the gram minus its last word
        with_ctx = ck.withColumn(
            "ctx",
            F.array_join(
                F.slice(F.split(F.col("gram"), " "), 1, k - 1), " "
            ),
        )
        parts.append(
            with_ctx.join(ctx, "ctx").select(
                F.lit(k).alias("order"),
                "gram",
                (F.col("cnt") / F.col("ctx_cnt")).alias("p"),
            )
        )
    model = parts[0]
    for p in parts[1:]:
        model = model.unionByName(p)
    return model


def lm_score(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int | None = None,
    alpha: float = 0.4,
    broadcast_model: bool = False,
) -> DataFrame:
    """Score every doc: (id_col, n_tokens, avg_log10_p). Each token
    position carries its order-1..n gram keys; n left joins against
    the model resolve the highest order present; backoff multiplies
    alpha per order skipped. ``avg_log10_p`` is the mean log10
    stupid-backoff score per token (higher = more corpus-like).

    ``n`` defaults to the model's max surviving ``order`` (one tiny
    aggregate job): scoring a bigram model at n=3 would charge every
    full-context position a spurious alpha backoff (no order-3 rows
    can ever match). An EXPLICIT ``n`` above that is still honored —
    a min_count-pruned model may legitimately have lost its entire
    top order while the caller scores at the trained order so pruned
    grams back off one level deeper."""
    if n is None:
        trained = model.agg(F.max("order")).first()[0]
        if trained is None or trained < 1:
            raise ValueError("model has no gram rows (order >= 1)")
        n = int(trained)
    if n < 1:
        raise ValueError("n must be >= 1")
    m = F.broadcast(model) if broadcast_model else model
    t = F.col("t")
    from codeindex_spark.util import ensure_parallelism

    pos = ensure_parallelism(
        docs.select(F.col(id_col), _tokens(text_col).alias("t")), factor=1
    ).filter(F.size("t") > 0)
    # one struct per position holding every order's key (null when
    # the position has too little left context for that order)
    keys = F.transform(
        F.sequence(F.lit(1), F.size(t)),
        lambda i: F.struct(
            *[
                F.when(
                    i >= k, F.array_join(F.slice(t, i - k + 1, k), " ")
                ).alias(f"g{k}")
                for k in range(1, n + 1)
            ]
        ),
    )
    scored = pos.select(F.col(id_col), F.explode(keys).alias("ks")).select(
        id_col, *[F.col(f"ks.g{k}") for k in range(1, n + 1)]
    )
    for k in range(1, n + 1):
        mk = m.filter(F.col("order") == k).select(
            F.col("gram").alias(f"g{k}"), F.col("p").alias(f"p{k}")
        )
        scored = scored.join(mk, f"g{k}", "left")
    oov = m.filter(F.col("order") == _OOV_ORDER).select(
        F.col("p").alias("p_oov")
    )
    scored = scored.crossJoin(F.broadcast(oov))
    # highest order wins; each UNSEEN-gram backoff multiplies alpha
    # once. The penalty is relative to the highest order the position
    # HAS context for (early positions start lower, unpenalized):
    # avail = min(position, n) = number of non-null keys.
    avail = sum(
        (
            F.when(F.col(f"g{k}").isNotNull(), 1).otherwise(0)
            for k in range(2, n + 1)
        ),
        F.lit(1),
    )
    choice = F.coalesce(
        *[
            F.col(f"p{k}")
            * F.pow(F.lit(float(alpha)), (avail - F.lit(k)).cast("double"))
            for k in range(n, 0, -1)
        ],
        F.col("p_oov")
        * F.pow(F.lit(float(alpha)), (avail - F.lit(1)).cast("double")),
    )
    return (
        scored.withColumn("lp", F.log10(choice))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.avg("lp").alias("avg_log10_p"),
        )
    )


def perplexity_buckets(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str | None = None,
    cuts: tuple[float, ...] = (1 / 3, 2 / 3),
    labels: tuple[str, ...] = ("tail", "middle", "head"),
    exact: bool = False,
    n: int | None = None,
    alpha: float = 0.4,
    broadcast_model: bool = False,
    round_to: int | None = 6,
) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020 §4.4): score
    every doc against a target-domain LM, then bucket by corpus
    score terciles — ``head`` = most target-like (lowest
    perplexity / highest avg_log10_p), the slice CCNet keeps for
    training. Returns (id_col, n_tokens, avg_log10_p, bucket) with
    avg_log10_p rounded to ``round_to`` BEFORE thresholding so the
    boundary comparison is engine-reproducible.

    ``partition_col`` computes thresholds per group (CCNet buckets
    per language); thresholding is done by ``score_buckets`` — a
    bounded per-group agg broadcast back, never a corpus sort. Docs
    with no tokens are dropped (lm_score's contract)."""
    from codeindex_spark.ops.analysis import score_buckets

    scored = lm_score(
        docs,
        model,
        id_col=id_col,
        text_col=text_col,
        n=n,
        alpha=alpha,
        broadcast_model=broadcast_model,
    )
    if partition_col:
        scored = scored.join(
            docs.select(F.col(id_col), F.col(partition_col)), id_col
        )
    if round_to is not None:
        scored = scored.withColumn(
            "avg_log10_p", F.round("avg_log10_p", round_to)
        )
    return score_buckets(
        scored,
        "avg_log10_p",
        cuts=cuts,
        labels=labels,
        partition_col=partition_col,
        exact=exact,
        round_to=round_to,
    )
