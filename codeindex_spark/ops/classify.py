"""Model-based quality / domain classification: multinomial Naive
Bayes log-odds over hashed n-gram buckets.

Public designs: web-pipeline quality filtering trains a linear text
classifier on a trusted target corpus vs the raw pool and keeps
documents the model scores target-like — fastText classifiers in
CCNet (Wenzek 2020), GPT-3's WebText-vs-CommonCrawl LR filter
(Brown 2020 App. A), DataComp/FineWeb-Edu. This module is the
closed-form member of that family: multinomial NB with log-count
ratios (the "NB" half of NBSVM, Wang & Manning 2012, ACL). Unlike
SGD training, NB weights are pure count aggregates, so training is
ONE distributed pass, deterministic under any partitioning, and
independently replayable by the DuckDB oracle — the same reasons
ops/dsir.py uses closed-form bag-of-buckets models.

The reference engine has no training-data surface (it indexes code
text); this is part of the repo's beyond-reference pipeline and
shares the DSIR featurization contract: order-1..n word grams,
bucket = first-8-hex of md5(gram) mod B (`ops/dsir.py:_bucket_rows`),
portable across engines bit-exactly.

Scale shape: training is one scan + one map-side-combinable groupBy
over a <=num_buckets-bounded key (the shuffle carries at most B rows
per map partition); the weight table is <=B rows and BROADCASTS;
scoring joins grams to weights map-side and reduces per doc — the
only corpus-keyed shuffle is the final per-doc sum. Nothing is ever
O(corpus^2) and no stage holds more than B model rows.

Scoring identity (the fold-the-constant form, mirrored exactly by
the SQL oracle):

    score(d) = log_prior + n_grams(d) * C + sum_g lr(bucket(g))
    lr(b)    = ln((cnt_pos_b + a) / (cnt_neg_b + a))
    C        = ln((tot_neg + a*B) / (tot_pos + a*B))

so buckets never seen in training contribute exactly 0 to the sum
(ln(a/a)) and are accounted for by the n_grams * C term — the weight
table needs no row for them.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from codeindex_spark.ops.dsir import _bucket_rows

__all__ = ["NBModel", "nb_train", "nb_score", "nb_filter"]


class NBModel(NamedTuple):
    """A trained hashed-n-gram NB classifier. ``weights`` is a
    (bucket, lr) DataFrame with <= num_buckets rows (broadcast at
    scoring time); the scalars make the model self-describing so
    nb_score cannot be called with mismatched featurization knobs."""

    weights: DataFrame
    log_prior: float
    gram_const: float  # C above: per-gram smoothing-mass correction
    n: int
    num_buckets: int
    alpha: float


def nb_train(
    labeled: DataFrame,
    label_col: str,
    text_col: str = "text",
    n: int = 2,
    num_buckets: int = 512,
    alpha: float = 1.0,
) -> NBModel:
    """Fit NB log-count-ratio weights on ``labeled`` rows whose
    boolean ``label_col`` marks the target (positive) class.

    One gram scan + one groupBy(bucket) with conditional sums —
    map-side combinable, <= num_buckets result rows. The doc-level
    class prior comes from one 1-row aggregate (bounded collect).
    Raises if either class has no documents: a one-class "model"
    would silently score everything with the prior.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    lab = labeled.select(
        F.col(label_col).cast("boolean").alias("_pos"), F.col(text_col)
    )
    row = lab.agg(
        F.sum(F.col("_pos").cast("long")).alias("np"),
        F.sum((~F.col("_pos")).cast("long")).alias("nn"),
    ).collect()[0]
    n_pos, n_neg = row["np"] or 0, row["nn"] or 0
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"nb_train needs both classes non-empty, got pos={n_pos} "
            f"neg={n_neg} from {label_col!r}"
        )

    grams = _bucket_rows(lab, text_col, n, num_buckets, extra=("_pos",))
    counts = grams.groupBy("bucket").agg(
        F.sum(F.col("_pos").cast("long")).alias("cp"),
        F.sum((~F.col("_pos")).cast("long")).alias("cn"),
    # <= num_buckets rows read twice (the tot collect below AND the
    # weight broadcast at scoring time): the lazy checkpoint
    # materializes at the tot collect and the scoring action reuses
    # the stored blocks, so the training gram scan runs exactly once
    # without an extra eager job
    ).localCheckpoint(eager=False)
    a = float(alpha)
    weights = counts.select(
        "bucket",
        F.log(
            (F.col("cp").cast("double") + F.lit(a))
            / (F.col("cn").cast("double") + F.lit(a))
        ).alias("lr"),
    )
    tot = counts.agg(
        F.sum("cp").alias("tp"), F.sum("cn").alias("tn")
    ).collect()[0]
    tot_pos, tot_neg = tot["tp"] or 0, tot["tn"] or 0
    c = math.log(
        (tot_neg + a * num_buckets) / (tot_pos + a * num_buckets)
    )
    return NBModel(
        weights=weights,
        log_prior=math.log(n_pos / n_neg),
        gram_const=c,
        n=n,
        num_buckets=num_buckets,
        alpha=a,
    )


def nb_score(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, n_grams, nb_logodds): the NB log-odds of the target
    class for every input doc. Grams join the broadcast weight table
    map-side (LEFT join, unseen buckets coalesce to 0 per the folded
    identity); one per-doc shuffle for the sum. Docs with no tokens
    keep n_grams = 0 and score exactly log_prior.

    nb_logodds is a float SUM — summation-order-dependent in the
    last ulps like every distributed double reduction; compare it
    rounded (the oracle entries round to 6), never raw-hashed.
    """
    grams = _bucket_rows(docs, text_col, model.n, model.num_buckets,
                         extra=(id_col,))
    per_doc = (
        grams.join(F.broadcast(model.weights), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("lr"), F.lit(0.0))).alias("_s"),
        )
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            (
                F.lit(model.log_prior)
                + F.coalesce("n_grams", F.lit(0)).cast("double")
                * F.lit(model.gram_const)
                + F.coalesce("_s", F.lit(0.0))
            ).alias("nb_logodds"),
        )
    )


def nb_filter(
    docs: DataFrame,
    model: NBModel,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Input rows whose NB log-odds >= threshold (0.0 = "target class
    more likely than not") — the pipeline keep-filter. One broadcast-
    scored semi-join; the doc payload never re-shuffles."""
    keep = nb_score(docs, model, id_col, text_col).filter(
        F.col("nb_logodds") >= F.lit(float(threshold))
    )
    return docs.join(keep.select(id_col), id_col, "left_semi")
