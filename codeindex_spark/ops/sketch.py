"""Frequency sketching with exact recovery (heavy hitters).

``heavy_hitters`` returns every n-gram whose corpus frequency is
>= ceil(phi * total_grams) — EXACT results, without ever shuffling or
collecting the full vocabulary:

  pass 1 (map-only, bounded state): each input partition runs a
    batched Misra-Gries summary with k = ceil(1/phi) + 1 counters over
    its gram stream (Misra & Gries 1982; survey: Cormode &
    Hadjieleftheriou, VLDB 2008). The batch decrement subtracts the
    (k+1)-th largest count m from every counter and drops the
    non-positive ones; at least k+1 counters hold >= m at that moment,
    so each event removes >= m*(k+1) total mass and the cumulative
    decrement is <= n_p/(k+1) per partition. Hence any gram with local
    count > n_p/(k+1) survives its partition, and any gram with GLOBAL
    count > N/(k+1) exceeds that local bar somewhere (averaging) — the
    candidate union is a SUPERSET of the true heavy hitters because
    ceil(phi*N) > N/(k+1) for k+1 > 1/phi. State: k counters per
    partition; pass-1 output: <= k+1 rows per partition.
  pass 2 (exact): re-count ONLY the candidate grams (broadcast
    membership join), keep count >= ceil(phi*N). Partial aggregation
    is map-side; the shuffle carries at most k*partitions distinct
    keys instead of the vocabulary.

Why this matters at 100 TB: boilerplate n-gram discovery (the input
to filters like pipeline.line_frequency_filter) over a web corpus has
a vocabulary far larger than executor memory; a groupBy over it is a
full-vocabulary shuffle, and collecting it is impossible. Two bounded
passes replace it. The reference engine has no sketch surface — this
is a training-data curation operator beyond SURVEY.md §2.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from codeindex_spark.ops._text import ws_tokens
from codeindex_spark.util import ensure_parallelism

__all__ = ["heavy_hitters", "gram_stream", "kmv_distinct"]

# MG state is per-partition and the candidate union is collected to
# the driver: a phi small enough to need more counters than this
# wants a CountSketch/CM-sketch design instead, not silent OOM
MAX_COUNTERS = 1 << 20

_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("gram", T.StringType(), True),
        T.StructField("n_part", T.LongType(), False),
    ]
)


def gram_stream(
    df: DataFrame, n: int = 1, text_col: str = "text", lower: bool = True
) -> DataFrame:
    """One row per (whitespace) n-gram occurrence: column ``gram``.
    Intra-document grams only — windows never span documents.

    Tokens are materialized ONCE per doc and windows come from an
    exploded position column with a plain slice — the lm/dsir shape.
    The obvious spelling (a higher-order-function lambda with the
    split embedded) re-splits the doc per gram position because Spark
    does not CSE through lambda bodies: measured 21 s vs 4 s for the
    bigram stream of 50k code docs. The size >= n filter also keeps
    sequence() from descending through 0 on too-short docs (slice
    rejects start=0)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    # fan out BEFORE the explode: repartitioning the doc-level rows
    # costs ~1/tokens-per-doc of repartitioning the exploded gram
    # stream. The old shape (callers wrapping the RESULT in
    # ensure_parallelism) round-robined the ~100x-larger gram stream
    # through disk whenever the scan packed into fewer splits than
    # the target — measured on kmv vocabulary estimation at 800k
    # docs: pooled 2->8 efficiency 0.294 (post-explode exchange,
    # wild 26-67 s swings) vs the pre-explode shape below.
    toks = ensure_parallelism(
        df.select(ws_tokens(text_col, lower=lower).alias("_t"))
    ).filter(F.size("_t") >= n)
    if n == 1:
        return toks.select(F.explode("_t").alias("gram"))
    pos = toks.select(
        "_t",
        F.explode(F.sequence(F.lit(1), F.size("_t") - (n - 1))).alias("_i"),
    )
    return pos.select(
        F.array_join(F.slice(F.col("_t"), F.col("_i"), n), " ").alias("gram")
    )


def _mg_summary(k: int):
    """mapInPandas kernel: batched Misra-Gries with k counters over
    the partition's gram stream, plus one null-gram row carrying the
    partition's total gram count (so N needs no second scan)."""

    def summarize(batches):
        # counters live in a pandas Series (gram -> count): the batch
        # merge (value_counts + Series.add) and the decrement
        # (np.partition + boolean mask) all run in C — no per-term
        # Python loop anywhere
        state: pd.Series | None = None
        total = 0
        for pdf in batches:
            total += len(pdf)
            vc = pdf["gram"].value_counts()
            state = vc if state is None else state.add(vc, fill_value=0)
            if len(state) > k:
                vals = state.to_numpy()
                # (k+1)-th largest == (len-k)-th smallest; subtracting
                # it everywhere drops >= len-k counters to <= 0
                m = np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1]
                state = state[vals > m] - m
        grams = [] if state is None else state.index.to_list()
        yield pd.DataFrame(
            {
                "gram": grams + [None],
                "n_part": [0] * len(grams) + [total],
            }
        )

    return summarize


def heavy_hitters(
    df: DataFrame,
    phi: float,
    n: int = 1,
    text_col: str = "text",
    lower: bool = True,
    max_counters: int = MAX_COUNTERS,
) -> DataFrame:
    """Exact (gram, freq) rows for every n-gram with corpus frequency
    >= max(1, ceil(phi * total_grams)). phi in (0, 1]."""
    if not (0.0 < phi <= 1.0):
        raise ValueError("phi must be in (0, 1]")
    k = math.ceil(1.0 / phi) + 1
    if k > max_counters:
        raise ValueError(
            f"phi={phi} needs {k} MG counters per partition (> "
            f"{max_counters}); use a sketch with sublinear state "
            "(CountSketch) for thresholds this small"
        )
    spark = df.sparkSession
    grams = ensure_parallelism(gram_stream(df, n, text_col, lower))
    summary = grams.mapInPandas(_mg_summary(k), schema=_SUMMARY_SCHEMA).collect()
    total = sum(r["n_part"] for r in summary if r["gram"] is None)
    cands = sorted({r["gram"] for r in summary if r["gram"] is not None})
    if total == 0 or not cands:
        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("gram", T.StringType(), False),
                    T.StructField("freq", T.LongType(), False),
                ]
            ),
        )
    threshold = max(1, math.ceil(phi * total))
    cand_df = spark.createDataFrame(
        pd.DataFrame({"gram": cands})
    )
    return (
        grams.join(F.broadcast(cand_df), "gram", "left_semi")
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= threshold)
    )


_KMV_HEX = 13  # 52 bits: exact in a double AND in BIGINT hex parses
_KMV_SCALE = float(1 << 52)  # 16^13

_KMV_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("_g", T.StringType(), True),
        T.StructField("_h", T.StringType(), False),
    ]
)


def _kmv_partial(k: int):
    """Per-partition bottom-k DISTINCT hashes per group — bounded
    state (k sorted hex strings per group seen in the partition),
    emits <= k rows per (partition, group)."""

    def fn(batches):
        state: dict = {}
        for pdf in batches:
            for grp, sub in pdf.groupby("_g", dropna=False, sort=False):
                vals = sub["_h"].to_numpy()
                cur = state.get(grp)
                merged = (
                    np.unique(vals)
                    if cur is None
                    else np.unique(np.concatenate([cur, vals]))
                )
                state[grp] = merged[:k]  # np.unique sorts ascending
        for grp, hs in state.items():
            yield pd.DataFrame(
                {"_g": [grp] * len(hs), "_h": hs}
            )

    return fn


def kmv_distinct(
    df: DataFrame,
    col: str,
    k: int = 256,
    group_col: str | None = None,
) -> DataFrame:
    """KMV / bottom-k distinct-count sketch (Bar-Yossef et al. 2002
    "Counting distinct elements in a data stream"; the estimator
    (k-1)/h_(k) analyzed by Beyer et al., SIGMOD 2007): per group,
    keep the k smallest DISTINCT md5-hashes of the value; if fewer
    than k distinct hashes exist the count is exact, otherwise
    estimate (k-1)/h_(k) with h_(k) = the k-th smallest hash mapped
    into (0, 1). Returns (group?, n_min, est_distinct).

    Deterministic by construction — the hash is md5 (no seed, no
    RNG), so the result is bit-stable across runs, partitionings,
    and engines; unlike HLL (whose register layout is
    implementation-defined) the whole sketch is replayable in plain
    SQL, which is what makes it oracle-checkable. The first 13 hex
    chars (52 bits) parse exactly into both a double and a BIGINT,
    so the (0,1) mapping is division by 2^52 with zero rounding in
    either engine.

    Scale shape (the reason to sketch at all): a map-only
    mapInPandas pass holds AT MOST k sorted hashes per (partition,
    group) — the full distinct set never materializes and the
    exchange carries <= k rows per partition per group, vs a
    count(DISTINCT) whose shuffle is the full cardinality. The final
    merge is one tiny groupBy over those bounded rows (array_sort +
    slice, all JVM-side). Standard error ~ 1/sqrt(k-2) (~6 % at
    k=256); raise k for tighter bounds, state stays k rows.

    Hash-prefix pruning (the Arrow-volume fix, measured): the global
    bottom-k all start with hex '0' — i.e. lie in the lowest 1/16 of
    the hash space — whenever at least k DISTINCT hashes do (every
    hash outside the prefix exceeds every hash inside it). So pass 1
    runs on the JVM-filtered ``_h < '1'`` stream, shipping ~1/16 of
    the rows through Arrow; a group whose pruned result holds >= k
    hashes is EXACT. Groups that come up short (distinct count
    <~ 16k — including groups with no pruned hash at all) re-run on
    the unpruned stream with the proven groups anti-joined out, so
    deciding needs no knowledge of the group universe; ungrouped
    sketches skip the second pass entirely when the prune proves
    exact. Without the prune, the Arrow transfer of the full stream
    dominates and caps 2->8 scaling (pooled eff 0.28-0.48 on the
    800k/3.2M vocabulary-estimation benchmark); the pruned pass is
    bounded by the same JVM scan that already scales at ~0.8. The
    fallback decision is one limit-guarded <= |groups|-row collect
    (beyond 2^16 groups it degrades to always-rerun, never a
    data-scale driver hop).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    spark = df.sparkSession
    # null group values route through a sentinel string: null join
    # keys never match, so without this a null group could never be
    # anti-joined out after the pruned pass proved it exact (correct
    # output, wasted full-stream rerun) — and the pandas state dict
    # would key on the fragile np.nan singleton. Mapped back to a
    # real NULL in the final projection.
    _null_g = "\x00__kmv_null_group__"
    g = (
        F.coalesce(F.col(group_col).cast("string"), F.lit(_null_g))
        if group_col
        else F.lit("(all)")
    )
    proj = df.filter(F.col(col).isNotNull()).select(
        g.alias("_g"),
        F.substring(F.md5(F.col(col).cast("string")), 1, _KMV_HEX).alias(
            "_h"
        ),
    )
    hs = F.slice(F.array_sort(F.collect_set("_h")), 1, k)
    pruned = ensure_parallelism(proj.filter(F.col("_h") < "1")).mapInPandas(
        _kmv_partial(k), schema=_KMV_PARTIAL_SCHEMA
    )
    # one row per group after the agg — eagerly materialized so the
    # decision collect below and the final result read the SAME run
    # of the pruned pass (without this the pass executes twice: once
    # for the decision, once for the output — measured 164 -> 265 s
    # at 3.2M docs before the checkpoint)
    pagg = (
        pruned.groupBy("_g").agg(hs.alias("_hs")).localCheckpoint(eager=True)
    )
    # decision collect: <= |groups| rows, limit-guarded — beyond the
    # cap we skip the prune-skip decision rather than ship a
    # data-scale list to the driver
    max_groups = 1 << 16
    stat = (
        pagg.select("_g", (F.size("_hs") >= k).alias("_full"))
        .limit(max_groups + 1)
        .collect()
    )
    ok = (
        [r["_g"] for r in stat if r["_full"]]
        if len(stat) <= max_groups
        else []
    )
    if group_col is None and ok:
        # single group proved exact by the pruned pass: done, the
        # unpruned stream is never shipped through Arrow
        agg = pagg
    else:
        # groups the pruned pass cannot prove exact — short ones AND
        # ones with zero pruned hashes — re-run on the unpruned
        # stream; the anti-join keeps proven groups out of Arrow
        # without any driver-side knowledge of the group universe
        rest = proj
        if ok:
            okdf = spark.createDataFrame(
                pd.DataFrame({"_g": ok}), schema="_g string"
            )
            rest = proj.join(F.broadcast(okdf), "_g", "left_anti")
        ragg = (
            ensure_parallelism(rest)
            .mapInPandas(_kmv_partial(k), schema=_KMV_PARTIAL_SCHEMA)
            .groupBy("_g")
            .agg(hs.alias("_hs"))
        )
        if ok:
            okdf2 = spark.createDataFrame(
                pd.DataFrame({"_g": ok}), schema="_g string"
            )
            agg = pagg.join(F.broadcast(okdf2), "_g", "left_semi").union(
                ragg
            )
        else:
            agg = ragg
    n = F.size("_hs")
    kth = F.conv(F.element_at("_hs", k), 16, 10).cast("double") / F.lit(
        _KMV_SCALE
    )
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / kth
    )
    out = agg.select(
        F.when(F.col("_g") == _null_g, F.lit(None))
        .otherwise(F.col("_g"))
        .alias(group_col if group_col else "group"),
        n.cast("long").alias("n_min"),
        est.alias("est_distinct"),
    )
    return out
