"""Iterative graph analytics over edge tables — PageRank (Brin &
Page 1998), the canonical join-based fixed-point computation (the
same execution shape as label propagation in ops/dedup.py's
duplicate_components, but with float mass instead of min-labels).

Scale shape: each iteration is ONE shuffle — edges (pre-joined with
out-degrees once, cached) join the current ranks on src, partial-agg
the contributions keyed on dst, and rebuild the rank vector with a
left join onto the node table. Dangling mass is recovered
arithmetically (1 − Σ contributions — ranks always sum to 1) via a
broadcast 1-row aggregate instead of a per-iteration driver action.
Lineage is truncated with eager localCheckpoint every few iterations
— without it the plan doubles per iteration and the 10th iteration
recompiles a 2^10-node tree (the classic iterative-Spark trap).

Determinism: per-node sums are float adds in shuffle order, so
results are reproducible only up to ~1e-14 per iteration; callers
that need engine-exact output round to 6 dp at the END (ulp noise is
orders of magnitude below the rounding grain).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(node, pr) after ``iters`` power iterations with uniform
    init, teleport (1−d)/N, and dangling mass redistributed
    uniformly; Σ pr = 1 every iteration. Parallel edges should be
    de-duplicated by the caller if a simple graph is intended."""
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()  # one bounded driver scalar, reused every iter
    deg = e.groupBy("_s").agg(F.count("*").alias("_deg"))
    ew = (
        e.join(deg, "_s")
        .select("_s", "_d", "_deg")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ew.count()  # materialize once; iterations reuse the cached edges

    d = float(damping)
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    for i in range(iters):
        msgs = (
            ew.join(ranks.withColumnRenamed("node", "_s"), "_s")
            .select("_d", (F.col("pr") / F.col("_deg")).alias("_c"))
            .groupBy("_d")
            .agg(F.sum("_c").alias("_contrib"))
        )
        # ranks sum to 1, so dangling mass = 1 - what was emitted
        total = msgs.agg(
            F.coalesce(F.sum("_contrib"), F.lit(0.0)).alias("_t")
        )
        ranks = (
            nodes.join(msgs.withColumnRenamed("_d", "node"), "node", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n)
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("_contrib"), F.lit(0.0))
                        + (F.lit(1.0) - F.col("_t")) / F.lit(float(n))
                    )
                ).alias("pr"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    ew.unpersist()
    nodes.unpersist()
    return ranks
