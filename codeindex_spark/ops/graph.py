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

__all__ = ["pagerank", "triangle_counts"]


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


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph
    (self-loops dropped, parallel edges collapsed); only nodes in at
    least one triangle are emitted. (node, triangles); Σ = 3·|Δ|.

    Scale shape — degree orientation (Cohen 2009 / node-iterator++):
    every canonical edge is oriented from the lower-(degree, id) rank
    endpoint to the higher, so each node's OUT-degree is bounded by
    O(sqrt(m)) regardless of its true degree. The wedge self-join on
    the oriented source therefore never explodes on a hub: the
    celebrity node with 10M followers has near-zero out-edges after
    orientation, its wedges are generated at its low-degree
    neighbours instead. Wedges close via one more shuffle join onto
    the oriented edge set (the closing edge's orientation is implied
    by the wedge's rank ordering, so the probe is a plain equi-join —
    AQE-skew-splittable, no inequality residual). Total work is the
    arboricity-bounded O(m^1.5) of the sequential algorithm, spread
    over 3 shuffles; no driver-side state beyond the plan.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("_a"),
            F.greatest(F.col(src), F.col(dst)).alias("_b"),
        )
        .filter(F.col("_a") != F.col("_b"))
        .distinct()
    )
    deg = (
        e.select(F.col("_a").alias("node"))
        .unionAll(e.select(F.col("_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("_deg"))
    )
    # rank(x) = (deg(x), x); orient every edge low-rank -> high-rank
    ed = (
        e.join(deg.withColumnRenamed("node", "_a"), "_a")
        .withColumnRenamed("_deg", "_da")
        .join(
            deg.select(
                F.col("node").alias("_b"), F.col("_deg").alias("_db")
            ),
            "_b",
        )
    )
    a_first = (F.col("_da") < F.col("_db")) | (
        (F.col("_da") == F.col("_db")) & (F.col("_a") < F.col("_b"))
    )
    # eager localCheckpoint, not persist: the oriented set is read 3×
    # (wedge left, wedge right, closure probe) and the result is
    # returned lazily, so a persist() here could never be unpersisted
    # without recomputing the caller's plan (ADVICE r3 leak class)
    o = ed.select(
        F.when(a_first, F.col("_a")).otherwise(F.col("_b")).alias("_u"),
        F.when(a_first, F.col("_b")).otherwise(F.col("_a")).alias("_v"),
        F.when(a_first, F.col("_db")).otherwise(F.col("_da")).alias("_dv"),
    ).localCheckpoint(eager=True)
    # wedges at the low-rank apex: (v1, v2) with rank(v1) < rank(v2),
    # so the closing edge, if present, is oriented exactly v1 -> v2
    o2 = o.select(
        F.col("_u").alias("_u2"),
        F.col("_v").alias("_w"),
        F.col("_dv").alias("_dw"),
    )
    wedges = o.join(o2, F.col("_u") == F.col("_u2")).filter(
        (F.col("_dv") < F.col("_dw"))
        | ((F.col("_dv") == F.col("_dw")) & (F.col("_v") < F.col("_w")))
    )
    tri = wedges.join(
        o.select(F.col("_u").alias("_v"), F.col("_v").alias("_w")),
        ["_v", "_w"],
    ).select("_u", "_v", "_w")
    out = (
        tri.select(F.col("_u").alias("node"))
        .unionAll(tri.select(F.col("_v").alias("node")))
        .unionAll(tri.select(F.col("_w").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    return out
