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

__all__ = ["pagerank", "hits", "triangle_counts"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
    checkpoint_every: int = 3,
    seeds: list | tuple | None = None,
) -> DataFrame:
    """(node, pr) after ``iters`` power iterations with uniform
    init, teleport (1−d)/N, and dangling mass redistributed
    uniformly; Σ pr = 1 every iteration. Parallel edges should be
    de-duplicated by the caller if a simple graph is intended.

    ``seeds`` switches to PERSONALIZED PageRank (topic-sensitive,
    Haveliwala WWW 2002; random-walk-with-restart): the teleport
    vector becomes uniform over the seed set instead of over all
    nodes, and dangling mass restarts at the seeds too — so Σ pr
    stays 1 and all rank concentrates in the seeds' reachable
    component. Init stays uniform (the fixed point is independent of
    init; iterates differ, which is why the oracle replays the same
    init). Seeds absent from the graph are ignored; an empty
    effective seed set raises. The seed list is broadcast — it is a
    query parameter (10s-1000s of nodes), never a data-scale table."""
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    deg = e.groupBy("_s").agg(F.count("*").alias("_deg"))
    ew = (
        e.join(deg, "_s")
        .select("_s", "_d", "_deg")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ew.count()  # materialize once; iterations AND node setup reuse it
    # nodes derive from the CACHED degree-joined edges (the inner
    # join keeps every edge — each _s has a degree row), so the
    # caller's edge subtree (often a corpus-sized distinct) executes
    # exactly once; the r5 order scanned it again for each setup job
    # (node-distinct job, degree build) because exchange reuse does
    # not span separate jobs
    nodes = (
        ew.select(F.col("_s").alias("node"))
        .union(ew.select(F.col("_d").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()  # one bounded driver scalar, reused every iter
    # teleport vector: uniform 1/N, or uniform over the seed set
    if seeds is None:
        # plain projection over the cached node table — persisting it
        # separately (the r5 shape) only duplicated the cache
        nodes_t = nodes.withColumn("_tp", F.lit(1.0 / n))
    else:
        seed_list = sorted(set(seeds))
        if not seed_list:
            raise ValueError("seeds must be non-empty when given")
        marker = nodes.filter(F.col("node").isin(seed_list)).withColumn(
            "_is", F.lit(1)
        )
        ns = marker.count()
        if ns == 0:
            raise ValueError("no seed node present in the graph")
        nodes_t = nodes.join(F.broadcast(marker), "node", "left").select(
            "node",
            F.when(F.col("_is").isNotNull(), F.lit(1.0 / ns))
            .otherwise(F.lit(0.0))
            .alias("_tp"),
        )
    if seeds is not None:
        nodes_t = nodes_t.persist(StorageLevel.MEMORY_AND_DISK)

    d = float(damping)
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    # msgs is consumed twice (dangling-mass total + rank rebuild):
    # persist so each checkpoint window's plan computes it once per
    # iteration instead of 2^checkpoint_every times (see hits())
    pending: list[DataFrame] = []
    for i in range(iters):
        # shuffle-hash hint: the rank vector is the per-partition
        # build side (nodes << edges); avoids re-sorting the cached
        # edge partitions every iteration (sort-merge would)
        msgs = (
            ew.join(
                ranks.withColumnRenamed("node", "_s").hint("shuffle_hash"),
                "_s",
            )
            .select("_d", (F.col("pr") / F.col("_deg")).alias("_c"))
            .groupBy("_d")
            .agg(F.sum("_c").alias("_contrib"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        pending.append(msgs)
        # ranks sum to 1, so dangling mass = 1 - what was emitted
        total = msgs.agg(
            F.coalesce(F.sum("_contrib"), F.lit(0.0)).alias("_t")
        )
        ranks = (
            nodes_t.join(msgs.withColumnRenamed("_d", "node"), "node", "left")
            .crossJoin(F.broadcast(total))
            .select(
                "node",
                (
                    F.lit(1.0 - d) * F.col("_tp")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("_contrib"), F.lit(0.0))
                        + (F.lit(1.0) - F.col("_t")) * F.col("_tp")
                    )
                ).alias("pr"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
            for df_ in pending:
                df_.unpersist()
            pending = []
    ew.unpersist()
    if seeds is not None:
        nodes_t.unpersist()
    nodes.unpersist()
    return ranks


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    checkpoint_every: int = 3,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, "Authoritative
    sources in a hyperlinked environment"): (node, hub, auth) after
    ``iters`` mutual-reinforcement iterations over the DIRECTED edge
    set — auth(v) = Σ hub(u) over in-neighbours u, then
    hub(u) = Σ auth(v) over out-neighbours v using the FRESH auth
    (the standard a = Aᵀh; h = Aa order), each vector L1-normalized
    to sum 1 per iteration (Kleinberg's paper normalizes L2; L1 is
    the common power-iteration variant and keeps the fixed point's
    RANKING identical — only the scale differs — while making the
    arithmetic replayable without sqrt). Nodes without in-edges hold
    auth 0; without out-edges, hub 0. Init: uniform 1/N.

    Scale shape (same contract as ``pagerank``): the degree-free
    edge table is cached once; each iteration is exactly TWO
    shuffles — the auth pass (join hubs on src, partial-agg keyed
    dst) and the hub pass (join fresh auths on dst, partial-agg
    keyed src). Normalization totals are broadcast 1-row aggregates,
    never a driver action; localCheckpoint truncates lineage every
    ``checkpoint_every`` iterations (the 2^k replan trap).

    Determinism: float sums in shuffle order — reproducible to
    ~1e-14 per iteration; round at the END for engine-exact output
    (same note as pagerank's module docstring)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    nodes = (
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        return nodes.select(
            "node", F.lit(0.0).alias("hub"), F.lit(0.0).alias("auth")
        )
    hubs = nodes.withColumn("hub", F.lit(1.0 / n))
    auths = nodes.withColumn("auth", F.lit(0.0))
    # each raw aggregate is consumed TWICE (normalization total +
    # rebuild join); persisting it makes every subtree compute once —
    # without this the plan between checkpoints branches 4× per
    # iteration and the checkpoint job re-runs 4^checkpoint_every
    # copies of the message shuffle (measured: 112 s -> ~20 s at
    # sf0.01 for 8 iterations)
    pending: list[DataFrame] = []
    for i in range(iters):
        # a = A^T h  (keyed on dst), L1-normalized
        araw = (
            e.join(hubs.withColumnRenamed("node", "_s"), "_s")
            .groupBy("_d")
            .agg(F.sum("hub").alias("_a"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        pending.append(araw)
        atot = araw.agg(F.coalesce(F.sum("_a"), F.lit(0.0)).alias("_t"))
        auths = (
            nodes.join(araw.withColumnRenamed("_d", "node"), "node", "left")
            .crossJoin(F.broadcast(atot))
            .select(
                "node",
                F.when(
                    F.col("_t") > 0.0,
                    F.coalesce(F.col("_a"), F.lit(0.0)) / F.col("_t"),
                )
                .otherwise(F.lit(0.0))
                .alias("auth"),
            )
        )
        # h = A a  with the fresh a (keyed on src), L1-normalized
        hraw = (
            e.join(auths.withColumnRenamed("node", "_d"), "_d")
            .groupBy("_s")
            .agg(F.sum("auth").alias("_h"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        pending.append(hraw)
        htot = hraw.agg(F.coalesce(F.sum("_h"), F.lit(0.0)).alias("_t"))
        hubs = (
            nodes.join(hraw.withColumnRenamed("_s", "node"), "node", "left")
            .crossJoin(F.broadcast(htot))
            .select(
                "node",
                F.when(
                    F.col("_t") > 0.0,
                    F.coalesce(F.col("_h"), F.lit(0.0)) / F.col("_t"),
                )
                .otherwise(F.lit(0.0))
                .alias("hub"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            # checkpoint BOTH state vectors: once hubs and auths are
            # materialized nothing downstream can re-read this
            # window's raw aggregates, so release them now — keeps
            # cached state bounded by one window instead of growing
            # 2 persisted frames per iteration for the whole run
            hubs = hubs.localCheckpoint(eager=True)
            auths = auths.localCheckpoint(eager=True)
            for df_ in pending:
                df_.unpersist()
            pending.clear()
    # the loop-final pair IS the k-iteration output: auths = a_k
    # (from h_{k-1}), hubs = h_k (from a_k) — the standard coupled
    # state after k mutual-reinforcement steps
    out = hubs.join(auths, "node").localCheckpoint(eager=True)
    for df_ in pending:
        df_.unpersist()
    e.unpersist()
    nodes.unpersist()
    return out


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
