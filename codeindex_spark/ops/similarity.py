"""Similarity search over embedding columns (array<float>).

- brute_force_cosine_topk: exact baseline — broadcast the query
  vector, JVM-side zip_with/aggregate dot product, TakeOrdered top-k.
- cosine_pairs_topk: all-pairs variant for small candidate sets.
- lsh_bucket_ann: the scale path — random-hyperplane LSH (signed
  projections -> bucket key), candidates restricted to matching
  buckets, exact cosine re-rank inside buckets. At 100 TB the bucket
  join replaces the O(N) scan per query with an O(N/2^bits) probe;
  multi-probe = union over nearby buckets.

Everything is built-in expressions or Arrow-batched pandas kernels —
no per-row Python.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from codeindex_spark.util import ensure_parallelism


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def brute_force_cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity to one query vector.
    Returns (vec_id, cosine) ordered desc, id asc."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    out = vectors.select(
        F.col(id_col).alias("vec_id"),
        (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias(
            "cosine"
        ),
    )
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return out.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def batch_cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Top-k per query for a (small, broadcastable) query set: the
    numpy matrix product runs inside an Arrow-batched kernel; the
    per-query top-k is a window rank (per-partition partial top-k
    then merge)."""
    qpdf = queries.select(q_id_col, q_vec_col).toPandas()
    qids = qpdf[q_id_col].to_numpy()
    qmat = np.stack([np.asarray(v, dtype=np.float64) for v in qpdf[q_vec_col]])
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)

    schema = T.StructType(
        [
            T.StructField("q_id", T.LongType(), False),
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            sims = mat @ qmat.T  # (batch, n_queries)
            n, m = sims.shape
            # per-batch partial top-k per query to bound output volume
            kk = min(k, n)
            top_idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]
            rows = {
                "q_id": np.repeat(qids, kk),
                "vec_id": pdf[id_col].to_numpy()[top_idx.T.ravel()],
                "cosine": np.take_along_axis(sims, top_idx, 0).T.ravel(),
            }
            yield pd.DataFrame(rows)

    from pyspark.sql import Window

    scored = ensure_parallelism(vectors.select(id_col, vec_col)).mapInPandas(
        kernel, schema=schema
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def _auto_grid(
    left: DataFrame, right: DataFrame, rows_per_block: int
) -> tuple[int, int]:
    """Grid from corpus sizes: enough blocks per side that one task's
    slice stays under ``rows_per_block`` vectors (two cheap count
    jobs — metadata-only for parquet sources)."""
    nl, nr = left.count(), right.count()
    pa = max(1, -(-nl // rows_per_block))
    pb = max(1, -(-nr // rows_per_block))
    return int(pa), int(pb)


def cross_knn(
    left: DataFrame,
    right: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: tuple[int, int] | str = (4, 4),
    rows_per_block: int = 100_000,
) -> DataFrame:
    """Exact k-nearest-neighbors of every LEFT vector within RIGHT by
    cosine, distributed as a block matrix product.

    Grid-blocked exact kNN (the CPU analog of the exact-search fan-out
    CCMatrix/LASER mining uses): left rows are replicated across the
    Pb right-blocks, right rows across the Pa left-blocks, and each of
    the Pa*Pb cogroups runs ONE float64 matmul + per-source partial
    top-k inside an Arrow kernel. Shuffle volume is Pb*|L| + Pa*|R|
    rows; per-task memory is (|L|/Pa + |R|/Pb) * dim — both chosen by
    ``grid``, so the op scales by adding tasks, never by growing a
    task. A window merge of the per-block top-k (cosine DESC, id ASC
    tie-break) yields the exact global result.

    Returns (src_id, dst_id, cosine) with exactly min(k, |R|) rows per
    source. For corpus sizes where |L|*|R| compute is prohibitive, use
    ivf_ann_topk as the approximate candidate generator instead.

    ``grid="auto"`` sizes the grid from two count jobs so each task
    holds at most ``rows_per_block`` vectors per side (100k 64-dim
    float64 vectors ≈ 50 MB) — the hand-tuned tuple stays available
    for tests and skew control.
    """
    pa, pb = (
        _auto_grid(left, right, rows_per_block) if grid == "auto" else grid
    )
    la = left.select(
        F.col(id_col).alias("src_id"), F.col(vec_col).alias("v")
    ).withColumn("ab", F.pmod(F.xxhash64("src_id"), F.lit(pa)))
    la = la.withColumn(
        "bb", F.explode(F.array(*[F.lit(j) for j in range(pb)]))
    )
    rb = right.select(
        F.col(id_col).alias("dst_id"), F.col(vec_col).alias("v")
    ).withColumn("bb", F.pmod(F.xxhash64("dst_id"), F.lit(pb)))
    rb = rb.withColumn(
        "ab", F.explode(F.array(*[F.lit(i) for i in range(pa)]))
    )

    schema = T.StructType(
        [
            T.StructField("src_id", T.LongType(), False),
            T.StructField("dst_id", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def block(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"src_id": [], "dst_id": [], "cosine": []})
        lm = np.stack([np.asarray(v, dtype=np.float64) for v in lpdf["v"]])
        rm = np.stack([np.asarray(v, dtype=np.float64) for v in rpdf["v"]])
        lm = lm / np.maximum(np.linalg.norm(lm, axis=1, keepdims=True), 1e-12)
        rm = rm / np.maximum(np.linalg.norm(rm, axis=1, keepdims=True), 1e-12)
        sims = lm @ rm.T  # (nl, nr)
        nl, nr = sims.shape
        kk = min(k, nr)
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pd.DataFrame(
            {
                "src_id": np.repeat(lpdf["src_id"].to_numpy(), kk),
                "dst_id": rpdf["dst_id"].to_numpy()[idx.ravel()],
                "cosine": np.take_along_axis(sims, idx, 1).ravel(),
            }
        )

    from pyspark.sql import Window

    partial = (
        la.groupBy("ab", "bb")
        .cogroup(rb.groupBy("ab", "bb"))
        .applyInPandas(lambda lg, rg: block(lg, rg), schema=schema)
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cosine"), F.asc("dst_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def ivf_cross_knn(
    left: DataFrame,
    right_index: "IvfIndex",
    k: int = 4,
    n_probe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cross_knn against an IVF-indexed right corpus —
    the margin-mining scale path when the exact |L|x|R| product is
    prohibitive.

    Every left vector is routed to its ``n_probe`` nearest coarse
    centroids (broadcast kernel, one Arrow pass, explode), then a
    centroid-keyed cogroup runs the exact cosine matmul of that
    probe's left slice against that CELL's vectors only — compute
    drops from |L|*|R| to |L|*n_probe*|R|/C, shuffle is bounded by
    n_probe*|L| + |R| rows on the centroid key, and the per-cell
    task never holds more than one cell plus its probes. Window
    merge (cosine DESC, id ASC) returns up to min(k, candidates)
    rows per source; recall follows IVF semantics (exact when
    n_probe = n_centroids).
    """
    cents = right_index.centroids  # (C, dim), L2-normalized rows
    n_probe = min(n_probe, cents.shape[0])
    vec_col = right_index.vec_col

    probe_schema = T.StructType(
        [
            T.StructField("src_id", T.LongType(), False),
            T.StructField("v", T.ArrayType(T.DoubleType()), False),
            T.StructField("centroid", T.IntegerType(), False),
        ]
    )

    def probes(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            sims = mat @ cents.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            yield pd.DataFrame(
                {
                    "src_id": np.repeat(pdf["src_id"].to_numpy(), n_probe),
                    "v": [
                        list(row)
                        for row in np.repeat(mat, n_probe, axis=0)
                    ],
                    "centroid": top.ravel().astype(np.int32),
                }
            )

    lq = ensure_parallelism(
        left.select(
            F.col(id_col).alias("src_id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
    ).mapInPandas(probes, schema=probe_schema)

    cells = right_index.cells.select(
        F.col(right_index.id_col).alias("dst_id"),
        F.col(vec_col).alias("rv"),
        "centroid",
    )

    out_schema = T.StructType(
        [
            T.StructField("src_id", T.LongType(), False),
            T.StructField("dst_id", T.LongType(), False),
            T.StructField("cosine", T.DoubleType(), False),
        ]
    )

    def cell_knn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0 or len(rpdf) == 0:
            return pd.DataFrame({"src_id": [], "dst_id": [], "cosine": []})
        lm = np.stack([np.asarray(x, dtype=np.float64) for x in lpdf["v"]])
        rm = np.stack([np.asarray(x, dtype=np.float64) for x in rpdf["rv"]])
        rm = rm / np.maximum(np.linalg.norm(rm, axis=1, keepdims=True), 1e-12)
        sims = lm @ rm.T
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        return pd.DataFrame(
            {
                "src_id": np.repeat(lpdf["src_id"].to_numpy(), kk),
                "dst_id": rpdf["dst_id"].to_numpy()[idx.ravel()],
                "cosine": np.take_along_axis(sims, idx, 1).ravel(),
            }
        )

    from pyspark.sql import Window

    partial = (
        lq.groupBy("centroid")
        .cogroup(cells.groupBy("centroid"))
        .applyInPandas(lambda lg, rg: cell_knn(lg, rg), schema=out_schema)
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("cosine"), F.asc("dst_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def margin_knn_align(
    left: DataFrame,
    right: DataFrame,
    k: int = 4,
    threshold: float = 1.05,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: tuple[int, int] | str = (4, 4),
    method: str = "exact",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Margin-based cross-corpus alignment mining (Artetxe & Schwenk
    2019, arXiv:1811.01136 — the CCMatrix/LASER bitext-mining
    criterion; beyond-reference training-data surface).

    For each forward candidate pair (x, y) with y among x's k-NN in
    RIGHT, the ratio margin is

        margin(x, y) = cos(x, y) /
                       (mean_kNN(x->RIGHT)/2 + mean_kNN(y->LEFT)/2)

    which normalizes raw cosine by how "hubby" each endpoint is —
    vectors whose neighborhoods are uniformly close score no pair
    highly, which is the point: raw-cosine thresholds break down
    under hubness, margins don't.

    Pairs with margin >= threshold survive. With method="exact"
    (default) both kNN passes are exact grid-blocked products
    (cross_knn); with method="ivf" each side is IVF-indexed once and
    kNN runs cell-pruned (ivf_cross_knn) — compute drops to
    |L|*n_probe*|R|/n_centroids, the scale path when the exact
    product is prohibitive (exact again at n_probe=n_centroids).
    The two per-node mean joins are on the pair's endpoints (shuffle
    bounded by k*|L| + k*|R| candidate rows). Returns
    (src_id, dst_id, cosine, margin).
    """
    if method == "ivf":
        dim = len(left.select(vec_col).first()[0])
        ridx = ivf_build(
            right, dim, n_centroids, seed=seed, id_col=id_col,
            vec_col=vec_col,
        )
        lidx = ivf_build(
            left, dim, n_centroids, seed=seed, id_col=id_col,
            vec_col=vec_col,
        )
        fwd = ivf_cross_knn(left, ridx, k, n_probe, id_col)
        bwd = ivf_cross_knn(right, lidx, k, n_probe, id_col)
    elif method == "exact":
        fwd = cross_knn(left, right, k, id_col, vec_col, grid)
        bwd_grid = grid if grid == "auto" else (grid[1], grid[0])
        bwd = cross_knn(right, left, k, id_col, vec_col, bwd_grid)
    else:
        raise ValueError(
            f"unknown method: {method!r} (expected 'exact' or 'ivf')"
        )
    mean_src = fwd.groupBy("src_id").agg(F.avg("cosine").alias("mean_src"))
    mean_dst = bwd.groupBy("src_id").agg(
        F.avg("cosine").alias("mean_dst")
    ).withColumnRenamed("src_id", "dst_id")
    return (
        fwd.join(mean_src, "src_id")
        .join(mean_dst, "dst_id")
        .withColumn(
            "margin",
            F.col("cosine")
            / (F.col("mean_src") / 2.0 + F.col("mean_dst") / 2.0),
        )
        .filter(F.col("margin") >= threshold)
        .select("src_id", "dst_id", "cosine", "margin")
    )


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    dim: int,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket): sign pattern of n_bits random projections.
    Hyperplanes are seeded-deterministic."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("bucket", T.LongType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            signs = (mat @ planes.T) > 0  # (n, n_bits)
            bucket = (signs * (1 << np.arange(n_bits))).sum(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(),
                    "bucket": bucket.astype(np.int64),
                }
            )

    return ensure_parallelism(vectors.select(id_col, vec_col)).mapInPandas(
        kernel, schema=schema
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.9,
    n_bits: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hot_cap: int = 100000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a, id_b, cosine >=
    threshold), restricted to hyperplane-LSH bucket mates — the
    100 TB shape: the bucket join bounds candidates at O(N^2/2^bits)
    instead of all-pairs, and buckets hotter than ``hot_cap`` are
    dropped like stopwords (bounded reducer fan-out). Exact cosine
    re-rank inside buckets, all JVM expressions."""
    b = hyperplane_lsh_buckets(vectors, dim, n_bits, seed, id_col, vec_col)
    hot = b.groupBy("bucket").count().filter(F.col("count") > hot_cap)
    cool = b.join(F.broadcast(hot.select("bucket")), "bucket", "left_anti")
    cand = (
        cool.alias("a")
        .join(cool.alias("b"), "bucket")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
        )
        .distinct()
    )
    v = vectors.select(
        F.col(id_col).alias("_vid"), F.col(vec_col).alias("_vec")
    )
    paired = (
        cand.join(v.withColumnRenamed("_vid", "id_a").withColumnRenamed("_vec", "_va"), "id_a")
        .join(v.withColumnRenamed("_vid", "id_b").withColumnRenamed("_vec", "_vb"), "id_b")
    )
    cosine = _dot(F.col("_va"), F.col("_vb")) / (
        _norm(F.col("_va")) * _norm(F.col("_vb"))
    )
    return (
        paired.withColumn("cosine", cosine)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semdedup(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_centroids: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 8192,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540, public): semantic
    deduplication by k-means clustering + within-cluster cosine
    threshold. Returns one row per vector:
    (id_col, cluster, cent_sim, kept, dup_of).

    Semantics (the paper's released procedure, made deterministic):
    cluster every vector to its nearest coarse centroid (the IVF
    quantizer trained on a seeded sample); within a cluster, order
    items by cosine similarity to the centroid ASCENDING (id asc
    tie-break) — the paper keeps the LOWEST-centroid-similarity member
    of a duplicate group to preserve diversity; an item is a duplicate
    (kept = false) when some EARLIER item in that order has pairwise
    cosine >= ``threshold`` with it, and ``dup_of`` is the earlier
    item with the highest similarity (smallest position on ties).

    Scale shape: training is O(sample) on the driver; assignment is
    one Arrow map pass (the cluster id is the natural partition
    column, same as the IVF cell table); dedup is applyInPandas per
    cluster — per-task cost is bounded by the cluster, NOT the
    corpus, and the pairwise pass runs in column blocks so memory is
    O(cluster x block), never O(cluster^2) at once. Clusters larger
    than ``max_cluster`` dedup their first ``max_cluster`` members
    (in keeper order) and pass the overflow through kept=true — the
    same bounded-reducer rule as the LSH hot_cap / simhash
    hot_bucket_cap; at 100 TB you raise n_centroids (the paper uses
    50k clusters for LAION) so clusters stay small, and the cap is
    the backstop against a degenerate embedding space."""
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    cents = ivf_train_centroids(
        vectors, dim, n_centroids, sample, iters, seed, vec_col, id_col
    )
    assigned = ivf_assign(vectors, cents, id_col, vec_col, keep_vec=True)

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("cluster", T.IntegerType(), False),
            T.StructField("cent_sim", T.DoubleType(), False),
            T.StructField("kept", T.BooleanType(), False),
            T.StructField("dup_of", T.LongType(), True),
        ]
    )

    def dedup_cluster(key, pdf: pd.DataFrame) -> pd.DataFrame:
        c = int(key[0])
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
        )
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
        # elementwise-multiply + row-sum, NOT mat @ cents[c]: BLAS
        # gemv rounds position-dependently (bit-identical rows at
        # different row indices can differ by 1 ulp), which would make
        # the cent_sim tie-break depend on partition order; the
        # per-row reduction is content-deterministic
        cent_sim = (mat * cents[c]).sum(axis=1)
        order = np.lexsort((ids, cent_sim))  # cent_sim asc, id asc
        ids_o, mat_o, cs_o = ids[order], mat[order], cent_sim[order]
        n = len(ids_o)
        m = min(n, max_cluster)
        dup_of = np.full(n, -1, dtype=np.int64)
        blk = 1024
        for lo in range(1, m, blk):
            hi = min(lo + blk, m)
            # sims[j, i-lo]: earlier item j (< i) vs block item i
            sims = mat_o[:hi] @ mat_o[lo:hi].T
            cols = np.arange(lo, hi)
            sims[cols[None, :] <= np.arange(hi)[:, None]] = -np.inf
            amx = sims.argmax(axis=0)
            mx = sims[amx, np.arange(hi - lo)]
            hit = mx >= threshold
            dup_of[lo:hi][hit] = ids_o[amx[hit]]
        return pd.DataFrame(
            {
                id_col: ids_o,
                "cluster": np.full(n, c, dtype=np.int32),
                "cent_sim": cs_o,
                "kept": dup_of < 0,
                "dup_of": pd.array(
                    np.where(dup_of < 0, None, dup_of), dtype="Int64"
                ),
            }
        )

    return assigned.groupBy("centroid").applyInPandas(
        dedup_cluster, schema=schema
    )


def _train_sample(vectors: DataFrame, id_col: str, sample: int):
    """Deterministic driver-side training sample: first ``sample``
    rows ordered by the EXPLICIT id column. Sorting by
    ``columns[0]`` (the old behavior) silently keyed the sample on
    whatever column happened to be first — an embedding-first caller
    got codebooks ordered by the array column."""
    if id_col not in vectors.columns:
        raise ValueError(
            f"id_col {id_col!r} not in vector columns {vectors.columns}"
        )
    return vectors.orderBy(id_col).limit(sample).toPandas()


def ivf_train_centroids(
    vectors: DataFrame,
    dim: int,
    n_centroids: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Seeded k-means on a driver-side sample (IVF coarse quantizer).

    The sample is deterministic (sort by ``id_col``, take first
    ``sample``) and tiny relative to the corpus; at 100 TB the same
    training runs on a 0.001% sample — IVF training cost is
    O(sample), not O(N).
    """
    pdf = _train_sample(vectors, id_col, sample)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=n_centroids, replace=False)]
    for _ in range(iters):
        sims = mat @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(n_centroids):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / max(np.linalg.norm(m), 1e-12)
    return centroids


def ivf_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """(vec_id, centroid[, <vec_col>]): nearest-centroid assignment,
    batch kernel. At scale this is the partitioning column of the
    vector table — queries scan only the probed centroid partitions.
    keep_vec=True carries the embedding through so the index build
    needs no join back to the corpus."""
    fields = [
        T.StructField(id_col, T.LongType(), False),
        T.StructField("centroid", T.IntegerType(), False),
    ]
    if keep_vec:
        fields.append(
            T.StructField(
                vec_col,
                next(
                    f.dataType
                    for f in vectors.schema.fields
                    if f.name == vec_col
                ),
                True,
            )
        )
    schema = T.StructType(fields)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            assign = (mat @ centroids.T).argmax(axis=1)
            cols = {
                id_col: pdf[id_col].to_numpy(),
                "centroid": assign.astype(np.int32),
            }
            if keep_vec:
                cols[vec_col] = pdf[vec_col]
            yield pd.DataFrame(cols)

    return ensure_parallelism(vectors.select(id_col, vec_col)).mapInPandas(
        kernel, schema=schema
    )


@dataclass
class IvfIndex:
    """Materialized IVF index: the coarse quantizer plus the cell
    table (vec_id, <vec_col>, centroid). When ``path``-backed, the
    cell table is parquet PARTITIONED BY centroid, so a probe is a
    partition-pruned scan — O(probed cells), never the full corpus."""

    centroids: np.ndarray
    cells: DataFrame
    vec_col: str = "embedding"
    id_col: str = "vec_id"
    path: str | None = None


def ivf_build(
    vectors: DataFrame,
    dim: int,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    path: str | None = None,
) -> IvfIndex:
    """Train the quantizer and materialize assignments ONCE. With
    ``path`` the cell table is written partitioned by centroid and
    read back, so every subsequent ivf_search prunes partitions at
    the scan (PartitionFilters in the plan). Without ``path`` the
    assignment DataFrame is cached in memory (small corpora / tests).
    Re-assigning the corpus per query — the round-1 shape — was an
    O(N) scan per query, defeating the inverted file."""
    centroids = ivf_train_centroids(
        vectors, dim, n_centroids, seed=seed, vec_col=vec_col, id_col=id_col
    )
    assigned = ivf_assign(vectors, centroids, id_col, vec_col, keep_vec=True)
    if path is not None:
        _PathOps(vectors.sparkSession, path).rmtree(_ivf_cells_root(path))
        _ivf_publish_batch(assigned, path, "base")
        cells = _ivf_read_cells(vectors.sparkSession, path)
    else:
        cells = assigned.cache()
    return IvfIndex(centroids, cells, vec_col=vec_col, id_col=id_col, path=path)


def _ivf_cells_root(path: str) -> str:
    import os

    return os.path.join(path, "cells")


def _ivf_read_cells(spark, path: str) -> DataFrame:
    # `batch` is a bookkeeping partition column, not index data
    return spark.read.parquet(_ivf_cells_root(path)).drop("batch")


class _PathOps:
    """Directory ops that follow the path's filesystem: plain os/
    shutil for local paths, the Hadoop FileSystem API (via the Spark
    JVM gateway) for any scheme-qualified path (hdfs://, s3a://, ...)
    — the same set of paths the Spark writes themselves accept.
    file:// also goes through Hadoop's LocalFileSystem (os.path
    cannot parse the scheme). Directory rename is atomic on POSIX
    filesystems and HDFS; object stores emulate rename non-atomically
    — use a transactional table format there for multi-writer
    setups."""

    def __init__(self, spark, path: str):
        self._hadoop = "://" in path
        if self._hadoop:
            jvm = spark._jvm
            self._P = jvm.org.apache.hadoop.fs.Path
            self._fs = self._P(path).getFileSystem(
                spark._jsc.hadoopConfiguration()
            )

    def exists(self, p: str) -> bool:
        if self._hadoop:
            return bool(self._fs.exists(self._P(p)))
        import os

        return os.path.exists(p)

    def rmtree(self, p: str) -> None:
        if self._hadoop:
            self._fs.delete(self._P(p), True)
        else:
            import shutil

            shutil.rmtree(p, ignore_errors=True)

    def mkdirs(self, p: str) -> None:
        if self._hadoop:
            self._fs.mkdirs(self._P(p))
        else:
            import os

            os.makedirs(p, exist_ok=True)

    def rename(self, src: str, dst: str) -> bool:
        """False when dst already exists (the loser of a publish
        race); raises on other failures."""
        if self._hadoop:
            return bool(self._fs.rename(self._P(src), self._P(dst)))
        import os

        try:
            os.rename(src, dst)
            return True
        except OSError:
            if os.path.exists(dst):
                return False
            raise


def _ivf_publish_batch(assigned: DataFrame, path: str, batch_id: str) -> bool:
    """Stage-then-rename publication of one cell batch: write the
    assigned vectors (partitioned by centroid) under a per-attempt
    _staging dir, then one atomic directory rename into
    cells/batch=<id>/. A crash mid-write leaves only an invisible
    staging dir; an already-published batch_id is a no-op; and
    because every attempt stages into its OWN directory, a concurrent
    retry can never clobber another attempt's files — the rename is
    the single commit point and exactly one attempt wins it. Same
    discipline as the posting-index group manifests (segments.py)."""
    import os
    import uuid

    if not batch_id or not all(
        c.isalnum() or c in "_-" for c in batch_id
    ):
        raise ValueError(
            f"batch_id must be non-empty [A-Za-z0-9_-], got {batch_id!r}"
        )
    ops = _PathOps(assigned.sparkSession, path)
    final = os.path.join(_ivf_cells_root(path), f"batch={batch_id}")
    if ops.exists(final):
        return False
    staging = os.path.join(
        path, "_staging", f"{batch_id}-{uuid.uuid4().hex}"
    )
    assigned.write.partitionBy("centroid").mode("overwrite").parquet(staging)
    ops.mkdirs(_ivf_cells_root(path))
    if not ops.rename(staging, final):
        ops.rmtree(staging)  # lost the race: batch already published
        return False
    return True


def ivf_add(
    index: IvfIndex, new_vectors: DataFrame, batch_id: str | None = None
) -> IvfIndex:
    """Incremental IVF maintenance: assign NEW vectors with the
    EXISTING quantizer (no retrain — the standard IVF add path; the
    coarse quantizer is a codebook, not a model of every vector) and
    append them to the cell table. Path-backed indexes publish the
    batch atomically (stage + rename, see _ivf_publish_batch) so a
    killed add never leaves partial files a re-run would duplicate —
    pass a deterministic batch_id to make retries exactly-once (an
    already-published id is skipped). In-memory indexes union +
    re-cache. Quantizer drift under distribution shift is handled by
    a periodic full ivf_build re-train, the analog of segment
    compaction (which also folds accumulated batch dirs back into
    one)."""
    assigned = ivf_assign(
        new_vectors, index.centroids, index.id_col, index.vec_col,
        keep_vec=True,
    )
    if index.path is not None:
        if batch_id is None:
            import uuid

            batch_id = uuid.uuid4().hex
        _ivf_publish_batch(assigned, index.path, batch_id)
        cells = _ivf_read_cells(new_vectors.sparkSession, index.path)
    else:
        cells = index.cells.unionByName(assigned).cache()
        index.cells.unpersist()
    return IvfIndex(
        index.centroids, cells, vec_col=index.vec_col, id_col=index.id_col,
        path=index.path,
    )


def ivf_search(
    index: IvfIndex,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Probe the n_probe centroids nearest the query; exact cosine
    re-rank within their cells only (partition-pruned when the index
    is path-backed)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(index.centroids @ qn))[:n_probe].tolist()
    cand = index.cells.filter(F.col("centroid").isin(probe))
    return brute_force_cosine_topk(
        cand, query_vec, k, index.id_col, index.vec_col
    )


def ivf_ann_topk(
    vectors: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: IvfIndex | None = None,
) -> DataFrame:
    """Convenience one-shot IVF ANN. Builds an (in-memory) index when
    none is supplied — for repeated queries build once with
    ivf_build(path=...) and call ivf_search so probes prune
    partitions instead of re-assigning the corpus."""
    if index is None:
        index = ivf_build(
            vectors, dim, n_centroids, seed=seed, id_col=id_col,
            vec_col=vec_col,
        )
    return ivf_search(index, query_vec, k, n_probe)


def lsh_ann_topk(
    vectors: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """ANN: probe the query's bucket (plus single-bit-flip neighbors
    when multiprobe_bits=1), exact cosine re-rank within candidates."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    qb = int(((q @ planes.T > 0) * (1 << np.arange(n_bits))).sum())
    probes = {qb}
    if multiprobe_bits >= 1:
        probes |= {qb ^ (1 << i) for i in range(n_bits)}
    buckets = hyperplane_lsh_buckets(
        vectors, dim, n_bits, seed, id_col, vec_col
    ).filter(F.col("bucket").isin(sorted(probes)))
    cand = vectors.join(
        buckets.withColumnRenamed("vec_id", id_col).select(id_col), id_col, "left_semi"
    )
    return brute_force_cosine_topk(cand, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------- PQ


def pq_train_codebooks(
    vectors: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 16,
    sample: int = 2048,
    iters: int = 10,
    seed: int = 43,
    vec_col: str = "embedding",
    normalize: bool = True,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    quantization for nearest neighbor search", TPAMI): seeded
    per-subspace k-means over the same deterministic driver-side
    sample discipline as the IVF coarse quantizer (sort by
    ``id_col``, first ``sample`` — training is O(sample), never
    O(N)). Vectors are
    L2-normalized first so asymmetric-distance inner-product scores
    rank like cosine (``normalize=False`` for inputs that are
    already residuals of normalized vectors — FAISS-style IVF-PQ
    residual encoding must NOT renormalize them). Returns
    (m, n_codes, dim//m) float64."""
    if dim % m:
        raise ValueError(f"dim={dim} must divide into m={m} subspaces")
    if n_codes < 1:
        raise ValueError("n_codes must be >= 1")
    pdf = _train_sample(vectors, id_col, sample)
    if len(pdf) == 0:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    if normalize:
        mat = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
        )
    # a corpus smaller than the codebook still trains: every vector
    # becomes (at most) its own centroid
    n_codes = min(n_codes, len(mat))
    d = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, d), dtype=np.float64)
    for j in range(m):
        sub = mat[:, j * d : (j + 1) * d]
        cb = sub[rng.choice(len(sub), size=n_codes, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(n_codes):
                members = sub[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[j] = cb
    return books


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = True,
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, codes array<int>): nearest sub-centroid per subspace.
    m small ints per vector instead of dim floats — 64-dim float32 →
    8 codes is the 32× memory lever that keeps a 100 TB vector corpus
    scannable. Arrow batch kernel; the argmin uses the expanded
    ``-2·x·c + ||c||²`` form (||x||² is constant per row), which the
    numpy oracle replays verbatim so ties break identically."""
    m, n_codes, d = codebooks.shape
    sq = (codebooks**2).sum(axis=2)  # (m, n_codes)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("codes", T.ArrayType(T.IntegerType()), False),
            # passthrough columns (e.g. the residual path's centroid)
            # keep their input types — carrying them through the
            # kernel avoids a corpus-wide re-join downstream
            *[vectors.schema[c] for c in passthrough],
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if normalize:
                mat = mat / np.maximum(
                    np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
                )
            codes = np.empty((len(mat), m), dtype=np.int32)
            for j in range(m):
                sub = mat[:, j * d : (j + 1) * d]
                dist = -2.0 * (sub @ codebooks[j].T) + sq[j][None, :]
                codes[:, j] = dist.argmin(axis=1)
            out = {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            for c in passthrough:
                out[c] = pdf[c].to_numpy()
            yield pd.DataFrame(out)

    return ensure_parallelism(
        vectors.select(id_col, vec_col, *passthrough)
    ).mapInPandas(kernel, schema=schema)


def pq_adc_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    offset_col: str | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: ONE (m × n_codes)
    inner-product lookup table from the normalized query, then
    score(x) = Σ_j table[j, code_j] — a table-lookup scan over the
    compressed codes, TakeOrdered top-k, no full sort and no float
    vectors read. ``offset_col`` names a per-row double added to the
    score — the residual-IVF-PQ decomposition ⟨q,x⟩ ≈ ⟨q,c_cell⟩ +
    ⟨q,r̂⟩ supplies ⟨q,c_cell⟩ there."""
    m, n_codes, d = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    table = np.stack(
        [codebooks[j] @ q[j * d : (j + 1) * d] for j in range(m)]
    )  # (m, n_codes)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("adc_score", T.DoubleType(), False),
        ]
    )
    rows = np.arange(m)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cm = np.stack([np.asarray(c, dtype=np.int64) for c in pdf["codes"]])
            scores = table[rows[None, :], cm].sum(axis=1)
            if offset_col is not None:
                scores = pdf[offset_col].to_numpy(dtype=np.float64) + scores
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "adc_score": scores}
            )

    cols = [id_col, "codes"] + ([offset_col] if offset_col else [])
    scored = codes.select(*cols).mapInPandas(kernel, schema=schema)
    return scored.orderBy(F.desc("adc_score"), F.asc(id_col)).limit(k)


def ivf_pq_residuals(index: IvfIndex) -> DataFrame:
    """(id, centroid, residual): every cell member's L2-normalized
    vector minus its assigned coarse centroid — the quantity residual
    PQ encodes. Reads the materialized cell table (assignments are
    authoritative there, including ``ivf_add``-ed vectors), centroids
    ride into the Arrow kernel as a closure (n_centroids × dim — tiny
    against any real corpus)."""
    cents = index.centroids
    id_col, vec_col = index.id_col, index.vec_col
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("centroid", T.IntegerType(), False),
            T.StructField("residual", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            mat = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-12
            )
            cell = pdf["centroid"].to_numpy(dtype=np.int64)
            res = mat - cents[cell]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "centroid": cell.astype(np.int32),
                    "residual": list(res),
                }
            )

    return ensure_parallelism(
        index.cells.select(id_col, vec_col, "centroid")
    ).mapInPandas(kernel, schema=schema)


def pq_ann_topk(
    vectors: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    refine: int = 4,
    seed: int = 43,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: np.ndarray | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """One-shot PQ ANN: train (seeded sample) → encode → ADC top
    ``k*refine`` candidates → exact cosine re-rank of just those.
    For repeated queries pass precomputed ``codebooks``/``codes`` —
    encoding is the one corpus-sized step and amortizes exactly like
    the materialized IVF cells."""
    if codebooks is None:
        codebooks = pq_train_codebooks(
            vectors, dim, m, n_codes, seed=seed, vec_col=vec_col,
            id_col=id_col,
        )
    if codes is None:
        codes = pq_encode(vectors, codebooks, id_col, vec_col)
    cand = pq_adc_topk(codes, codebooks, query_vec, k * refine, id_col)
    pool = vectors.join(cand.select(id_col), id_col, "left_semi")
    return brute_force_cosine_topk(pool, query_vec, k, id_col, vec_col)


def ivf_pq_topk(
    vectors: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    refine: int = 4,
    seed: int = 42,
    pq_seed: int = 43,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: IvfIndex | None = None,
    codebooks: np.ndarray | None = None,
    codes: DataFrame | None = None,
    by_residual: bool = False,
) -> DataFrame:
    """IVF+PQ (the FAISS IndexIVFPQ composition): coarse-probe the
    ``n_probe`` nearest cells, ADC-rank ONLY their members' codes,
    exact-cosine re-rank the top ``k*refine``. The two prune levers
    stack — the probe cuts candidates to O(N·n_probe/n_centroids)
    rows, PQ cuts bytes-per-candidate to m codes — which is what a
    100 TB vector scan actually needs; recall knobs are n_probe and
    refine. Pass a prebuilt ``index``/``codebooks``/``codes`` to
    amortize the corpus-sized steps across queries.

    ``by_residual=True`` is FAISS's default IndexIVFPQ refinement: PQ
    trains on and encodes residuals x − c_cell, which are far smaller
    in norm than the vectors (the coarse quantizer already explains
    the cluster structure), so the same m × n_codes budget spends its
    precision on the part the probe didn't resolve. The inner product
    decomposes exactly — ⟨q,x⟩ = ⟨q,c_cell⟩ + ⟨q,r⟩ — so scoring
    stays one global ADC table plus a per-cell constant carried as
    the ``offset_col``. With ``by_residual``, precomputed
    ``codebooks``/``codes`` must come from ``ivf_pq_residuals`` of
    the SAME index (codes rows carry the centroid column)."""
    if index is None:
        index = ivf_build(
            vectors, dim, n_centroids, seed=seed, id_col=id_col,
            vec_col=vec_col,
        )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(index.centroids @ qn))[:n_probe].tolist()
    if by_residual:
        need_books, need_codes = codebooks is None, codes is None
        if need_books or need_codes:
            res = ivf_pq_residuals(index)
            both = need_books and need_codes
            if both:
                # the residual kernel feeds both the training sample
                # scan and the encode pass — persist so the
                # full-corpus normalize-and-subtract runs once
                # (DISK_ONLY: residuals are corpus-sized); released
                # below, after codes materialize, so per-query calls
                # do not leak one disk cache each (ivf_build's own
                # unpersist convention)
                res = res.persist(StorageLevel.DISK_ONLY)
            if need_books:
                codebooks = pq_train_codebooks(
                    res, dim, m, n_codes, seed=pq_seed,
                    vec_col="residual", normalize=False,
                    id_col=index.id_col,
                )
            if need_codes:
                # centroid rides through the encode kernel — no
                # corpus-wide re-join against the cell table
                codes = pq_encode(
                    res,
                    codebooks,
                    id_col,
                    "residual",
                    normalize=False,
                    passthrough=("centroid",),
                )
            if both:
                # materialize the (compact: m ints/vector) codes so
                # the residual cache can be dropped eagerly
                codes = codes.localCheckpoint(eager=True)
                res.unpersist()
        qc = (index.centroids @ qn).tolist()
        cand_codes = codes.filter(F.col("centroid").isin(probe)).withColumn(
            "_qc",
            F.element_at(
                F.array(*[F.lit(float(x)) for x in qc]),
                F.col("centroid") + 1,
            ),
        )
        cand = pq_adc_topk(
            cand_codes, codebooks, query_vec, k * refine, id_col,
            offset_col="_qc",
        )
    else:
        if codebooks is None:
            codebooks = pq_train_codebooks(
                vectors, dim, m, n_codes, seed=pq_seed, vec_col=vec_col,
                id_col=id_col,
            )
        if codes is None:
            codes = pq_encode(vectors, codebooks, id_col, vec_col)
        members = index.cells.filter(F.col("centroid").isin(probe)).select(
            id_col
        )
        cand_codes = codes.join(members, id_col, "left_semi")
        cand = pq_adc_topk(
            cand_codes, codebooks, query_vec, k * refine, id_col
        )
    pool = vectors.join(cand.select(id_col), id_col, "left_semi")
    return brute_force_cosine_topk(pool, query_vec, k, id_col, vec_col)
