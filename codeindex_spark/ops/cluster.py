"""Cluster-space corpus curation: deterministic k-means assignment,
per-cluster profiles, and cluster-balanced sampling.

Public designs: D4 (Tirumala et al. 2023, arXiv:2308.12284) curates
pretraining data by deduplicating then DIVERSIFYING in embedding-
cluster space (drop points too close to cluster centroids, rebalance
across clusters); SemDeDup (Abbas et al. 2023) and the DataComp
filtering tracks operate per k-means cluster the same way. The
reference engine has no embedding surface (it indexes code text);
this module is part of the repo's beyond-reference training-data
pipeline, built on the same coarse quantizer as the IVF ANN index
(ops/similarity.py:ivf_train_centroids).

Scale shape: training is O(sample) on the driver; assignment is one
Arrow map pass with NO shuffle; the profile is one map-side-
combinable groupBy over n_centroids keys; balanced sampling is one
shuffle keyed on the cluster id with per-group cost bounded by the
largest cluster. Nothing here is ever O(corpus^2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from codeindex_spark.ops.mixing import _hash_col
from codeindex_spark.util import ensure_parallelism

__all__ = ["cluster_assign", "cluster_profile", "cluster_balanced_sample"]


def cluster_assign(
    vectors: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    chunk: int = 64,
) -> DataFrame:
    """(id_col, cluster, cent_sim): nearest spherical-k-means centroid
    and the cosine similarity to it, as one Arrow map pass.

    Similarities are computed as elementwise-multiply + per-row sum
    (chunked over centroids), NOT a BLAS gemm: gemm rounds
    position-dependently — the same vector at a different row index
    can differ by 1 ulp — so near-tie assignments would depend on
    partition composition and no independent replay could match
    bit-for-bit (the pitfall the semdedup keeper tie-break hit, see
    BENCH/BASELINE.md). The per-row reduction is content-
    deterministic: curation centroid counts are 10^2..10^4, where
    this costs the same pass over the data gemm would.

    Ties (two centroids at exactly equal cosine) resolve to the
    lowest centroid index — np.argmax's first-maximum rule, stated
    here because the oracle replay relies on it.
    """
    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("cluster", T.IntegerType(), False),
            T.StructField("cent_sim", T.DoubleType(), False),
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
            sims = np.empty((len(mat), len(cents)))
            for lo in range(0, len(cents), chunk):
                hi = min(lo + chunk, len(cents))
                sims[:, lo:hi] = (
                    mat[:, None, :] * cents[None, lo:hi, :]
                ).sum(axis=2)
            best = sims.argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": best.astype(np.int32),
                    "cent_sim": sims[np.arange(len(mat)), best],
                }
            )

    return ensure_parallelism(vectors.select(id_col, vec_col)).mapInPandas(
        kernel, schema=schema
    )


def cluster_profile(assigned: DataFrame) -> DataFrame:
    """(cluster, n, min_sim, max_sim, mean_sim) over a cluster_assign
    result — the curation dashboard (which clusters are tight, which
    are junk drawers). One map-side-combinable groupBy with
    n_centroids output rows; min/max are order-independent doubles
    (mean is summation-order-dependent — compare it with a tolerance,
    not a hash)."""
    return assigned.groupBy("cluster").agg(
        F.count("*").alias("n"),
        F.min("cent_sim").alias("min_sim"),
        F.max("cent_sim").alias("max_sim"),
        F.avg("cent_sim").alias("mean_sim"),
    )


def cluster_balanced_sample(
    assigned: DataFrame,
    n_per_cluster: int,
    id_col: str = "vec_id",
    seed: str = "cluster",
) -> DataFrame:
    """Up to ``n_per_cluster`` rows from every cluster, selected by
    ascending md5(seed:id) with id tie-break — RNG-free, so re-runs,
    repartitions, and engine replays pick the identical sample (the
    same determinism contract as mixture_sample / sample_by_hash).
    The D4-style diversification step: a corpus dominated by one
    dense cluster exports a capped, cluster-uniform subset instead.

    One shuffle keyed on the cluster id; per-group sort cost is
    bounded by the largest cluster (raise n_centroids to shrink it —
    same knob as semdedup). For approximate-count zero-shuffle
    selection at extreme scale, compose cluster sizes with
    sample_by_hash thresholds instead.
    """
    if n_per_cluster < 1:
        raise ValueError("n_per_cluster must be >= 1")
    w = Window.partitionBy("cluster").orderBy(
        _hash_col(id_col, seed).asc(), F.col(id_col).asc()
    )
    return (
        assigned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_cluster)
        .drop("_rn")
    )
