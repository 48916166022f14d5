"""Hybrid retrieval: reciprocal-rank fusion of ranked lists.

Fuses the engine's lexical BM25 top-k with an embedding-cosine
top-k (or any other ranked sources) the way hybrid search pipelines
do: RRF score = Σ_sources 1 / (rrf_k + rank_source), which is
scale-free (no score normalization across incomparable scales) and
robust to outliers — the standard fusion baseline
(Cormack/Clarke/Buettcher, SIGIR'09).

Scale notes: fusion operates on ALREADY-BOUNDED top-k lists (one
per source, k rows each), never on corpus-sized inputs — the
expensive part of hybrid search is producing the per-source lists
(block-max WAND for lexical, IVF/LSH probes for semantic; both
elsewhere in this package). The fusion itself is a union + window +
groupBy over O(sources x k) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    sources: "dict[str, DataFrame]",
    id_col: str = "doc_id",
    score_col: str = "score",
    rrf_k: int = 60,
    k: int = 10,
) -> DataFrame:
    """(doc_id, rrf_score, n_sources) — top-k by reciprocal-rank
    fusion over named ranked lists.

    Each source DataFrame holds (id_col, score_col) for its own
    bounded top list; ranks are assigned per source as row_number
    over (score desc, id asc) so ties fuse identically on any
    engine. A doc absent from a source simply contributes nothing
    for it (the standard RRF convention).
    """
    if not sources:
        raise ValueError("rrf_fuse needs at least one ranked source")
    parts = []
    for name, df in sources.items():
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        parts.append(
            df.select(
                F.col(id_col).alias("doc_id"),
                F.lit(name).alias("source"),
                F.row_number().over(w).alias("rank"),
            )
        )
    ranked = parts[0]
    for p in parts[1:]:
        ranked = ranked.unionByName(p)
    fused = ranked.groupBy("doc_id").agg(
        F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank"))).alias(
            "rrf_score"
        ),
        F.count("*").alias("n_sources"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(k)


def hybrid_search(
    lexical: DataFrame,
    semantic: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    rrf_k: int = 60,
    k: int = 10,
) -> DataFrame:
    """Two-source convenience wrapper: fuse a lexical (BM25) top
    list with a semantic (embedding-cosine) top list by RRF."""
    return rrf_fuse(
        {"lexical": lexical, "semantic": semantic},
        id_col=id_col,
        score_col=score_col,
        rrf_k=rrf_k,
        k=k,
    )
