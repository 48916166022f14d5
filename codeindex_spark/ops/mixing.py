"""Training-export operators: domain-mixture sampling and
deterministic shard assignment (beyond-reference; the standard last
mile between a filtered corpus and a training dataloader — cf. The
Pile / DoReMi-style fixed mixture weights applied at export time).

Everything is RNG-free: selection order and shard ids derive from
md5(seed:id), so re-runs, engine changes, and repartitions reproduce
the same byte-identical export.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mixture_plan", "mixture_sample", "assign_shards"]


def _hash_col(id_col: str, seed: str):
    """Deterministic uniform-ish sort key: md5 hex of seed:id.
    Lowercase-hex lexicographic order == numeric order, so the string
    compares portably across engines with no integer conversion."""
    return F.md5(F.concat_ws(":", F.lit(seed), F.col(id_col)))


def mixture_plan(
    df: DataFrame,
    target_props: dict[str, float],
    group_col: str = "lang",
    budget: int | None = None,
) -> dict[str, dict]:
    """Per-group take counts that realize ``target_props`` exactly
    (by proportion) at the largest feasible total: the total is
    min(available_g / prop_g) over requested groups — the scarcest
    group binds the mixture — further capped by ``budget``. Returns
    {group: {"available", "prop", "take"}} (driver-side: one row per
    group, bounded by the domain count, never by corpus size)."""
    props = {g: float(p) for g, p in target_props.items() if p > 0}
    if not props:
        raise ValueError("target_props must have a positive entry")
    s = sum(props.values())
    if not math.isclose(s, 1.0, rel_tol=1e-9):
        props = {g: p / s for g, p in props.items()}  # normalize
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    missing = sorted(set(props) - set(counts))
    if missing:
        raise ValueError(f"groups absent from corpus: {missing}")
    total = min(counts[g] / p for g, p in props.items())
    if budget is not None:
        total = min(total, float(budget))
    return {
        g: {
            "available": counts[g],
            "prop": p,
            "take": int(math.floor(total * p)),
        }
        for g, p in props.items()
    }


def mixture_sample(
    df: DataFrame,
    target_props: dict[str, float],
    group_col: str = "lang",
    budget: int | None = None,
    id_col: str = "doc_id",
    seed: str = "mix",
    exact: bool = True,
) -> DataFrame:
    """Select a subset whose group proportions match ``target_props``:
    per group, the ``take`` lowest md5(seed:id) rows (deterministic —
    no RNG, stable under repartition/re-run/engine).

    ``exact=True`` takes exactly the planned counts via a per-group
    window rank — one shuffle keyed on the group, per-group sort cost
    bounded by the LARGEST DOMAIN, the right tool up to billions of
    rows per domain. ``exact=False`` converts each take to a hash
    threshold (take/available) — Bernoulli-approximate counts but
    zero-shuffle map-side filtering: the 100 TB fast path when a ~1 %
    count tolerance is acceptable."""
    plan = mixture_plan(df, target_props, group_col, budget)
    h = _hash_col(id_col, seed)
    in_groups = df.filter(F.col(group_col).isin(list(plan)))
    if exact:
        take_map = F.create_map(
            *[x for g, row in plan.items() for x in (F.lit(g), F.lit(row["take"]))]
        )
        w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
        return (
            in_groups.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= take_map[F.col(group_col)])
            .drop("_rn")
        )
    thr_map = F.create_map(
        *[
            x
            for g, row in plan.items()
            for x in (
                F.lit(g),
                F.lit(min(1.0, row["take"] / max(row["available"], 1))),
            )
        ]
    )
    # first-8-hex uniform in [0, 2^32)
    u = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
    )
    return in_groups.filter(u < thr_map[F.col(group_col)])


def assign_shards(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shard",
) -> DataFrame:
    """Add a ``shard`` column in [0, n_shards): hash-uniform,
    deterministic, independent of row order and partitioning — the
    dataloader contract (every worker recomputes the same shard for
    the same id). Pure map-side expression, no shuffle; write with
    ``.write.partitionBy('shard')`` for one output dir per shard."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    return df.withColumn(
        "shard",
        F.pmod(
            F.conv(F.substring(_hash_col(id_col, seed), 1, 8), 16, 10).cast(
                "long"
            ),
            F.lit(n_shards),
        ).cast("int"),
    )
