"""Skew mitigation: salted aggregation and salted broadcast-replica
joins — the classic hot-key defenses, as reusable operators with
results IDENTICAL to their unsalted spellings (which is what makes
them oracle-checkable).

Why this exists even with AQE: adaptive skew-join splitting
(spark.sql.adaptive.skewJoin) only splits SORT-MERGE join partitions
after a shuffle has already materialized the skewed map output, and
it never helps a skewed AGGREGATION whose hot key must still meet on
one reducer for the final combine. Salting restructures the plan so
no single task ever owns a hot key:

- ``salted_agg``: two-phase decomposable aggregation. Phase 1 groups
  by (key, salt) — the hot key's rows spread over ``n_salts``
  reducers; phase 2 re-aggregates the <= n_salts partials per key.
  Works for any algebraic aggregate (count/sum/min/max and anything
  built from them, e.g. avg = sum/count assembled in phase 2).
  Map-side partial aggregation still applies within each phase, so
  the exchange volume is at most n_salts rows per key per mapper.
- ``salted_join``: fact-side rows get a deterministic salt in
  [0, n_salts); the DIMENSION side is replicated n_salts times
  (explode over a literal range — dims are the small side), and the
  join key becomes (key, salt). Every fact row still meets exactly
  one replica of its dim row, so the result multiset is identical to
  the plain join, but a hot fact key now lands on n_salts reducers.

Salt determinism: with ``salt_on`` set, salts are xxhash64 of a
stable id column — reproducible run-to-run and partition-invariant.
The fallback (xxhash64 of spark_partition_id + a monotonic row id)
is only deterministic for a FIXED physical plan: AQE decisions,
input-split boundaries, or repartitioning change which salt a row
gets. RESULTS stay identical either way (the phase-2 re-aggregate /
replica join is salt-value-agnostic); only the salt assignment
itself is plan-dependent in fallback mode. Pass ``salt_on`` when you
need the assignment itself replayable (e.g. debugging a specific
reducer's load).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "salted_join"]


def _salt(df: DataFrame, n_salts: int, salt_on: str | None) -> Column:
    if salt_on is not None:
        return F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n_salts))
    # no stable id: spread purely by physical position — still
    # deterministic for a deterministic input plan
    return F.pmod(
        F.xxhash64(F.spark_partition_id(), F.monotonically_increasing_id()),
        F.lit(n_salts),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    salt_on: str | None = None,
    count_alias: str = "n",
    sums: dict[str, str] | None = None,
) -> DataFrame:
    """Two-phase salted groupBy: per ``keys``, a row count plus a sum
    per entry of ``sums`` ({out_alias: column}). Result rows are
    identical to the plain ``df.groupBy(keys).agg(...)`` — only the
    physical plan differs (no reducer ever holds a whole hot key)."""
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    sums = sums or {}
    salted = df.withColumn("_salt", _salt(df, n_salts, salt_on))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        F.count(F.lit(1)).alias("_c"),
        *[F.sum(c).alias(f"_s_{a}") for a, c in sums.items()],
    )
    return phase1.groupBy(*keys).agg(
        F.sum("_c").cast("long").alias(count_alias),
        *[F.sum(f"_s_{a}").alias(a) for a in sums],
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    salt_on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: fact rows salt into [0, n_salts), the
    dim side replicates once per salt, and the join runs on
    (on, salt). Multiset-identical to ``fact.join(dim, on, how)``
    for ``inner`` and ``left`` joins (each fact row meets exactly
    one replica of its dim match). Replication multiplies the dim
    side n_salts×, so use it when dim is orders of magnitude smaller
    than fact — the same regime where the hot fact key hurts."""
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError(
            "salted_join preserves semantics for inner/left joins only"
        )
    f = fact.withColumn("_salt", _salt(fact, n_salts, salt_on))
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [on, "_salt"], how).drop("_salt")
