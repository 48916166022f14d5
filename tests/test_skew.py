"""Salted aggregation / salted join: result-identical to the plain
spellings (modulo float reassociation in sums), deterministic, and
semantics-preserving for inner/left joins."""

from __future__ import annotations

import pytest

from codeindex_spark.ops.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 'hot' owns 80% of rows — the key salting exists for
    rows = [("hot" if i % 5 != 4 else f"k{i % 97}", i, float(i % 13))
            for i in range(5000)]
    return spark.createDataFrame(rows, "k string, rid long, v double")


def test_salted_agg_equals_plain(spark, skewed):
    from pyspark.sql import functions as F

    got = {
        r["k"]: (r["n"], r["sum_v"])
        for r in salted_agg(
            skewed, ["k"], n_salts=8, salt_on="rid", sums={"sum_v": "v"}
        ).collect()
    }
    exp = {
        r["k"]: (r["n"], r["sum_v"])
        for r in skewed.groupBy("k")
        .agg(F.count("*").cast("long").alias("n"), F.sum("v").alias("sum_v"))
        .collect()
    }
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == pytest.approx(exp[k][1], rel=1e-12)


def test_salted_agg_partition_invariance(spark, skewed):
    a = sorted(
        (r["k"], r["n"], round(r["sum_v"], 6))
        for r in salted_agg(
            skewed, ["k"], n_salts=8, salt_on="rid", sums={"sum_v": "v"}
        ).collect()
    )
    b = sorted(
        (r["k"], r["n"], round(r["sum_v"], 6))
        for r in salted_agg(
            skewed.repartition(13), ["k"], n_salts=8, salt_on="rid",
            sums={"sum_v": "v"},
        ).collect()
    )
    assert a == b


def test_salted_agg_spreads_hot_key(spark, skewed):
    """The phase-1 exchange must really spread 'hot': with 8 salts
    and a deterministic rid hash, the hot key appears under >= 4
    distinct salt values."""
    from pyspark.sql import functions as F

    from codeindex_spark.ops.skew import _salt

    n = (
        skewed.filter(F.col("k") == "hot")
        .select(_salt(skewed, 8, "rid").alias("s"))
        .distinct()
        .count()
    )
    assert n >= 4


def test_salted_join_equals_plain(spark, skewed):
    dim_rows = [("hot", "HOT"), ("k4", "K4"), ("k9", "K9")]
    dim = spark.createDataFrame(dim_rows, "k string, label string")
    got = sorted(
        (r["k"], r["rid"], r["label"])
        for r in salted_join(skewed, dim, "k", n_salts=8, salt_on="rid").collect()
    )
    exp = sorted(
        (r["k"], r["rid"], r["label"])
        for r in skewed.join(dim, "k").collect()
    )
    assert got == exp


def test_salted_left_join_keeps_unmatched(spark, skewed):
    dim = spark.createDataFrame([("hot", "HOT")], "k string, label string")
    got = salted_join(skewed, dim, "k", n_salts=4, salt_on="rid", how="left")
    assert got.count() == skewed.count()
    assert got.filter("label IS NULL").count() == skewed.filter(
        "k <> 'hot'"
    ).count()


def test_salted_validation(spark, skewed):
    dim = spark.createDataFrame([("hot", "x")], "k string, label string")
    with pytest.raises(ValueError):
        salted_agg(skewed, ["k"], n_salts=0)
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", how="outer")
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", n_salts=0)
