"""Salted-join equivalence on a pathologically skewed key."""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_ingestion_spark.skew import salted_join


def test_salted_join_equals_plain_join(spark):
    # 50k rows, 90% on one hot key
    big = spark.range(50_000).select(
        F.when(F.col("id") % 10 != 0, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(k, f"dim_{k}") for k in range(100)], ["k", "dim_val"]
    )
    plain = big.join(small, "k")
    salted = salted_join(big, small, "k", n_salt=8)
    assert salted.count() == plain.count()
    a = sorted((r.k, r.payload, r.dim_val) for r in salted.collect())
    b = sorted((r.k, r.payload, r.dim_val) for r in plain.collect())
    assert a == b


def test_salt_distribution_spreads_hot_key(spark):
    big = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    small = spark.createDataFrame([(7, "x")], ["k", "v"])
    salted = salted_join(big, small, "k", n_salt=8)
    # every salt bucket participates (deterministic hash spreads rows)
    from travel_data_ingestion_spark.skew import salted_join as _  # noqa: F401

    buckets = (
        big.withColumn("s", F.pmod(F.xxhash64(*big.columns), F.lit(8)))
        .groupBy("s")
        .count()
        .collect()
    )
    assert len(buckets) == 8
    counts = [r["count"] for r in buckets]
    assert max(counts) < 3 * min(counts)  # roughly even
    assert salted.count() == 10_000


def test_salted_join_preserves_unmatched_big_rows(spark):
    # left join: big rows with no dim match must appear exactly once
    big = spark.range(1_000).select(
        (F.col("id") % 150).alias("k"), F.col("id").alias("payload")
    )
    small = spark.createDataFrame([(k, f"dim_{k}") for k in range(100)], ["k", "dim_val"])
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, "k", n_salt=8, how="left")
    a = sorted((r.k, r.payload, r.dim_val) for r in salted.collect())
    b = sorted((r.k, r.payload, r.dim_val) for r in plain.collect())
    assert a == b


def test_salted_join_rejects_small_side_preserving_joins(spark):
    """right/full joins would emit unmatched small-side rows n_salt times
    (each salt replica misses independently) — the API must refuse."""
    import pytest

    big = spark.range(10).select(F.col("id").alias("k"))
    small = spark.createDataFrame([(1, "x")], ["k", "v"])
    for how in ("right", "right_outer", "full", "full_outer", "outer", "right_semi"):
        with pytest.raises(ValueError, match="big-side-preserving"):
            salted_join(big, small, "k", n_salt=4, how=how)
