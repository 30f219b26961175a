"""Salted dedup tests: correctness vs the naive plan on a heavily
skewed fixture, deterministic keeper selection, and the partition-
spread property that IS the point of salting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomaly_detection_toolkit_spark.operators.salted import (
    salted_duplicate_counts,
    salted_sorted_dedup,
)


@pytest.fixture(scope="module")
def skewed_df(spark):
    """50k rows, 40% sharing ONE hot key — the duplicate-phash shape
    the north star warns about."""
    n = 50_000
    base = spark.range(0, n, 1, 16)
    return base.select(
        F.when(F.col("id") % 5 < 2, F.lit(0xC0FFEE))
        .otherwise(F.col("id"))
        .alias("phash"),
        F.col("id").alias("row_id"),
        (F.col("id") * 7 % 1000).alias("payload"),
    )


def test_dedup_matches_naive_keeper(spark, skewed_df):
    got = salted_sorted_dedup(skewed_df, ["phash"], ["row_id"], n_salts=8)
    from pyspark.sql import Window

    w = Window.partitionBy("phash").orderBy("row_id")
    want = (
        skewed_df.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .drop("rn")
    )
    assert got.count() == want.count()
    # exact same keeper rows
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # the hot key keeps its order_cols-smallest row
    hot = got.filter(F.col("phash") == 0xC0FFEE).collect()
    assert len(hot) == 1 and hot[0].row_id == 0


def test_hot_key_is_spread_across_partitions(spark, skewed_df):
    """After the salted repartition, the 20k-row hot key must occupy
    many partitions — the property a plain repartition(key) lacks."""
    n_salts = 8
    salt = F.pmod(F.xxhash64(F.col("row_id")), F.lit(n_salts))
    salted = skewed_df.withColumn("_salt", salt).repartition(
        32, F.col("phash"), F.col("_salt")
    )
    spread = (
        salted.filter(F.col("phash") == 0xC0FFEE)
        .select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    assert len(spread) >= n_salts * 3 // 4  # hot key split across ~n_salts parts
    assert max(r["count"] for r in spread) < 20_000  # no single-task pileup
    # unsalted control: the hot key collapses onto ONE partition
    unsalted = skewed_df.repartition(32, F.col("phash"))
    control = (
        unsalted.filter(F.col("phash") == 0xC0FFEE)
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert control == 1


def test_salted_duplicate_counts(spark, skewed_df):
    counts = {r.phash: r.key_count for r in salted_duplicate_counts(
        skewed_df, ["phash"]
    ).collect()}
    assert counts[0xC0FFEE] == 20_000
    del counts[0xC0FFEE]
    assert all(c == 1 for c in counts.values())


def test_dedup_no_duplicates_fixture(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"), F.col("id").alias("o"))
    out = salted_sorted_dedup(df, ["k"], ["o"])
    assert out.count() == 100
