"""salted_join correctness: identical results to the plain join on a
synthetically skewed key distribution (90% of rows on one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tsod_spark.analytics.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 900 rows of key=1 (hot), 100 spread over keys 2..11
    big = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise((F.col("id") % 10) + 2).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(i, f"dim_{i}") for i in range(1, 12)], "k int, name string"
    )
    plain = big.join(small, ["k"]).select("k", "payload", "name")
    salted = salted_join(big, small, ["k"], n_salts=4).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "c")], "k int, v string")
    small = spark.createDataFrame([(1, "x"), (2, "y")], "k int, name string")
    out = salted_join(big, small, ["k"], n_salts=3, how="left").collect()
    by_key = {r["k"]: r["name"] for r in out}
    assert len(out) == 3
    assert by_key[99] is None


def test_salt_actually_spreads_hot_key(spark):
    big = spark.range(1000).select(F.lit(1).alias("k"), F.col("id").alias("p"))
    from tsod_spark.analytics import skew as _  # noqa: F401

    salt = (F.abs(F.xxhash64("k", "p")) % 8).cast("int")
    n_buckets = big.withColumn("s", salt).select("s").distinct().count()
    assert n_buckets >= 6  # the single hot key fans out across salts
