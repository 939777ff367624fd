"""Skew operators must be exact rewrites of their naive forms, including
on deliberately skewed data (one hot key holding most rows)."""

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators.skew import (
    exact_distinct_per_key,
    salted_group_count,
    salted_join,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def skewed(spark):
    """90% of rows share key=1, the rest spread over 100 keys."""
    return spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 > 0, F.lit(1)).otherwise(F.col("id") % 100 + 2)
        .alias("k"),
        F.col("id").alias("row_id"),
        (F.col("id") % 37).alias("v"),
    )


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_group_count_matches_plain(spark, skewed):
    got = salted_group_count(skewed, "k", salt_on="row_id", n_salt=16)
    want = skewed.groupBy("k").agg(F.count(F.lit(1)).alias("count"))
    assert _sorted(got) == _sorted(want)


def test_salted_group_count_spreads_hot_key(spark, skewed):
    partial = (
        skewed.withColumn("__salt", F.pmod(F.xxhash64("row_id"), F.lit(16)))
        .groupBy("k", "__salt").count()
    )
    assert partial.filter(F.col("k") == 1).count() == 16


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.range(1, 60).select(
        F.col("id").alias("dk"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    got = salted_join(skewed, dim, "k", "dk", salt_on="row_id", n_salt=8).select(
        "k", "row_id", "name"
    )
    want = skewed.join(dim, skewed.k == dim.dk).select("k", "row_id", "name")
    assert _sorted(got) == _sorted(want)


def test_exact_distinct_matches_plain(spark, skewed):
    got = exact_distinct_per_key(skewed, "k", "v")
    want = skewed.groupBy("k").agg(F.countDistinct("v").alias("n_distinct"))
    assert _sorted(got) == _sorted(want)


def test_salted_join_on_fixture_tables(spark):
    orders = load_table(spark, "orders", SF)
    cust = load_table(spark, "customer", SF).select("c_custkey", "c_mktsegment")
    got = salted_join(orders, cust, "o_custkey", "c_custkey", salt_on="o_orderkey")
    assert got.count() == orders.join(cust, orders.o_custkey == cust.c_custkey).count()


def test_exact_distinct_ignores_nulls_like_sql(spark):
    """COUNT(DISTINCT value) semantics: NULL is not a value; a key whose
    values are all NULL still appears with n_distinct = 0."""
    from building_permissions_etl_spark.operators.skew import (
        exact_distinct_per_key,
    )

    df = spark.createDataFrame(
        [(1, "a"), (1, None), (1, "a"), (2, None)],
        "k int, v string",
    )
    got = {r["k"]: r["n_distinct"]
           for r in exact_distinct_per_key(df, "k", "v").collect()}
    assert got == {1: 1, 2: 0}
