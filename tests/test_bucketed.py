"""Bucketed tables must co-locate joins: same key, same bucket count ⇒
the join plan contains NO shuffle Exchange on either side."""

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.sources.sinks import write_bucketed_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_quantity")
    orders = load_table(spark, "orders", SF).select("o_orderkey", "o_orderpriority")
    write_bucketed_table(li, "t_li_bucketed", "l_orderkey", 8, sort_col="l_orderkey")
    write_bucketed_table(orders, "t_ord_bucketed", "o_orderkey", 8, sort_col="o_orderkey")
    yield spark.table("t_li_bucketed"), spark.table("t_ord_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_ord_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li, orders = bucketed
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_plain(spark, bucketed):
    li, orders = bucketed
    got = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    plain_li = load_table(spark, "lineitem", SF)
    plain_or = load_table(spark, "orders", SF)
    want = (
        plain_li.join(plain_or, plain_li.l_orderkey == plain_or.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
