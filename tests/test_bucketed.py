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


def test_zorder_write_gives_multi_column_file_pruning(spark, tmp_path):
    """Z-order clustering vs single-column sort on (l_orderkey,
    l_partkey): for point lookups on the SECOND column, footer min/max
    ranges must make far fewer z-ordered files candidates — the
    multi-dimensional locality that single-column clustering cannot
    give."""
    import glob

    from building_permissions_etl_spark.sources.sinks import write_zordered

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet") \
        .select("l_orderkey", "l_partkey", "l_quantity")
    zpath, spath = str(tmp_path / "zorder"), str(tmp_path / "single")
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], n_files=8)
    (li.repartitionByRange(8, "l_orderkey")
       .sortWithinPartitions("l_orderkey")
       .write.mode("overwrite").parquet(spath))

    def file_ranges(path):
        out = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            r = spark.read.parquet(f).agg(
                {"l_partkey": "min"}).collect()[0][0], \
                spark.read.parquet(f).agg({"l_partkey": "max"}).collect()[0][0]
            out.append(r)
        return out

    zr, sr = file_ranges(zpath), file_ranges(spath)
    assert len(zr) == 8 and len(sr) == 8
    # no rows lost
    assert spark.read.parquet(zpath).count() == li.count()

    probes = [r.l_partkey for r in li.select("l_partkey").distinct().limit(40).collect()]
    z_hits = sum(sum(1 for lo, hi in zr if lo <= p <= hi) for p in probes)
    s_hits = sum(sum(1 for lo, hi in sr if lo <= p <= hi) for p in probes)
    # single-column layout: nearly every file is a candidate for every
    # probe; z-order: a small fraction
    assert z_hits < 0.6 * s_hits, (z_hits, s_hits)
