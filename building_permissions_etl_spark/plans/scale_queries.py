"""Scale-pattern queries: skew mitigation shapes, oracle-checked.

Each salted/two-stage operator must produce byte-identical results to its
naive relational form — the oracle IS the naive form, so the driver's
hash-compare proves the rewrite is semantics-preserving.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators.skew import (
    exact_distinct_per_key,
    salted_group_count,
    salted_join,
)


def contribute(register) -> None:
    # Two-stage salted count per supplier over lineitem.
    def salted_counts(spark, sf):
        li = load_table(spark, "lineitem", sf)
        return salted_group_count(li, "l_suppkey", salt_on="l_orderkey", n_salt=16)

    register(
        "salted_group_count",
        salted_counts,
        """
        SELECT l_suppkey, CAST(count(*) AS BIGINT) AS count
        FROM lineitem GROUP BY l_suppkey
        """,
    )

    # Salted fact⋈dim join (orders ⋈ customer), aggregated per segment ×
    # priority so the result is compact but every joined row counts.
    def salted_seg(spark, sf):
        orders = load_table(spark, "orders", sf)
        cust = load_table(spark, "customer", sf).select("c_custkey", "c_mktsegment")
        joined = salted_join(
            orders, cust, "o_custkey", "c_custkey", salt_on="o_orderkey", n_salt=8
        )
        return joined.groupBy("c_mktsegment", "o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )

    register(
        "salted_join_segments",
        salted_seg,
        """
        SELECT c.c_mktsegment, o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o.o_totalprice), 2) AS revenue
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
        """,
    )

    # Skew-safe exact distinct parts per supplier.
    def distinct_parts(spark, sf):
        li = load_table(spark, "lineitem", sf)
        return exact_distinct_per_key(li, "l_suppkey", "l_partkey")

    register(
        "exact_distinct_per_key",
        distinct_parts,
        """
        SELECT l_suppkey, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct
        FROM lineitem GROUP BY l_suppkey
        """,
    )
