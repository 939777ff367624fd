"""Registry contributions: notebook-parity analytics (SURVEY.md §3.4,
M6), scalar-function showcase (§2.8), validation suite (§2.9), set ops
(§2.7) over the fixture tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.functions.roman import (
    ROMAN_OF_INT,
    int_to_roman_col,
    roman_to_int_col,
)
from building_permissions_etl_spark.operators import aggregates as A
from building_permissions_etl_spark.operators.validation import (
    expectation_suite_df,
)


def contribute(register) -> None:
    # --- A3/O2: value_counts sorted desc, deterministic tie-break --------
    register(
        "value_counts_priority",
        lambda spark, sf: A.value_counts(
            load_table(spark, "orders", sf), "o_orderpriority"
        ),
        """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_orderpriority
        ORDER BY cnt DESC, o_orderpriority
        """,
    )

    # --- A4/C11: monthly time series -------------------------------------
    register(
        "monthly_series",
        lambda spark, sf: A.monthly_series(
            load_table(spark, "lineitem", sf), "l_shipdate"
        ),
        """
        SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
               CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY 1 ORDER BY month
        """,
    )

    # --- A5: exact count-distinct (approx variant below, rows-only) -------
    register(
        "count_distinct_dates",
        lambda spark, sf: A.count_distinct(
            load_table(spark, "lineitem", sf), "l_shipdate"
        ),
        "SELECT CAST(count(DISTINCT l_shipdate) AS BIGINT) AS distinct_cnt FROM lineitem",
    )
    # At 100 TB the exact distinct is a full shuffle; HLL++ is the scale
    # path (SURVEY.md A5). Sketch internals differ from DuckDB ⇒ rows-only.
    register(
        "approx_count_distinct_dates",
        lambda spark, sf: A.count_distinct(
            load_table(spark, "lineitem", sf), "l_shipdate", approx=True
        ),
        None,
    )

    # --- A6: scalar max watermark ------------------------------------------
    register(
        "scalar_max_watermark",
        lambda spark, sf: A.scalar_max(load_table(spark, "events", sf), "ts"),
        "SELECT max(ts) AS max_val FROM events",
    )

    # --- A8: conversion success/failure tallies (C5 coerce-to-null) --------
    def parse_metrics(spark, sf):
        ev = load_table(spark, "events", sf)
        # props is a JSON-ish string column; try to parse a timestamp out of
        # ts formatted back and forth to exercise to_timestamp coercion.
        parsed = ev.withColumn(
            "parsed",
            F.to_timestamp(F.date_format("ts", "yyyy-MM-dd HH:mm:ss"),
                           "yyyy-MM-dd HH:mm:ss"),
        )
        return parsed.agg(
            F.count(F.when(F.col("parsed").isNotNull(), 1)).alias("converted"),
            F.count(F.when(F.col("parsed").isNull() & F.col("ts").isNotNull(), 1)
                    ).alias("failed"),
        )

    register(
        "timestamp_parse_metrics",
        parse_metrics,
        """
        SELECT CAST(count(CASE WHEN strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'),
                                             '%Y-%m-%d %H:%M:%S') IS NOT NULL
                          THEN 1 END) AS BIGINT) AS converted,
               CAST(0 AS BIGINT) AS failed
        FROM events
        """,
    )

    # --- A9/O3: top-k ---------------------------------------------------------
    register(
        "top_k_parts",
        lambda spark, sf: A.top_k(
            load_table(spark, "lineitem", sf), "l_partkey", 16
        ),
        """
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_partkey
        ORDER BY cnt DESC, l_partkey LIMIT 16
        """,
    )

    # --- C14-analog: code → name rollup with default ---------------------------
    def region_rollup(spark, sf):
        nation = load_table(spark, "nation", sf)
        region = load_table(spark, "region", sf)
        mapped = nation.join(
            F.broadcast(region),
            nation.n_regionkey == region.r_regionkey,
            "left",
        ).select(
            F.col("n_nationkey").cast("bigint").alias("nationkey"),
            F.coalesce(F.col("r_name"), F.lit("Unknown")).alias("region_name"),
        )
        return mapped.groupBy("region_name").agg(
            F.count(F.lit(1)).alias("cnt")
        ).orderBy(F.desc("cnt"), "region_name")

    register(
        "region_rollup_with_default",
        region_rollup,
        """
        SELECT COALESCE(r.r_name, 'Unknown') AS region_name,
               CAST(count(*) AS BIGINT) AS cnt
        FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1 ORDER BY cnt DESC, region_name
        """,
    )

    # --- C1-C3, C13, C16-C18: scalar function showcase --------------------------
    def scalar_funcs(spark, sf):
        cust = load_table(spark, "customer", sf)
        from building_permissions_etl_spark.functions.text import (
            canonicalize_numeric_string,
            zero_pad_terc,
        )

        code = F.lpad(F.col("c_custkey").cast("string"), 6, "0")
        return cust.select(
            "c_custkey",
            F.substring(code, 1, 2).alias("prefix2"),
            F.substring(code, 1, 4).alias("prefix4"),
            zero_pad_terc(code).alias("padded7"),
            canonicalize_numeric_string(
                F.concat(F.col("c_custkey").cast("string"), F.lit(".0"))
            ).alias("canon"),
            F.col("c_name").startswith("Customer#1").alias("starts_1"),
            F.col("c_acctbal").cast("int").alias("bal_int"),
            F.col("c_custkey").cast("string").alias("key_str"),
        ).orderBy("c_custkey")

    register(
        "scalar_function_showcase",
        scalar_funcs,
        """
        SELECT c_custkey,
               substr(lpad(CAST(c_custkey AS VARCHAR), 6, '0'), 1, 2) AS prefix2,
               substr(lpad(CAST(c_custkey AS VARCHAR), 6, '0'), 1, 4) AS prefix4,
               '0' || lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS padded7,
               CAST(c_custkey AS VARCHAR) AS canon,
               (c_name LIKE 'Customer#1%') AS starts_1,
               CAST(TRUNC(c_acctbal) AS INTEGER) AS bal_int,
               CAST(c_custkey AS VARCHAR) AS key_str
        FROM customer ORDER BY c_custkey
        """,
    )

    # --- C4: roman numeral codec (literal-map, no UDF) ---------------------------
    def roman_roundtrip(spark, sf):
        part = load_table(spark, "part", sf)
        n = (F.col("p_size") % 30 + 1).cast("int")
        return part.select(
            "p_partkey",
            n.alias("n"),
            int_to_roman_col(n).alias("as_roman"),
            roman_to_int_col(int_to_roman_col(n)).alias("back"),
        ).orderBy("p_partkey")

    roman_case = " ".join(
        f"WHEN {n} THEN '{r}'" for n, r in sorted(ROMAN_OF_INT.items())
    )
    register(
        "roman_numeral_codec",
        roman_roundtrip,
        f"""
        SELECT p_partkey,
               CAST(p_size % 30 + 1 AS INTEGER) AS n,
               CASE CAST(p_size % 30 + 1 AS INTEGER) {roman_case} END AS as_roman,
               CAST(p_size % 30 + 1 AS INTEGER) AS back
        FROM part ORDER BY p_partkey
        """,
    )

    # --- U1: union with schema alignment -------------------------------------
    def union_align(spark, sf):
        ev = load_table(spark, "events", sf)
        clicks = ev.filter(F.col("event_type") == "click").select(
            "event_id", "user_id", "value"
        )
        views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id")
        return clicks.unionByName(
            views, allowMissingColumns=True
        ).orderBy("event_id")

    register(
        "union_schema_align",
        union_align,
        """
        SELECT event_id, user_id, value FROM events WHERE event_type='click'
        UNION ALL
        SELECT event_id, user_id, NULL AS value FROM events WHERE event_type='view'
        ORDER BY event_id
        """,
    )

    # --- F9/F10: projection, reorder, rename -----------------------------------
    register(
        "projection_rename",
        lambda spark, sf: load_table(spark, "supplier", sf).select(
            F.col("s_suppkey").alias("supp_id"),
            F.col("s_name").alias("supp_name"),
            F.col("s_acctbal").alias("balance"),
        ).orderBy("supp_id"),
        """
        SELECT s_suppkey AS supp_id, s_name AS supp_name, s_acctbal AS balance
        FROM supplier ORDER BY supp_id
        """,
    )

    # --- V1-V4: Great-Expectations-style suite as ONE agg pass ------------------
    register(
        "validation_suite",
        lambda spark, sf: expectation_suite_df(load_table(spark, "orders", sf)),
        """
        SELECT
          (count(CASE WHEN o_orderpriority IS NOT NULL
                       AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
                 THEN 1 END) = 0) AS priority_regex_pass,
          (count(CASE WHEN o_orderstatus IS NOT NULL
                       AND o_orderstatus NOT IN ('F','O','P')
                 THEN 1 END) = 0) AS status_in_set_pass,
          COALESCE(avg(CASE WHEN o_orderpriority IS NULL THEN NULL
                    WHEN regexp_matches(o_orderpriority, '^[12]-') THEN 1.0
                    ELSE 0.0 END) >= 0.2, TRUE) AS priority_mostly_pass,
          (count(DISTINCT CASE WHEN o_orderstatus NOT IN ('F','O','P')
                          THEN o_orderstatus END) = 0) AS status_distinct_subset_pass,
          CAST(count(*) AS BIGINT) AS element_count
        FROM orders
        """,
    )

    # --- window-function family: top-k per group via rank ----------------
    # (the engine's OVER-clause surface beyond row_number/lag: rank with a
    # deterministic tie-break, partitioned top-k without a self-join)
    def topk_per_group(spark, sf):
        from pyspark.sql.window import Window

        li = load_table(spark, "lineitem", sf)
        per = li.groupBy("l_returnflag", "l_partkey").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        w = Window.partitionBy("l_returnflag").orderBy(
            F.desc("cnt"), F.col("l_partkey")
        )
        return (
            per.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("l_returnflag", "l_partkey", "cnt", "rk")
            .orderBy("l_returnflag", "rk")
        )

    register(
        "topk_per_group",
        topk_per_group,
        """
        SELECT l_returnflag, l_partkey, cnt, rk FROM (
          SELECT l_returnflag, l_partkey,
                 CAST(count(*) AS BIGINT) AS cnt,
                 CAST(row_number() OVER (PARTITION BY l_returnflag
                       ORDER BY count(*) DESC, l_partkey) AS INT) AS rk
          FROM lineitem GROUP BY l_returnflag, l_partkey
        ) WHERE rk <= 5 ORDER BY l_returnflag, rk
        """,
    )

    # --- exact quantiles: the length-distribution probe a training
    # pipeline uses to set filter thresholds. Spark `percentile` and
    # DuckDB `quantile_cont` share the linear-interpolation definition.
    def length_quantiles(spark, sf):
        docs = load_table(spark, "documents", sf)
        qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
        return (
            docs.groupBy("lang")
            .agg(*[
                F.round(F.percentile("n_chars", F.lit(p)), 6).alias(name)
                for name, p in qs.items()
            ])
            .orderBy("lang")
        )

    register(
        "doc_length_quantiles",
        length_quantiles,
        """
        SELECT lang,
               round(quantile_cont(n_chars, 0.25), 6) AS p25,
               round(quantile_cont(n_chars, 0.50), 6) AS p50,
               round(quantile_cont(n_chars, 0.75), 6) AS p75,
               round(quantile_cont(n_chars, 0.95), 6) AS p95
        FROM documents GROUP BY lang ORDER BY lang
        """,
    )

    # --- multi-join analytics representative (TPC-H Q3 shape): selective
    # dim filter → 3-way join → grouped revenue → top-k. Catalyst prunes
    # all three scans, broadcasts the filtered customer side, and executes
    # the top-k as TakeOrderedAndProject (no global sort shuffle).
    def shipping_priority(spark, sf):
        cutoff = "1998-06-01"
        cust = load_table(spark, "customer", sf).filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        orders = load_table(spark, "orders", sf).filter(
            F.col("o_orderdate") < F.lit(cutoff).cast("timestamp")
        )
        li = load_table(spark, "lineitem", sf).filter(
            F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")
        )
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ), 2).alias("revenue"))
            .orderBy(F.desc("revenue"), F.col("l_orderkey"))
            .limit(10)
        )

    register(
        "shipping_priority_topk",
        shipping_priority,
        """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate > TIMESTAMP '1998-06-01'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey LIMIT 10
        """,
    )

    # --- hierarchical aggregation: ROLLUP over (status, priority) with
    # subtotals and a grand total; grouping_id distinguishes subtotal
    # levels from genuine NULL keys. One shuffle — Spark expands the
    # grouping sets map-side before the exchange.
    def rollup_orders(spark, sf):
        orders = load_table(spark, "orders", sf)
        return (
            orders.rollup("o_orderstatus", "o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("revenue"),
                F.grouping_id().cast("int").alias("gid"),
            )
            .orderBy("gid", "o_orderstatus", "o_orderpriority")
        )

    register(
        "rollup_order_totals",
        rollup_orders,
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                    AS INT) AS gid
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY gid, o_orderstatus, o_orderpriority
        """,
    )

    # --- TPC-H Q1 (pricing summary): the canonical scan-heavy aggregate —
    # one pushed-down date filter, one partial-agg shuffle onto a 6-row
    # group space, eight aggregates in a single pass. The shape every
    # columnar engine is judged on first.
    def pricing_summary(spark, sf):
        li = load_table(spark, "lineitem", sf).filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
        disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
        return (
            li.groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                F.round(F.sum(disc), 2).alias("sum_disc_price"),
                F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
                F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .orderBy("l_returnflag", "l_linestatus")
        )

    register(
        "pricing_summary",
        pricing_summary,
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                 AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                 AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2 ORDER BY 1, 2
        """,
    )

    # --- distribution window functions (§2.5 breadth): ntile, percent_rank,
    # cume_dist over per-customer order value within market segment. ntile
    # assigns ties by ROW order, so the window orders by (total, custkey) —
    # every peer group is a single row and both engines agree exactly.
    def customer_value_dist(spark, sf):
        from pyspark.sql.window import Window

        cust = load_table(spark, "customer", sf)
        orders = load_table(spark, "orders", sf)
        totals = (
            orders.groupBy("o_custkey")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("total"))
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .select("c_custkey", "c_mktsegment", "total")
        )
        w = Window.partitionBy("c_mktsegment").orderBy("total", "c_custkey")
        return totals.select(
            "c_custkey", "c_mktsegment", "total",
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        ).orderBy("c_mktsegment", "c_custkey")

    register(
        "customer_value_distribution",
        customer_value_dist,
        """
        WITH t AS (
          SELECT c_custkey, c_mktsegment,
                 round(sum(o_totalprice), 2) AS total
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2)
        SELECT c_custkey, c_mktsegment, total,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM t WINDOW w AS (PARTITION BY c_mktsegment
                            ORDER BY total, c_custkey)
        ORDER BY c_mktsegment, c_custkey
        """,
    )

    # --- CUBE: all grouping combinations in one pass (complement of the
    # ROLLUP query; same single-exchange expansion).
    def cube_orders(spark, sf):
        orders = load_table(spark, "orders", sf)
        return (
            orders.cube("o_orderstatus", "o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.grouping_id().cast("int").alias("gid"),
            )
            .orderBy("gid", "o_orderstatus", "o_orderpriority")
        )

    register(
        "cube_order_counts",
        cube_orders,
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                    AS INT) AS gid
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY gid, o_orderstatus, o_orderpriority
        """,
    )

    # --- daily active users: exact distinct per day (the approx twin is
    # approx_count_distinct_dates; at 100 TB the exact form relies on the
    # (day, user) de-dup spreading hot days across reducers — same
    # skew-safety argument as operators/skew.exact_distinct_per_key).
    def dau(spark, sf):
        ev = load_table(spark, "events", sf)
        # UTC-day truncation via epoch arithmetic: date_trunc('day') on
        # an ltz timestamp uses the SESSION zone's day boundaries, which
        # diverges from the oracle's naive-as-UTC truncation on any
        # non-UTC session (measured: even the row COUNT differs under
        # America/New_York). floor(epoch/86400) is zone-free.
        day = F.timestamp_seconds(
            F.floor(F.unix_seconds(F.col("ts")) / 86400) * 86400
        )
        return (
            ev.select(day.alias("day"), "user_id")
            .dropDuplicates(["day", "user_id"])
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias("dau"))
            .orderBy("day")
        )

    register(
        "daily_active_users",
        dau,
        """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        FROM events GROUP BY 1 ORDER BY day
        """,
    )

    # --- set ops: INTERSECT / EXCEPT (distinct semantics) -----------------
    def custkeys_both(spark, sf):
        cust = load_table(spark, "customer", sf).select(
            F.col("c_custkey").alias("custkey"))
        ordered = load_table(spark, "orders", sf).select(
            F.col("o_custkey").alias("custkey"))
        return cust.intersect(ordered).orderBy("custkey")

    register(
        "intersect_active_customers",
        custkeys_both,
        """
        SELECT c_custkey AS custkey FROM customer
        INTERSECT SELECT o_custkey FROM orders
        ORDER BY custkey
        """,
    )

    def custkeys_finished_only(spark, sf):
        orders = load_table(spark, "orders", sf)
        fin = orders.filter(F.col("o_orderstatus") == "F").select(
            F.col("o_custkey").alias("custkey"))
        open_ = orders.filter(F.col("o_orderstatus") == "O").select(
            F.col("o_custkey").alias("custkey"))
        return fin.distinct().exceptAll(open_.distinct()).orderBy("custkey")

    register(
        "except_finished_only_customers",
        custkeys_finished_only,
        """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        ORDER BY custkey
        """,
    )

    # --- array aggregation: per-customer sorted order lists ---------------
    # (collect_list is unordered by contract; sort_array pins determinism
    # — same reason every oracle query carries an ORDER BY). The list is
    # emitted as a comma-joined STRING, not array<bigint>: the driver's
    # canonicalizer sorts/hashes cell values and cannot hash list cells
    # (CORRECTNESS_r01: "unhashable type: 'list'") — same information,
    # hashable representation.
    def orders_arrays(spark, sf):
        orders = load_table(spark, "orders", sf)
        return (
            orders.groupBy("o_custkey")
            .agg(
                F.array_join(
                    F.sort_array(F.collect_list("o_orderkey")), ","
                ).alias("orderkeys"),
                F.count(F.lit(1)).alias("n_orders"),
            )
            .filter(F.col("n_orders") >= 5)
            .orderBy("o_custkey")
        )

    register(
        "orders_per_customer_array",
        orders_arrays,
        """
        SELECT o_custkey,
               array_to_string(list(o_orderkey ORDER BY o_orderkey), ',')
                 AS orderkeys,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey
        HAVING count(*) >= 5 ORDER BY o_custkey
        """,
    )

    # --- the SQL surface: same engine, spark.sql text over registered
    # views (register_views makes every fixture table addressable). The
    # oracle is literally the same ANSI text — Catalyst and DuckDB parse
    # the identical query.
    _SQL_REVENUE = """
        SELECT o.o_orderstatus,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus
        ORDER BY o.o_orderstatus
    """

    def sql_surface(spark, sf):
        from building_permissions_etl_spark.catalog import register_views

        register_views(spark, sf)
        return spark.sql(_SQL_REVENUE)

    register("sql_revenue_by_status", sql_surface, _SQL_REVENUE)

    # --- C22-C23: CRS reprojection as shared SQL text (functions/crs.py).
    # The EPSG:2180→WGS84 inverse Transverse Mercator series is emitted
    # ONCE as a SQL expression both engines parse: Spark runs it through
    # F.expr (whole-stage codegen, no UDF), DuckDB runs the IDENTICAL
    # text — the driver's hash-compare proves the projection math itself.
    # Synthetic easting/northing grid derived from order keys spans the
    # EPSG:2180 domain; every 97th key keeps the output compact.
    from building_permissions_etl_spark.functions.crs import to_wgs84_sql

    _GRID_SRC = """
        SELECT o_orderkey,
               CAST(250000 + (o_orderkey * 7919) % 500000 AS DOUBLE) AS x,
               CAST(150000 + (o_orderkey * 104729) % 600000 AS DOUBLE) AS y
        FROM orders WHERE o_orderkey % 97 = 0
    """
    _LON_SQL, _LAT_SQL = to_wgs84_sql("x", "y")

    def crs_grid(spark, sf):
        return (
            load_table(spark, "orders", sf)
            .filter(F.expr("o_orderkey % 97 = 0"))
            .selectExpr(
                "o_orderkey",
                "CAST(250000 + (o_orderkey * 7919) % 500000 AS DOUBLE) AS x",
                "CAST(150000 + (o_orderkey * 104729) % 600000 AS DOUBLE) AS y",
            )
            .selectExpr(
                "o_orderkey",
                f"ROUND({_LON_SQL}, 6) AS lon",
                f"ROUND({_LAT_SQL}, 6) AS lat",
            )
            .orderBy("o_orderkey")
        )

    register(
        "crs_transform_grid",
        crs_grid,
        f"""
        SELECT o_orderkey,
               ROUND({_LON_SQL}, 6) AS lon,
               ROUND({_LAT_SQL}, 6) AS lat
        FROM ({_GRID_SRC})
        ORDER BY o_orderkey
        """,
    )
