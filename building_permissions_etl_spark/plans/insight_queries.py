"""Registry contributions: product/behavioral analytics breadth —
grouping sets, statistical and regression aggregates, funnel
conversion, cohort retention, forward-fill gap-filling, and z-score
outlier detection.

These are the standard "insight" workloads a warehouse user runs over
the same tables as the decision-support family, chosen to exercise
semantics the registry did not yet cover:

  * GROUP BY GROUPING SETS + GROUPING() disambiguation — shared SQL
    text, both engines parse the identical statement;
  * corr / covar_samp / stddev_samp / var_samp and the regr_* family —
    closed-form second-moment aggregates, identically defined in Spark
    and DuckDB (sample variants only: skewness/kurtosis differ in
    their bias correction between engines and are excluded);
  * multi-stage funnel via progressive min-timestamp joins (each stage
    is a small per-user aggregate joined back — no window over the
    full event stream needed);
  * cohort retention (first-activity month × active month);
  * per-user daily forward-fill over a complete calendar grid
    (sequence + explode, then last-ignore-nulls window) — the
    timeseries gap-fill shape;
  * z-score outliers against per-group moments (broadcast the few-row
    moment table back; the fact table is scanned once).

Scale notes: every query shuffles the events/lineitem fact at most
once on its natural key (user_id / group key); moment and stage tables
are tiny aggregates, always broadcast. The calendar grid explode is
|users| × |days| — bounded output by construction, generated from an
aggregate, never from a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table, register_views

# Shared SQL (identical text runs on both engines): grouping sets.
_GROUPING_SETS_SQL = """
SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
            ELSE o_orderstatus END AS status,
       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
            ELSE o_orderpriority END AS priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
ORDER BY status, priority
"""


def contribute(register) -> None:
    # ---- grouping sets with GROUPING() labels --------------------------
    def grouping_sets(spark, sf):
        register_views(spark, sf)
        return spark.sql(_GROUPING_SETS_SQL)

    register("grouping_sets_order_stats", grouping_sets, _GROUPING_SETS_SQL)

    # ---- second-moment statistical aggregates --------------------------
    def lineitem_stats(spark, sf):
        li = load_table(spark, "lineitem", sf)
        return (
            li.groupBy("l_returnflag")
            .agg(
                F.round(F.corr("l_quantity", "l_extendedprice"), 6)
                .alias("qty_price_corr"),
                F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4)
                .alias("qty_price_covar"),
                F.round(F.stddev_samp("l_discount"), 6).alias("discount_sd"),
                F.round(F.var_samp("l_tax"), 6).alias("tax_var"),
                F.count(F.lit(1)).alias("n"),
            )
            .orderBy("l_returnflag")
        )

    register(
        "lineitem_stats_by_flag",
        lineitem_stats,
        """
        SELECT l_returnflag,
               round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
               round(covar_samp(l_quantity, l_extendedprice), 4)
                 AS qty_price_covar,
               round(stddev_samp(l_discount), 6) AS discount_sd,
               round(var_samp(l_tax), 6) AS tax_var,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- linear-regression aggregates ----------------------------------
    def price_regression(spark, sf):
        li = load_table(spark, "lineitem", sf)
        return (
            li.groupBy("l_returnflag")
            .agg(
                F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6)
                .alias("slope"),
                F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4)
                .alias("intercept"),
                F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6)
                .alias("r2"),
                F.regr_count("l_extendedprice", "l_quantity").alias("n"),
            )
            .orderBy("l_returnflag")
        )

    register(
        "price_regression_by_flag",
        price_regression,
        """
        SELECT l_returnflag,
               round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
               round(regr_intercept(l_extendedprice, l_quantity), 4)
                 AS intercept,
               round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
               CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
        FROM lineitem GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- multi-stage funnel conversion ---------------------------------
    # Progressive min-timestamp joins: stage N's frame is a per-user
    # 1-row aggregate (tiny), joined back onto the filtered next-stage
    # events. No whole-stream window, no per-user collect.
    def funnel(spark, sf):
        ev = load_table(spark, "events", sf)
        views = (ev.filter(F.col("event_type") == "view")
                 .groupBy("user_id").agg(F.min("ts").alias("t_view")))
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .join(views, "user_id")
            .filter(F.col("ts") > F.col("t_view"))
            .groupBy("user_id").agg(F.min("ts").alias("t_click"))
        )
        buys = (
            ev.filter(F.col("event_type") == "purchase")
            .join(clicks, "user_id")
            .filter(F.col("ts") > F.col("t_click"))
            .groupBy("user_id").agg(F.min("ts").alias("t_buy"))
        )
        return (
            views.agg(F.count(F.lit(1)).alias("n_viewed"))
            .join(F.broadcast(clicks.agg(F.count(F.lit(1)).alias("n_clicked"))))
            .join(F.broadcast(buys.agg(F.count(F.lit(1)).alias("n_purchased"))))
        )

    register(
        "event_funnel_conversion",
        funnel,
        """
        WITH views AS (
          SELECT user_id, min(ts) AS t_view FROM events
          WHERE event_type = 'view' GROUP BY 1
        ), clicks AS (
          SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN views v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY 1
        ), buys AS (
          SELECT e.user_id, min(e.ts) AS t_buy
          FROM events e JOIN clicks c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY 1
        )
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM views) AS n_viewed,
               (SELECT CAST(count(*) AS BIGINT) FROM clicks) AS n_clicked,
               (SELECT CAST(count(*) AS BIGINT) FROM buys) AS n_purchased
        """,
    )

    # ---- cohort retention ----------------------------------------------
    def cohort_retention(spark, sf):
        ev = load_table(spark, "events", sf)
        firsts = ev.groupBy("user_id").agg(
            F.date_trunc("month", F.min("ts")).alias("cohort_month"))
        return (
            ev.join(firsts, "user_id")
            .groupBy("cohort_month",
                     F.date_trunc("month", F.col("ts")).alias("active_month"))
            .agg(F.countDistinct("user_id").alias("n_active"))
            .orderBy("cohort_month", "active_month")
        )

    register(
        "monthly_cohort_retention",
        cohort_retention,
        """
        WITH firsts AS (
          SELECT user_id,
                 CAST(date_trunc('month', min(ts)) AS TIMESTAMP)
                   AS cohort_month
          FROM events GROUP BY 1
        )
        SELECT f.cohort_month,
               CAST(date_trunc('month', e.ts) AS TIMESTAMP) AS active_month,
               CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        GROUP BY 1, 2 ORDER BY 1, 2
        """,
    )

    # ---- forward-fill gap-fill over a daily grid -----------------------
    # Grid = per-user sequence(min_day, max_day) exploded (bounded:
    # |users| × |span|); daily closing value left-joined on; the fill is
    # one last-ignore-nulls window per user. Restricted to users < 10 to
    # keep the fixture output compact; the shape is user-count invariant.
    def gapfill(spark, sf):
        ev = load_table(spark, "events", sf).filter(F.col("user_id") < 10)
        # arg-max key is (ts, event_id): a bare max_by(value, ts) breaks
        # same-timestamp ties arbitrarily in each engine, which would
        # flake the oracle on a fixture with duplicate (user, ts) pairs
        daily = (
            ev.groupBy("user_id", F.to_date("ts").alias("day"))
            .agg(F.round(F.max_by("value", F.struct("ts", "event_id")), 6)
                 .alias("close_value"))
        )
        span = ev.groupBy("user_id").agg(
            F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1"))
        grid = span.select(
            "user_id",
            F.explode(F.sequence("d0", "d1",
                                 F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
        w = (Window.partitionBy("user_id").orderBy("day")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return (
            grid.join(daily, ["user_id", "day"], "left")
            .select(
                "user_id", "day",
                F.last("close_value", ignorenulls=True).over(w)
                .alias("filled_value"),
            )
            .orderBy("user_id", "day")
        )

    register(
        "gapfill_daily_forward_fill",
        gapfill,
        """
        WITH ev AS (
          SELECT * FROM events WHERE user_id < 10
        ), daily AS (
          -- arg-max via window (DuckDB's max_by has no composite key):
          -- same (ts, event_id)-last semantics as the Spark struct key
          SELECT user_id, day, round(value, 6) AS close_value
          FROM (
            SELECT user_id, CAST(ts AS DATE) AS day, value,
                   row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM ev
          ) WHERE rn = 1
        ), span AS (
          SELECT user_id, CAST(min(ts) AS DATE) AS d0,
                 CAST(max(ts) AS DATE) AS d1
          FROM ev GROUP BY 1
        ), grid AS (
          SELECT user_id, CAST(unnest(generate_series(d0, d1,
                 INTERVAL 1 DAY)) AS DATE) AS day
          FROM span
        )
        SELECT g.user_id, g.day,
               last_value(d.close_value IGNORE NULLS)
                 OVER (PARTITION BY g.user_id ORDER BY g.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS filled_value
        FROM grid g LEFT JOIN daily d
          ON g.user_id = d.user_id AND g.day = d.day
        ORDER BY g.user_id, g.day
        """,
    )

    # ---- z-score outliers per event type -------------------------------
    def outliers(spark, sf):
        ev = load_table(spark, "events", sf)
        moments = ev.groupBy("event_type").agg(
            F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd"))
        z = (F.col("value") - F.col("mu")) / F.col("sd")
        return (
            ev.join(F.broadcast(moments), "event_type")
            .withColumn("z", F.round(z, 4))
            .filter(F.abs(F.col("z")) > 2.5)
            .select("event_id", "event_type",
                    F.round("value", 6).alias("value"), "z")
            .orderBy("event_id")
        )

    register(
        "value_outliers_zscore",
        outliers,
        """
        WITH moments AS (
          SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
          FROM events GROUP BY 1
        )
        SELECT event_id, e.event_type, round(value, 6) AS value,
               round((value - mu) / sd, 4) AS z
        FROM events e JOIN moments m ON e.event_type = m.event_type
        WHERE abs(round((value - mu) / sd, 4)) > 2.5
        ORDER BY event_id
        """,
    )


    _contribute_extra(register)
    _contribute_recursive(register)
    _contribute_variant(register)
    _contribute_ordinality(register)


def _contribute_extra(register) -> None:
    # ---- fixed-width value histogram -----------------------------------
    # Bucket arithmetic written identically for both engines (no
    # width_bucket dependence): 10 × 50-unit buckets over [0, 500), open
    # top. One partial-agg shuffle of (type, bucket) pairs.
    def value_histogram(spark, sf):
        ev = load_table(spark, "events", sf)
        bucket = F.least(F.lit(9), F.floor(F.col("value") / 50).cast("int"))
        return (
            ev.groupBy("event_type", bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("event_type", "bucket")
        )

    register(
        "value_histogram_fixed_buckets",
        value_histogram,
        """
        SELECT event_type,
               CAST(least(9, CAST(floor(value / 50) AS INT)) AS INT) AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
    )

    # ---- event transition matrix (behavioral 2-grams) ------------------
    # lag over (user, time) gives each event its predecessor type; the
    # count of (prev, next) pairs is the first-order Markov transition
    # table. One window shuffle on user_id, then a small pair aggregate.
    def transitions(spark, sf):
        ev = load_table(spark, "events", sf)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        pairs = ev.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        ).filter(F.col("prev_type").isNotNull())
        return (
            pairs.groupBy("prev_type", "next_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("prev_type", "next_type")
        )

    register(
        "event_transition_matrix",
        transitions,
        """
        SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        FROM (
          SELECT lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type,
                 event_type AS next_type
          FROM events
        ) WHERE prev_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
        """,
    )


# Shared SQL (identical text on both engines — Spark 4.x gained WITH
# RECURSIVE): halving-chain transitive closure. Each key walks
# k → floor(k/2) → … → 0; `steps` is the walk length (⌊log2 k⌋+1).
# Arithmetic is spelled engine-portably: floor(x / 2.0) + CAST, because
# bare int/int division differs (Spark truncates, DuckDB yields double).
_RECURSIVE_CHAIN_SQL = """
WITH RECURSIVE chain(c_custkey, ancestor, depth) AS (
  SELECT c_custkey, c_custkey AS ancestor, 0 AS depth
  FROM customer WHERE c_custkey < 512
  UNION ALL
  SELECT c_custkey, CAST(floor(ancestor / 2.0) AS BIGINT), depth + 1
  FROM chain WHERE ancestor > 0
)
SELECT c_custkey, CAST(max(depth) AS INT) AS steps
FROM chain GROUP BY 1 ORDER BY 1
"""


def _contribute_recursive(register) -> None:
    def recursive_chain(spark, sf):
        register_views(spark, sf)
        return spark.sql(_RECURSIVE_CHAIN_SQL)

    register("recursive_key_chain", recursive_chain, _RECURSIVE_CHAIN_SQL)


def _contribute_variant(register) -> None:
    # Spark 4 VARIANT: props parses ONCE into a variant column (binary
    # semi-structured encoding — at 100 TB far cheaper to re-query than
    # JSON text), then typed try_variant_get paths project fields; the
    # missing-path probe shows the NULL (not error) contract. DuckDB
    # twin runs the same shape over its JSON type.
    def variant_props(spark, sf):
        ev = load_table(spark, "events", sf)
        v = ev.select("event_type", F.parse_json("props").alias("v"))
        k = F.try_variant_get(F.col("v"), "$.k", "long")
        missing = F.try_variant_get(F.col("v"), "$.absent_field", "string")
        # truncated %, not pmod: both engines' % keeps the dividend's
        # sign, so the pair stays portable for negative k too
        return (
            v.groupBy("event_type", (k - (k % F.lit(10))).alias("k_bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count(missing).alias("n_absent_nonnull"))
            .orderBy("event_type", "k_bucket")
        )

    register(
        "variant_props_rollup",
        variant_props,
        """
        SELECT event_type,
               k - (k % 10) AS k_bucket,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(absent) AS BIGINT) AS n_absent_nonnull
        FROM (
          SELECT event_type,
                 CAST(json_extract(CAST(props AS JSON), '$.k') AS BIGINT) AS k,
                 json_extract_string(CAST(props AS JSON), '$.absent_field')
                   AS absent
          FROM events
        ) GROUP BY 1, 2 ORDER BY 1, 2
        """,
    )


def _contribute_ordinality(register) -> None:
    # Array-of-struct assembly + positional explode: lineitems pack into
    # a per-order array ORDERED BY linenumber (sort_array on a struct
    # whose first field is the sort key — deterministic regardless of
    # aggregation order), then posexplode re-derives each element's
    # ordinal. `pos + 1 = l_linenumber` holds by construction, so the
    # query also acts as a self-check of the array ordering; output is
    # ordinals vs stored linenumbers for a key slice. DuckDB twin uses
    # unnest ... WITH ORDINALITY over list(... ORDER BY ...).
    def ordinality(spark, sf):
        li = load_table(spark, "lineitem", sf).filter(
            F.col("l_orderkey") % 1000 == 0)
        packed = (
            li.groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_list(
                F.struct("l_linenumber", "l_partkey"))).alias("lines"))
        )
        return (
            packed.select(
                "l_orderkey",
                F.posexplode("lines").alias("pos", "line"),
            )
            .select(
                "l_orderkey",
                (F.col("pos") + 1).cast("int").alias("ordinal"),
                F.col("line.l_linenumber").cast("int").alias("l_linenumber"),
                F.col("line.l_partkey").alias("l_partkey"),
            )
            .orderBy("l_orderkey", "ordinal")
        )

    register(
        "order_lines_with_ordinality",
        ordinality,
        """
        -- DuckDB 1.0 lacks WITH ORDINALITY; index the ordered list by a
        -- generated subscript instead
        SELECT l_orderkey,
               CAST(i AS INT) AS ordinal,
               CAST(lines[i].l_linenumber AS INT) AS l_linenumber,
               lines[i].l_partkey AS l_partkey
        FROM (
          SELECT l_orderkey,
                 list({'l_linenumber': l_linenumber, 'l_partkey': l_partkey}
                      ORDER BY l_linenumber, l_partkey) AS lines
          FROM lineitem WHERE l_orderkey % 1000 = 0
          GROUP BY 1
        ), unnest(range(1, len(lines) + 1)) AS t(i)
        ORDER BY l_orderkey, ordinal
        """,
    )
