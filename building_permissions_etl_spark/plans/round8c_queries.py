"""Round-8c batch: weekly user churn — the exact anti-join reference
and its theta-sketch A-NOT-B twin (the third theta set operation, after
round 8's intersection; HLL can express neither) — plus the
partial-mergeable heavy-hitter rollup (approx_top_k_accumulate per day,
approx_top_k_combine to weeks) run inside its exactness envelope so the
full value-hash oracle applies to the accumulate/combine/estimate
plumbing.

Together with round 7/8 these complete the mergeable-sketch story a
100 TB warehouse ships: HLL partials for distinct-union rollups, theta
partials for intersection (retention) and difference (churn), KLL
partials for quantile rollups, frequent-items partials for top-k — each
registered beside the exact oracle-backed query whose shuffle it
deletes at scale.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table


def contribute(register) -> None:
    # ---- weekly churned users: exact ------------------------------------
    # Users active in week W but NOT in week W+1 — the anti-join shape
    # whose cost at 100 TB is the full (week, user) distinct shuffle,
    # same as retention's; the theta twin below replaces it with ~4 KB
    # mergeable partials per week. LEFT ANTI against the next week,
    # counted per week; weeks with no successor week are excluded (the
    # final week has no churn measurement), mirroring the retention
    # query's join semantics.
    def churn_exact(spark, sf):
        ev = load_table(spark, "events", sf)
        wu = ev.select(
            F.date_trunc("week", "ts").cast("date").alias("wk"),
            "user_id").distinct()
        weeks = wu.select("wk").distinct()
        nxt_weeks = weeks.select(F.col("wk").alias("wk_next"))
        has_next = weeks.join(
            nxt_weeks, nxt_weeks.wk_next == F.date_add(F.col("wk"), 7),
            "semi")
        nxt = wu.select(F.col("wk").alias("wk_n"),
                        F.col("user_id").alias("uid"))
        stayed_away = wu.join(
            nxt, (nxt.wk_n == F.date_add(wu.wk, 7))
            & (nxt.uid == wu.user_id), "anti")
        churned = stayed_away.groupBy("wk").agg(
            F.count(F.lit(1)).cast("bigint").alias("n"))
        # zero-fill over the week dimension: a week where EVERY user
        # returned must still report n_churned = 0 (the dim-completion
        # rule every absent⇒0 aggregate in this repo follows)
        return (
            has_next.join(churned, "wk", "left")
            .select(F.col("wk").cast("string").alias("week_start"),
                    F.coalesce(F.col("n"), F.lit(0)).cast("bigint")
                    .alias("n_churned"))
            .orderBy("week_start")
        )

    register(
        "weekly_churned_users_exact",
        churn_exact,
        """
        WITH wu AS (
          SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS wk,
                          user_id
          FROM events
        ),
        weeks AS (SELECT DISTINCT wk FROM wu),
        has_next AS (
          SELECT w.wk FROM weeks w
          WHERE EXISTS (SELECT 1 FROM weeks n WHERE n.wk = w.wk + 7)
        ),
        ch AS (
          SELECT a.wk, CAST(count(*) AS BIGINT) AS n
          FROM wu a
          WHERE NOT EXISTS (
            SELECT 1 FROM wu b
            WHERE b.user_id = a.user_id AND b.wk = a.wk + 7
          )
          GROUP BY 1
        )
        SELECT CAST(h.wk AS VARCHAR) AS week_start,
               CAST(coalesce(ch.n, 0) AS BIGINT) AS n_churned
        FROM has_next h LEFT JOIN ch ON ch.wk = h.wk
        ORDER BY 1
        """,
    )

    # ---- weekly churn: theta A-NOT-B twin --------------------------------
    # theta_difference(week_W, week_W+1) estimates |W \ W+1| from the
    # same per-week sketches retention reuses — one sketch build serves
    # union, intersection AND difference questions, which is the whole
    # point of shipping theta partials instead of HLL when set algebra
    # beyond union is on the menu. Rows-only (estimates are
    # engine-specific); weekly_churned_users_exact above is the
    # oracle-backed reference (exact below the 4096-entry threshold).
    def churn_theta(spark, sf):
        ev = load_table(spark, "events", sf)
        wk = ev.groupBy(
            F.date_trunc("week", "ts").cast("date").alias("wk")).agg(
            F.expr("theta_sketch_agg(user_id)").alias("sk"))
        nxt = wk.select(F.col("wk").alias("wk_next"),
                        F.col("sk").alias("sk_next"))
        return (
            wk.join(nxt, nxt.wk_next == F.date_add(wk.wk, 7))
            .select(
                F.col("wk").cast("string").alias("week_start"),
                F.expr("theta_sketch_estimate("
                       "theta_difference(sk, sk_next))")
                .cast("bigint").alias("est_churned"),
            )
            .orderBy("week_start")
        )

    register("weekly_churn_theta", churn_theta, None)

    # ---- mergeable heavy-hitter rollup: daily partials → weekly ----------
    # The frequent-items analogue of the HLL/KLL rollups: per-day
    # approx_top_k_accumulate states, approx_top_k_combine to weeks,
    # estimate once — re-aggregation without re-touching the fact. Run
    # with maxItemsTracked (8192) far above the item cardinality (5
    # event types), no evictions can occur, so the combined estimate is
    # provably EXACT and the full value-hash oracle verifies the
    # accumulate/combine/estimate plumbing end to end (the same
    # exactness-envelope trick as approx_topk_event_types); lowering
    # the budget converts it to genuinely-approximate heavy-hitter duty
    # with the identical plan. Explicit (count, item) output sort — the
    # sketch's internal order is not a contract.
    def topk_rollup(spark, sf):
        ev = load_table(spark, "events", sf)
        daily = ev.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("dy")).agg(
            F.expr("approx_top_k_accumulate(event_type, 8192)")
            .alias("st"))
        weekly = daily.groupBy(
            F.date_trunc("week", "dy").cast("date").alias("wk")).agg(
            F.expr("approx_top_k_combine(st, 8192)").alias("st"))
        return (
            weekly.select(
                F.col("wk").cast("string").alias("week_start"),
                F.explode(F.expr("approx_top_k_estimate(st, 100)"))
                .alias("e"))
            .select("week_start",
                    F.col("e.item").alias("item"),
                    F.col("e.count").cast("bigint").alias("cnt"))
            .orderBy("week_start", F.desc("cnt"), "item")
        )

    register(
        "approx_topk_weekly_rollup",
        topk_rollup,
        """
        SELECT CAST(CAST(date_trunc('week', ts) AS DATE) AS VARCHAR)
                 AS week_start,
               event_type AS item,
               CAST(count(*) AS BIGINT) AS cnt
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, cnt DESC, item
        """,
    )
