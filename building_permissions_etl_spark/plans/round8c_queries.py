"""Round-8c batch: weekly user churn — the exact anti-join reference
and its theta-sketch A-NOT-B twin (the third theta set operation, after
round 8's intersection; HLL can express neither) — plus the
partial-mergeable heavy-hitter rollup (approx_top_k_accumulate per day,
approx_top_k_combine to weeks) run inside its exactness envelope so the
full value-hash oracle applies to the accumulate/combine/estimate
plumbing, and the registry's THIRD iterative algorithm: two rounds of
power iteration for the dominant eigendirection of the embedding
corpus, Gram-matrix-free and integer-exact end to end.

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

DIM = 64
# milli-unit quantization: components live in (-0.53, 0.46), so
# q ∈ [-530, 460]. Per-iteration bounds with |v| <= 1000:
# |x·v| <= 64·530·1000 ≈ 3.4e7, |u_j| = |Σ_i q_ij (x_i·v)| <=
# N·530·3.4e7 ≈ 1.8e14 at N = 10^4 — five orders inside bigint. At
# 10^9 vectors the same arithmetic needs the rescale moved inside the
# aggregate (sum div N partials) or a 10³ smaller v scale; the plan
# shape (explode → two groupBys per iteration) is unchanged.
_Q_SQL = (f"list_transform(range(1, {DIM + 1}), "
          f"i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) "
          f"AS BIGINT))")


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

    # ---- dominant eigendirection: two rounds of power iteration ----------
    # The registry's third iterative algorithm (after PageRank and the
    # Lloyd loop): v ← Xᵀ(Xv) / ‖·‖∞, Gram-matrix-free — the corpus is
    # never squared, each iteration is one pass computing the N dot
    # products (shuffle on vec_id) and one pass re-projecting them onto
    # the 64 axes (shuffle on the 6-bit component index, trivially
    # map-side combined). INTEGER end to end: milli-quantized
    # components, exact bigint sums, and the ∞-norm rescale is `div` by
    # the max |u_j| — probed this session: Spark `div` and DuckDB `//`
    # BOTH truncate toward zero on every sign combination, so the
    # rescaled vectors are bit-identical across engines (the only
    # divergence risk in the whole loop). Deterministic sign: v₀ = all
    # 1000s, and every subsequent step is a function of it. The
    # exploded quantized corpus is cached once (the PageRank /
    # Lloyd materialize-between-iterations rule); both E-step shuffles
    # read the InMemoryRelation.
    def power_iteration(spark, sf):
        emb = load_table(spark, "embeddings", sf)
        e = (
            emb.select(
                "vec_id",
                F.posexplode(F.transform(
                    F.col("embedding"),
                    lambda x: F.floor(x.cast("double") * 1000)
                    .cast("bigint"))).alias("j", "qx"),
            )
            .cache()
        )
        v = spark.range(DIM).select(
            F.col("id").cast("int").alias("j"),
            F.lit(1000).cast("bigint").alias("v"))

        u = None
        for _ in range(2):
            d = (e.join(F.broadcast(v), "j")
                 .groupBy("vec_id")
                 .agg(F.sum(F.col("qx") * F.col("v")).alias("d")))
            # the shuffle_hash hint is load-bearing twice over: (1) at
            # bench scale BOTH sides sit under the auto-broadcast
            # threshold and the planner may pick the 64×-bigger
            # exploded side as the build — which is what failed with
            # "Not enough memory to build and broadcast" on the
            # default 1 GiB vanilla driver at the tail of a
            # full-registry sf0.1 sweep; (2) at real scale d is one
            # row per VECTOR, so no broadcast is ever correct here —
            # the honest plan co-partitions on vec_id (d already
            # leaves its groupBy partitioned that way) and builds
            # per-partition hash tables, no driver-side build at all.
            # u is 64 rows but referenced TWICE (the ∞-norm scalar and
            # the rescale) — cache it so the matvec above runs once
            # per iteration, not 2^iter times (the LPA/k-core lesson).
            # Residue contract (round-8 advice): eagerly materialize
            # the 64-row frame and unpersist the superseded previous
            # iteration's u, so the call retains two cached frames
            # (exploded e + final u), not one per iteration.
            prev_u = u
            u = (e.join(d.hint("shuffle_hash"), "vec_id")
                 .groupBy("j")
                 .agg(F.sum(F.col("qx") * F.col("d")).alias("u"))
                 .cache())
            u.count()
            if prev_u is not None:
                prev_u.unpersist(blocking=True)
            m = u.agg(F.max(F.abs(F.col("u"))).alias("m"))
            v = (u.crossJoin(F.broadcast(m))
                 .select("j", F.expr("(u * 1000) div m").alias("v")))

        return v.select(F.col("j").cast("bigint").alias("j"), "v") \
                .orderBy("j")

    _e_sql = (f"SELECT vec_id, i - 1 AS j, qv[i] AS qx "
              f"FROM q CROSS JOIN range(1, {DIM + 1}) t(i)")
    # MATERIALIZED on e and every u: DuckDB's default CTE inlining
    # re-evaluates a CTE once per reference, and e is referenced by all
    # four matvec aggregates (u twice each, via the ∞-norm scalar
    # subquery) — the compounding re-runs are the triangle-oracle
    # lesson (round8_queries) applied preemptively.
    _iter_sql = """
        d{n} AS (
          SELECT vec_id, CAST(sum(qx * v) AS BIGINT) AS d
          FROM e JOIN v{p} USING (j) GROUP BY 1
        ),
        u{n} AS MATERIALIZED (
          SELECT j, CAST(sum(qx * d) AS BIGINT) AS u
          FROM e JOIN d{n} USING (vec_id) GROUP BY 1
        ),
        v{n} AS (
          SELECT j, CAST(u * 1000 // (SELECT max(abs(u)) FROM u{n})
                         AS BIGINT) AS v
          FROM u{n}
        )"""
    register(
        "power_iteration_eigendirection",
        power_iteration,
        f"""
        WITH q AS (SELECT vec_id, {_Q_SQL} AS qv FROM embeddings),
        e AS MATERIALIZED ({_e_sql}),
        v0 AS (SELECT CAST(j AS INT) AS j, CAST(1000 AS BIGINT) AS v
               FROM range(0, {DIM}) t(j)),
        {_iter_sql.format(n=1, p=0)},
        {_iter_sql.format(n=2, p=1)}
        SELECT CAST(j AS BIGINT) AS j, v FROM v2 ORDER BY j
        """,
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
