"""Round-8 batch: graph triangle counting with degree-ordered
orientation, deterministic weighted (priority) sampling, a Pareto
frontier (skyline) via pre-aggregated prefix-min, weekly-anchor linear
interpolation in exact integer arithmetic, week-over-week retention
with its theta-sketch intersection twin, a mergeable KLL quantile
rollup (daily partials → weekly estimates), and an approx_top_k
demonstration run inside its exactness envelope.

Cross-engine determinism rules used throughout (the round-7 lesson,
generalized): quantize with floor (never round — Spark HALF_UP vs
DuckDB round diverge on half-way doubles), keep integer division
operands positive or rely on the verified div/`//` truncate-toward-zero
agreement, and restrict float work to IEEE-correctly-rounded ops
(+ - * /, integer→double casts) which both engines compute
bit-identically — no transcendentals in any value-checked expression.

Reference scope: these extend the analytics surface the same way the
round-6 batch did (helpers:* has no graph/sampling/sketch analytics;
the patterns are Tsourakakis/Suri-Vassilvitskii MapReduce triangle
counting, Duffield-Lund-Thorup priority sampling, Börzsönyi skyline,
Apache DataSketches theta/KLL — all published public knowledge).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.functions.portable import (
    PORTABLE_HASH_SQL,
    portable_hash64,
)
from building_permissions_etl_spark.operators import graph as G

# Undirected nation-level trade graph, thresholded to heavy edges.
# The threshold compare is INTEGER-exact on both engines:
# keep iff w >= 1.2 * mean(w)  ⇔  5 * w * n_edges >= 6 * total_w.
# ONE aggregation level: counting joined rows per unordered
# (least, greatest) pair equals summing the directed pair counts, so
# the directed pre-aggregate would only add a shuffle (Spark) / a
# pipeline stage (DuckDB).
_UND_EDGES_SQL = """
  SELECT least(s.s_nationkey, c.c_nationkey) AS a,
         greatest(s.s_nationkey, c.c_nationkey) AS b,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  WHERE s.s_nationkey <> c.c_nationkey
  GROUP BY 1, 2
"""

_MILLI = "CAST(floor(value * 1000) AS BIGINT)"


def trade_graph_kept_edges(spark, sf):
    """Spark twin of ``_UND_EDGES_SQL`` + the heavy-edge threshold:
    the undirected nation trade graph restricted to edges with
    w >= 1.2 * mean(w) (integer-exact compare). One fact shuffle for
    the pair aggregate, then a single-partition window over the ≤ n²
    nation-pair rows. Shared by the triangle / label-propagation /
    k-core queries so the derivation exists once."""
    li = load_table(spark, "lineitem", sf).select("l_orderkey", "l_suppkey")
    od = load_table(spark, "orders", sf).select("o_orderkey", "o_custkey")
    cust = load_table(spark, "customer", sf).select(
        "c_custkey", "c_nationkey")
    sup = load_table(spark, "supplier", sf).select(
        "s_suppkey", "s_nationkey")
    und = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cust), od.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .filter(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.least("s_nationkey", "c_nationkey").alias("a"),
            F.greatest("s_nationkey", "c_nationkey").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    whole = Window.partitionBy()
    return (
        und.withColumn("tw", F.sum("w").over(whole))
        .withColumn("ne", F.count(F.lit(1)).over(whole))
        .filter(F.lit(5) * F.col("w") * F.col("ne")
                >= F.lit(6) * F.col("tw"))
        .select("a", "b")
    )


# Shared SQL twin of trade_graph_kept_edges (DuckDB oracles compose it
# under WITH ... AS MATERIALIZED).
KEPT_EDGES_SQL = f"""
  WITH und_k AS ({_UND_EDGES_SQL}),
  tot_k AS (SELECT sum(w) AS tw, count(*) AS ne FROM und_k)
  SELECT a, b FROM und_k, tot_k WHERE 5 * w * ne >= 6 * tw
"""


def contribute(register) -> None:
    # ---- triangle counting, degree-ordered orientation -----------------
    # Edge derivation (one fact shuffle, broadcast dims), thresholded to
    # heavy edges with a single-partition window over the NATION-GROUPED
    # relation (<= n^2 rows at any fact scale — the equi_depth_histogram
    # SinglePartition precedent), then
    # operators.graph.triangle_counts_per_node, which caches the edge
    # list so the fact lineage materializes exactly once (the round-6
    # PageRank lesson, applied at authoring time) and attributes
    # triangle corners via one explode instead of a 3x union of the
    # wedge join.
    def triangles(spark, sf):
        nat = load_table(spark, "nation", sf).select("n_nationkey")
        kept = trade_graph_kept_edges(spark, sf)
        counts = G.triangle_counts_per_node(
            kept, nat, node_col="n_nationkey")
        return (
            counts.select(F.col("n_nationkey").alias("nationkey"),
                          "n_triangles")
            .orderBy("nationkey")
        )

    register(
        "triangle_count_trade_graph",
        triangles,
        f"""
        WITH und AS MATERIALIZED ({_UND_EDGES_SQL}),
        tot AS (SELECT sum(w) AS tw, count(*) AS ne FROM und),
        kept AS MATERIALIZED (
          SELECT a, b FROM und, tot WHERE 5 * w * ne >= 6 * tw
        ),
        deg AS MATERIALIZED (
          SELECT node, count(*) AS d FROM (
            SELECT a AS node FROM kept
            UNION ALL SELECT b AS node FROM kept
          ) GROUP BY 1
        ),
        -- MATERIALIZED is load-bearing on every multiply-referenced
        -- CTE here: DuckDB's default inlining re-evaluates kept/deg/o
        -- once per reference, compounding through the 3-way wedge join
        -- to ~33 re-runs of the fact aggregation (measured: >5 min and
        -- a temp-disk blowout at sf0.1 vs 0.8 s materialized).
        o AS MATERIALIZED (
          SELECT CASE WHEN (da.d, k.a) < (db.d, k.b)
                      THEN k.a ELSE k.b END AS u,
                 CASE WHEN (da.d, k.a) < (db.d, k.b)
                      THEN k.b ELSE k.a END AS v
          FROM kept k
          JOIN deg da ON da.node = k.a
          JOIN deg db ON db.node = k.b
        ),
        tri AS (
          SELECT e1.u AS x, e1.v AS y, e2.v AS z
          FROM o e1
          JOIN o e2 ON e2.u = e1.v
          JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v
        ),
        corners AS (
          SELECT x AS node FROM tri
          UNION ALL SELECT y AS node FROM tri
          UNION ALL SELECT z AS node FROM tri
        )
        SELECT n.n_nationkey AS nationkey,
               CAST(count(c.node) AS BIGINT) AS n_triangles
        FROM nation n LEFT JOIN corners c ON c.node = n.n_nationkey
        GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- deterministic weighted sampling (priority sampling) -----------
    # Duffield-Lund-Thorup priority sampling: each item gets priority
    # w / u with u uniform in (0, 1]; the k highest priorities per
    # stratum are a weighted sample without replacement. Deterministic
    # and ENGINE-EXACT: u = (portable_hash64 + 1) / 2^60, so priority
    # = double(w) * 2^60 / double(h + 1) — an integer→double cast, one
    # multiply, one divide, each correctly rounded per IEEE-754 and
    # therefore bit-identical in Spark and DuckDB (no ln/pow, which
    # differ in last-ulp between libm builds — that rules out the
    # textbook exp-race formulation for value-hash parity). Scale: one
    # map-side hash per row + a top-k window per lang; at 10^4+ strata
    # the same shape holds (window on the stratum key), with partial
    # top-k pre-pruning available via groupBy(lang).agg(max_by) trees.
    def priority_sample(spark, sf):
        docs = load_table(spark, "documents", sf)
        h = portable_hash64(
            F.concat(F.lit("ps:"), F.col("doc_id").cast("string")))
        pr = docs.select(
            "lang", "doc_id", "n_chars",
            (F.col("n_chars").cast("double") * F.lit(float(1 << 60))
             / (h + F.lit(1)).cast("double")).alias("priority"),
        )
        w = Window.partitionBy("lang").orderBy(F.desc("priority"), "doc_id")
        return (
            pr.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 5)
            .select("lang", "doc_id", "n_chars")
            .orderBy("lang", "doc_id")
        )

    _h = PORTABLE_HASH_SQL.format(x="concat('ps:', CAST(doc_id AS VARCHAR))")
    register(
        "priority_sample_by_lang",
        priority_sample,
        f"""
        WITH pr AS (
          SELECT lang, doc_id, n_chars,
                 CAST(n_chars AS DOUBLE) * 1152921504606846976.0
                   / CAST(({_h}) + 1 AS DOUBLE) AS priority
          FROM documents
        ),
        rk AS (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY priority DESC, doc_id) AS rn
          FROM pr
        )
        SELECT lang, doc_id, n_chars FROM rk WHERE rn <= 5
        ORDER BY lang, doc_id
        """,
    )

    # ---- Pareto frontier (skyline) over parts --------------------------
    # A part is on the (min price, min size) frontier iff nothing is
    # <= on both axes with one strict. Scale shape: pre-aggregate to
    # ONE row per distinct price (min size) — the only data that can
    # matter — THEN a prefix-min ordered window over that reduced
    # relation, then a broadcast join back. The global window sees
    # |distinct prices| rows, not |parts|; for domains too large even
    # for that, the range-partitioned two-pass prefix-min used by
    # corpus.pack_sequences_global applies unchanged. The oracle is an
    # independent formulation (NOT EXISTS dominance), so agreement
    # checks the algorithm, not the transcription.
    def pareto(spark, sf):
        parts = load_table(spark, "part", sf).select(
            "p_partkey", "p_retailprice", "p_size")
        per_price = parts.groupBy("p_retailprice").agg(
            F.min("p_size").alias("min_size"))
        w = (Window.orderBy("p_retailprice")
             .rowsBetween(Window.unboundedPreceding, -1))
        frontier_prices = (
            per_price.withColumn("prev_min", F.min("min_size").over(w))
            .filter(F.col("prev_min").isNull()
                    | (F.col("min_size") < F.col("prev_min")))
            .select("p_retailprice", "min_size")
        )
        return (
            parts.join(F.broadcast(frontier_prices), "p_retailprice")
            .filter(F.col("p_size") == F.col("min_size"))
            .select("p_partkey", "p_retailprice", "p_size")
            .orderBy("p_retailprice", "p_size", "p_partkey")
        )

    register(
        "pareto_frontier_parts",
        pareto,
        """
        SELECT p_partkey, p_retailprice, p_size FROM part p
        WHERE NOT EXISTS (
          SELECT 1 FROM part q
          WHERE q.p_retailprice <= p.p_retailprice
            AND q.p_size <= p.p_size
            AND (q.p_retailprice < p.p_retailprice
                 OR q.p_size < p.p_size)
        )
        ORDER BY p_retailprice, p_size, p_partkey
        """,
    )

    # ---- weekly-anchor linear interpolation (integer-exact) ------------
    # Temporal disaggregation: weekly revenue totals anchored at week
    # start, evaluated on the daily spine by linear interpolation
    # between surrounding anchors. Every value is exact bigint
    # (floor-quantized milli-units); the lerp is
    # prev + (next - prev) * (day - d0) div (d1 - d0), integer ops
    # only — `div` and DuckDB `//` agree on every sign (both truncate
    # toward zero, probed). One groupBy + one window pass per type;
    # spine explode is bounded by the date range, not the fact.
    def interp(spark, sf):
        ev = load_table(spark, "events", sf)
        anc = ev.groupBy(
            "event_type",
            F.date_trunc("week", "ts").cast("date").alias("wk"),
        ).agg(F.sum(F.expr(_MILLI)).alias("units"))
        spine = (
            anc.groupBy("event_type")
            .agg(F.min("wk").alias("mn"), F.max("wk").alias("mx"))
            .select("event_type",
                    F.explode(F.sequence("mn", "mx")).alias("dy"))
        )
        j = spine.join(
            anc,
            (spine.event_type == anc.event_type) & (anc.wk == spine.dy),
            "left",
        ).select(spine.event_type, "dy", "units")
        back = (Window.partitionBy("event_type").orderBy("dy")
                .rowsBetween(Window.unboundedPreceding, 0))
        fwd = (Window.partitionBy("event_type").orderBy("dy")
               .rowsBetween(0, Window.unboundedFollowing))
        anchor_day = F.when(F.col("units").isNotNull(), F.col("dy"))
        filled = j.select(
            "event_type", "dy", "units",
            F.last("units", ignorenulls=True).over(back).alias("pv"),
            F.last(anchor_day, ignorenulls=True).over(back).alias("pd"),
            F.first("units", ignorenulls=True).over(fwd).alias("nv"),
            F.first(anchor_day, ignorenulls=True).over(fwd).alias("nd"),
        )
        lerp = (F.col("pv")
                + F.expr("(nv - pv) * CAST(datediff(dy, pd) AS BIGINT)"
                         " div CAST(datediff(nd, pd) AS BIGINT)"))
        return (
            filled.select(
                "event_type",
                F.col("dy").cast("string").alias("dy"),
                F.when(F.col("units").isNotNull(), F.col("units"))
                .otherwise(lerp).alias("interp_units"),
                F.when(F.col("units").isNull(), F.lit(1))
                .otherwise(F.lit(0)).cast("bigint").alias("is_interp"),
            )
            .orderBy("event_type", "dy")
        )

    register(
        "weekly_anchor_interpolation",
        interp,
        f"""
        WITH anc AS (
          SELECT event_type,
                 CAST(date_trunc('week', ts) AS DATE) AS wk,
                 sum({_MILLI}) AS units
          FROM events GROUP BY 1, 2
        ),
        spine AS (
          SELECT event_type,
                 CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY))
                      AS DATE) AS dy
          FROM (SELECT event_type, min(wk) AS mn, max(wk) AS mx
                FROM anc GROUP BY 1)
        ),
        filled AS (
          SELECT s.event_type, s.dy, a.units,
                 last_value(a.units IGNORE NULLS) OVER w_back AS pv,
                 last_value(CASE WHEN a.units IS NOT NULL THEN s.dy END
                            IGNORE NULLS) OVER w_back AS pd,
                 first_value(a.units IGNORE NULLS) OVER w_fwd AS nv,
                 first_value(CASE WHEN a.units IS NOT NULL THEN s.dy END
                             IGNORE NULLS) OVER w_fwd AS nd
          FROM spine s LEFT JOIN anc a
            ON a.event_type = s.event_type AND a.wk = s.dy
          WINDOW
            w_back AS (PARTITION BY s.event_type ORDER BY s.dy
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
            w_fwd AS (PARTITION BY s.event_type ORDER BY s.dy
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, CAST(dy AS VARCHAR) AS dy,
               -- CAST: sum() over BIGINT is HUGEINT in DuckDB; uncast it
               -- leaks int128 into the checked column and the driver's
               -- typed hash diverges from Spark's bigint even though
               -- every value is identical (round-8 driver red).
               CAST(CASE WHEN units IS NOT NULL THEN units
                         ELSE pv + (nv - pv) * (dy - pd) // (nd - pd)
                    END AS BIGINT) AS interp_units,
               CAST(CASE WHEN units IS NULL THEN 1 ELSE 0 END
                    AS BIGINT) AS is_interp
        FROM filled ORDER BY event_type, dy
        """,
    )

    # ---- week-over-week retained users: exact --------------------------
    # The exact reference for the theta twin below: distinct users
    # active in week W AND week W+1. At 100 TB this is the shape whose
    # cost is a full (week, user) distinct shuffle — which is exactly
    # what the sketch twin removes.
    def retention_exact(spark, sf):
        ev = load_table(spark, "events", sf)
        wu = ev.select(
            F.date_trunc("week", "ts").cast("date").alias("wk"),
            "user_id").distinct()
        nxt = wu.select(F.col("wk").alias("wk_next"),
                        F.col("user_id").alias("uid"))
        return (
            wu.join(nxt, (nxt.wk_next == F.date_add(wu.wk, 7))
                    & (nxt.uid == wu.user_id))
            .groupBy(F.col("wk").cast("string").alias("week_start"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_retained"))
            .orderBy("week_start")
        )

    register(
        "weekly_user_overlap_exact",
        retention_exact,
        """
        WITH wu AS (
          SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE) AS wk,
                          user_id
          FROM events
        )
        SELECT CAST(a.wk AS VARCHAR) AS week_start,
               CAST(count(*) AS BIGINT) AS n_retained
        FROM wu a JOIN wu b
          ON b.user_id = a.user_id AND b.wk = a.wk + 7
        GROUP BY 1 ORDER BY 1
        """,
    )

    # ---- week-over-week retained users: theta-sketch twin --------------
    # Theta sketches are the mergeable structure that supports set
    # INTERSECTION (HLL only unions): one sketch per week — partials
    # combine map-side, ~4 KB each at any cardinality — then adjacent
    # weeks intersect driver-free with the scalar theta_intersection.
    # Registered rows-only (estimates are engine-specific);
    # weekly_user_overlap_exact above is the oracle-backed reference
    # the estimate tracks (exact below the sketch's 4096-entry
    # threshold, within ~2-3% above it).
    def retention_theta(spark, sf):
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
                       "theta_intersection(sk, sk_next))")
                .cast("bigint").alias("est_retained"),
            )
            .orderBy("week_start")
        )

    register("weekly_user_overlap_theta", retention_theta, None)

    # ---- mergeable KLL quantile rollup: daily partials → weekly --------
    # The quantile analogue of the HLL rollup: per-(type, day) KLL
    # sketches of floor-quantized values, re-aggregated to weeks by
    # sketch MERGE (reduce over kll_sketch_merge_bigint) without
    # re-touching the fact — bounded-memory percentiles with partial
    # merge, vs exact `percentile` which buffers every value on one
    # reducer per group. Rows-only by design (KLL estimates are
    # engine-specific); the exact twin family (doc_length_quantiles,
    # mad_outliers_by_type) provides the oracle-backed references.
    def kll_rollup(spark, sf):
        ev = load_table(spark, "events", sf)
        daily = ev.groupBy(
            "event_type",
            F.date_trunc("day", "ts").cast("date").alias("dy"),
        ).agg(F.expr(f"kll_sketch_agg_bigint({_MILLI}, 256)").alias("sk"))
        weekly = daily.groupBy(
            "event_type",
            F.date_trunc("week", "dy").cast("date").alias("wk"),
        ).agg(F.collect_list("sk").alias("sks"))
        merged = F.expr(
            "reduce(slice(sks, 2, size(sks) - 1), sks[0], "
            "(acc, x) -> kll_sketch_merge_bigint(acc, x))")
        return (
            weekly.select(
                "event_type",
                F.col("wk").cast("string").alias("week_start"),
                merged.alias("m"),
            )
            .select(
                "event_type", "week_start",
                F.expr("kll_sketch_get_n_bigint(m)").alias("n"),
                F.expr("kll_sketch_get_quantile_bigint(m, 0.5)")
                .alias("p50_units"),
                F.expr("kll_sketch_get_quantile_bigint(m, 0.9)")
                .alias("p90_units"),
            )
            .orderBy("event_type", "week_start")
        )

    register("kll_weekly_value_quantiles", kll_rollup, None)

    # ---- approx_top_k inside its exactness envelope --------------------
    # DataSketches frequent-items via approx_top_k, run with
    # maxItemsTracked (8192) far above the item cardinality (5 event
    # types): no evictions can occur, so the "approx" result is
    # provably exact and the full value-hash oracle applies — the
    # driver verifies the sketch PLUMBING (accumulate/explode/sort),
    # and the same call scales to genuinely-approximate heavy-hitter
    # duty by lowering the budget. Explicit (count, item) output sort:
    # the sketch's own tie order is not a contract.
    def topk_events(spark, sf):
        ev = load_table(spark, "events", sf)
        return (
            ev.agg(F.expr("approx_top_k(event_type, 100, 8192)").alias("tk"))
            .select(F.explode("tk").alias("e"))
            .select(F.col("e.item").alias("item"),
                    F.col("e.count").cast("bigint").alias("cnt"))
            .orderBy(F.desc("cnt"), "item")
        )

    register(
        "approx_topk_event_types",
        topk_events,
        """
        SELECT event_type AS item, CAST(count(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1 ORDER BY cnt DESC, item
        """,
    )
