"""Round-8e batch: two more fixed-iteration graph algorithms on the
thresholded nation trade graph — synchronous label-propagation
communities and k-core peeling — plus integer day-of-week seasonality
residuals over the event stream. All value-checked against DuckDB
oracles built from the SAME shared edge SQL the triangle query uses
(`round8_queries.KEPT_EDGES_SQL`), with the iterations unrolled as
MATERIALIZED CTE levels (the round-8 lesson: DuckDB inlines
multiply-referenced CTEs and re-runs the fact aggregation through
every level otherwise).

Determinism per the round-7/8 rules: every per-node argmax carries a
full-order tiebreak (count desc, label asc), iteration counts are
fixed, and the seasonality test is a cross-multiplied integer compare
— |daily·n_days − dow_sum|·10 > 3·dow_sum — so no division ever
happens.

Reference scope: beyond the reference's helpers:* surface; the
algorithms are Raghavan et al. (2007) label propagation, Seidman
(1983) k-cores, and the textbook seasonal-naive residual screen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.catalog import load_table
from building_permissions_etl_spark.operators import graph as G
from building_permissions_etl_spark.plans.round8_queries import (
    KEPT_EDGES_SQL,
    trade_graph_kept_edges,
)

# One synchronous LPA level as SQL, parameterized on the previous
# labels CTE name. Mirrors operators/graph.py::label_propagation:
# most-frequent neighbor label, ties to the smallest label, isolated
# nodes keep theirs.
def _lpa_level_sql(prev: str, out: str) -> str:
    return f"""
    {out} AS MATERIALIZED (
      SELECT l.id,
             coalesce(b.nlbl, l.lbl) AS lbl
      FROM {prev} l
      LEFT JOIN (
        SELECT d, nlbl FROM (
          SELECT e.d, p.lbl AS nlbl,
                 row_number() OVER (
                   PARTITION BY e.d
                   ORDER BY count(*) DESC, p.lbl) AS rn
          FROM directed e JOIN {prev} p ON e.s = p.id
          GROUP BY e.d, p.lbl
        ) WHERE rn = 1
      ) b ON b.d = l.id
    )"""


# One k-core peel level: survivors = nodes with degree >= k in the
# previous surviving edge set; edges restricted to survivor pairs.
def _kcore_level_sql(prev: str, out: str, k: int) -> str:
    return f"""
    {out} AS MATERIALIZED (
      SELECT e.a, e.b FROM {prev} e
      JOIN (SELECT n FROM (SELECT a AS n FROM {prev}
                           UNION ALL SELECT b AS n FROM {prev})
            GROUP BY 1 HAVING count(*) >= {k}) da ON da.n = e.a
      JOIN (SELECT n FROM (SELECT a AS n FROM {prev}
                           UNION ALL SELECT b AS n FROM {prev})
            GROUP BY 1 HAVING count(*) >= {k}) db ON db.n = e.b
    )"""


def contribute(register) -> None:
    # ---- label-propagation communities ----------------------------------
    # Three synchronous LPA iterations over the heavy-edge trade graph;
    # output is every nation's community label (the smallest id that
    # won its neighborhood votes). operators/graph.py::label_propagation
    # caches the doubled edge list once; each iteration is one count
    # shuffle + one window on the same key.
    def lpa(spark, sf):
        nat = load_table(spark, "nation", sf).select("n_nationkey")
        kept = trade_graph_kept_edges(spark, sf)
        out = G.label_propagation(kept, nat, node_col="n_nationkey",
                                  n_iter=3)
        return (out.select(F.col("n_nationkey").alias("nationkey"),
                           "community")
                .orderBy("nationkey"))

    register(
        "lpa_trade_communities",
        lpa,
        f"""
        WITH kept AS MATERIALIZED ({KEPT_EDGES_SQL}),
        directed AS MATERIALIZED (
          SELECT a AS s, b AS d FROM kept
          UNION ALL SELECT b AS s, a AS d FROM kept
        ),
        l0 AS (SELECT n_nationkey AS id,
                      CAST(n_nationkey AS BIGINT) AS lbl FROM nation),
        {_lpa_level_sql('l0', 'l1')},
        {_lpa_level_sql('l1', 'l2')},
        {_lpa_level_sql('l2', 'l3')}
        SELECT CAST(id AS BIGINT) AS nationkey,
               CAST(lbl AS BIGINT) AS community
        FROM l3 ORDER BY nationkey
        """,
    )

    # ---- k-core peeling ---------------------------------------------------
    # Three rounds of 2-core peeling on the same graph: leaf nations
    # (single heavy partner) fall off, cascades included. Output is
    # every nation with its survival flag and residual degree.
    def kcore(spark, sf):
        nat = load_table(spark, "nation", sf).select("n_nationkey")
        kept = trade_graph_kept_edges(spark, sf)
        out = G.k_core_peel(kept, nat, k=2, node_col="n_nationkey",
                            n_rounds=3)
        return (out.select(F.col("n_nationkey").alias("nationkey"),
                           "in_core", "degree")
                .orderBy("nationkey"))

    register(
        "kcore_trade_graph",
        kcore,
        f"""
        WITH e0 AS MATERIALIZED ({KEPT_EDGES_SQL}),
        {_kcore_level_sql('e0', 'e1', 2)},
        {_kcore_level_sql('e1', 'e2', 2)},
        {_kcore_level_sql('e2', 'e3', 2)},
        deg AS (
          SELECT n, CAST(count(*) AS BIGINT) AS d
          FROM (SELECT a AS n FROM e3 UNION ALL SELECT b AS n FROM e3)
          GROUP BY 1
        )
        SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
               (deg.n IS NOT NULL) AS in_core,
               CAST(coalesce(deg.d, 0) AS BIGINT) AS degree
        FROM nation LEFT JOIN deg ON deg.n = n_nationkey
        ORDER BY nationkey
        """,
    )

    # ---- day-of-week seasonality residual outliers ------------------------
    # Seasonal-naive anomaly screen: a (type, day) is anomalous when
    # its daily total deviates from its day-of-week mean by more than
    # 30%. dow is day_num % 7 (pure integer — engine date functions
    # disagree on week-start conventions), and the 30% test is the
    # cross-multiplied |daily·n − sum|·10 > 3·sum, so everything stays
    # BIGINT. Two aggregations: fact → daily (shuffle on (type, day)),
    # daily → dow stats (tiny), joined back broadcast-size.
    def dow_outliers(spark, sf):
        ev = load_table(spark, "events", sf)
        daily = (
            ev.select(
                "event_type",
                F.expr("datediff(CAST(ts AS DATE), DATE '2024-01-01')")
                .cast("bigint").alias("day"),
                F.expr("CAST(floor(value * 100) AS BIGINT)").alias("x"))
            .groupBy("event_type", "day")
            .agg(F.sum("x").alias("daily_cents"))
            .withColumn("dow", F.pmod(F.col("day"), F.lit(7)))
        )
        dow_stats = (
            daily.groupBy("event_type", "dow")
            .agg(F.sum("daily_cents").alias("dow_sum"),
                 F.count(F.lit(1)).cast("bigint").alias("n_days"))
        )
        return (
            daily.join(dow_stats, ["event_type", "dow"])
            .filter(
                F.abs(F.col("daily_cents") * F.col("n_days")
                      - F.col("dow_sum")) * 10 > 3 * F.col("dow_sum"))
            .select("event_type", "day", "dow", "daily_cents",
                    "dow_sum", "n_days")
            .orderBy("event_type", "day")
        )

    register(
        "dow_seasonality_outliers",
        dow_outliers,
        """
        WITH daily AS (
          SELECT event_type,
                 CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                   AS BIGINT) AS day,
                 CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
                   AS daily_cents
          FROM events GROUP BY 1, 2
        ),
        -- ((day%7)+7)%7 = Spark's pmod: DuckDB's % keeps the sign for
        -- negative days, so the contract holds for events before the
        -- 2024-01-01 epoch too (round-8 advice: parity was previously
        -- fixture-dependent, not explicit)
        d2 AS (SELECT *, ((day % 7) + 7) % 7 AS dow FROM daily),
        stats AS (
          SELECT event_type, dow,
                 CAST(sum(daily_cents) AS BIGINT) AS dow_sum,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM d2 GROUP BY 1, 2
        )
        SELECT d2.event_type, d2.day, d2.dow, d2.daily_cents,
               stats.dow_sum, stats.n_days
        FROM d2 JOIN stats ON d2.event_type = stats.event_type
                          AND d2.dow = stats.dow
        WHERE abs(d2.daily_cents * stats.n_days - stats.dow_sum) * 10
                > 3 * stats.dow_sum
        ORDER BY 1, 2
        """,
    )
