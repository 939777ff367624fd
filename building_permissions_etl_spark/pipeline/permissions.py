"""The permissions ETL, end to end (SURVEY.md §3.2-§3.3) — the Spark
re-architecture of the reference DAG's ingest + aggregate tasks
(dags/aggregates_python.py:49-85), parameterized by logical date (never
wall-clock, helpers:101-102).

Ingest (one lazy, shuffle-free plan until the write — the fuzzy join is
broadcast):
    read CSV (S2) → parse event time w/ coerce-to-null (C5) → mode-
    dependent range filter (F1/F2) → terc correction (§2.10) → audit
    (A7) → drop Unknown* (F4) → drop null event time (F3) → partitioned
    clustered write (S4).

Aggregate (the flagship, §3.3): 3-month scan with pushed-down predicate
(S7) → county prefix (C1) → per-window pivot counts (A1) + per-type
marginals (A2) → deromanized/sanitized names (C4/C21) → full-outer merge
(J1) → injection date/reorder/rename (C19/F9/F10) → dim anti-join (J2) →
dim completion (J3+U1) → sort (O1) → schema-evolving append (S13).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from building_permissions_etl_spark.functions.roman import INT_OF_ROMAN
from building_permissions_etl_spark.functions.text import sanitize_column_names
from building_permissions_etl_spark.operators.aggregates import pivot_counts
from building_permissions_etl_spark.operators.joins import (
    complete_via_left_join,
    outer_merge_zero_fill,
)
from building_permissions_etl_spark.operators.terc import (
    correct_terc,
    correction_audit_metrics,
    drop_invalid_terc,
)
from building_permissions_etl_spark.schemas import (
    EVENT_TIME_COL,
    EXPECTED_RODZAJ_TYPES,
)
from building_permissions_etl_spark.sources.csv_source import (
    parse_event_time,
    read_permissions_csv,
)
from building_permissions_etl_spark.sources.sinks import (
    append_with_schema_evolution,
    table_exists_nonempty,
    write_fact_partitioned,
)


def first_day_of_previous_month(d: dt.datetime) -> dt.datetime:
    """C8 (helpers:115-127)."""
    first_this = d.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    return (first_this - dt.timedelta(days=1)).replace(day=1)


def ingest_permissions(
    spark: SparkSession,
    csv_path: str,
    fact_path: str,
    powiaty: DataFrame,
    execution_date: dt.datetime,
) -> dict:
    """Tasks 2+3 of the DAG: validate/parse, mode-select, correct, load.

    Mode (helpers:89-111): 'update' (sink non-empty) loads only rows in
    (first_day_of_prev_month, execution_date) — both bounds STRICT
    (helpers:186-191); 'full' loads everything < execution_date.
    Returns audit metrics (driver-side dict, logged by the scheduler).
    """
    mode = "update" if table_exists_nonempty(spark, fact_path) else "full"
    df = parse_event_time(read_permissions_csv(spark, csv_path))

    t = F.col(EVENT_TIME_COL)
    if mode == "update":
        lo = first_day_of_previous_month(execution_date)
        df = df.filter((t > F.lit(lo)) & (t < F.lit(execution_date)))
    else:
        df = df.filter(t < F.lit(execution_date))

    # the audit action and the write both consume the corrected frame,
    # and correct_terc internally scans the CSV again for its distinct-
    # city broadcast lookup — uncached, one ingest run would execute ~4
    # full CSV scans. One cached generation serves both actions.
    corrected = correct_terc(df, powiaty).cache()
    try:
        audit = correction_audit_metrics(corrected).first().asDict()
        clean = drop_invalid_terc(corrected).na.drop(subset=[EVENT_TIME_COL])

        write_fact_partitioned(
            clean, fact_path, EVENT_TIME_COL, "terc",
            overwrite_partitions=(mode == "update"),
        )
    finally:
        corrected.unpersist()
    return {"mode": mode, **audit}


# --- aggregate task -----------------------------------------------------

def _short_rodzaj(r: str) -> str:
    """Reference shortens pivot prefixes to the rodzaj's first word
    (helpers:485-515)."""
    return r.split(" ")[0].split("/")[0]


def _deromanize(kat: str) -> str:
    """C4 (helpers:517-533): roman category → kat_{n}."""
    return f"kat_{INT_OF_ROMAN[kat]}" if kat in INT_OF_ROMAN else kat


def aggregate_window(df: DataFrame, suffix: str) -> DataFrame:
    """A1+A2 for one lookback window (helpers:429-481): pivot counts per
    county × (rodzaj × kategoria) + per-rodzaj marginals, zero-filled,
    with the reference's renamed column shapes."""
    cells = df.withColumn(
        "cell", F.concat_ws("|", F.col("rodzaj_zam_budowlanego"), F.col("kategoria"))
    )
    # DYNAMIC pivot, observed combos only — reference parity: pandas
    # pivot_table mints columns per observed (rodzaj, kategoria) pair
    # (helpers:431), which is exactly what feeds the sink's schema
    # evolution (S13). The domain is bounded (≤ 5×30, SURVEY.md §7 risk
    # 4), so the auto-distinct pivot scan stays cheap at any scale.
    pivoted = cells.groupBy("terc").pivot("cell").count().na.fill(0)
    renames = {
        f"{r}|{k}": sanitize_column_names(
            [f"{_short_rodzaj(r)}_{_deromanize(k)}_{suffix}"]
        )[0]
        for r in EXPECTED_RODZAJ_TYPES for k in INT_OF_ROMAN
    }
    pivoted = pivoted.toDF(*[
        renames.get(c, sanitize_column_names([f"{c}_{suffix}"])[0]) if c != "terc" else c
        for c in pivoted.columns
    ])

    margins = pivot_counts(df, "terc", "rodzaj_zam_budowlanego", EXPECTED_RODZAJ_TYPES)
    margin_renames = {
        r: sanitize_column_names([f"{_short_rodzaj(r)}_{suffix}"])[0]
        for r in EXPECTED_RODZAJ_TYPES
    }
    margins = margins.toDF(*[margin_renames.get(c, c) for c in margins.columns])
    return pivoted.join(margins, on="terc", how="full_outer").na.fill(0)


def superior_aggregates(
    spark: SparkSession,
    fact_path: str,
    agg_path: str,
    powiaty: DataFrame,
    execution_date: dt.datetime,
) -> DataFrame:
    """Task 4 (helpers:323-426): the flagship monthly aggregate."""
    from building_permissions_etl_spark.sources.sinks import MONTH_COL

    t = F.col(EVENT_TIME_COL)
    fact = spark.read.parquet(fact_path)
    # S7: the 3-month window is bounded on BOTH sides and duplicated on
    # the month PARTITION column. The upper bound makes backfills
    # re-run-safe — without `t < execution_date` a re-run for an old
    # logical date would count months ingested by later runs (the
    # reference only survived because Airflow catchup replayed serially
    # over an append-only table). The month predicates are what Spark
    # can actually PRUNE partitions with: a filter on the event-time
    # data column alone still lists and footer-reads every month
    # directory (yyyy-MM strings compare chronologically).
    # INTERVAL arithmetic preserves the logical date's time-of-day
    # (add_months coerces to DATE and would snap a midday logical date
    # to midnight, mirroring nothing in the reference's relativedelta)
    lo = F.lit(execution_date).cast("timestamp") - F.expr("INTERVAL 3 MONTHS")
    base = fact.filter(
        (t >= lo) & (t < F.lit(execution_date))
        & (F.col(MONTH_COL) >= F.date_format(lo, "yyyy-MM"))
        & (F.col(MONTH_COL)
           <= F.date_format(F.lit(execution_date), "yyyy-MM"))
    ).withColumn("terc", F.substring("terc", 1, 4)).cache()

    windows = {
        "3m": base,
        "2m": base.filter(t >= F.lit(execution_date).cast("timestamp")
                          - F.expr("INTERVAL 2 MONTHS")),
        "1m": base.filter(t >= F.lit(execution_date).cast("timestamp")
                          - F.expr("INTERVAL 1 MONTH")),
    }
    aggs = [aggregate_window(wdf, s) for s, wdf in windows.items()]
    merged = outer_merge_zero_fill(aggs, "terc")

    inj = execution_date.strftime("%Y-%m-%d %H:%M:%S.%f")[:-3] + " UTC"
    merged = merged.withColumn("injection_date", F.lit(inj)).withColumnRenamed(
        "terc", "unit_id"
    )
    ordered = ["unit_id", "injection_date"] + [
        c for c in merged.columns if c not in ("unit_id", "injection_date")
    ]
    merged = merged.select(*ordered)

    dim = powiaty.select("JPT_KOD_JE")
    # fused J2+J3+U1: the semi+anti+union shape references `merged` twice
    # and would evaluate the whole 3-window pivot subtree twice (only
    # `base` is cached) — complete_via_left_join is the single-evaluation
    # form this module's own joins.py documents as "the one to run"
    merged = complete_via_left_join(
        merged, dim, "unit_id", "JPT_KOD_JE",
        fill_values={"injection_date": F.lit(inj)},
    ).orderBy("unit_id")

    append_with_schema_evolution(spark, merged, agg_path, key_cols=("unit_id", "injection_date"))
    return merged
