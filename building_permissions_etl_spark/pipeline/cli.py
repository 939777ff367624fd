"""Job entry points — the spark-submit surface of the engine.

The reference runs five Airflow tasks on a monthly cron
(dags/aggregates_python.py:39-93); here each is a parameterized Spark job
and the scheduler stays external (cron/Airflow/Dagster calling
``spark-submit`` or ``python -m building_permissions_etl_spark.pipeline``):

    download  — S1 HTTP ZIP fetch+extract (driver-side prep)
    validate  — V1-V4 expectation suite → HTML report
    ingest    — CSV → terc correction → month-partitioned fact write
    aggregate — the flagship multi-window aggregate → evolving sink
    all       — validate → ingest → aggregate in sequence

Logical time comes ONLY from ``--date`` (the reference threads Airflow's
execution_date the same way; wall-clock never drives data logic).
"""

from __future__ import annotations

import argparse
import datetime as dt
import json

from pyspark.sql import SparkSession


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="building_permissions_etl_spark.pipeline",
        description="Run one ETL task for a logical date",
    )
    p.add_argument("task", choices=["download", "validate", "ingest", "aggregate", "all"])
    p.add_argument("--date", required=True,
                   help="logical execution date, YYYY-MM-DD[ HH:MM:SS]")
    p.add_argument("--zip-url")
    p.add_argument("--zip-path", default="/tmp/permissions.zip")
    p.add_argument("--extract-to", default="/tmp/permissions_csv")
    p.add_argument("--csv", help="permissions CSV path (ingest/validate)")
    p.add_argument("--fact", help="fact table path (ingest/aggregate)")
    p.add_argument("--agg", help="aggregate table path (aggregate)")
    p.add_argument("--powiaty", help="county dim path (parquet with "
                                     "JPT_KOD_JE / JPT_NAZWA_ columns)")
    p.add_argument("--report", default="/tmp/validation_report.html")
    return p


def _parse_date(s: str) -> dt.datetime:
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return dt.datetime.strptime(s, fmt)
        except ValueError:
            continue
    raise SystemExit(f"unparseable --date {s!r}")


def run(spark: SparkSession, argv: list[str]) -> dict:
    """Execute one task; returns a result dict (printed as JSON by main)."""
    ns = build_parser().parse_args(argv)
    exec_date = _parse_date(ns.date)

    if ns.task == "download":
        from building_permissions_etl_spark.sources.http_zip import download_and_unpack_zip

        files = download_and_unpack_zip(ns.zip_url, ns.zip_path, ns.extract_to)
        return {"task": "download", "files": files}

    if ns.task == "validate":
        from building_permissions_etl_spark.functions.roman import ROMAN_SET
        from building_permissions_etl_spark.operators.validation import (
            Expectation,
            ExpectationSuite,
        )
        from building_permissions_etl_spark.schemas import (
            EVENT_TIME_COL,
            EXPECTED_RODZAJ_TYPES,
        )
        from building_permissions_etl_spark.sources.csv_source import read_permissions_csv

        df = read_permissions_csv(spark, ns.csv)
        suite = ExpectationSuite(expectations=(
            Expectation("event_time_shape", "regex", EVENT_TIME_COL,
                        regex=r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"),
            Expectation("kategoria_in_set", "in_set", "kategoria",
                        value_set=tuple(sorted(ROMAN_SET))),
            Expectation("terc_mostly_numeric", "regex_mostly", "terc",
                        regex=r"^\d{6,7}$", mostly=0.85),
            Expectation("rodzaj_distinct_subset", "distinct_in_set",
                        "rodzaj_zam_budowlanego",
                        value_set=tuple(EXPECTED_RODZAJ_TYPES)),
        ))
        rep = suite.render_html(df, ns.report)
        return {"task": "validate", "report": ns.report, **rep}

    if ns.task in ("ingest", "all"):
        from building_permissions_etl_spark.pipeline.permissions import ingest_permissions

        powiaty = spark.read.parquet(ns.powiaty)
        audit = ingest_permissions(spark, ns.csv, ns.fact, powiaty, exec_date)
        if ns.task == "ingest":
            return {"task": "ingest", **audit}

    if ns.task in ("aggregate", "all"):
        from building_permissions_etl_spark.pipeline.permissions import superior_aggregates

        powiaty = spark.read.parquet(ns.powiaty)
        out = superior_aggregates(spark, ns.fact, ns.agg, powiaty, exec_date)
        return {"task": ns.task, "aggregate_rows": out.count()}

    raise SystemExit(f"unhandled task {ns.task}")


def main(argv: list[str] | None = None) -> None:
    import sys

    from building_permissions_etl_spark.session import get_spark

    result = run(get_spark(), argv if argv is not None else sys.argv[1:])
    print(json.dumps(result, default=str))
