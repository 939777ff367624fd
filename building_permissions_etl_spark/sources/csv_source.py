"""Permissions CSV source (S2): ``#``-delimited, UTF-8, header row,
explicit 26-column schema (reference helpers:35,174-183 —
``pd.read_csv(file_path, delimiter='#', names=column_names, header=0)``).

Never inferSchema: all columns land as string; the event-time column is
parsed in a separate audited step (C5/A8 — coerce-to-null via
``try_to_timestamp`` so the plan behaves identically under ANSI mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from building_permissions_etl_spark.schemas import (
    EVENT_TIME_COL,
    PERMISSIONS_CSV_SCHEMA,
)

TIMESTAMP_FMT = "yyyy-MM-dd HH:mm:ss"


def read_permissions_csv(spark: SparkSession, path: str) -> DataFrame:
    """Raw scan: 26 string columns, '#' delimiter, header consumed."""
    return (
        spark.read.option("sep", "#")
        .option("header", "true")
        .option("encoding", "UTF-8")
        .schema(PERMISSIONS_CSV_SCHEMA)
        .csv(path)
    )


def parse_event_time(df: DataFrame, col: str = EVENT_TIME_COL) -> DataFrame:
    """C5 (helpers:302-308): parse '%Y-%m-%d %H:%M:%S' strings, coercing
    failures to null (``errors='coerce'`` parity) — ``try_to_timestamp``
    keeps that behavior even with ANSI enabled."""
    return df.withColumn(col, F.try_to_timestamp(F.col(col), F.lit(TIMESTAMP_FMT)))


def parse_metrics(parsed: DataFrame, col: str = EVENT_TIME_COL) -> DataFrame:
    """A8 (helpers:302-308): converted vs failed tallies, one agg pass."""
    return parsed.agg(
        F.count(F.when(F.col(col).isNotNull(), 1)).alias("converted"),
        F.count(F.when(F.col(col).isNull(), 1)).alias("failed_or_null"),
    )
