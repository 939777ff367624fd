"""Table catalog for the driver-generated fixture tables (TESTDATA.md).

Parquet tables ``region nation customer supplier part orders lineitem
events documents embeddings`` live under ``/root/testdata/sf*/``. At 100 TB
these would be partitioned warehouse tables; the loader keeps the access
path identical (``spark.read.parquet``) so partition pruning and column
pruning behave the same either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimensions small enough to always broadcast (≈ powiaty, 380 rows, in the
# reference — helpers:748). At 100 TB the facts grow; these don't.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier"})


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    return spark.read.parquet(path)


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet, which Spark's vectorized
    reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as long (legacy
    conf) and rebuild a microsecond timestamp — lossless for this data
    and identical to DuckDB's own ns→µs view of the table."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for spark.sql access."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
