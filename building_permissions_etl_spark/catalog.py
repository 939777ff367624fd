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


# Schema cache: footer-based schema inference costs ~55 ms per
# spark.read.parquet (driver-side footer job) — measured 70 ms bare vs
# 15 ms with an explicit schema at sf0.1. Query CONSTRUCTION repeats it
# for every table of every call, so a warm process pays it hundreds of
# times for identical files. This is the local stand-in for a warehouse
# metastore: at 100 TB the table schema comes from the catalog service,
# never from re-reading footers per query. Keyed by (path, mtime) so a
# rewritten path (scale harnesses overwrite synthetic fixtures in
# place) can never serve a stale schema.
_SCHEMA_CACHE: dict = {}


def _mtime(path: str) -> float:
    try:
        return os.path.getmtime(path)
    except OSError:
        return -1.0


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return _load_events(spark, path)
    key = (path, _mtime(path))
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def _read_events_raw(spark: SparkSession, path: str) -> DataFrame:
    """Physical read of the events parquet, tolerant of both fixture eras:
    current files store ``ts`` as µs TIMESTAMP_NTZ (reads directly); older
    ones stored TIMESTAMP(NANOS), which Spark's vectorized reader rejects
    (PARQUET_TYPE_ILLEGAL) unless the legacy nanosAsLong conf surfaces it
    as bigint — set only on that fallback path, never as a blanket side
    effect. Successful reads cache their schema (same (path, mtime)
    contract as ``load_table``); on the ns-era fallback the legacy conf
    is already set by the time the schema is cached, so replaying the
    cached schema keeps reading the bigint surface correctly."""
    key = (path, _mtime(path))
    schema = _SCHEMA_CACHE.get(key)
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    try:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
        return df
    except Exception as exc:
        # ONLY the ns-era footer rejection takes the legacy-conf path: a
        # bare retry would set the session-wide conf on ANY failure
        # (missing file, corrupt footer) and mask the real error behind
        # the retry's
        msg = str(exc)
        if "PARQUET_TYPE_ILLEGAL" not in msg and "Illegal Parquet type" not in msg:
            raise
        # deliberately NOT cached: the bigint surface exists only under
        # the SESSION-scoped nanosAsLong conf, and a recycled session
        # replaying a cached bigint schema without the conf would fail
        # at scan time — the legacy path re-pays footer inference
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path)


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``ts`` to TIMESTAMP (ltz) whatever the physical type:

      * bigint          — ns-as-long era: rebuild µs timestamps;
      * timestamp_ntz   — current µs fixtures: interpret the naive wall
                          clock AS UTC regardless of the session zone
                          (DuckDB's naive-as-UTC view of the same file),
                          by REBUILDING the epoch from tz-free field
                          extractions (date, hour, minute, fractional
                          second) — a bare cast shifts epoch math on any
                          non-UTC session, and even cast +
                          ``from_utc_timestamp`` mangles wall clocks
                          that fall in the session zone's DST
                          spring-forward gap (the cast resolves the
                          nonexistent local time by shifting it an hour
                          first);
      * timestamp       — already normalized.

    ltz is required downstream: ``withWatermark`` rejects NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and ``cast("long")`` epoch
    math raises CAST_WITHOUT_SUGGESTION on NTZ."""
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if dt == "timestamp_ntz":
        # ntz→date and date_part on ntz are pure field truncations — no
        # timezone semantics anywhere on this path, so gap/ambiguous
        # local times cannot shift (timestampdiff and cast both coerce
        # through the session zone; measured wrong on 'America/New_York'
        # for 2023-03-12 02:30, the spring-forward gap)
        return df.withColumn(
            "ts",
            F.expr(
                "timestamp_micros("
                "CAST(unix_date(CAST(ts AS DATE)) AS BIGINT) * 86400000000"
                " + CAST(date_part('HOUR', ts) AS BIGINT) * 3600000000"
                " + CAST(date_part('MINUTE', ts) AS BIGINT) * 60000000"
                " + CAST(date_part('SECOND', ts) * 1000000 AS BIGINT))"
            ),
        )
    return df


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    return normalize_events_ts(_read_events_raw(spark, path))


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view for spark.sql access."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
