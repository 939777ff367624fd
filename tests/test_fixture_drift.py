"""Fixture-drift guard (VERDICT r02 item 5).

Round 2 lost its whole bench to silent fixture drift: the driver
regenerated events.parquet with ``ts`` as µs TIMESTAMP_NTZ while the
loaders still assumed the ns-as-bigint era. This suite makes drift LOUD:
it pins each table's physical column set (parquet footers, no Spark —
cheap) and the loader-level contract that ``events.ts`` always surfaces
as TIMESTAMP (ltz), whatever the fixture era stores.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from building_permissions_etl_spark.catalog import TABLES, load_table
from tests.conftest import SF_DIR, SF_DIR_MID

EXPECTED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal",
                 "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
    "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size",
             "p_retailprice"},
    "orders": {"o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
               "o_orderdate", "o_orderpriority"},
    "lineitem": {"l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"},
    "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
    "documents": {"doc_id", "text", "lang", "source", "n_chars"},
    "embeddings": {"vec_id", "embedding", "label"},
}

# Physical ts encodings a loader is REQUIRED to understand. Anything else
# (e.g. a future ns or string regeneration) fails here with a clear
# message instead of deep inside a query plan.
ACCEPTED_TS_TYPES = {"timestamp[us]", "timestamp[ns]", "int64",
                     "timestamp[us, tz=UTC]"}


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MID])
@pytest.mark.parametrize("table", TABLES)
def test_physical_columns_match_loader_expectations(sf_dir, table):
    path = os.path.join(sf_dir, f"{table}.parquet")
    schema = pq.read_schema(path)
    got = set(schema.names)
    assert got == EXPECTED_COLUMNS[table], (
        f"FIXTURE DRIFT: {path} columns {sorted(got)} != expected "
        f"{sorted(EXPECTED_COLUMNS[table])} — update catalog.py loaders "
        f"and this guard together."
    )


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MID])
def test_events_ts_physical_type_is_understood(sf_dir):
    path = os.path.join(sf_dir, "events.parquet")
    ts_type = str(pq.read_schema(path).field("ts").type)
    assert ts_type in ACCEPTED_TS_TYPES, (
        f"FIXTURE DRIFT: events.ts is now physically {ts_type!r}; "
        f"catalog.normalize_events_ts only understands {ACCEPTED_TS_TYPES}. "
        f"Teach the loader the new encoding (emitting TIMESTAMP ltz) "
        f"before trusting any events query."
    )


@pytest.mark.parametrize("sf_dir", [SF_DIR, SF_DIR_MID])
def test_loader_normalizes_events_ts_to_ltz_timestamp(spark, sf_dir):
    """The loader contract every downstream operator relies on:
    ``ts`` is TIMESTAMP (ltz) — watermark-compatible, epoch-castable."""
    dt = dict(load_table(spark, "events", sf_dir).dtypes)["ts"]
    assert dt == "timestamp", (
        f"events.ts surfaced as {dt!r}, not 'timestamp' — withWatermark "
        f"and cast('long') epoch math both break on this type."
    )


def test_ntz_normalization_is_session_timezone_independent(spark):
    """ADVICE r03: a bare ntz→ltz cast reads the wall clock in the SESSION
    zone, silently shifting epoch math on non-UTC machines relative to
    DuckDB's naive-as-UTC view. The loader must yield the SAME instant
    under any session timezone."""
    from building_permissions_etl_spark.catalog import normalize_events_ts

    # plain noon, a wall clock inside NY's spring-forward GAP (02:30
    # does not exist as a local time on 2023-03-12), and one inside the
    # fall-back AMBIGUITY (01:30 exists twice on 2023-11-05) — cast- or
    # from_utc_timestamp-based conversions shift the gap case by 1 h
    walls = {
        "2023-06-15 12:00:00": 1686830400,
        "2023-03-12 02:30:00": 1678588200,
        "2023-11-05 01:30:00": 1699147800,
    }
    src = spark.sql(" UNION ALL ".join(
        f"SELECT TIMESTAMP_NTZ '{w}' AS ts" for w in walls
    ))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = sorted(
                r["e"] for r in normalize_events_ts(src)
                .selectExpr("unix_seconds(ts) AS e").collect()
            )
            assert got == sorted(walls.values()), (tz, got)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_daily_active_users_day_is_session_timezone_independent(spark):
    """date_trunc('day', ltz) uses SESSION-zone day boundaries; the dau
    query must bucket by UTC days (the oracle's naive-as-UTC view) under
    any session timezone."""
    import __spark_entry__ as E

    q = E.queries()["daily_active_users"]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = [(r["day"].isoformat(), r["dau"])
               for r in q(spark, SF_DIR).collect()]
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = [(r["day"], r["dau"]) for r in q(spark, SF_DIR).collect()]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # row count and dau values must be identical; collect renders the
    # day INSTANTS in the session zone, but the grouping (and therefore
    # the counts) must not move with the zone
    assert len(utc) == len(ny)
    assert [n for _, n in utc] == [n for _, n in ny]
