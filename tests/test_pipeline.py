"""End-to-end permissions pipeline: ingest modes, flagship aggregate,
schema evolution, idempotence — on a generated reference-shaped CSV
fixture (FIXTURES.md §A; property checks from SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.pipeline.permissions import (
    first_day_of_previous_month,
    ingest_permissions,
    superior_aggregates,
)
from building_permissions_etl_spark.schemas import (
    EVENT_TIME_COL,
    EXPECTED_RODZAJ_TYPES,
    PERMISSIONS_CSV_COLUMNS,
)

EXEC_DATE = dt.datetime(2022, 7, 1)


def _csv_rows(n=200, kategorias=("I", "II", "V")):
    """Deterministic permission rows spanning 6 months around EXEC_DATE,
    with dirty terc values exercising every §2.10 branch."""
    rows = []
    for i in range(n):
        month = 1 + (i % 6)                      # 2022-01 .. 2022-06
        day = 1 + (i % 27)
        date = f"2022-{month:02d}-{day:02d} 12:00:00"
        if i % 17 == 0:
            date = "not-a-date"                  # parse-failure branch
        terc_cases = [
            "1465011", "0201011", "9965011", "465011", "abc", "", "nan",
            "1465011.0",
        ]
        terc = terc_cases[i % len(terc_cases)]
        jn = "1465xyz" if i % 3 == 0 else ""
        miasto = "warsaw" if i % 3 == 1 else ""
        rodzaj = EXPECTED_RODZAJ_TYPES[i % len(EXPECTED_RODZAJ_TYPES)]
        kat = kategorias[i % len(kategorias)]
        row = {c: f"v{i}" for c in PERMISSIONS_CSV_COLUMNS}
        row.update({
            EVENT_TIME_COL: date, "terc": terc, "jednostki_numer": jn,
            "miasto": miasto, "rodzaj_zam_budowlanego": rodzaj,
            "kategoria": kat,
        })
        rows.append(row)
    return rows


def _write_csv(path, rows):
    with open(path, "w", encoding="utf-8") as f:
        f.write("#".join(PERMISSIONS_CSV_COLUMNS) + "\n")
        for r in rows:
            f.write("#".join(r[c] for c in PERMISSIONS_CSV_COLUMNS) + "\n")


@pytest.fixture(scope="module")
def powiaty(spark):
    rows = [("1465", "Warsaw County", "P"), ("0201", "Wroclaw County", "P"),
            ("0463", "Krakow County", "P"), ("2261", "Gdansk County", "P")]
    return spark.createDataFrame(rows, ["JPT_KOD_JE", "JPT_NAZWA_", "geometry"])


def test_full_pipeline(spark, powiaty, tmp_path):
    csv = str(tmp_path / "perms.csv")
    fact = str(tmp_path / "fact")
    agg = str(tmp_path / "agg")
    _write_csv(csv, _csv_rows())

    # --- full-mode ingest ------------------------------------------------
    audit = ingest_permissions(spark, csv, fact, powiaty, EXEC_DATE)
    assert audit["mode"] == "full"
    assert audit["total_rows"] > 0
    loaded = spark.read.parquet(fact)
    assert "month" in loaded.columns
    assert loaded.filter(F.col(EVENT_TIME_COL) >= F.lit(EXEC_DATE)).count() == 0
    # all kept tercs valid 7-digit or 4-digit matched codes
    bad = loaded.filter(~F.col("terc").rlike(r"^\d{4}(\d{3})?$")).count()
    assert bad == 0

    # --- update-mode ingest is idempotent (dynamic partition overwrite) --
    audit2 = ingest_permissions(spark, csv, fact, powiaty, EXEC_DATE)
    assert audit2["mode"] == "update"
    n1 = spark.read.parquet(fact).count()
    ingest_permissions(spark, csv, fact, powiaty, EXEC_DATE)
    assert spark.read.parquet(fact).count() == n1   # re-run: no double count

    # --- flagship aggregate ---------------------------------------------
    out = superior_aggregates(spark, fact, agg, powiaty, EXEC_DATE)
    rows = out.collect()
    # output key set == dim key set, constructively (SURVEY §5 item 3)
    assert sorted(r.unit_id for r in rows) == ["0201", "0463", "1465", "2261"]
    cols = out.columns
    # window monotonicity: 1m ⊆ 2m ⊆ 3m per county per cell family
    for r in rows:
        d = r.asDict()
        for c3 in [c for c in cols if c.endswith("_3m")]:
            c2, c1 = c3[:-3] + "_2m", c3[:-3] + "_1m"
            if c2 in d and c1 in d:
                assert d[c1] <= d[c2] <= d[c3], (r.unit_id, c3)
    # pivot-cell sums == in-window fact rows (SURVEY §5 property check)
    # only rows whose county prefix is a known dim key survive the J2
    # anti-join (the reference's false_records drop, helpers:573-587)
    fact_df = spark.read.parquet(fact)
    in3m = fact_df.filter(
        (F.col(EVENT_TIME_COL) >= F.lit(dt.datetime(2022, 4, 1)))
        & F.substring("terc", 1, 4).isin("0201", "0463", "1465", "2261")
    ).count()
    kat_cols = [c for c in cols if "_kat_" in c and c.endswith("_3m")]
    total_cells = sum(sum(r.asDict()[c] for c in kat_cols) for r in rows)
    assert total_cells == in3m

    # --- schema evolution on a later run with a NEW kategoria ------------
    csv2 = str(tmp_path / "perms2.csv")
    _write_csv(csv2, _csv_rows(n=60, kategorias=("X",)))
    fact2 = str(tmp_path / "fact2")
    ingest_permissions(spark, csv2, fact2, powiaty, EXEC_DATE)
    superior_aggregates(spark, fact2, agg, powiaty, EXEC_DATE)
    evolved = spark.read.parquet(agg)
    new_cols = [c for c in evolved.columns if "_kat_10_" in c]
    assert new_cols, "new kategoria X must mint kat_10 columns"
    # historic rows backfilled with 0 for the new columns
    first_run = evolved.filter(F.col(new_cols[0]).isNotNull())
    assert evolved.count() == 8                      # 2 runs × 4 counties
    assert first_run.count() == 8
    assert evolved.agg(F.min(new_cols[0])).first()[0] == 0


def test_first_day_of_previous_month():
    assert first_day_of_previous_month(dt.datetime(2022, 7, 15)) == dt.datetime(2022, 6, 1)
    assert first_day_of_previous_month(dt.datetime(2022, 1, 3)) == dt.datetime(2021, 12, 1)


def test_superior_aggregates_excludes_future_months(spark, tmp_path):
    """Backfill safety: a re-run for an OLD logical date must not count
    rows ingested by later runs (t < execution_date upper bound)."""
    import datetime as dt

    from building_permissions_etl_spark.pipeline.permissions import (
        superior_aggregates,
    )
    from building_permissions_etl_spark.sources.sinks import (
        write_fact_partitioned,
    )

    rows = [
        # one row inside the May window, one row in the FUTURE (July)
        ("1465", "Budowa nowego/nowych obiektów budowlanych", "I",
         dt.datetime(2022, 4, 20)),
        ("1465", "Budowa nowego/nowych obiektów budowlanych", "I",
         dt.datetime(2022, 7, 10)),
    ]
    fact = spark.createDataFrame(
        rows, "terc string, rodzaj_zam_budowlanego string, kategoria string,"
              " data_wplywu_wniosku_do_urzedu timestamp")
    fact_path = str(tmp_path / "fact")
    write_fact_partitioned(fact, fact_path,
                           "data_wplywu_wniosku_do_urzedu", "terc")
    powiaty = spark.createDataFrame([("1465", "Warszawa")],
                                    ["JPT_KOD_JE", "JPT_NAZWA_"])
    out = superior_aggregates(
        spark, fact_path, str(tmp_path / "agg"), powiaty,
        execution_date=dt.datetime(2022, 5, 1),
    )
    row = out.filter("unit_id = '1465'").collect()[0].asDict()
    counts = [v for k, v in row.items()
              if k not in ("unit_id", "injection_date")]
    # only the April row counts; the July row (after the logical date)
    # must be invisible to this run
    assert max(counts) == 1, row


def test_schema_evolution_refuses_to_zero_fill_keys(spark, tmp_path):
    import pytest as _pytest

    from building_permissions_etl_spark.sources.sinks import (
        append_with_schema_evolution,
    )

    path = str(tmp_path / "sink")
    first = spark.createDataFrame([("a", "2022", 1)],
                                  "unit_id string, injection_date string, n int")
    append_with_schema_evolution(spark, first, path,
                                 key_cols=("unit_id", "injection_date"))
    # second batch LOST a key column — must raise, not materialize '0' keys
    second = spark.createDataFrame([("b", 2)], "unit_id string, n int")
    with _pytest.raises(ValueError, match="key column"):
        append_with_schema_evolution(spark, second, path,
                                     key_cols=("unit_id", "injection_date"))


def test_zorder_key_never_overflows_sign_bit(spark):
    from building_permissions_etl_spark.sources.sinks import zorder_value
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        (F.col("id") * 7 % 65536).alias("a"), (F.col("id") * 13 % 65536).alias("b"),
        (F.col("id") * 17 % 65536).alias("c"), (F.col("id") * 23 % 65536).alias("d"),
    )
    z = zorder_value([F.col(c) for c in df.columns],
                     [0, 0, 0, 0], [65535, 65535, 65535, 65535], bits=16)
    mn = df.select(F.min(z).alias("m")).first()["m"]
    assert mn >= 0  # 4x16 bits would hit the sign bit; capped to 4x15


def test_validation_mostly_vacuous_success_on_all_null(spark):
    from building_permissions_etl_spark.operators.validation import (
        Expectation,
        ExpectationSuite,
    )

    df = spark.createDataFrame([(None,), (None,)], "terc string")
    suite = ExpectationSuite(expectations=(
        Expectation("terc_mostly_numeric", "regex_mostly", "terc",
                    regex=r"^\d{6,7}$", mostly=0.85),
    ))
    row = suite.evaluate(df).first()
    assert row["terc_mostly_numeric"] is True  # GE vacuous-success parity
