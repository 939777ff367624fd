"""Schema registry — explicit StructTypes, never inferSchema in production.

Mirrors the reference's declared schemas:
  * 26-column permissions CSV column list
    (reference: dags/aggregates_python_helpers.py:174-181);
  * 27-field canonical warehouse fact schema
    (dags/aggregates_python_helpers.py:681-709) — all STRING except ``id``
    INTEGER and the event-time column (DATE in BQ, handled as timestamp);
  * powiaty geo dimension — all STRING incl. WKT geometry
    (dags/aggregates_python_helpers.py:774-779);
  * domain constants: the 16 voivodeship codes→names
    (helpers:242-259), the 5 expected construction types (helpers:43),
    Roman numerals I..XXX (helpers:72-78).
"""

from __future__ import annotations

from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_TIME_COL = "data_wplywu_wniosku_do_urzedu"

PERMISSIONS_CSV_COLUMNS = [
    "numer_ewidencyjny_system", "numer_ewidencyjny_urzad", EVENT_TIME_COL,
    "nazwa_organu", "wojewodztwo_objekt", "obiekt_kod_pocztowy", "miasto",
    "terc", "cecha", "cecha2", "ulica", "ulica_dalej", "nr_domu", "kategoria",
    "nazwa_zam_budowlanego", "rodzaj_zam_budowlanego", "kubatura", "stan",
    "jednostki_numer", "obreb_numer", "numer_dzialki",
    "numer_arkusza_dzialki", "nazwisko_projektanta", "imie_projektanta",
    "projektant_numer_uprawnien", "projektant_pozostali",
]

# CSV arrives all-string; the event-time column is parsed to timestamp in a
# separate, metrics-audited step (coerce-to-null — helpers:302-308).
PERMISSIONS_CSV_SCHEMA = StructType(
    [StructField(c, StringType(), True) for c in PERMISSIONS_CSV_COLUMNS]
)

# Canonical warehouse fact table: id + 26 string cols, event time as timestamp.
PERMISSIONS_TABLE_SCHEMA = StructType(
    [StructField("id", LongType(), True)]
    + [
        StructField(c, TimestampType() if c == EVENT_TIME_COL else StringType(), True)
        for c in PERMISSIONS_CSV_COLUMNS
    ]
)

POWIATY_SCHEMA = StructType([
    StructField("JPT_KOD_JE", StringType(), True),   # 4-digit county code
    StructField("JPT_NAZWA_", StringType(), True),   # county name
    StructField("geometry", StringType(), True),     # WKT polygon, opaque
])

# 16 voivodeship codes → English names (helpers:242-259).
VOIVODESHIPS: dict[str, str] = {
    "02": "Lower Silesian", "04": "Kuyavian-Pomeranian", "06": "Lublin",
    "08": "Lubusz", "10": "Lodz", "12": "Lower Poland", "14": "Masovian",
    "16": "Opole", "18": "Podkarpackie", "20": "Podlaskie",
    "22": "Pomeranian", "24": "Silesian", "26": "Swietokrzyskie",
    "28": "Warmian-Masurian", "30": "Greater Poland", "32": "West Pomeranian",
}

# The 5 expected values of rodzaj_zam_budowlanego (helpers:43).
EXPECTED_RODZAJ_TYPES = [
    "budowa nowego/nowych obiektów budowlanych",
    "rozbudowa istniejącego/istniejących obiektów budowlanych",
    "odbudowa istniejącego/istniejących obiektów budowlanych",
    "nadbudowa istniejącego/istniejących obiektów budowlanych",
    "wykonanie robót budowlanych innych niż wymienione powyżej",
]

TIMESTAMP_REGEX = r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"   # helpers:49
TERC_REGEX = r"^\d{6,7}$"                                     # helpers:52
TERC_MOSTLY_THRESHOLD = 0.85                                  # helpers:53
