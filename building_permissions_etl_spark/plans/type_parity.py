"""DuckDB-vs-Spark oracle OUTPUT-TYPE parity lint.

Round-8 driver red (`weekly_anchor_interpolation`) was a whole defect
class the value-normalizing sweep could not see: the oracle's uncast
``sum(BIGINT)`` is HUGEINT (int128) in DuckDB, the grading driver's
pandas fetch renders HUGEINT as float64, and the driver's TYPED value
hash diverged from Spark's bigint even though every value was
identical. This module maps both engines' result types onto a small
set of comparison classes so the sweep and the contract tests can
assert, for every oracle, that the DuckDB output type is
hash-compatible with the Spark dtype — BEFORE the driver ever sees it.

Classes are deliberately coarser than exact dtypes: the driver's
pandas path erases integer width (int32 and int64 hash identically),
so int-width drift is NOT a defect; int-vs-float, int-vs-hugeint,
and scale drift on decimals ARE.
"""

from __future__ import annotations

import re

# DuckDB scalar type name -> comparison class. HUGEINT maps to its own
# class on purpose: no Spark type produces it, so it can never match.
_DUCK_SCALAR = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int",
    "UBIGINT": "int",
    "HUGEINT": "hugeint", "UHUGEINT": "hugeint",
    "FLOAT": "float", "DOUBLE": "float", "REAL": "float",
    "VARCHAR": "string", "DATE": "date", "BOOLEAN": "bool",
    "BLOB": "binary", "INTERVAL": "interval",
    "TIMESTAMP": "timestamp", "TIMESTAMP WITH TIME ZONE": "timestamp",
    "TIMESTAMP_S": "timestamp", "TIMESTAMP_MS": "timestamp",
    "TIMESTAMP_NS": "timestamp", "TIMESTAMPTZ": "timestamp",
    "TIME": "time",
}

_SPARK_SCALAR = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "string", "date": "date", "boolean": "bool",
    "binary": "binary", "timestamp": "timestamp",
    "timestamp_ntz": "timestamp", "void": "null",
}


def duckdb_class(duck_type: str) -> str:
    """Comparison class for a DuckDB result type string.

    Handles scalars, DECIMAL(p,s) (class keeps the SCALE only — scale
    changes the rendered value, precision does not), and LIST types
    (``T[]``) recursively. Unknown types map to themselves so new
    drift surfaces as a mismatch, never a silent pass.
    """
    t = str(duck_type).strip()
    if t.endswith("[]"):
        return f"array<{duckdb_class(t[:-2])}>"
    m = re.fullmatch(r"DECIMAL\((\d+),(\d+)\)", t)
    if m:
        return f"decimal(s={m.group(2)})"
    return _DUCK_SCALAR.get(t, t)


def spark_class(spark_dtype: str) -> str:
    """Comparison class for a Spark ``df.dtypes`` type string."""
    t = str(spark_dtype).strip()
    m = re.fullmatch(r"array<(.*)>", t)
    if m:
        return f"array<{spark_class(m.group(1))}>"
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", t)
    if m:
        return f"decimal(s={m.group(2)})"
    return _SPARK_SCALAR.get(t, t)


def type_mismatches(spark_dtypes: list[tuple[str, str]],
                    duck_cols: list[str],
                    duck_types: list) -> list[str]:
    """Column-by-column class comparison; returns human-readable
    mismatch strings (empty list = parity). Matches by column NAME
    (case-insensitive) because the driver sorts columns by name
    before hashing."""
    s = {c.lower(): spark_class(t) for c, t in spark_dtypes}
    out = []
    for c, t in zip(duck_cols, duck_types):
        dc = duckdb_class(t)
        sc = s.get(c.lower())
        if sc is None:
            out.append(f"{c}: in oracle only (duck={t})")
        elif sc != dc:
            out.append(f"{c}: spark={sc} duck={dc} (raw duck type {t})")
    return out


def hugeint_columns(duck_cols: list[str], duck_types: list) -> list[str]:
    """Names of oracle output columns whose type (recursively) is
    HUGEINT — the exact round-8 driver-red class."""
    return [c for c, t in zip(duck_cols, duck_types)
            if "hugeint" in duckdb_class(t)]
