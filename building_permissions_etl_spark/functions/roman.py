"""Roman numeral codec for the ``kategoria`` domain (I..XXX).

The reference uses the ``roman`` package to build the validation set
(helpers:72-78) and to deromanize pivot column names (helpers:517-533).
Values are bounded (1..30) so a literal map expression — constant-folded
by Catalyst, no UDF — covers the row-level path; plain dicts cover the
column-name (driver-side) path.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

_ROMAN_DIGITS = [
    (10, "X"), (9, "IX"), (5, "V"), (4, "IV"), (1, "I"),
]


def int_to_roman(n: int) -> str:
    if not 1 <= n <= 30:
        raise ValueError(f"kategoria domain is 1..30, got {n}")
    out, rem = [], n
    for value, digit in _ROMAN_DIGITS:
        while rem >= value:
            out.append(digit)
            rem -= value
    return "".join(out)


ROMAN_OF_INT: dict[int, str] = {n: int_to_roman(n) for n in range(1, 31)}
INT_OF_ROMAN: dict[str, int] = {r: n for n, r in ROMAN_OF_INT.items()}
ROMAN_SET: frozenset[str] = frozenset(ROMAN_OF_INT.values())


def roman_to_int_col(col: Column) -> Column:
    """Column expression: roman numeral string → int (null if out of set)."""
    mapping = F.create_map(
        *chain.from_iterable((F.lit(r), F.lit(n)) for r, n in INT_OF_ROMAN.items())
    )
    return mapping[col]


def int_to_roman_col(col: Column) -> Column:
    """Column expression: int 1..30 → roman numeral string (null otherwise)."""
    mapping = F.create_map(
        *chain.from_iterable((F.lit(n), F.lit(r)) for n, r in ROMAN_OF_INT.items())
    )
    return mapping[col]
