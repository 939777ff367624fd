"""Engine-portable 64-bit hash.

The sketch operators (MinHash, SimHash, winnowing) default to Spark's
``xxhash64`` — the fastest JVM-side hash, but one with no twin in other
engines, which forces any cross-engine check down to a rows-only count.
``portable_hash64`` is the pluggable alternative: the first 60 bits of
``md5`` parsed as a bigint. md5 is available and bit-identical in every
engine (Spark, DuckDB, Trino, Postgres, ...), so a sketch built on it is
reproducible cross-engine and its WHOLE pipeline (signatures, banding,
densification, hamming) becomes value-checkable against an independent
SQL implementation.

15 hex chars = 60 bits keeps the value strictly below 2^60: positive,
overflow-safe under ANSI mode for every downstream affine map
(a*h+b with a,b < 2^31 stays < 2^91... bounded via mod p first), and
identical under Spark's pmod and DuckDB's ``%`` (both operands
non-negative).

Cost note (measured, sf0.1 documents): md5 is ~3× slower than xxhash64
per call but both are JVM-codegen; sketch queries stay well inside the
bench envelope. Production pipelines keep the xxhash64 default; the
driver-checked registry variants use the portable hash so correctness is
verified end-to-end by an independent engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def portable_hash64(col: Column) -> Column:
    """First 60 bits of md5(col) as a non-negative bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# DuckDB twin — format with {x} = any VARCHAR expression. Verified
# bit-identical to ``portable_hash64`` incl. unicode (CJK, combining
# accents) and control characters.
PORTABLE_HASH_SQL = "CAST(CONCAT('0x', substr(md5({x}), 1, 15)) AS BIGINT)"
