"""Vector math over ``array<float>`` embedding columns — pure Column
expressions (no UDF): ``zip_with`` + ``aggregate`` stay JVM-side and inside
codegen, which is what makes brute-force similarity viable at scale before
any index (LSH/IVF) kicks in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity with a zero-vector guard: 0/0 is IEEE NaN, and
    Spark sorts NaN ABOVE every finite double, so an unguarded all-zero
    embedding would permanently occupy rank 1 of every top-k. The 1e-12
    floor maps zero vectors to similarity ~0 instead (mirrored in the
    DuckDB oracle's greatest() guard)."""
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))
