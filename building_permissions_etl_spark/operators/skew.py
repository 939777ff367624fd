"""Skew-mitigation operators.

AQE's skew-join splitting (on in session.py) handles most sort-merge skew
at runtime; these operators cover the cases AQE cannot re-plan:

  * ``salted_group_count`` — two-stage aggregation for skewed grouping
    keys: groupBy(key, salt) partial counts, then groupBy(key) sum. The
    first shuffle spreads one hot key over ``n_salt`` reducers. (Plain
    count already partial-aggregates map-side; the salted form is for
    pipelines whose first stage must shuffle raw rows — e.g. when the
    partial state is large or the agg doesn't combine, like collect_*.)
  * ``salted_join`` — fact⋈dim equi-join where the dim is too big to
    broadcast and fact keys are skewed: the fact side gets a
    deterministic per-row salt in [0, n_salt), the dim side is replicated
    n_salt times, and the join key becomes (key, salt) — a hot key's rows
    land on n_salt reducers instead of one.
  * ``exact_distinct_per_key`` — shuffle-safe COUNT(DISTINCT v) per key:
    de-dup on (key, v) first (spreads a hot key across reducers by value),
    then count per key. The direct form funnels every row of a hot key
    into one reducer's hash set.

Salts are content-deterministic (xxhash64 of a row-identifying column),
so retries/replays produce identical placement — no RNG in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(expr: Column, n_salt: int) -> Column:
    return F.pmod(F.xxhash64(expr), F.lit(n_salt)).cast("int")


def salted_group_count(
    df: DataFrame, key: str, salt_on: str, n_salt: int = 16
) -> DataFrame:
    """Two-stage count per ``key``: partial counts per (key, salt), then a
    final sum per key. Result == plain groupBy(key).count()."""
    partial = (
        df.withColumn("__salt", _salt(F.col(salt_on), n_salt))
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("count"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_on: str,
    n_salt: int = 8,
) -> DataFrame:
    """Equi-join with fact-side salting and dim-side replication.

    Shuffle volume: fact unchanged, dim × n_salt (dim is the smaller,
    non-broadcastable side — replication is the price of spreading hot
    fact keys). Join key (key, salt) is fixed-width; result == plain
    fact.join(dim, fact_key == dim_key).
    """
    salted_fact = fact.withColumn("__salt", _salt(F.col(salt_on), n_salt))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    replicated = dim.withColumn("__salt", salts)
    cond = (salted_fact[fact_key] == replicated[dim_key]) & (
        salted_fact["__salt"] == replicated["__salt"]
    )
    return salted_fact.join(replicated, cond).drop("__salt")


def exact_distinct_per_key(df: DataFrame, key: str, value: str) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key in two skew-safe shuffles:
    dropDuplicates shuffles on (key, value) — a hot key spreads across
    reducers by value — then the count per key aggregates pre-shrunk
    rows. ``count(value)`` (not ``count(*)``) skips the NULL row the
    dedup keeps, matching SQL ``COUNT(DISTINCT value)`` — which ignores
    NULLs — while a key whose values are ALL null still surfaces with
    n_distinct = 0. The approx_count_distinct sketch is the
    single-shuffle alternative when exactness isn't required."""
    return (
        df.select(key, value)
        .dropDuplicates([key, value])
        .groupBy(key)
        .agg(F.count(F.col(value)).alias("n_distinct"))
    )
