"""Aggregation operators (SURVEY.md §2.4 A1-A9).

The flagship is the pivot count (A1, helpers:429-481): count rows per unit
× (type × category), zero-filled, with per-type marginal counts (A2).
Always called with an **explicit pivot-value list** — at 100 TB an
unbounded ``pivot()`` needs an extra distinct-scan job and can explode
columns; the reference's domain is bounded (5 types × 30 categories) and
the explicit list also reproduces its "absent value ⇒ zero column"
behavior (helpers:470-472) exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_counts(
    df: DataFrame,
    key: str,
    cell_col: str,
    cell_values: list[str],
    suffix: str = "",
) -> DataFrame:
    """A1: one row per ``key``, one count column per ``cell_values`` entry.

    ``cell_col`` is typically a pre-concatenated ``type_category`` column.
    One shuffle (the groupBy); map-side partial aggregation is automatic.
    """
    out = df.groupBy(key).pivot(cell_col, cell_values).count().na.fill(0)
    for v in cell_values:
        out = out.withColumnRenamed(v, f"{v}{suffix}")
    return out


def marginal_counts(
    df: DataFrame,
    key: str,
    type_col: str,
    type_values: list[str],
    suffix: str = "",
) -> DataFrame:
    """A2: per-type marginal counts per key, zero where absent
    (helpers:445-472). Explicit value list ⇒ absent type still yields a
    zero column, matching the reference's forced-0 branch (helpers:470-472).
    """
    out = df.groupBy(key).pivot(type_col, type_values).count().na.fill(0)
    for v in type_values:
        out = out.withColumnRenamed(v, f"{v}{suffix}")
    return out


def windowed_conditional_counts(
    df: DataFrame,
    key: str,
    cell_col: str,
    cell_values: list[str],
    time_col: str,
    windows: dict[str, "F.Column"],
) -> DataFrame:
    """Single-pass variant of (3 × filter → pivot → full-outer-join).

    The reference aggregates three filtered copies of one frame and outer-
    joins them (helpers:351-362,535-553). Idiomatic Spark does it in ONE
    shuffle with conditional aggregation::

        count(when(in_window & cell == v, 1)) per (window, value)

    ``windows`` maps suffix → boolean Column over ``time_col``. The n-pass
    shape is kept too (plans/flagship.py) as the parity-checkable form; a
    parity test pins both to the same result.
    """
    aggs = windowed_count_exprs(cell_col, cell_values, windows)
    return df.groupBy(key).agg(*aggs)


def windowed_count_exprs(
    cell_col: str,
    cell_values: list[str],
    windows: dict[str, "F.Column"],
    alias_fmt=lambda v, w: f"{v}_{w}",
) -> list:
    """The conditional-count expression list behind
    ``windowed_conditional_counts``, exposed so composite single-shuffle
    aggregates (flagship: cells + return-flag marginals in ONE groupBy)
    build from the same implementation instead of re-inlining it."""
    return [
        F.count(F.when(wpred & (F.col(cell_col) == v), 1))
        .alias(alias_fmt(v, wname))
        for wname, wpred in windows.items()
        for v in cell_values
    ]


def value_counts(df: DataFrame, key: str) -> DataFrame:
    """A3: occurrences per value, sorted desc (nb:9, nb:11 …).

    Ties are broken by key asc — the reference's ``value_counts`` tie order
    is memory-layout-dependent; we pin a deterministic total order
    (SURVEY.md §7 risk 2).
    """
    return (
        df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.col(key))
    )


def monthly_series(df: DataFrame, time_col: str) -> DataFrame:
    """A4: count per calendar month, sorted by month (nb:13)."""
    return (
        df.groupBy(F.date_trunc("month", F.col(time_col)).alias("month"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("month")
    )


def count_distinct(df: DataFrame, col: str, approx: bool = False) -> DataFrame:
    """A5: distinct count (helpers:151-152). ``approx=True`` switches to
    HyperLogLog++ — the variant to use at 100 TB (one pass, no exact
    distinct shuffle)."""
    fn = F.approx_count_distinct if approx else F.countDistinct
    return df.agg(fn(F.col(col)).alias("distinct_cnt"))


def scalar_max(df: DataFrame, col: str) -> DataFrame:
    """A6: watermark max (nb:21)."""
    return df.agg(F.max(col).alias("max_val"))


def top_k(df: DataFrame, key: str, k: int) -> DataFrame:
    """A9+O2/O3: top-k groups by count desc, key asc tie-break (nb:21)."""
    return value_counts(df, key).limit(k)
