"""Profile-drift monitoring: fixed-domain histogram snapshots + PSI.

Laws pinned here: identical snapshots drift zero; PSI is symmetric;
the Spark computation matches an independent pure-Python PSI on the
collected histograms to 1e-9; a planted distribution shift crosses
the industry "major shift" threshold while a same-distribution split
stays under the "stable" one; the NULL bin makes null-rate drift
visible; the domain contract is validated."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.operators.validation import (
    histogram_snapshot,
    psi_drift,
)

SF_DIR = "/root/testdata/sf0.001"


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _py_psi(base_rows, cur_rows, min_prob=1e-6):
    b = {r.bin: r.cnt for r in base_rows}
    c = {r.bin: r.cnt for r in cur_rows}
    nb, nc = sum(b.values()), sum(c.values())
    psi = 0.0
    for k in set(b) | set(c):
        p = max(b.get(k, 0) / nb, min_prob)
        q = max(c.get(k, 0) / nc, min_prob)
        psi += (p - q) * math.log(p / q)
    return psi


def test_identical_snapshots_drift_zero(spark):
    od = _orders(spark)
    h = histogram_snapshot(od, "o_totalprice", 0.0, 600_000.0)
    row = psi_drift(h, h).first()
    assert row.psi == 0.0
    assert row.n_base == row.n_cur == od.count()


def test_psi_matches_python_and_is_symmetric(spark):
    od = _orders(spark)
    a = histogram_snapshot(od.filter("o_orderkey % 2 = 0"),
                           "o_totalprice", 0.0, 600_000.0)
    b = histogram_snapshot(od.filter("o_orderkey % 2 = 1"),
                           "o_totalprice", 0.0, 600_000.0)
    fwd = psi_drift(a, b).first().psi
    rev = psi_drift(b, a).first().psi
    assert fwd == rev
    assert abs(fwd - _py_psi(a.collect(), b.collect())) < 1e-9
    # a same-distribution split reads stable
    assert fwd < 0.1


def test_planted_shift_crosses_major_threshold(spark):
    od = _orders(spark)
    base = histogram_snapshot(od, "o_totalprice", 0.0, 600_000.0)
    shifted = histogram_snapshot(
        od.select((F.col("o_totalprice") * 2 + 150_000)
                  .alias("o_totalprice")),
        "o_totalprice", 0.0, 600_000.0)
    assert psi_drift(base, shifted).first().psi > 0.25


def test_null_rate_drift_is_visible(spark):
    od = _orders(spark)
    base = histogram_snapshot(od, "o_totalprice", 0.0, 600_000.0)
    nulled = histogram_snapshot(
        od.select(F.when(F.col("o_orderkey") % 3 == 0, None)
                  .otherwise(F.col("o_totalprice")).alias("o_totalprice")),
        "o_totalprice", 0.0, 600_000.0)
    assert {r.bin for r in nulled.collect()} >= {-2}
    assert psi_drift(base, nulled).first().psi > 0.1


def test_snapshot_bins_are_domain_stable_and_bounded(spark):
    od = _orders(spark)
    h = histogram_snapshot(od, "o_totalprice", 0.0, 600_000.0, n_bins=8)
    rows = h.collect()
    assert len(rows) <= 8 + 3
    assert all(-2 <= r.bin <= 8 for r in rows)
    # out-of-domain values land in the overflow/underflow bins, never
    # a new bin id
    weird = spark.createDataFrame(
        [(-5.0,), (10**9 * 1.0,), (float("nan"),), (None,)],
        ["o_totalprice"])
    w = {r.bin: r.cnt for r in histogram_snapshot(
        weird, "o_totalprice", 0.0, 600_000.0, n_bins=8).collect()}
    # NaN joins NULL in the missing bin — never a silent NULL bin id
    assert w == {-1: 1, 8: 1, -2: 2}


def test_domain_contract_validated(spark):
    od = _orders(spark)
    with pytest.raises(ValueError):
        histogram_snapshot(od, "o_totalprice", 10.0, 10.0)
    with pytest.raises(ValueError):
        histogram_snapshot(od, "o_totalprice", 0.0, 1.0, n_bins=0)


def test_extreme_values_land_in_clamp_bins_under_ansi(spark):
    """Round-10 ADVICE fix: raw bin ids stay BIGINT until after the
    clamp. Under ANSI, a long->int cast of an out-of-domain quotient
    (|raw| >= 2^31) or of floor(±Infinity) (saturates to
    Long.Min/MaxValue) used to throw CAST_OVERFLOW mid-snapshot; the
    contract says those rows belong in the -1/overflow bins."""
    df = spark.createDataFrame(
        [(1e18,), (-1e18,), (float("inf",),), (float("-inf"),),
         (float("nan"),), (None,), (5.0,)],
        "v double")
    rows = {r.bin: r.cnt for r in
            histogram_snapshot(df, "v", 0.0, 16.0, n_bins=16).collect()}
    assert rows == {-2: 2, -1: 2, 16: 2, 5: 1}
