"""Round-10 queries: the drift-monitor histogram as a maintained table.

The DuckDB oracles prove end-to-end value parity at three scales;
these tests pin what the oracles can't see: (a) the MAINTENANCE
CONTRACT — merging per-shard snapshots equals a full rebuild for any
sharding, and the merge is order-insensitive; (b) the clamp bins the
merge query's deliberately-narrow domain must occupy with REAL
fixture rows (underflow -1 and overflow n_bins both present, so the
round-10 ANSI clamp fix is exercised by driver data, not just unit
literals); (c) conservation — bin counts sum to the table's row
count in every query; (d) the PSI artifact contract — drift is
computed on two ≤ n_bins+3-row artifacts, zero against itself, and
the registry query's one-row output carries the exact split counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from building_permissions_etl_spark.operators.maintenance import (
    merge_histograms,
)
from building_permissions_etl_spark.operators.validation import (
    histogram_snapshot,
    psi_drift,
)
from building_permissions_etl_spark.plans.registry import queries

SF_DIR = "/root/testdata/sf0.001"

Q = queries()


def _orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_shard_merge_equals_rebuild_for_any_sharding(spark):
    od = _orders(spark)
    full = histogram_snapshot(od, "o_totalprice", 2_000.0, 480_000.0)
    for k in (2, 3, 5):
        shards = [histogram_snapshot(od.filter(F.col("o_orderkey") % k == i),
                                     "o_totalprice", 2_000.0, 480_000.0)
                  for i in range(k)]
        assert _rows(merge_histograms(*shards)) == _rows(full)


def test_merge_is_order_insensitive_and_validates_input(spark):
    od = _orders(spark)
    a = histogram_snapshot(od.filter("o_orderkey % 2 = 0"),
                           "o_totalprice", 0.0, 600_000.0)
    b = histogram_snapshot(od.filter("o_orderkey % 2 = 1"),
                           "o_totalprice", 0.0, 600_000.0)
    assert _rows(merge_histograms(a, b)) == _rows(merge_histograms(b, a))
    with pytest.raises(ValueError, match="at least one"):
        merge_histograms()


def test_merge_query_occupies_both_clamp_bins(spark):
    """The registry query's domain [2000, 480000) is chosen so the
    fixture itself drives rows through BOTH clamp branches — the
    ANSI-overflow regression surface — at every SF."""
    bins = {r["bin"]: r["cnt"]
            for r in Q["histogram_shard_merge"](spark, SF_DIR).collect()}
    assert bins.get(-1, 0) > 0, "no underflow rows — domain drifted"
    assert bins.get(16, 0) > 0, "no overflow rows — domain drifted"
    assert -2 not in bins  # o_totalprice has no NULLs in the fixture
    assert sum(bins.values()) == _orders(spark).count()


def test_snapshot_query_conserves_rows(spark):
    bins = {r["bin"]: r["cnt"]
            for r in Q["histogram_snapshot_price"](spark, SF_DIR).collect()}
    assert sum(bins.values()) == _orders(spark).count()
    assert all(-2 <= b <= 16 for b in bins)


def test_psi_monitor_counts_split_exactly_and_self_drift_zero(spark):
    od = _orders(spark)
    row = Q["psi_drift_monitor"](spark, SF_DIR).first()
    n_pre = od.filter("o_orderdate < TIMESTAMP '1998-01-01'").count()
    assert row.n_base == n_pre
    assert row.n_cur == od.count() - n_pre
    assert row.psi >= 0.0  # PSI is a sum of (p-q)ln(p/q) >= 0 terms
    h = histogram_snapshot(od, "o_totalprice", 0.0, 600_000.0)
    assert psi_drift(h, merge_histograms(h.limit(0), h)).first().psi == 0.0
