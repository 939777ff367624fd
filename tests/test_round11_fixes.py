"""Round-11 regression pins for the round-10 ADVICE items.

1. ``weighted_median_unit_price`` buckets by FLOOR division, not
   truncate-toward-zero ``div``: on a value domain that dips below
   zero, truncation made bucket 0 span (-W, +W) while the pushed
   literal prune assumed [tb*W, (tb+1)*W), silently excluding
   negative values inside the median bucket. Latent on the fixture
   (l_extendedprice > 0), so the pin runs on a planted negative-price
   table.
2. ``psi_drift`` raises when a snapshot side sums to zero instead of
   emitting a silent NaN psi (0/0 under double division does not
   raise even under ANSI).
3. ``merge_bloom_registers`` folds by NAME with a column-set check —
   the same misalignment contract ``merge_extent_tables`` carries.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _staged_round8b():
    from building_permissions_etl_spark.plans.round8b_queries import (
        contribute,
    )

    staged = {}
    contribute(lambda n, fn, sql: staged.__setitem__(n, fn))
    return staged


def test_weighted_median_floor_buckets_on_negative_domain(spark, tmp_path):
    # group A's median sits at -150 cents: floor buckets put it in
    # bucket -2 and the pushed range [-2.01, -0.99) keeps it; the old
    # truncating `div` targeted bucket -1 with a prune range that
    # EXCLUDED -1.50, returning no row at all for the group
    rows = [
        ("A", -2.50, 1.0), ("A", -1.50, 1.0),
        ("A", -0.50, 1.0), ("A", 0.50, 1.0),
        ("B", 1.00, 1.0), ("B", 2.00, 1.0), ("B", 3.00, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, "
              "l_quantity double")
    df.write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet"))

    fn = _staged_round8b()["weighted_median_unit_price"]
    got = {
        r["l_returnflag"]: (r["wmedian_cents"], r["total_qty"])
        for r in fn(spark, str(tmp_path), bucket_width=100).collect()
    }
    # brute force: smallest v where cumulative weight reaches half
    assert got == {"A": (-150, 4), "B": (200, 3)}


def test_psi_drift_raises_on_zero_sum_snapshot(spark):
    from building_permissions_etl_spark.operators.validation import (
        psi_drift,
    )

    h = spark.createDataFrame(
        [(0, 10), (1, 20)], "bin int, cnt bigint")
    zero = spark.createDataFrame([(0, 0), (1, 0)], "bin int, cnt bigint")
    with pytest.raises(Exception, match="sums to zero"):
        psi_drift(h, zero).collect()
    with pytest.raises(Exception, match="sums to zero"):
        psi_drift(zero, h).collect()
    # the guard must not disturb the green path
    assert psi_drift(h, h).first().psi == 0.0


def test_merge_bloom_registers_folds_by_name_and_checks_columns(spark):
    from building_permissions_etl_spark.operators.maintenance import (
        bloom_registers,
        merge_bloom_registers,
    )

    keys = spark.range(64).select(F.col("id").cast("string").alias("k"))
    a = bloom_registers(keys, "k")
    # same column SET, different physical order: a positional union
    # would OR word indexes into bit masks; by-name fold keeps the
    # merge idempotent (a OR a == a)
    swapped_order = a.select("bits", "word_idx")
    merged = {r["word_idx"]: r["bits"]
              for r in merge_bloom_registers(a, swapped_order).collect()}
    base = {r["word_idx"]: r["bits"] for r in a.collect()}
    assert merged == base
    # a register table with a drifted column name is rejected up front
    with pytest.raises(ValueError, match="columns"):
        merge_bloom_registers(a, a.withColumnRenamed("word_idx", "idx"))


def test_catalog_schema_cache_serves_and_invalidates(spark, tmp_path):
    import os
    import time

    from building_permissions_etl_spark import catalog

    p = os.path.join(str(tmp_path), "region.parquet")
    spark.createDataFrame([(1, "a")], "r_regionkey int, r_name string") \
        .write.parquet(p)
    df1 = catalog.load_table(spark, "region", str(tmp_path))
    key = (p, *catalog._stat_key(p))
    assert key in catalog._SCHEMA_CACHE
    df2 = catalog.load_table(spark, "region", str(tmp_path))
    assert df2.schema == df1.schema
    assert df2.count() == 1
    # rewriting the path with a DIFFERENT schema must not serve the
    # stale cached one: the (path, mtime) key misses and re-infers
    time.sleep(0.05)
    spark.createDataFrame([(2, "b", 9)],
                          "r_regionkey int, r_name string, extra int") \
        .write.mode("overwrite").parquet(p)
    os.utime(p)  # directory mtime granularity guard
    df3 = catalog.load_table(spark, "region", str(tmp_path))
    assert "extra" in df3.columns and df3.count() == 1


def test_weighted_median_invariant_to_bucket_width(spark, tmp_path):
    """The bucket width is a pure execution parameter: for ANY width the
    two-pass refinement must return the exact weighted median — the
    smallest v with cumulative weight >= half the total. Seeded random
    values spanning both signs stress bucket-edge alignment (medians
    landing exactly on tb*W), the carried-in prefix, and the pushed
    literal prune's superset-ness in a way the fixture (all-positive
    prices) never does."""
    import os
    import random

    rng = random.Random(411)
    rows = []
    for g in ("A", "B", "C"):
        for _ in range(200):
            # cents in [-50000, 50000]; weights 1..5
            v = rng.randint(-50_000, 50_000)
            rows.append((g, v / 100.0, float(rng.randint(1, 5))))
    spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, "
              "l_quantity double"
    ).write.mode("overwrite").parquet(
        os.path.join(str(tmp_path), "lineitem.parquet"))

    # brute force in exact integer arithmetic (floor cents, floor qty)
    expected = {}
    agg: dict = {}
    for g, price, qty in rows:
        v = int(__import__("math").floor(price * 100))
        agg.setdefault(g, {}).setdefault(v, 0)
        agg[g][v] += int(qty)
    for g, byv in agg.items():
        tot = sum(byv.values())
        cum = 0
        for v in sorted(byv):
            cum += byv[v]
            if 2 * cum >= tot:
                expected[g] = (v, tot)
                break

    fn = _staged_round8b()["weighted_median_unit_price"]
    for width in (1, 3, 100, 4096, 1 << 16):
        got = {
            r["l_returnflag"]: (r["wmedian_cents"], r["total_qty"])
            for r in fn(spark, str(tmp_path), bucket_width=width).collect()
        }
        assert got == expected, f"width={width}"


def test_psi_drift_raises_on_zero_row_snapshots(spark):
    """Zero-ROW inputs escape the per-row zero-sum guard (no row ever
    evaluates it) — the global agg would emit one all-NULL row that a
    threshold monitor reads as 'no drift'. Pinned: raise instead."""
    from building_permissions_etl_spark.operators.validation import (
        psi_drift,
    )

    empty = spark.createDataFrame([], "bin int, cnt bigint")
    with pytest.raises(Exception, match="empty snapshot"):
        psi_drift(empty, empty).collect()


def test_events_bigint_schema_never_enters_cache(spark):
    """The ns-era bigint ts surface exists only under the session-scoped
    nanosAsLong conf; caching it would poison recycled sessions. The
    admission predicate refuses ANY read whose ts surfaced as bigint —
    including ordinary reads in a session where the conf is already
    set (the second-call poisoning path)."""
    from building_permissions_etl_spark.catalog import (
        _events_schema_cacheable,
    )

    ns_era = spark.createDataFrame([(1, 2)], "event_id long, ts long")
    us_era = spark.createDataFrame(
        [(1,)], "event_id long").withColumn(
        "ts", __import__("pyspark.sql.functions", fromlist=["F"])
        .current_timestamp())
    assert not _events_schema_cacheable(ns_era)
    assert _events_schema_cacheable(us_era)
