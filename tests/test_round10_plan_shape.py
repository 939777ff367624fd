"""Plan-shape pins for the round-10 scale rewrites.

``weighted_median_unit_price``: the two-pass bucket refinement exists
so the per-group ordered cumulative window (inherently one task per
group) walks a BOUNDED number of rows — ≤ n_buckets in the bucket
pass, ≤ bucket_width distinct values in the refine pass — instead of
|distinct prices|. The pins assert the shape that delivers that: a
broadcast of the ≤|groups|-row target table (never a shuffled join),
partial aggregation under both exchanges, and exactly the two ordered
windows.

``basket_lift_brands``: singles, pair counts, and n_orders all derive
from ONE collect_set exchange; the self-join shape this replaced
re-shuffled a fact-sized pair stream. The docstring's "one wide
exchange total" claim is a RUNTIME property — AQE's ReuseExchange is
what collapses the three basket consumers onto one exchange — so the
pin inspects the executed adaptive plan, not the static one.
"""

from __future__ import annotations

import re

from building_permissions_etl_spark.plans.registry import queries

SF_DIR = "/root/testdata/sf0.001"

Q = queries()


def _static_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weighted_median_refine_pass_shape(spark):
    # the callable runs pass 1 eagerly (≤|groups|-row collect), so the
    # returned frame IS pass 2: one pruned scan, a broadcast of the
    # collected target, one bounded ordered window
    df = Q["weighted_median_unit_price"](spark, SF_DIR)
    plan = _static_plan(df)
    # exactly one fact scan in the returned plan, with the literal
    # price-range superset pushed to parquet (row-group pruning at
    # scale — a join-derived predicate could never reach the scan)
    assert plan.count("FileScan parquet") == 1, plan
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_extendedprice" in m.group(1), plan
    # target-bucket table reaches the fact via broadcast, not shuffle
    assert "BroadcastHashJoin" in plan, plan
    # the refine aggregate combines map-side before its exchange
    assert "partial_sum" in plan, plan
    # exactly one ordered cumulative window, over in-bucket rows only
    ordered = re.findall(r"windowspecdefinition\([^)]*ASC", plan)
    assert len(ordered) == 1, plan
    # the whole query stays JVM-side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_weighted_median_matches_singlepass_oracle(spark):
    """Exactness guard for the bucket refinement: the two-pass result
    must equal the single-pass distinct-value cumsum computed with a
    degenerate one-bucket width (which IS the round-8 original)."""
    two_pass = {
        r["l_returnflag"]: (r["wmedian_cents"], r["total_qty"])
        for r in Q["weighted_median_unit_price"](spark, SF_DIR).collect()
    }
    from building_permissions_etl_spark.plans.round8b_queries import (
        contribute,
    )
    staged = {}
    contribute(lambda n, fn, sql: staged.__setitem__(n, fn))
    one_bucket = {
        r["l_returnflag"]: (r["wmedian_cents"], r["total_qty"])
        for r in staged["weighted_median_unit_price"](
            spark, SF_DIR, bucket_width=1 << 62).collect()
    }
    assert two_pass == one_bucket and len(two_pass) == 3


def test_psi_drift_reads_each_snapshot_input_once(spark):
    """psi_drift's bin totals come from an UN-partitioned window over
    the ≤ n_bins+3-row joined artifact, not a separate aggregate +
    crossJoin: the agg form re-derived the join's lineage twice, which
    doubled the base-table scans (4 instead of 2) whenever the
    snapshots are built inline. Pin the scan count."""
    plan = _static_plan(Q["psi_drift_monitor"](spark, SF_DIR))
    assert plan.count("FileScan parquet") == 2, plan


def test_basket_lift_single_tally_pass(spark):
    spark.catalog.clearCache()
    df = Q["basket_lift_brands"](spark, SF_DIR)
    df.collect()  # materialize the cached tally frame
    plan = _static_plan(df)
    # round 14: the three basket consumers (pairs, singles, n_orders)
    # read ONE cached <=326-row tally frame built by a single
    # exploded-entries pass — the former shape re-ran the basket
    # pipeline per consumer (pinned then via ReusedExchange); now the
    # consumers are InMemoryTableScans over one InMemoryRelation (the
    # wide collect_set exchange lives inside the cached subtree, whose
    # TEXT explain repeats per reference — so no textual exchange
    # count; the cache itself is the single-computation pin)
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert "InMemoryRelation" in plan, plan
    # pair generation happens inside the row (Generate over the
    # collected array), never via a join on l_orderkey
    assert "Generate explode" in plan, plan
    joins = [ln for ln in plan.splitlines()
             if "HashJoin" in ln and "l_orderkey" in ln]
    assert not joins, joins
    # tally counts partial-aggregate before the (tiny) final exchange
    assert "partial_count" in plan, plan
    spark.catalog.clearCache()
