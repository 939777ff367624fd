"""Driver-contract invariants over the registry itself."""

from building_permissions_etl_spark.plans.registry import oracle_sql, queries


def test_oracle_keys_subset_of_queries():
    q, o = queries(), oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in o.values())


def test_rows_only_set_is_exactly_the_documented_one():
    """Every query without an oracle must be one whose semantics are
    genuinely not ANSI-expressible — additions to this set need the same
    justification. The sketch family (minhash/oph/simhash/winnowing/
    stratified-sample) is value-checked via portable_hash64 +
    plans/sketch_oracles.py, and IVF similarity via its portable-centroid
    twin, since round 2. Only HLL sketch state remains."""
    rows_only = set(queries()) - set(oracle_sql())
    assert rows_only == {"approx_count_distinct_dates"}


def test_driver_window_matches_round6_rotation():
    """The first 50 registry entries (the slice the driver verifies)
    must match _DRIVER_WINDOW exactly; every entry except the documented
    rows-only HLL twin is oracle-backed; and the window front-loads (a)
    the 13 round-5 queries that registered after the round-5 window was
    pinned and so have no driver verdict, (b) the rows-only twin's
    first-ever driver row, (c) the five remaining oldest r01+r02-only
    entries, and (d) all fourteen round-6 additions — windowed the same
    round they register, ending the after-pinning evidence-gap pattern."""
    from building_permissions_etl_spark.plans.registry import _DRIVER_WINDOW

    names = list(queries())
    o = set(oracle_sql())
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == _DRIVER_WINDOW
    assert set(names[:50]) - o == {"approx_count_distinct_dates"}
    round5_unverified = {
        "scd2_point_in_time_join", "rolling_7d_order_stats",
        "dedup_survivors_longest", "ann_batch_topk", "curriculum_top_half",
        "paragraph_dedup_reassembly", "quality_funnel_report",
        "asset_dedup_by_content", "lateral_top2_per_nation",
        "changelog_snapshot", "not_in_null_aware", "incremental_agg_merge",
        "last_touch_attribution",
    }
    oldest_r02 = {
        "monthly_series", "count_distinct_dates", "scalar_max_watermark",
        "timestamp_parse_metrics", "top_k_parts",
    }
    round6 = {
        "scd2_history_violations", "activity_islands",
        "running_distinct_users", "campaign_overlap_orders",
        "fk_coverage_audit", "equi_depth_histogram",
        "dedup_incremental_batch", "group_by_all_revenue",
        "concurrent_purchase_errors", "snapshot_diff_census",
        "time_weighted_value", "mad_outliers_by_type",
        "minhash_estimate_calibration", "kmeans_assign_census",
    }
    front = (round5_unverified | {"approx_count_distinct_dates"}
             | oldest_r02 | round6)
    assert len(front) == 33
    assert front <= set(names[:50])
