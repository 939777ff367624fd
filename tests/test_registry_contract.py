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


def test_driver_window_is_oracle_backed_and_complete():
    """The first 50 registry entries (the slice the driver verifies) must
    match _DRIVER_WINDOW exactly, be fully oracle-backed (round 5 window
    contains no rows-only query), and contain every query that had no
    driver verdict in rounds 1-4 — the 42 round-4 continuation queries."""
    from building_permissions_etl_spark.plans.registry import _DRIVER_WINDOW

    names = list(queries())
    o = set(oracle_sql())
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == _DRIVER_WINDOW
    assert set(names[:50]) <= o, set(names[:50]) - o
    never_driver_verified = {
        # TPC-H-style continuation family
        "min_cost_supplier_per_part", "order_priority_checking",
        "forecast_revenue", "volume_shipping", "national_market_share",
        "product_profit_by_nation", "returned_items_report",
        "part_value_concentration", "priority_shipping_split",
        "customer_order_distribution", "promo_revenue_share",
        "top_supplier_revenue", "supplier_part_variety",
        "small_quantity_revenue", "large_volume_customers",
        "brand_range_revenue", "last_shipper_per_order",
        "dormant_high_balance_customers", "dominant_part_suppliers",
        # training curation
        "train_split_census", "mixture_resample_counts",
        "mixture_temperature_resample", "gopher_rule_filter",
        "similarity_topk_quantized", "chunk_documents_32",
        # behavioural insight
        "grouping_sets_order_stats", "lineitem_stats_by_flag",
        "price_regression_by_flag", "event_funnel_conversion",
        "monthly_cohort_retention", "gapfill_daily_forward_fill",
        "value_outliers_zscore", "value_histogram_fixed_buckets",
        "event_transition_matrix", "recursive_key_chain",
        "variant_props_rollup", "order_lines_with_ordinality",
        # SCD + session windows
        "scd1_customer_upsert", "scd2_customer_upsert",
        "stream_scd1_upsert", "native_session_window",
        "stream_session_window",
    }
    assert len(never_driver_verified) == 42
    assert never_driver_verified <= set(names[:50])
