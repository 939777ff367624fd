"""Driver-contract invariants over the registry itself."""

import ast
import pathlib
import pkgutil

from building_permissions_etl_spark.plans.registry import oracle_sql, queries

# Queries registered WITHOUT a DuckDB oracle. Additions need the same
# justification: semantics genuinely not ANSI-expressible. The sketch
# dedup family (minhash/oph/simhash/winnowing/stratified-sample) is
# value-checked via portable_hash64 + plans/sketch_oracles.py and IVF
# similarity via its portable-centroid twin, so those are NOT here.
# What remains is engine-opaque sketch STATE whose estimates are
# implementation-specific (DataSketches HLL/theta/KLL, Spark GK
# percentile_approx) — each has an exact oracle-backed twin registered
# beside it (count_distinct_dates / quarterly_distinct_users /
# weekly_user_overlap_exact / doc_length_quantiles+mad_outliers_by_type)
# so the driver still verifies the exact semantics the sketch tracks.
ROWS_ONLY = {
    "approx_count_distinct_dates",      # HLL++ twin of count_distinct_dates
    "mad_outliers_by_type_approx",      # GK-sketch twin of mad_outliers_by_type
    "hll_quarterly_users_rollup",       # mergeable-HLL twin of quarterly_distinct_users
    "weekly_user_overlap_theta",        # theta-intersection twin of weekly_user_overlap_exact
    "kll_weekly_value_quantiles",       # mergeable-KLL rollup (exact twins: doc_length_quantiles)
    "weekly_churn_theta",               # theta-A-NOT-B twin of weekly_churned_users_exact
}


def test_oracle_keys_subset_of_queries():
    q, o = queries(), oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in o.values())


def test_rows_only_set_is_exactly_the_documented_one():
    rows_only = set(queries()) - set(oracle_sql())
    assert rows_only == ROWS_ONLY


def test_driver_window_matches_round8_rotation():
    """The first 50 registry entries (the slice the driver verifies)
    must match _DRIVER_WINDOW exactly, and the round-8 window must
    front-load (a) every round-7/8 addition — new queries take a driver
    verdict the round they register, and (b) the r03-newest cohort (the
    oldest evidence, recomputed from CORRECTNESS_r01-r07) minus the
    three stragglers the round-8e additions displaced (salted-skew
    pair + exact_distinct_per_key — plan-shape-tested and sweep-green;
    they head the round-9 queue)."""
    from building_permissions_etl_spark.plans.registry import _DRIVER_WINDOW

    names = list(queries())
    o = set(oracle_sql())
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == _DRIVER_WINDOW
    # the only windowed queries without an oracle are the documented
    # rows-only sketch twins
    assert set(names[:50]) - o == ROWS_ONLY - {"approx_count_distinct_dates"}
    new_round78 = {
        "kmeans_lloyd_2iter", "mad_outliers_by_type_approx",
        "quarterly_distinct_users", "hll_quarterly_users_rollup",
        "triangle_count_trade_graph", "priority_sample_by_lang",
        "pareto_frontier_parts", "weekly_anchor_interpolation",
        "weekly_user_overlap_exact", "weekly_user_overlap_theta",
        "kll_weekly_value_quantiles", "approx_topk_event_types",
        "sparse_dot_topk_pairs", "basket_lift_brands",
        "weighted_median_unit_price", "peak_concurrency_by_type",
        "weekly_churned_users_exact", "weekly_churn_theta",
        "approx_topk_weekly_rollup", "power_iteration_eigendirection",
        "bloom_pruned_segment_revenue", "zorder_extent_pruning",
        "cusum_changepoint_by_type", "rfm_segment_counts",
        "pareto_customer_concentration", "active_day_streaks",
        "table_checksum_rollup",
        "lpa_trade_communities", "kcore_trade_graph",
        "dow_seasonality_outliers",
    }
    r03_cohort = {
        "rollup_order_totals", "orders_per_customer_array",
        "text_quality_filter", "text_quality_stats", "language_id",
        "token_counts", "doc_fingerprint", "multimodal_features",
        "multimodal_frame_sample", "corpus_vocabulary_top100",
        "stratified_sample_by_lang", "multimodal_resize", "pii_redact",
        "pack_sequences_by_lang", "repetition_stats", "corpus_composition",
        "event_window_counts", "event_sliding_window", "event_json_props",
        "asof_join_last_error",
    }
    assert len(new_round78) == 30 and len(r03_cohort) == 20
    assert new_round78 | r03_cohort <= set(names[:50])


def test_every_contributor_module_is_wired():
    """Round-7 failure mode made impossible: a module under plans/ that
    defines contribute() but is never imported/invoked by
    registry._populate() is dead code — its queries silently skip the
    driver, tests, and bench (VERDICT r07 found exactly this, with two
    broken queries hiding inside). Walk the package, find every module
    whose AST defines a top-level `contribute`, and assert _populate()'s
    source names each one."""
    import building_permissions_etl_spark.plans as plans_pkg
    from building_permissions_etl_spark.plans import registry

    plans_dir = pathlib.Path(plans_pkg.__file__).parent
    contributors = []
    for mod in pkgutil.iter_modules([str(plans_dir)]):
        src = (plans_dir / f"{mod.name}.py").read_text()
        tree = ast.parse(src)
        if any(isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
               and n.name == "contribute" for n in tree.body):
            contributors.append(mod.name)
    assert contributors, "no contributor modules found — walk is broken"

    reg_src = pathlib.Path(registry.__file__).read_text()
    reg_tree = ast.parse(reg_src)
    populate = next(n for n in reg_tree.body
                    if isinstance(n, ast.FunctionDef) and n.name == "_populate")
    called = {
        n.func.value.id
        for n in ast.walk(populate)
        if isinstance(n, ast.Call) and isinstance(n.func, ast.Attribute)
        and n.func.attr == "contribute" and isinstance(n.func.value, ast.Name)
    }
    unwired = sorted(set(contributors) - called)
    assert not unwired, (
        f"plans modules defining contribute() but never invoked by "
        f"registry._populate(): {unwired} — wire them in and window "
        f"their queries")
