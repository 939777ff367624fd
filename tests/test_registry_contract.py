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


def test_driver_window_matches_round14_rotation():
    """The first 50 registry entries (the slice the driver verifies)
    must match _DRIVER_WINDOW exactly, and the round-14 window must
    front-load (a) the two round-14 additions
    (`zorder_layout_compacted_skip` and
    `zorder_layout_lifecycle_skip` — never verified) plus the two
    round-13 queries whose code changed closing the round-13 ADVICE
    items (dead-evidence rule), (b) the 14 r09-cohort leftovers (five
    rounds without a verdict, the oldest evidence in the registry),
    and (c) 32 of the 48-query r10 cohort, alphabetical; the 16 r10
    leftovers are pinned by name so the round-15 queue stays
    mechanical."""
    from building_permissions_etl_spark.plans.registry import _DRIVER_WINDOW

    names = list(queries())
    o = set(oracle_sql())
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == _DRIVER_WINDOW
    # every windowed query is oracle-backed (the rows-only sketch
    # twins all took their designed rows-only verdict in r08 and
    # rotate out — a window slot spent on a hash-uncheckable row is a
    # slot wasted)
    assert set(names[:50]) <= o
    head = {
        "zorder_layout_compacted_skip",    # round-14 additions
        "zorder_layout_lifecycle_skip",
        "zorder_layout_incremental_skip",  # ADVICE fix: pre-append extents
        "cusum_state_persisted_probe",     # ADVICE fix: headroom guard
    }
    r09_leftovers = {
        "region_rollup_with_default",
        "salted_group_count", "salted_join_segments",
        "shipping_priority_topk", "similarity_topk_bruteforce",
        "sql_revenue_by_status", "stream_dedup_keys",
        "stream_stream_join", "tfidf_top_terms", "topk_per_group",
        "unigram_logprob", "unpivot_cells_long",
        "weekly_anchor_interpolation", "zorder_extent_merge",
    }
    r10_head = {
        "basket_lift_brands", "event_sessionization",
        "gapfill_daily_forward_fill", "histogram_shard_merge",
        "min_cost_supplier_per_part", "native_session_window",
        "range_join_clicks_errors",
    }
    # round-15 queue: the r10 leftovers stay registered but out of
    # this window
    r10_deferred = {
        "recursive_key_chain", "returned_items_report", "rfm_segment_counts",
        "scd1_customer_upsert", "scd2_customer_upsert",
        "similarity_topk_quantized", "stream_scd1_upsert",
        "stream_session_window", "stream_window_counts",
        "supplier_part_variety", "top_supplier_revenue",
        "train_split_census", "value_histogram_fixed_buckets",
        "value_outliers_zscore", "variant_props_rollup",
        "volume_shipping",
    }
    w = set(names[:50])
    assert head | r09_leftovers | r10_head <= w
    assert r10_deferred & w == set()
    assert r10_deferred <= set(names)  # deferred, not dropped


def test_no_oracle_output_column_is_hugeint():
    """Round-8's one driver-red row (`weekly_anchor_interpolation`) was
    an uncast DuckDB ``sum(BIGINT)`` — HUGEINT (int128) — flowing into
    a checked output column: the driver's pandas fetch renders HUGEINT
    as float64, so the TYPED value hash diverges from Spark's bigint
    even when every value is identical. Kill the class: bind every
    oracle against the sf0.001 views (DuckDB resolves result types
    without executing) and assert no output column's type is HUGEINT,
    recursively. scripts/oracle_check.py enforces the stronger
    class-mapped Spark-dtype parity at sweep time; this test is the
    Spark-free fast gate."""
    import duckdb

    from building_permissions_etl_spark.plans.type_parity import (
        hugeint_columns,
    )

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")

    # negative control: the lint must actually fire on the round-8
    # defect shape (an uncast integer sum), or it guards nothing.
    bad = con.sql("SELECT sum(CAST(1 AS BIGINT)) AS s")
    assert hugeint_columns(list(bad.columns), list(bad.types)) == ["s"]

    offenders = {}
    for name, sql in oracle_sql().items():
        rel = con.sql(sql)
        hug = hugeint_columns(list(rel.columns), list(rel.types))
        if hug:
            offenders[name] = hug
    assert not offenders, (
        f"oracles with HUGEINT output columns (uncast sums?) — the "
        f"driver's typed hash WILL diverge from Spark: {offenders}")


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
