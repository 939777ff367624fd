"""Query registry: name → (spark callable, duckdb oracle SQL).

This is the single source of truth behind ``__spark_entry__.queries()`` /
``oracle_sql()``, the local parity tests, and ``bench.py``. Each entry maps
an operator (or operator composition) from SURVEY.md §2 onto the driver
fixture tables; queries registered without SQL are those whose semantics
are not ANSI-SQL-expressible (HLL state, trained index, stub codecs) —
the driver records a rows-only check for those.

Registration ORDER is a driver contract: the grading driver verifies only
the FIRST 50 registry entries per round (CORRECTNESS_r01 capped there).
``_DRIVER_WINDOW`` pins which 50 land in the round-5 window, chosen from
the per-query verdict history of CORRECTNESS_r01-r04:

  1. the 42 queries with NO driver verdict in any round — all registered
     in round 4 after that round's window was pinned: the 18-query
     TPC-H-style family (tpch_queries), the training-curation family
     (train/mixture/temperature splits, Gopher rules, quantized ANN,
     fixed-budget chunking), the 12-query behavioural-insight family,
     the SCD1/SCD2 merges + streaming SCD fold, and the native/streaming
     session-window pair;
  2. the three queries whose single green verdict is r03-only
     (event_sessionization, range_join_clicks_errors,
     stream_window_counts), for re-confirmation;
  3. five of the queries whose evidence is oldest (green r01+r02 only,
     never re-verified since) — the remaining five rotate into round 6.

With this window, r01∪…∪r05 gives EVERY oracle-backed registry query
REGISTERED BEFORE ROUND 5 at least one driver verdict
(approx_count_distinct_dates stays the single documented rows-only
entry). The queries added during round 5 (`plans/round5_queries.py`:
temporal PIT join, rolling RANGE frame, quality-policy survivors,
batched ANN, curriculum cut, paragraph dedup, quality funnel, asset
content dedup, shared-SQL LATERAL / null-aware NOT IN, changelog
compaction, incremental agg merge, last-touch attribution) registered after this window was
pinned — they are the front of the round-6 rotation, together with the
five remaining oldest (r01+r02-only) entries. Local tri-scale parity
(scripts/oracle_check.py at sf0.001/0.01/0.1) covers ALL queries every
round regardless of window.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Each module contributes {name: (callable, sql_or_None)}.
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}

# The 50 entries the driver will verify this round (see module docstring).
_DRIVER_WINDOW = [
    # -- 1. no driver verdict in any round: TPC-H-style family --
    "min_cost_supplier_per_part",
    "order_priority_checking",
    "forecast_revenue",
    "volume_shipping",
    "national_market_share",
    "product_profit_by_nation",
    "returned_items_report",
    "part_value_concentration",
    "priority_shipping_split",
    "customer_order_distribution",
    "promo_revenue_share",
    "top_supplier_revenue",
    "supplier_part_variety",
    "small_quantity_revenue",
    "large_volume_customers",
    "brand_range_revenue",
    "last_shipper_per_order",
    "dormant_high_balance_customers",
    "dominant_part_suppliers",
    # -- 1. training-curation family --
    "train_split_census",
    "mixture_resample_counts",
    "mixture_temperature_resample",
    "gopher_rule_filter",
    "similarity_topk_quantized",
    "chunk_documents_32",
    # -- 1. behavioural-insight family --
    "grouping_sets_order_stats",
    "lineitem_stats_by_flag",
    "price_regression_by_flag",
    "event_funnel_conversion",
    "monthly_cohort_retention",
    "gapfill_daily_forward_fill",
    "value_outliers_zscore",
    "value_histogram_fixed_buckets",
    "event_transition_matrix",
    "recursive_key_chain",
    "variant_props_rollup",
    "order_lines_with_ordinality",
    # -- 1. SCD family + session windows --
    "scd1_customer_upsert",
    "scd2_customer_upsert",
    "stream_scd1_upsert",
    "native_session_window",
    "stream_session_window",
    # -- 2. single green verdict is r03-only; re-confirm --
    "event_sessionization",
    "range_join_clicks_errors",
    "stream_window_counts",
    # -- 3. oldest evidence (green r01+r02 only) --
    "range_filter_halfopen",
    "audit_metrics",
    "days_lookback_window",
    "dim_completion_zero_rows",
    "value_counts_priority",
]


def register(name: str, fn: Callable[[SparkSession, str], DataFrame],
             sql: str | None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name {name!r}")
    _REGISTRY[name] = (fn, sql)


def _populate() -> None:
    if _REGISTRY:
        return
    from building_permissions_etl_spark.plans import (  # noqa: F401
        analytics,
        corpus_queries,
        extensions,
        flagship_queries,
        ranking_queries,
        scale_queries,
        streaming_queries,
        insight_queries,
        scd_queries,
        tpch_queries,
        training_queries,
        round5_queries,
    )

    staged: dict[str, tuple] = {}

    def stage(name: str, fn, sql) -> None:
        if name in staged:
            raise ValueError(f"duplicate query name {name!r}")
        staged[name] = (fn, sql)

    flagship_queries.contribute(stage)
    analytics.contribute(stage)
    extensions.contribute(stage)
    corpus_queries.contribute(stage)
    streaming_queries.contribute(stage)
    ranking_queries.contribute(stage)
    scale_queries.contribute(stage)
    tpch_queries.contribute(stage)
    training_queries.contribute(stage)
    insight_queries.contribute(stage)
    scd_queries.contribute(stage)
    round5_queries.contribute(stage)

    # driver window first (KeyError here = window names drifted from the
    # contributors), then everything else in contribution order. Built
    # into a LOCAL dict and committed atomically: a mid-loop KeyError
    # must not leave _REGISTRY partially filled, or a caller that
    # catches and retries would hit the `if _REGISTRY: return`
    # short-circuit and silently serve a truncated driver window.
    ordered: dict[str, tuple] = {}
    for name in _DRIVER_WINDOW:
        ordered[name] = staged.pop(name)
    ordered.update(staged)
    for name, (fn, sql) in ordered.items():
        register(name, fn, sql)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _populate()
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _populate()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}
