"""Query registry: name → (spark callable, duckdb oracle SQL).

This is the single source of truth behind ``__spark_entry__.queries()`` /
``oracle_sql()``, the local parity tests, and ``bench.py``. Each entry maps
an operator (or operator composition) from SURVEY.md §2 onto the driver
fixture tables; queries registered without SQL are those whose semantics
are not ANSI-SQL-expressible (HLL state, trained index, stub codecs) —
the driver records a rows-only check for those.

Registration ORDER is a driver contract: the grading driver verifies only
the FIRST 50 registry entries per round (CORRECTNESS_r01 capped there).
``_DRIVER_WINDOW`` pins which 50 land in the window — all oracle-backed:
first everything that got NO verdict in round 1 (as-of/range joins, the
event/stream family, salted/skew, text stats, vocabulary, the fixed
array query), then the queries newly value-checked in round 2 (the
portable-hash sketch family, winnowing, stratified sample, LSH top-k),
then the core SURVEY §2 evidence queries for re-confirmation, the
round-2 corpus-preparation family (PII redaction, decontamination,
packing, repetition, composition), and the four queries that have never
had any driver verdict (the round-2 value-checked multimodal trio and
the rows-only IVF probe). Everything past position 50 was verified green
in CORRECTNESS_r01 (or is a declared rows-only check), so the UNION of
r01+r02 driver verdicts covers every oracle-backed query in the
registry. Local tri-scale parity
(scripts/oracle_check.py at sf0.001/0.01/0.1) covers all of them every
round regardless of the window.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Each module contributes {name: (callable, sql_or_None)}.
_REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}

# The 50 entries the driver will verify this round (see module docstring).
_DRIVER_WINDOW = [
    # -- no driver verdict in round 1 (registered past position 50 then) --
    "asof_join_last_error",
    "range_join_clicks_errors",
    "event_window_counts",
    "event_sliding_window",
    "event_sessionization",
    "event_json_props",
    "stream_window_counts",
    "salted_group_count",
    "salted_join_segments",
    "exact_distinct_per_key",
    "text_quality_filter",
    "text_quality_stats",
    "language_id",
    "token_counts",
    "corpus_vocabulary_top100",
    # -- hard error in round 1, fixed (array stringified) --
    "orders_per_customer_array",
    # -- rows-only in round 1, value-checked since round 2 --
    "dedup_minhash_lsh",
    "dedup_minhash_oph",
    "dedup_simhash",
    "doc_fingerprint",
    "stratified_sample_by_lang",
    "similarity_topk_lsh",
    # -- core SURVEY §2 evidence, green in round 1, re-confirmed --
    "flagship_monthly_pivot",
    "flagship_merge_shape",
    "pivot_counts_90d",
    "marginal_counts",
    "range_filter_halfopen",
    "audit_metrics",
    "days_lookback_window",
    "outer_merge_windows",
    "dim_completion_zero_rows",
    # -- new in round 2: corpus-preparation family (plans/corpus_queries) --
    "pii_redact",
    "decontaminate_8gram",
    "pack_sequences_by_lang",
    "repetition_stats",
    "corpus_composition",
    "fuzzy_first_match",
    "terc_decision_tree",
    "dim_summary_left_join",
    "value_counts_priority",
    "monthly_series",
    "count_distinct_dates",
    "scalar_max_watermark",
    "timestamp_parse_metrics",
    "top_k_parts",
    "validation_suite",
    # -- never driver-verified: new-in-round-2 value checks + IVF probe --
    "similarity_topk_ivf",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
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
        scale_queries,
        streaming_queries,
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
    scale_queries.contribute(stage)

    # driver window first (KeyError here = window names drifted from the
    # contributors), then everything else in contribution order
    for name in _DRIVER_WINDOW:
        fn, sql = staged.pop(name)
        register(name, fn, sql)
    for name, (fn, sql) in staged.items():
        register(name, fn, sql)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _populate()
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _populate()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}
