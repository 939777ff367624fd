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
    all be oracle-backed, contain every query that lacked a round-1
    verdict, and match _DRIVER_WINDOW exactly."""
    from building_permissions_etl_spark.plans.registry import _DRIVER_WINDOW

    names = list(queries())
    o = set(oracle_sql())
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == _DRIVER_WINDOW
    assert set(names[:50]) <= o, set(names[:50]) - o
    unverified_r1 = {
        "asof_join_last_error", "range_join_clicks_errors",
        "event_window_counts", "event_sliding_window",
        "event_sessionization", "event_json_props", "stream_window_counts",
        "salted_group_count", "salted_join_segments",
        "exact_distinct_per_key", "text_quality_filter",
        "text_quality_stats", "language_id", "token_counts",
        "corpus_vocabulary_top100", "orders_per_customer_array",
    }
    assert unverified_r1 <= set(names[:50])
