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
    match _DRIVER_WINDOW exactly, be oracle-backed (the single allowed
    exception is the HLL rows-only query, in the window because its only
    driver record is a since-fixed r01 fail), and contain every query
    that had no driver verdict in rounds 1-3."""
    from building_permissions_etl_spark.plans.registry import _DRIVER_WINDOW

    names = list(queries())
    o = set(oracle_sql())
    assert len(_DRIVER_WINDOW) == 50
    assert names[:50] == _DRIVER_WINDOW
    rows_only_allowed = {"approx_count_distinct_dates"}
    assert set(names[:50]) - o <= rows_only_allowed, set(names[:50]) - o
    never_driver_verified = {
        "embedding_norm_stats", "quality_classifier_score",
        "props_key_histogram", "dedup_ngram_inverted",
        "pack_sequences_global", "dedup_cluster_survivors_star",
        "crs_transform_grid", "approx_count_distinct_dates",
    }
    assert never_driver_verified <= set(names[:50])
