"""Driver-contract invariants over the registry itself."""

from building_permissions_etl_spark.plans.registry import oracle_sql, queries


def test_oracle_keys_subset_of_queries():
    q, o = queries(), oracle_sql()
    assert set(o) <= set(q)
    assert all(callable(fn) for fn in q.values())
    assert all(isinstance(sql, str) and sql.strip() for sql in o.values())


def test_rows_only_set_is_exactly_the_documented_one():
    """Every query without an oracle must be one whose semantics are
    genuinely not ANSI-expressible (HLL sketch state, trained index,
    stub media codecs) — additions to this set need the same
    justification. The sketch family (minhash/oph/simhash/winnowing/
    stratified-sample) is value-checked via portable_hash64 +
    plans/sketch_oracles.py since round 2."""
    rows_only = set(queries()) - set(oracle_sql())
    assert rows_only == {
        "approx_count_distinct_dates",
        "multimodal_features",
        "multimodal_frame_sample",
        "multimodal_resize",
        "similarity_topk_ivf",
    }
