"""Property-based invariants for the SCD2 merge: for ARBITRARY
(dimension, batch) pairs the output must satisfy the versioned-history
laws, and re-applying the same batch must be a no-op.

Frames are hypothesis-generated but tiny (≤6 keys); each example runs
two Spark jobs, so the example budget is kept small and deadlines off
(Spark latency dominates)."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from building_permissions_etl_spark.operators import scd as SCD
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)

_T0 = datetime.datetime(2000, 1, 1)
_T1 = datetime.datetime(2001, 6, 1)

_DIM = StructType([
    StructField("k", LongType()),
    StructField("bal", DoubleType()),
    StructField("seg", StringType()),
    StructField("valid_from", TimestampType()),
    StructField("valid_to", TimestampType()),
])
_UPD = StructType([
    StructField("k", LongType()),
    StructField("bal", DoubleType()),
    StructField("seg", StringType()),
])

_bal = st.one_of(st.none(), st.sampled_from([10.0, 20.0, 30.0]))
_seg = st.one_of(st.none(), st.sampled_from(["X", "Y"]))

# current dim: per key, one OPEN row, or one CLOSED row, or one of each
_key_state = st.sampled_from(["open", "closed", "both"])
_dim_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=6),
    st.tuples(_key_state, _bal, _seg),
    min_size=0, max_size=4,
)
_upd_strategy = st.dictionaries(
    st.integers(min_value=1, max_value=8),
    st.tuples(_bal, _seg),
    min_size=0, max_size=4,
)


def _k(t):
    return tuple((v is None, str(v)) for v in t)


def _build(spark, dim_spec, upd_spec):
    dim_rows = []
    for k, (state, bal, seg) in dim_spec.items():
        if state in ("closed", "both"):
            dim_rows.append((k, 1.0, "OLD", _T0, _T0))
        if state in ("open", "both"):
            dim_rows.append((k, bal, seg, _T0, None))
    upd_rows = [(k, bal, seg) for k, (bal, seg) in upd_spec.items()]
    return (spark.createDataFrame(dim_rows, _DIM),
            spark.createDataFrame(upd_rows, _UPD))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(dim_spec=_dim_strategy, upd_spec=_upd_strategy)
def test_scd2_invariants(spark, dim_spec, upd_spec):
    cur, upd = _build(spark, dim_spec, upd_spec)
    out = SCD.scd2_upsert(cur, upd, "k", ["bal", "seg"], _T1)
    rows = out.collect()

    # Law 1: at most one open version per key.
    open_by_key = {}
    for r in rows:
        if r["valid_to"] is None:
            open_by_key[r["k"]] = open_by_key.get(r["k"], 0) + 1
    assert all(v == 1 for v in open_by_key.values()), open_by_key

    # Law 2: every batch key has an open version afterwards.
    for k in upd_spec:
        assert open_by_key.get(k) == 1, (k, rows)

    # Law 3: the open version of a batch key carries the batch's values.
    for r in rows:
        if r["valid_to"] is None and r["k"] in upd_spec:
            bal, seg = upd_spec[r["k"]]
            assert r["bal"] == bal and r["seg"] == seg, (r, upd_spec)

    # Law 4: keys untouched by the batch are byte-identical pass-through.
    untouched = {k for k in dim_spec if k not in upd_spec}
    assert sorted((t for t in map(tuple, rows) if t[0] in untouched),
                  key=_k) == \
        sorted((t for t in map(tuple, cur.collect()) if t[0] in untouched),
               key=_k)

    # Law 5: re-applying the same batch is a no-op (idempotence).
    again = SCD.scd2_upsert(out, upd, "k", ["bal", "seg"],
                            datetime.datetime(2002, 1, 1))
    assert sorted(map(tuple, again.collect()), key=_k) == \
        sorted(map(tuple, rows), key=_k)
