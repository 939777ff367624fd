"""Property-based invariants for the round-6 operators: arbitrary
inputs, laws checked against brute-force Python reimplementations.
Hypothesis frames are tiny (Spark latency dominates), example budgets
small, deadlines off — same conventions as test_scd_property."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from building_permissions_etl_spark.operators.aggregates import (
    equi_depth_buckets,
)
from building_permissions_etl_spark.operators.joins import (
    bucketized_interval_join,
)
from building_permissions_etl_spark.operators.scd import (
    validate_scd2_history,
)

_SET = settings(max_examples=12, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])


# ---- equi_depth_buckets vs the ANSI NTILE definition ----------------------

def _ntile_bruteforce(rows, k):
    """ANSI NTILE over (value, id): first n % k buckets get one extra."""
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    n = len(ordered)
    base, rem = divmod(n, k)
    out, pos = {}, 0
    for b in range(1, k + 1):
        size = base + (1 if b <= rem else 0)
        for r in ordered[pos:pos + size]:
            out[r[0]] = b
        pos += size
    return out


@_SET
@given(
    vals=st.lists(st.integers(min_value=-5, max_value=5), min_size=1,
                  max_size=40),
    k=st.integers(min_value=1, max_value=7),
    num_ranges=st.integers(min_value=2, max_value=6),
)
def test_equi_depth_law(spark, vals, k, num_ranges):
    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r["id"]: r["bucket"] for r in
           equi_depth_buckets(df, "v", "id", k,
                              num_ranges=num_ranges).collect()}
    assert got == _ntile_bruteforce(rows, k)


# ---- bucketized_interval_join vs the naive overlap -------------------------

@_SET
@given(
    left=st.lists(st.tuples(st.integers(0, 60), st.integers(1, 25)),
                  min_size=0, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 60), st.integers(1, 25)),
                   min_size=0, max_size=15),
    width=st.integers(min_value=1, max_value=30),
)
def test_bucketized_overlap_law(spark, left, right, width):
    lrows = [(i, s, s + ln) for i, (s, ln) in enumerate(left)]
    rrows = [(100 + i, s, s + ln) for i, (s, ln) in enumerate(right)]
    ldf = spark.createDataFrame(lrows or [(0, 0, 0)],
                                "lid long, ls long, le long")
    rdf = spark.createDataFrame(rrows or [(0, 0, 0)],
                                "rid long, rs long, re long")
    if not lrows:
        ldf = ldf.filter("lid < 0")
    if not rrows:
        rdf = rdf.filter("rid < 0")
    got = sorted((r["lid"], r["rid"]) for r in bucketized_interval_join(
        ldf, rdf, "ls", "le", "rs", "re", bucket_width=width).collect())
    want = sorted((lid, rid)
                  for lid, ls, le in lrows for rid, rs, re_ in rrows
                  if ls < re_ and rs < le)
    assert got == want
    assert len(got) == len(set(got))


# ---- validate_scd2_history vs a brute-force checker ------------------------

def _violations_bruteforce(rows, check_gaps=False):
    """(key, vf, vt) rows → set of (key, violation), mirroring the
    documented ordering: vf ASC NULLS FIRST, vt ASC NULLS LAST."""
    bykey = {}
    for k, vf, vt in rows:
        bykey.setdefault(k, []).append((vf, vt))
    out = set()
    far_lo = datetime.date.min
    far_hi = datetime.date.max
    for k, vers in bykey.items():
        vers.sort(key=lambda p: (p[0] is not None,
                                 p[0] or far_lo,
                                 p[1] is None,
                                 p[1] or far_hi))
        for i, (vf, vt) in enumerate(vers):
            has_next = i + 1 < len(vers)
            nvf = vers[i + 1][0] if has_next else None
            if vf is None:
                out.add((k, "null_valid_from"))
            if vf is not None and vt is not None and vt <= vf:
                out.add((k, "non_positive_interval"))
            if vt is None and has_next:
                out.add((k, "open_not_last"))
            if vt is not None and nvf is not None and nvf < vt:
                out.add((k, "overlap"))
            if check_gaps and vt is not None and nvf is not None and nvf > vt:
                out.add((k, "gap"))
    return out


_day = st.integers(min_value=0, max_value=12)
_interval = st.tuples(
    st.one_of(st.none(), _day),                       # valid_from day offset
    st.one_of(st.none(), _day),                       # valid_to day offset
)


@_SET
@given(
    spec=st.lists(st.tuples(st.integers(1, 3), _interval),
                  min_size=1, max_size=8),
    check_gaps=st.booleans(),
)
def test_validate_scd2_history_law(spark, spec, check_gaps):
    d0 = datetime.date(2000, 1, 1)

    def day(off):
        return None if off is None else d0 + datetime.timedelta(days=off)

    rows = [(k, day(vf), day(vt)) for k, (vf, vt) in spec]
    df = spark.createDataFrame(rows, "k long, valid_from date, valid_to date")
    got = {(r["k"], r["violation"]) for r in
           validate_scd2_history(df, "k", check_gaps=check_gaps).collect()}
    assert got == _violations_bruteforce(rows, check_gaps)
