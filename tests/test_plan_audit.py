"""Registry-wide physical-plan audit: the scale invariants every query
must hold, checked mechanically so a future edit can't silently
reintroduce a quadratic plan.

Invariants:
  * NO CartesianProduct anywhere — an unhinted cross product over two
    corpus-sized inputs is the one plan shape that can never survive
    100×. (BroadcastNestedLoopJoin is allowed: the engine uses it only
    for broadcast 1-row scalars / centroid literals / query vectors,
    where the broadcast side is O(1) by construction.)
  * Every BroadcastNestedLoopJoin must carry a BroadcastExchange —
    i.e. it IS the declared tiny-side pattern, not a fallback.

Streaming queries (memory-sink shapes) are skipped: their returned
DataFrame is a scan of the already-materialized sink table.
"""

from __future__ import annotations

import pytest

from building_permissions_etl_spark.plans.registry import queries

SF = "/root/testdata/sf0.001"

_SKIP_PREFIXES = ("stream_",)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name",
    [n for n in queries() if not n.startswith(_SKIP_PREFIXES)],
)
def test_no_cartesian_product(spark, name):
    plan = _plan(queries()[name](spark, SF))
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in physical plan — this shape is "
        f"quadratic in input size and cannot survive scale-up. Broadcast "
        f"the small side or restructure as an equi-join.\n{plan[:2000]}"
    )
    if "BroadcastNestedLoopJoin" in plan:
        assert "BroadcastExchange" in plan, (
            f"{name}: BroadcastNestedLoopJoin without a BroadcastExchange "
            f"— the non-equi join fell back to a non-broadcast strategy."
        )
