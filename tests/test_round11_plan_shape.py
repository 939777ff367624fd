"""Plan-shape pin for the round-11 persisted-artifact drift monitor.

``psi_drift_persisted``'s whole point is the claim its round-10
sibling could not evidence: once snapshot artifacts exist as tables,
the monitor never touches the base table — cost independent of table
size. The pins make that mechanical: the registered query's plan
reads EXACTLY the two artifact tables and ZERO fixture tables.
"""

from __future__ import annotations

import re

from building_permissions_etl_spark.plans.registry import queries

SF_DIR = "/root/testdata/sf0.001"

Q = queries()


def _static_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_psi_persisted_monitor_reads_only_artifacts(spark):
    df = Q["psi_drift_persisted"](spark, SF_DIR)
    plan = _static_plan(df)
    # exactly the two snapshot artifacts, nothing else
    assert plan.count("FileScan parquet") == 2, plan
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    assert all("drift_artifacts_" in s for s in scans), scans
    # the base table never appears: no fixture path, no orders scan
    assert "/root/testdata" not in plan, plan
    # monitor arithmetic stays JVM-side
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_psi_persisted_equals_inline_monitor(spark):
    """Artifact path == rebuild path: the persisted monitor must
    reproduce the inline round-10 monitor exactly (same domain
    contract, same split), including across a re-invocation (the
    driver's determinism probe re-calls the callable; the second call
    is artifact-read-only via the session cache)."""
    inline = Q["psi_drift_monitor"](spark, SF_DIR).first()
    p1 = Q["psi_drift_persisted"](spark, SF_DIR).first()
    p2 = Q["psi_drift_persisted"](spark, SF_DIR).first()
    for row in (p1, p2):
        assert row.psi == inline.psi
        assert row.n_base == inline.n_base
        assert row.n_cur == inline.n_cur
