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


def test_histogram_delta_update_never_rescans_base(spark):
    """The ingest-shape pin: one fixture scan (the delta, with the
    split date pushed to parquet) + one artifact scan; merge ==
    rebuild is the oracle's job, never-touching-base is this one's."""
    df = Q["histogram_persisted_delta_update"](spark, SF_DIR)
    plan = _static_plan(df)
    scans = re.findall(r"FileScan parquet[^\n]*", plan)
    assert len(scans) == 2, plan
    art = [s for s in scans if "drift_artifacts_" in s]
    fixture = [s for s in scans if "/root/testdata" in s]
    assert len(art) == 1 and len(fixture) == 1, scans
    # the delta scan pushes the split-date bound to the reader
    m = re.search(r"PushedFilters: \[([^\]]*)\]", fixture[0])
    assert m and "o_orderdate" in m.group(1), fixture[0]
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_histogram_delta_update_equals_inline_snapshot(spark):
    """Artifact + delta fold == the one-shot full snapshot, row for
    row (merge-equals-rebuild on the persisted path)."""
    inline = {(r.bin, r.cnt) for r in
              Q["histogram_snapshot_price"](spark, SF_DIR).collect()}
    folded = {(r.bin, r.cnt) for r in
              Q["histogram_persisted_delta_update"](spark, SF_DIR).collect()}
    assert folded == inline and folded
