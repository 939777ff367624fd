"""pagerank_fixed_point materialization + plan guards (VERDICT r06 #1).

Round 6 shipped the iteration loop without caching the edge list: the
executed plan replayed the caller's edge lineage (a fact×fact join in
the registered query) 2·n_iter times. These tests pin the fix from both
sides — a runtime pass-count accumulator proves the edge rows are
computed exactly once regardless of n_iter, and an explain-tree walk
proves the registered trade-graph query's plan contains zero
non-cached scans of the lineitem fact.
"""

from __future__ import annotations

import re

import pytest

from building_permissions_etl_spark.operators.graph import (
    pagerank_fixed_point,
)

SF = "/root/testdata/sf0.001"


def _node_indent(line: str) -> int:
    """Position where the operator name starts in an explain line
    (tree-drawing prefix of spaces / ':' / '+' / '-' stripped)."""
    return len(line) - len(line.lstrip(" :+-*("))


def _noncached_occurrences(plan: str, token: str) -> int:
    """Count explain lines containing ``token`` that do NOT sit beneath
    an InMemoryRelation node — i.e. scans that would execute against
    the source rather than the cache. Walks ancestors by indentation."""
    lines = plan.splitlines()
    n = 0
    for i, ln in enumerate(lines):
        if token not in ln:
            continue
        indent = _node_indent(ln)
        covered = False
        for j in range(i - 1, -1, -1):
            ind_j = _node_indent(lines[j])
            if ind_j < indent:
                if "InMemoryRelation" in lines[j]:
                    covered = True
                    break
                indent = ind_j  # keep climbing through ancestors
        if not covered:
            n += 1
    return n


def test_pagerank_materializes_edges_once(spark):
    """Every edge row passes through the plan exactly ONCE no matter how
    many iterations reference the edge list — the runtime proof that the
    cache, not lineage replay, feeds the loop."""
    acc = spark.sparkContext.accumulator(0)
    edges_raw = spark.createDataFrame(
        [(1, 2, 1), (2, 1, 1), (2, 3, 2), (3, 1, 1), (4, 1, 3)],
        "src int, dst int, w int",
    )

    def counted(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    edges = edges_raw.mapInPandas(counted, edges_raw.schema)
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "id int")
    try:
        pr = pagerank_fixed_point(edges, nodes, n_iter=4)
        rows = pr.collect()
    finally:
        spark.catalog.clearCache()
    assert len(rows) == 4
    assert acc.value == 5, f"edge rows computed {acc.value}x, expected 1x"


def test_pagerank_conserves_mass_and_ranks_sinks(spark):
    """Unit semantics: ranks are positive, total mass stays within the
    documented truncation bound, and the node every edge points at
    outranks the rest."""
    edges = spark.createDataFrame(
        [(2, 1, 1), (3, 1, 1), (4, 1, 1), (1, 2, 1)],
        "src int, dst int, w int",
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 5)], "id int")
    scale = 10**12
    try:
        got = {
            r["id"]: r["pr_fixed"]
            for r in pagerank_fixed_point(
                edges, nodes, n_iter=6, scale=scale
            ).collect()
        }
    finally:
        spark.catalog.clearCache()
    assert set(got) == {1, 2, 3, 4}
    assert all(v > 0 for v in got.values())
    # dangling nodes (3, 4) leak their damped mass by design; everything
    # else must survive up to integer-floor truncation
    assert sum(got.values()) <= scale
    # 1 and 2 trade the bulk of the mass around their 2-cycle; both must
    # dominate the dangling pair, which ties exactly by symmetry
    assert min(got[1], got[2]) > got[3]
    assert got[3] == got[4]


def test_pagerank_rejects_bad_args(spark):
    edges = spark.createDataFrame([(1, 2, 1)], "src int, dst int, w int")
    nodes = spark.createDataFrame([(1,), (2,)], "id int")
    with pytest.raises(ValueError, match="n_iter"):
        pagerank_fixed_point(edges, nodes, n_iter=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank_fixed_point(edges, nodes, damping=(100, 100))
    with pytest.raises(ValueError, match="empty"):
        pagerank_fixed_point(edges, nodes.limit(0))


def test_pagerank_trade_graph_fact_scans_all_cached(spark, monkeypatch):
    """The DISTRIBUTED loop's executed plan (pinned past the round-14
    driver short-circuit via cap=0): every print of the lineitem fact
    sits beneath an InMemoryRelation (the cached edge list) and the
    iterations read it through InMemoryTableScan references — zero
    non-cached fact scans remain."""
    from building_permissions_etl_spark.operators import graph
    from building_permissions_etl_spark.plans.registry import queries

    monkeypatch.setattr(graph, "GRAPH_DRIVER_CAP", 0)
    spark.catalog.clearCache()
    try:
        df = queries()["pagerank_trade_graph"](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.catalog.clearCache()
    assert plan.count("InMemoryTableScan") >= 6, plan
    assert _noncached_occurrences(plan, "lineitem.parquet") == 0, plan
    # guard the guard: the fact does appear (inside the cached subtree)
    assert re.search(r"lineitem\.parquet", plan), plan


def test_graph_driver_short_circuit_matches_distributed(spark, monkeypatch):
    """Round-14 small-graph short-circuit: the driver replay of each
    iterative operator returns rows BIT-IDENTICAL to the distributed
    loop on the registered trade-graph queries."""
    from building_permissions_etl_spark.operators import graph
    from building_permissions_etl_spark.plans.registry import queries

    for name in ("pagerank_trade_graph", "lpa_trade_communities",
                 "kcore_trade_graph"):
        spark.catalog.clearCache()
        fast = queries()[name](spark, SF)
        assert "LocalTableScan" in fast._jdf.queryExecution() \
            .executedPlan().toString().replace("Scan ExistingRDD",
                                               "LocalTableScan")
        fast_rows = fast.collect()
        with monkeypatch.context() as m:
            m.setattr(graph, "GRAPH_DRIVER_CAP", 0)
            spark.catalog.clearCache()
            slow_rows = queries()[name](spark, SF).collect()
        assert fast_rows == slow_rows and len(fast_rows) > 0, name
    spark.catalog.clearCache()
