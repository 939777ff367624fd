"""Round-8e invariants beyond oracle parity: the LPA and k-core
operators match brute-force Python on hand-built graphs AND on the
fixture-derived trade graph, and the seasonality screen matches a
brute-force recomputation from the raw events.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.operators.graph import (
    k_core_peel,
    label_propagation,
)
from building_permissions_etl_spark.plans.registry import queries
from building_permissions_etl_spark.plans.round8_queries import (
    trade_graph_kept_edges,
)

SF_DIR = "/root/testdata/sf0.001"

Q = queries()


# ---- brute-force references ------------------------------------------------

def _py_lpa(edges, node_ids, n_iter=3):
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lbl = {n: n for n in node_ids}
    for _ in range(n_iter):
        nxt = {}
        for n in node_ids:
            counts = {}
            for m in nbrs.get(n, []):
                counts[lbl[m]] = counts.get(lbl[m], 0) + 1
            if counts:
                nxt[n] = min(counts, key=lambda L: (-counts[L], L))
            else:
                nxt[n] = lbl[n]
        lbl = nxt
    return lbl


def _py_kcore(edges, node_ids, k, n_rounds=3):
    live = list(edges)
    for _ in range(n_rounds):
        deg = {}
        for a, b in live:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        live = [(a, b) for a, b in live if a in keep and b in keep]
    deg = {}
    for a, b in live:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {n: (n in deg, deg.get(n, 0)) for n in node_ids}


def _run_lpa(spark, edges, node_ids, n_iter=3):
    e = spark.createDataFrame(edges, "a long, b long")
    n = spark.createDataFrame([(i,) for i in node_ids], "id long")
    out = label_propagation(e, n, n_iter=n_iter)
    return {r["id"]: r["community"] for r in out.collect()}


def _run_kcore(spark, edges, node_ids, k, n_rounds=3):
    e = spark.createDataFrame(edges, "a long, b long")
    n = spark.createDataFrame([(i,) for i in node_ids], "id long")
    out = k_core_peel(e, n, k=k, n_rounds=n_rounds)
    return {r["id"]: (r["in_core"], r["degree"]) for r in out.collect()}


# ---- LPA on hand-built graphs ----------------------------------------------

def test_lpa_two_cliques_with_bridge(spark):
    cliques = [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)]
    ids = [1, 2, 3, 4, 5, 6, 7]
    got = _run_lpa(spark, cliques, ids)
    assert got == _py_lpa(cliques, ids)
    # the two cliques resolve to different communities; isolated node
    # keeps its own label
    assert got[1] == got[2] == got[3]
    assert got[4] == got[5] == got[6]
    assert got[1] != got[4]
    assert got[7] == 7


def test_lpa_star_adopts_center_or_leaves(spark):
    star = [(1, 2), (1, 3), (1, 4), (1, 5)]
    ids = [1, 2, 3, 4, 5]
    assert _run_lpa(spark, star, ids) == _py_lpa(star, ids)


def test_lpa_matches_bruteforce_on_trade_graph(spark):
    kept = [(r["a"], r["b"]) for r in
            trade_graph_kept_edges(spark, SF_DIR).collect()]
    ids = [r["n_nationkey"] for r in
           spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()]
    got = {r["nationkey"]: r["community"] for r in
           Q["lpa_trade_communities"](spark, SF_DIR).collect()}
    assert got == _py_lpa(kept, ids)


# ---- k-core on hand-built graphs --------------------------------------------

def test_kcore_validates_parameters(spark):
    import pytest
    e = spark.createDataFrame([(1, 2)], "a long, b long")
    n = spark.createDataFrame([(1,), (2,)], "id long")
    with pytest.raises(ValueError):
        k_core_peel(e, n, k=0)
    with pytest.raises(ValueError):
        k_core_peel(e, n, k=2, n_rounds=-1)


def test_kcore_chain_fully_peels(spark):
    chain = [(1, 2), (2, 3), (3, 4), (4, 5)]
    ids = [1, 2, 3, 4, 5]
    got = _run_kcore(spark, chain, ids, k=2)
    assert got == _py_kcore(chain, ids, 2)
    # a chain has no 2-core: 3 peel rounds empty it (ends fall off
    # round by round)
    assert all(not in_core for in_core, _ in got.values())


def test_kcore_cycle_with_tail(spark):
    g = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    ids = [1, 2, 3, 4, 5]
    got = _run_kcore(spark, g, ids, k=2)
    assert got == _py_kcore(g, ids, 2)
    # the triangle survives with degree 2 each; the tail peels
    assert got[1] == (True, 2) and got[2] == (True, 2) and got[3] == (True, 2)
    assert got[4] == (False, 0) and got[5] == (False, 0)


def test_kcore_matches_bruteforce_on_trade_graph(spark):
    kept = [(r["a"], r["b"]) for r in
            trade_graph_kept_edges(spark, SF_DIR).collect()]
    ids = [r["n_nationkey"] for r in
           spark.read.parquet(f"{SF_DIR}/nation.parquet").collect()]
    got = {r["nationkey"]: (r["in_core"], r["degree"]) for r in
           Q["kcore_trade_graph"](spark, SF_DIR).collect()}
    assert got == _py_kcore(kept, ids, 2)
    # the peel must actually remove something at this SF (degree-1
    # nations exist) while a core survives
    assert any(not c for c, _ in got.values())
    assert any(c for c, _ in got.values())


# ---- seasonality screen matches brute force ---------------------------------

def test_dow_outliers_match_bruteforce(spark):
    rows = Q["dow_seasonality_outliers"](spark, SF_DIR).collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").selectExpr(
        "event_type",
        "datediff(CAST(ts AS DATE), DATE '2024-01-01') AS day",
        "CAST(floor(value * 100) AS BIGINT) AS x").collect()
    daily = {}
    for r in ev:
        daily[(r["event_type"], r["day"])] = (
            daily.get((r["event_type"], r["day"]), 0) + r["x"])
    stats = {}
    for (t, d), v in daily.items():
        s, n = stats.get((t, d % 7), (0, 0))
        stats[(t, d % 7)] = (s + v, n + 1)
    want = set()
    for (t, d), v in daily.items():
        s, n = stats[(t, d % 7)]
        if abs(v * n - s) * 10 > 3 * s:
            want.add((t, d))
    got = {(r["event_type"], r["day"]) for r in rows}
    assert got == want and got
    for r in rows:
        s, n = stats[(r["event_type"], r["dow"])]
        assert (r["dow_sum"], r["n_days"]) == (s, n)
        assert r["daily_cents"] == daily[(r["event_type"], r["day"])]
