"""Plan-shape pins for the round-8d/8e additions: the Bloom probe sits
in the fact's scan stage BEFORE the join, the checksum rollup combines
map-side, the z-order query never leaves the JVM, and the two new
iterative graph operators read their per-round state through the cache
(the geometric-re-execution regression guard).

Plus hypothesis property coverage for the two pure-expression
primitives (Morton interleave via DuckDB — no JVM per example — and
the blocked-Bloom build/probe hash agreement in pure Python).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from building_permissions_etl_spark.functions.zorder import z_interleave_sql
from building_permissions_etl_spark.plans.registry import queries

SF_DIR = "/root/testdata/sf0.001"

Q = queries()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---- bloom: probe before the join, join after the probe -------------------

def test_bloom_probe_filters_fact_before_join(spark):
    plan = _plan(Q["bloom_pruned_segment_revenue"](spark, SF_DIR))
    lines = plan.splitlines()
    probe_lines = [i for i, ln in enumerate(lines)
                   if "Filter" in ln and "xxhash64" in ln]
    join_lines = [i for i, ln in enumerate(lines) if "HashJoin" in ln]
    assert probe_lines, plan  # the Bloom probe survived optimization
    assert join_lines, plan
    # explain prints parents above children: the probe (a child of the
    # join's fact side) must appear BELOW the join node
    assert min(probe_lines) > min(join_lines), plan
    # register-blocked property: each probe Filter carries exactly ONE
    # element_at (one word lookup), not one per hash. (Catalyst's
    # constraint propagation legitimately copies the probe across the
    # equi-join to the dim side, so there may be more than one Filter.)
    for i in probe_lines:
        assert lines[i].count("element_at") == 1, lines[i]


def test_checksum_rollup_combines_map_side(spark):
    plan = _plan(Q["table_checksum_rollup"](spark, SF_DIR))
    # expand (rollup) feeds a partial aggregate before the exchange:
    # the fact never crosses the shuffle row-per-row
    assert "Expand" in plan, plan
    assert "partial_sum" in plan, plan


def test_zorder_query_stays_jvm_side(spark):
    plan = _plan(Q["zorder_extent_pruning"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_min" in plan or "partial_max" in plan, plan


def test_rfm_has_no_global_ntile_window(spark):
    """Round-9 swap pin: the RFM quintiles must come from the
    range-partitioned equi-depth prefix sum, never from a global
    un-partitioned ntile window (the round-8 shape pushed every
    customer row through ONE task, three times). The only permitted
    un-partitioned windows are the equi-depth offset prefix sums over
    the ~32-row per-range count tables (one SinglePartition exchange
    per score), plus the anchor/global-agg singletons."""
    df = Q["rfm_segment_counts"](spark, SF_DIR)
    plan = _plan(df)
    assert "ntile" not in plan, plan
    # every full-frame window (row_number over the per-customer rows)
    # is partitioned by its range id — no Window node sorts the whole
    # frame in one task
    for ln in plan.splitlines():
        if "Window [row_number()" in ln:
            assert "__rid" in ln, ln
    # the per-customer frame is cached: each stage's two branches must
    # read the rollup from memory, not recompute the orders aggregate
    # (a raw SinglePartition count over the plan text is useless here —
    # every InMemoryTableScan re-prints the cached relation's internal
    # plan, anchor exchange included; the ntile-free + partitioned
    # row_number assertions above are what pin the shuffle shape)
    assert plan.count("InMemoryTableScan") >= 6, plan


# ---- iterative graph operators: per-round state is cached ------------------

def _cached_rdd_count(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_lpa_rounds_read_cached_state_and_release_superseded(
        spark, monkeypatch):
    """Two regression guards in one: (a) the returned frame reads the
    FINAL round's labels from the cache (the geometric-re-execution
    lesson — each round was eagerly materialized against its
    predecessor's cache inside the operator, so no round can replay
    the full lineage), and (b) per round-8 advice, superseded
    per-round frames are unpersisted as soon as the next round
    materializes: a call retains at most TWO cached frames (directed
    edges + final labels), not n_iter+1, without relying on the
    caller's clearCache. Round 14: pinned on the DISTRIBUTED loop via
    cap=0 — the small-graph driver short-circuit (which the registered
    query normally takes now) returns a literal frame and retains no
    caches at all (its own pin lives in tests/test_graph.py)."""
    from building_permissions_etl_spark.operators import graph

    monkeypatch.setattr(graph, "GRAPH_DRIVER_CAP", 0)
    spark.catalog.clearCache()
    before = _cached_rdd_count(spark)
    df = Q["lpa_trade_communities"](spark, SF_DIR)
    plan = _plan(df)
    assert "InMemoryTableScan" in plan, plan
    assert _cached_rdd_count(spark) - before <= 2
    spark.catalog.clearCache()


def test_kcore_rounds_read_cached_state_and_release_superseded(
        spark, monkeypatch):
    from building_permissions_etl_spark.operators import graph

    monkeypatch.setattr(graph, "GRAPH_DRIVER_CAP", 0)
    spark.catalog.clearCache()
    before = _cached_rdd_count(spark)
    df = Q["kcore_trade_graph"](spark, SF_DIR)
    plan = _plan(df)
    assert "InMemoryTableScan" in plan, plan
    # one live cached frame (last round's surviving edges)
    assert _cached_rdd_count(spark) - before <= 1
    spark.catalog.clearCache()


# ---- hypothesis: Morton interleave --------------------------------------

def _py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_interleave_duckdb_property():
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()
    expr = z_interleave_sql("x", "y", 8, "duckdb")

    @settings(max_examples=200, deadline=None)
    @given(st.integers(0, 255), st.integers(0, 255))
    def check(x, y):
        z = con.execute(
            f"SELECT {expr} FROM (SELECT {x} AS x, {y} AS y)").fetchone()[0]
        assert z == _py_morton(x, y, 8)
        # interleave is a bijection on (x, y): reconstruct both
        rx = sum(((z >> (2 * i)) & 1) << i for i in range(8))
        ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (rx, ry) == (x, y)

    check()


def test_z_interleave_monotone_within_row():
    """For fixed y, z is strictly increasing in x (per-dimension order
    preserved within a Morton cell row) — the property extent pruning
    leans on."""
    import duckdb
    con = duckdb.connect()
    expr = z_interleave_sql("x", "y", 8, "duckdb")
    rows = con.execute(
        f"SELECT y, x, {expr} AS z FROM (SELECT unnest(range(256)) AS x)"
        f" CROSS JOIN (SELECT unnest([0, 7, 255]) AS y) ORDER BY y, x"
    ).fetchall()
    by_y = {}
    for y, x, z in rows:
        by_y.setdefault(y, []).append(z)
    for y, zs in by_y.items():
        assert all(a < b for a, b in zip(zs, zs[1:])), y


# ---- bloom probe/build share one hash scheme (Spark-evaluated) ------------

def test_bloom_build_and_probe_agree_on_random_keysets(spark):
    from building_permissions_etl_spark.operators.bloom import (
        bloom_might_contain,
        build_bloom_bits,
    )

    # three deterministic pseudo-random key sets of different shapes
    for seed, n in ((1, 17), (2, 300), (3, 1000)):
        keys = (spark.range(n)
                .select((F.xxhash64("id", F.lit(seed)) % 10_000_000)
                        .alias("k")))
        bits = build_bloom_bits(keys, "k")
        assert keys.filter(
            bloom_might_contain(F.col("k"), bits)).count() == n
